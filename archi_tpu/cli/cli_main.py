"""archi-tpu CLI — deploy/manage/evaluate the framework.

Mirrors the reference's ``archi`` console command
(``src/cli/cli_main.py:39`` Click group) and its subcommands ``create``
(``:43-173``), ``delete`` (``:176-184``), ``restart`` (``:264-274``),
``list-services`` (``:401``), ``list-deployments`` (``:432``), and
``evaluate`` (``:464-475``).  Deployments are supervised local processes
(plus a rendered compose manifest); see ``archi_tpu.cli.deployment``.
"""

from __future__ import annotations

import json

import click

from archi_tpu.cli.deployment import DeploymentManager, list_deployments
from archi_tpu.cli.registry import SERVICES, SOURCES
from archi_tpu.config.manager import ConfigurationManager


@click.group()
def cli():
    """archi-tpu: TPU-native RAG framework."""


@cli.command()
@click.option("--name", "-n", required=True, help="deployment name")
@click.option("--config", "-c", "configs", multiple=True,
              type=click.Path(exists=True), help="config YAML (repeatable)")
@click.option("--env-file", "-e", type=click.Path(exists=True),
              help="env file with KEY=VALUE secrets")
@click.option("--services", "only", multiple=True,
              help="start only these services")
def create(name, configs, env_file, only):
    """Create and start a deployment."""
    cm = ConfigurationManager(list(configs), overrides={"name": name})
    cm.validate()
    mgr = DeploymentManager(name)
    started = mgr.start(cm.config, only=list(only) or None,
                        env_file=env_file)
    click.echo(f"deployment {name!r} started:")
    for svc, info in started.items():
        port = f" :{info['port']}" if info.get("port") else ""
        click.echo(f"  {svc}{port}  pid={info['pid']}")
    click.echo(f"artifacts in {mgr.dir}")


@cli.command()
@click.option("--name", "-n", required=True)
@click.option("--keep-files", is_flag=True, help="stop but keep data")
def delete(name, keep_files):
    """Stop (and remove) a deployment."""
    mgr = DeploymentManager(name)
    if not mgr.exists():
        raise click.ClickException(f"no deployment {name!r}")
    if keep_files:
        stopped = mgr.stop()
        click.echo(f"stopped: {', '.join(stopped) or 'nothing running'}")
    else:
        mgr.delete()
        click.echo(f"deployment {name!r} deleted")


@cli.command()
@click.option("--name", "-n", required=True)
def restart(name):
    """Restart a deployment's services."""
    mgr = DeploymentManager(name)
    if not mgr.exists():
        raise click.ClickException(f"no deployment {name!r}")
    import yaml

    with open(f"{mgr.dir}/config.yaml") as f:
        config = yaml.safe_load(f)
    mgr.stop()
    started = mgr.start(config)
    click.echo(f"restarted: {', '.join(started)}")


@cli.command("status")
@click.option("--name", "-n", required=True)
def status(name):
    """Show a deployment's service status."""
    mgr = DeploymentManager(name)
    if not mgr.exists():
        raise click.ClickException(f"no deployment {name!r}")
    for svc, info in mgr.status().items():
        state = "running" if info["alive"] else "stopped"
        click.echo(f"  {svc}: {state} (pid {info.get('pid')})")


@cli.command("list-services")
def list_services():
    """List available services and sources."""
    click.echo("services:")
    for s in SERVICES.values():
        deps = f" (depends on: {', '.join(s.depends_on)})" if s.depends_on else ""
        click.echo(f"  {s.name}: {s.description}{deps}")
    click.echo("sources:")
    for name, spec in SOURCES.items():
        click.echo(f"  {name}: {spec['collector']}")


@cli.command("list-deployments")
def list_deps():
    """List deployments."""
    deps = list_deployments()
    if not deps:
        click.echo("no deployments")
        return
    for d in deps:
        click.echo(f"  {d['name']}: {d['running']}/{len(d['services'])} "
                   f"services running")


@cli.command()
@click.option("--name", "-n", default="evaluate")
@click.option("--config", "-c", "configs", multiple=True,
              type=click.Path(exists=True))
@click.option("--queries", "-q", type=click.Path(exists=True),
              help="queries JSON file (omit with --fixture)")
@click.option("--fixture", is_flag=True,
              help="use the built-in deterministic quality fixture corpus "
                   "+ queries (benchmarking/fixture.py) instead of a "
                   "deployment corpus")
@click.option("--beir", type=click.Path(exists=True),
              help="BEIR-format dataset dir (corpus.jsonl/queries.jsonl/"
                   "qrels) → nDCG@10/recall@k instead of the QA harness "
                   "(BASELINE config 2)")
@click.option("--retriever-mode", default="hybrid",
              type=click.Choice(["hybrid", "semantic", "bm25"]),
              help="retrieval mode for --beir runs")
@click.option("--mode", "-m", multiple=True,
              default=("SOURCES", "RETRIEVAL"),
              type=click.Choice(["SOURCES", "RAGAS", "RETRIEVAL"]))
@click.option("--judge", help="model ref for RAGAS-fallback LLM judging "
                              "(e.g. openai/gpt-4o-mini)")
@click.option("--out", "-o", default="./benchmark_results")
def evaluate(name, configs, queries, fixture, beir, retriever_mode, mode,
             judge, out):
    """Run the quality/retrieval benchmark (reference `archi evaluate`)."""
    from archi_tpu.benchmarking.harness import Benchmarker
    from archi_tpu.orchestrator.archi import Archi

    if beir:
        from archi_tpu.benchmarking.beir import evaluate_beir

        embedder = None
        if configs:
            from archi_tpu.config.manager import ConfigurationManager
            from archi_tpu.models.registry import resolve_embedder

            cm = ConfigurationManager(list(configs))
            embedder = resolve_embedder(cm.config["data_manager"])
        result = evaluate_beir(beir, embedder=embedder,
                               mode=retriever_mode)
        click.echo(json.dumps(result, indent=2))
        return

    judge_model = None
    if judge:
        from archi_tpu.providers.registry import get_model

        judge_model = get_model(judge)

    if fixture:
        from archi_tpu.benchmarking.fixture import fixture_corpus
        from archi_tpu.data.chunking import character_split
        from archi_tpu.engine.vectorstore import TpuVectorStore
        from archi_tpu.models.hashed_embedder import HashedNgramEmbedder

        docs, qs = fixture_corpus()
        store = TpuVectorStore(HashedNgramEmbedder())
        texts, metas, ids = [], [], []
        for dname, text, meta in docs:
            for i, chunk in enumerate(character_split(text)):
                texts.append(chunk)
                metas.append(dict(meta))
                ids.append(f"{dname}:{i}")
        store.add_texts(texts, metas, ids=ids)
        archi = Archi("QAPipeline", vectorstore=store)
        vectorstore = store
    else:
        if not queries:
            raise click.UsageError("--queries required without --fixture")
        from archi_tpu.bin.bootstrap import build_context

        with open(queries) as f:
            qs = json.load(f)
        ctx = build_context(list(configs))
        ctx.data_manager.run_ingestion()
        archi = Archi(ctx.config.get("active_pipeline", "QAPipeline"),
                      config=ctx.config, vectorstore=ctx.vectorstore)
        vectorstore = ctx.vectorstore
    bench = Benchmarker(archi, qs, modes=tuple(mode), out_dir=out,
                        vectorstore=vectorstore, judge_model=judge_model)
    report = bench.run()
    click.echo(json.dumps(report["totals"], indent=2))
    click.echo(f"full report: {out}/results.json, {out}/results.html")


if __name__ == "__main__":
    cli()
