"""BASELINE config 1: a REAL documentation corpus end to end.

Config 1 is "archi docs + SubMIT corpus (~10k chunks), exact cosine top-10"
— this run ingests the reference framework's own documentation (markdown,
used purely as corpus DATA) through the production path: local_files
collector → catalog → diff-sync → chunk (1000/0) → embed → TPU flat index
→ hybrid retrieval → QAPipeline, then scores SOURCES accuracy on
hand-written questions grounded in those docs plus recall@10/QPS.

The embedder is the deterministic hashed-ngram featurizer by default (no
pretrained weights exist in this image); two r5 options upgrade it:
  --embedder DIR     serve a trained encoder snapshot via JaxEmbedder
  --train-encoder    contrastively train the encoder ON THIS CORPUS first
                     (self-supervised ICT + mined pairs — the production
                     story for a fresh deployment: in-domain encoder
                     trained at ingest time), then embed with it
and --full-checkout widens the corpus from the 15-file docs tree to the
whole reference checkout's text (markdown + source code + SQL + JS —
the same file classes the reference's own GitScraper ingests,
``git_scraper.py:94``), with code-grounded queries added so SOURCES
accuracy is scored against code files too.

Usage: python scripts/run_config1.py [corpus_dir] [out.json]
           [--full-checkout] [--embedder DIR] [--train-encoder]
           [--steps N]
"""

from __future__ import annotations

import json
import sys
import time

QUERIES = [
    {"question": "how do I configure a deployment with a YAML file?",
     "reference_sources": [{"display_name": "configuration.md"}]},
    {"question": "which services can I enable at deploy time?",
     "reference_sources": [{"display_name": "services.md"}]},
    {"question": "walk me through deploying my first instance",
     "reference_sources": [{"display_name": "quickstart.md"}]},
    {"question": "how do I ingest content from a web link list?",
     "reference_sources": [{"display_name": "data_sources.md"}]},
    {"question": "what are the evaluation modes of the benchmarking "
                 "command?",
     "reference_sources": [{"display_name": "benchmarking.md"}]},
    {"question": "how are agent specs defined and where do they live?",
     "reference_sources": [{"display_name": "agents_tools.md"}]},
    {"question": "what should I do about port conflicts?",
     "reference_sources": [{"display_name": "troubleshooting.md"}]},
    {"question": "which LLM provider types are supported?",
     "reference_sources": [{"display_name": "models_providers.md"}]},
    {"question": "how do I verify the CLI installation?",
     "reference_sources": [{"display_name": "cli_reference.md"}]},
    {"question": "what are the system requirements to install?",
     "reference_sources": [{"display_name": "install.md"}]},
    {"question": "list the REST API endpoints of the chat application",
     "reference_sources": [{"display_name": "api_reference.md"}]},
    {"question": "how do I enable lingering for podman containers?",
     "reference_sources": [{"display_name": "advanced_setup_deploy.md"}]},
    {"question": "give me an architecture overview for contributors",
     "reference_sources": [{"display_name": "developer_guide.md"}]},
    {"question": "what are the core parts of the retrieval assistant "
                 "framework?",
     "reference_sources": [{"display_name": "user_guide.md"}]},
]

# Code-grounded queries for --full-checkout: the right document is a
# SOURCE file (all basenames verified unique in the checkout), matching
# how the reference's own GitScraper serves code files as documents.
CODE_QUERIES = [
    {"question": "what is the default recursion limit of the ReAct agent "
                 "loop and how is it recovered from?",
     "reference_sources": [{"display_name": "base_react.py"}]},
    {"question": "how are per-user encrypted provider API keys resolved "
                 "into a provider instance?",
     "reference_sources": [{"display_name": "byok_resolver.py"}]},
    {"question": "which SQL table stores the per-message timing "
                 "decomposition timestamps?",
     "reference_sources": [{"display_name": "init.sql"}]},
    {"question": "how does the benchmark service compute strict versus "
                 "relative source accuracy?",
     "reference_sources": [{"display_name": "service_benchmark.py"}]},
    {"question": "how does the link crawler limit BFS depth and the "
                 "maximum number of pages?",
     "reference_sources": [{"display_name": "scraper.py"}]},
    {"question": "how does the postgres connection pool health-check and "
                 "reconnect stale connections?",
     "reference_sources": [{"display_name": "connection_pool.py"}]},
    {"question": "which pgvector distance operators does the vectorstore "
                 "use for similarity search?",
     "reference_sources": [{"display_name": "postgres_vectorstore.py"}]},
    {"question": "how are cron schedules reloaded when their database "
                 "config changes?",
     "reference_sources": [{"display_name": "scheduler.py"}]},
    {"question": "how are question and answer pairs extracted from closed "
                 "redmine issues?",
     "reference_sources": [{"display_name": "redmine_tickets.py"}]},
    {"question": "how are prompts and history pruned to fit a model's "
                 "token limit?",
     "reference_sources": [{"display_name": "token_limiter.py"}]},
    {"question": "where is the diff-based vectorstore sync between the "
                 "catalog and embedded chunks implemented?",
     "reference_sources": [{"display_name": "manager.py"}]},
]


def main() -> None:
    import os

    args = sys.argv[1:]
    pos, skip = [], False
    for i, a in enumerate(args):
        if skip:
            skip = False
            continue
        if a in ("--embedder", "--steps"):
            skip = True
        elif not a.startswith("-"):
            pos.append(a)
    full = "--full-checkout" in args
    corpus_dir = pos[0] if pos else "/root/reference/docs/docs"
    out_path = pos[1] if len(pos) > 1 else "CONFIG1_r02.json"
    model_dir = args[args.index("--embedder") + 1] \
        if "--embedder" in args else None
    train_enc = "--train-encoder" in args
    steps = int(args[args.index("--steps") + 1]) if "--steps" in args \
        else 1500
    if not os.path.isdir(corpus_dir):
        # the classic footgun: passing only the OUTPUT path makes the
        # collector ingest that file as a one-document corpus
        raise SystemExit(
            f"corpus_dir {corpus_dir!r} is not a directory "
            "(usage: run_config1.py [corpus_dir] [out.json])")
    import tempfile

    from archi_tpu.benchmarking.harness import Benchmarker
    from archi_tpu.bin.bootstrap import build_context
    from archi_tpu.orchestrator.archi import Archi

    queries = list(QUERIES)
    if full:
        # the whole checkout's text: docs + source + SQL + JS + configs
        # (the file classes the reference's GitScraper ingests) — NOT the
        # .git objects; explicit top-level paths keep the corpus honest.
        base = "/root/reference"
        paths = [f"{base}/docs", f"{base}/src", f"{base}/tests",
                 f"{base}/openspec", f"{base}/README.md",
                 f"{base}/AGENTS.md", f"{base}/pyproject.toml"]
        paths = [p for p in paths if os.path.exists(p)]
        queries += CODE_QUERIES
    else:
        paths = [corpus_dir]

    embedding_name = "hashed_ngram"
    embedding_kwargs: dict = {}
    train_s = train_chunks = None
    if train_enc:
        # In-domain self-supervised encoder: chunk the corpus the same way
        # ingest will, train the contrastive encoder on those chunks
        # (models/train_encoder.py — ICT views + corpus-mined pairs), then
        # serve it for the benchmark.  This is the fresh-deployment story
        # for an image with no pretrained checkpoints.
        from archi_tpu.data.chunking import character_split
        from archi_tpu.data.loaders import load_text, supported_extensions
        from archi_tpu.models.train_encoder import save_model_dir, train

        exts = supported_extensions()
        texts = []
        for p in paths:
            files = [p] if os.path.isfile(p) else [
                os.path.join(r, f) for r, _d, fs in os.walk(p) for f in fs]
            for f in files:
                ext = os.path.splitext(f)[1].lower()
                if ext not in exts and ext != "":
                    continue
                try:
                    content = load_text(f)
                except Exception:
                    continue
                texts.extend(character_split(content, chunk_size=1000,
                                             chunk_overlap=0))
        train_chunks = len(texts)
        print(f"training in-domain encoder on {train_chunks} chunks",
              flush=True)
        t0 = time.time()
        cfg, params, tok = train(texts, steps=steps,
                                 log=lambda s: print(s, flush=True))
        train_s = round(time.time() - t0, 1)
        model_dir = tempfile.mkdtemp(prefix="config1_enc_")
        save_model_dir(model_dir, cfg, params, tok)
    if model_dir:
        embedding_name = "jax"
        embedding_kwargs = {"model_dir": model_dir, "max_length": 256}

    root = tempfile.mkdtemp(prefix="config1_")
    t0 = time.time()
    ctx = build_context(overrides={
        "data_manager": {
            "data_path": root + "/data",
            "db_path": root + "/catalog.db",
            "embedding_name": embedding_name,
            "embedding_kwargs": embedding_kwargs,
            "sources": {"local_files": {"paths": paths}},
            "index": {"dtype": "float32", "tile_n": 256},
        },
    })
    ingest = ctx.data_manager.run_ingestion()
    ingest_s = time.time() - t0

    archi = Archi("QAPipeline", config=ctx.config,
                  vectorstore=ctx.vectorstore)
    bench = Benchmarker(archi, queries, modes=("SOURCES", "RETRIEVAL"),
                        out_dir=root + "/results",
                        vectorstore=ctx.vectorstore, retrieval_k=10)
    report = bench.run()
    t = report["totals"]
    missed = [q["question"] for name, q in
              zip(report["questions"], queries)
              if not all(m["matched"] for m in
                         report["questions"][name].get(
                             "reference_sources_metadata", [{"matched": 1}]))]
    payload = {
        "config": "BASELINE config 1 — real docs corpus through the full "
                  "ingest+retrieval pipeline",
        "corpus": paths if full else corpus_dir,
        "embedder": ("trained in-domain encoder" if train_enc else
                     "trained encoder snapshot" if model_dir else
                     "hashed_ngram featurizer"),
        **({"encoder_train_s": train_s,
            "encoder_train_chunks": train_chunks,
            "encoder_train_steps": steps} if train_enc else {}),
        "documents": ingest["collected"]["local_files"],
        "chunks": ingest["total_chunks"],
        "ingest_s": round(ingest_s, 1),
        "source_accuracy": t.get("source_accuracy"),
        "relative_source_accuracy": t.get("relative_source_accuracy"),
        "recall_at_10": t.get("recall_at_k"),
        "query_qps": t.get("query_qps"),
        "n_questions": t["n_questions"],
        "missed": missed,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
    ctx.scheduler.stop()


if __name__ == "__main__":
    main()
