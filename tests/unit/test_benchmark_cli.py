"""Benchmark harness + CLI registry/deployment rendering + bots/mailer."""

import json

import numpy as np
import pytest

from archi_tpu.benchmarking.harness import (
    Benchmarker, match_sources, wait_for_ingestion,
)
from archi_tpu.cli.deployment import render_compose
from archi_tpu.cli.registry import SERVICES, resolve_dependencies
from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.orchestrator.output import PipelineOutput
from archi_tpu.utils.documents import Document
from archi_tpu.web.bots import MattermostBot
from archi_tpu.web.redmine_mailer import (
    Mailbox, MailSender, RedmineMailer,
)
from tests.unit.test_vectorstore import FakeEmbeddings

DOCS = [
    ("submit jobs with the batch scheduler", {"display_name": "guide.md"}),
    ("storage quotas are 100GB per user", {"display_name": "storage.md"}),
    ("the gpu partition needs approval", {"display_name": "gpu.md"}),
]


@pytest.fixture
def store():
    s = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    s.add_texts([d for d, _ in DOCS], [m for _, m in DOCS])
    return s


def test_match_sources():
    out = PipelineOutput(
        answer="a",
        source_documents=[Document("x", {"display_name": "guide.md"}),
                          Document("y", {"display_name": "other.md"})],
    )
    assert match_sources(out, [{"display_name": "guide.md"}]) == [True]
    assert match_sources(out, [{"display_name": "guide.md"},
                               {"display_name": "missing.md"}]) == [True, False]
    assert match_sources(out, [{"url": "http://x"}]) == [False]


def test_benchmarker_sources_and_retrieval(store, tmp_path):
    archi = Archi("QAPipeline", vectorstore=store)
    queries = [
        {"question": "how to submit batch jobs?",
         "reference_sources": [{"display_name": "guide.md"}]},
        {"question": "what are the storage quotas?",
         "reference_sources": [{"display_name": "storage.md"}]},
        {"question": "how to use the gpu partition?",
         "reference_sources": [{"display_name": "gpu.md"},
                               {"display_name": "nonexistent.md"}]},
    ]
    bench = Benchmarker(archi, queries,
                        modes=("SOURCES", "RETRIEVAL", "RAGAS"),
                        out_dir=str(tmp_path), vectorstore=store)
    report = bench.run()
    t = report["totals"]
    assert t["relative_source_accuracy"] == 1.0
    assert t["source_accuracy"] == pytest.approx(2 / 3)
    assert t["recall_at_k"] == 1.0  # exact flat index
    assert t["query_qps"] > 0
    assert t.get("ragas_backend") == "llm_judge_fallback"  # vendored judge
    assert "aggregate_faithfulness" in t
    assert (tmp_path / "results.json").exists()
    assert (tmp_path / "results.html").exists()
    data = json.loads((tmp_path / "results.json").read_text())
    assert len(data["questions"]) == 3
    assert data["questions"]["question_3"]["reference_sources_metadata"][1][
        "matched"] is False


def test_wait_for_ingestion():
    states = iter([
        {"status": "collecting", "by_status": {"pending": 2}},
        {"status": "done", "by_status": {"embedded": 2}},
    ])
    assert wait_for_ingestion(lambda: next(states), timeout=5, poll=0.01)
    assert not wait_for_ingestion(
        lambda: {"status": "collecting", "by_status": {"pending": 1}},
        timeout=0.05, poll=0.01)


# --------------------------------------------------------------------- CLI
def test_resolve_dependencies_order():
    order = resolve_dependencies(["chat", "data_manager", "grader"])
    assert order.index("data_manager") < order.index("chat")
    assert order.index("data_manager") < order.index("grader")


def test_render_compose():
    import yaml

    cfg = {
        "services": {
            "chat": {"enabled": True, "port": 7861},
            "data_manager": {"enabled": True, "port": 7862},
            "grader": {"enabled": False, "port": 7863},
        },
        "verbosity": 2,
    }
    compose = yaml.safe_load(render_compose(cfg))
    assert set(compose["services"]) == {"chat", "data_manager"}
    assert compose["services"]["chat"]["depends_on"] == ["data_manager"]
    assert compose["services"]["chat"]["ports"] == ["7861:7861"]
    assert compose["services"]["chat"]["restart"] == "always"


def test_cli_list_services_runs():
    from click.testing import CliRunner

    from archi_tpu.cli.cli_main import cli

    r = CliRunner().invoke(cli, ["list-services"])
    assert r.exit_code == 0
    assert "data_manager" in r.output and "sources:" in r.output


def test_cli_evaluate(tmp_path, store):
    from click.testing import CliRunner

    from archi_tpu.cli.cli_main import cli

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "guide.md").write_text("submit jobs with the batch scheduler " * 10)
    cfg = tmp_path / "c.yaml"
    cfg.write_text(f"""
data_manager:
  embedding_name: hash
  data_path: {tmp_path}/data
  db_path: {tmp_path}/catalog.db
  sources:
    local_files:
      paths: ["{corpus}"]
""")
    queries = tmp_path / "q.json"
    queries.write_text(json.dumps([
        {"question": "how to submit jobs?",
         "reference_sources": [{"display_name": "guide.md"}]},
    ]))
    r = CliRunner().invoke(cli, [
        "evaluate", "-c", str(cfg), "-q", str(queries),
        "-o", str(tmp_path / "out"),
    ])
    assert r.exit_code == 0, r.output
    assert '"source_accuracy": 1.0' in r.output


# --------------------------------------------------------------- bots/mailer
def test_mattermost_bot_step(store):
    archi = Archi("QAPipeline", vectorstore=store)
    posts = [{"id": "p1", "question": "how to submit jobs?"}]
    answered = {}
    bot = MattermostBot(
        archi, fetch_fn=lambda: posts,
        post_fn=lambda item, ans: answered.update({item["id"]: ans}),
    )
    assert bot.step() == 1
    assert answered["p1"].startswith("ECHO:")
    # already answered → no repost
    assert bot.step() == 0


def test_redmine_mailer_step(store):
    archi = Archi("QAPipeline", vectorstore=store)
    mails = [{"uid": "1", "from": "user@x.y", "subject": "disk full",
              "body": "node03 /tmp is full"}]
    tickets, notes, sent = [], [], []

    class FakeRedmine:
        def create_issue(self, project, subject, desc):
            tickets.append(subject)
            return {"id": 42}

        def add_note(self, issue_id, note, private=False):
            notes.append((issue_id, note, private))

    mailer = RedmineMailer(
        mailbox=Mailbox("", "", "", fetch_fn=lambda: mails),
        sender=MailSender("", send_fn=lambda to, subj, body:
                          sent.append((to, subj))),
        redmine_client=FakeRedmine(),
        agent_archi=archi,
    )
    assert mailer.step() == 1
    assert tickets == ["disk full"]
    assert notes[0][0] == 42 and notes[0][2] is True
    assert sent[0][0] == "user@x.y" and "#42" in sent[0][1]
    # idempotent
    assert mailer.step() == 0


def test_piazza_bot_step(store):
    from archi_tpu.web.bots import PiazzaBot

    archi = Archi("QAPipeline", vectorstore=store)
    drafts = []
    bot = PiazzaBot(
        archi, network_id="n1",
        fetch_fn=lambda: [{"id": "p9", "question": "storage quotas?"}],
        post_fn=lambda item, ans: drafts.append((item["id"], ans)),
    )
    assert bot.step() == 1
    assert drafts[0][0] == "p9" and drafts[0][1].startswith("ECHO:")
    assert bot.step() == 0  # no duplicate drafts
