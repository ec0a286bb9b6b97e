"""Collectors + scheduler + DataManager composition tests."""

import time

import numpy as np
import pytest

from archi_tpu.data.catalog import CatalogService
from archi_tpu.data.collectors.anonymizer import Anonymizer
from archi_tpu.data.collectors.local_files import LocalFileManager
from archi_tpu.data.collectors.scraper import LinkScraper, ScraperManager
from archi_tpu.data.collectors.tickets import (
    JiraClient, RedmineClient, TicketManager,
)
from archi_tpu.data.data_manager import DataManager
from archi_tpu.data.persistence import PersistenceService
from archi_tpu.data.scheduler import CronExpr, CronScheduler
from archi_tpu.engine.vectorstore import TpuVectorStore
from tests.unit.test_vectorstore import FakeEmbeddings


@pytest.fixture
def persistence(tmp_path):
    catalog = CatalogService(str(tmp_path / "cat.db"))
    return PersistenceService(str(tmp_path / "data"), catalog)


# -------------------------------------------------------------- local files
def test_local_file_collection(tmp_path, persistence):
    src = tmp_path / "corpus"
    src.mkdir()
    (src / "a.md").write_text("# Title\n\nSome markdown docs.")
    (src / "b.py").write_text("def f():\n    return 1\n")
    (src / "skip.bin").write_bytes(b"\x00\x01")
    mgr = LocalFileManager(persistence)
    hashes = mgr.collect_path(str(src))
    assert len(hashes) == 2
    docs = persistence.catalog.list_documents()
    assert {d["display_name"] for d in docs} == {"a.md", "b.py"}


def test_uploaded_file(persistence):
    mgr = LocalFileManager(persistence)
    h = mgr.ingest_uploaded_file("notes.txt", b"uploaded content")
    assert persistence.read_content(h) == "uploaded content"
    assert persistence.catalog.get_document(h)["metadata"]["extra"]["uploaded"]


# ------------------------------------------------------------------ scraper
PAGES = {
    "http://site.test/": '<html><body>Home page <a href="/a">A</a> '
                         '<a href="http://other.test/x">ext</a></body></html>',
    "http://site.test/a": '<html><body>Page A <a href="/b">B</a></body></html>',
    "http://site.test/b": "<html><body>Page B deep</body></html>",
}


def fake_fetch(url):
    return PAGES.get(url)


def test_link_scraper_bfs_same_host():
    scraper = LinkScraper(max_depth=2, max_pages=10, fetcher=fake_fetch)
    got = list(scraper.crawl_iter("http://site.test/"))
    urls = [u for u, _h, _d in got]
    assert urls == ["http://site.test/", "http://site.test/a", "http://site.test/b"]
    # external host excluded
    assert all("other.test" not in u for u in urls)


def test_link_scraper_depth_limit():
    scraper = LinkScraper(max_depth=1, max_pages=10, fetcher=fake_fetch)
    urls = [u for u, _h, _d in scraper.crawl_iter("http://site.test/")]
    assert "http://site.test/b" not in urls


def test_scraper_manager_persists(persistence):
    mgr = ScraperManager(persistence)
    hashes = mgr.collect_url("http://site.test/", fetcher=fake_fetch)
    assert len(hashes) == 3
    docs = persistence.catalog.list_documents(source_type="links")
    assert len(docs) == 3
    assert all(d["url"].startswith("http://site.test") for d in docs)


# ------------------------------------------------------------------ tickets
def test_jira_collection(persistence):
    def fake_get(url, headers=None, params=None, **kw):
        assert "project = PROJ" in params["jql"]
        return {"issues": [{
            "key": "PROJ-1",
            "fields": {"summary": "Disk full", "description": "node03 /tmp full",
                       "comment": {"comments": [{"body": "cleaned, resolved"}]}},
        }]}

    client = JiraClient("http://jira.test", http_get=fake_get)
    mgr = TicketManager(persistence)
    hashes = mgr.collect_jira(client, "PROJ")
    assert len(hashes) == 1
    text = persistence.read_content(hashes[0])
    assert "Disk full" in text and "cleaned, resolved" in text
    doc = persistence.catalog.get_document(hashes[0])
    assert doc["url"] == "http://jira.test/browse/PROJ-1"


def test_redmine_qa_extraction(persistence):
    def fake_get(url, headers=None, params=None, **kw):
        return {"issues": [
            {"id": 5, "subject": "How to submit jobs?",
             "description": "Which queue should I use?",
             "journals": [{"notes": "Use the long queue."}]},
            {"id": 6, "subject": "No answer", "description": "x",
             "journals": []},
        ]}

    client = RedmineClient("http://rm.test", http_get=fake_get)
    mgr = TicketManager(persistence)
    hashes = mgr.collect_redmine(client, "support")
    assert len(hashes) == 1  # issue without notes skipped
    text = persistence.read_content(hashes[0])
    assert "Question" in text and "Use the long queue." in text


def test_anonymizer():
    a = Anonymizer()
    out = a.anonymize("Hi John Smith, mail me at j.smith@cern.ch or "
                      "+41 22 767 1234. Regards, Alice")
    assert "j.smith@cern.ch" not in out
    assert "John Smith" not in out
    assert "Alice" not in out
    assert "[REDACTED]" in out


# ---------------------------------------------------------------- scheduler
def test_cron_expr_parse_and_match():
    e = CronExpr.parse("*/15 2 * * *")
    assert e.minute == {0, 15, 30, 45}
    assert e.hour == {2}
    t = time.struct_time((2026, 8, 16, 2, 30, 0, 5, 228, 0))
    assert e.matches(t)
    t2 = time.struct_time((2026, 8, 16, 3, 30, 0, 5, 228, 0))
    assert not e.matches(t2)


def test_cron_bad_expr():
    with pytest.raises(ValueError):
        CronExpr.parse("* * *")


def test_scheduler_tick_and_reload():
    sched = CronScheduler()
    ran = []
    sched.add_job("always", "* * * * *", lambda **kw: ran.append("always"))
    assert sched._tick() == ["always"]
    assert ran == ["always"]
    # within the same minute slot it doesn't re-fire
    assert sched._tick() == []

    # config reload with hash change detection
    cfgs = [{"src1": {"cron": "* * * * *"}},
            {"src1": {"cron": "* * * * *"}},  # same → no reload
            {"src2": {"cron": "0 0 * * *"}}]
    calls = []

    def loader():
        return cfgs[min(len(calls), 2)]

    def factory(name, spec):
        return lambda **kw: None

    sched.set_config_loader(loader, factory)
    assert sched.jobs() == ["src1"]
    calls.append(1)
    sched._reload_config()  # same hash → keep
    assert sched.jobs() == ["src1"]
    calls.append(2)
    sched._reload_config()
    assert sched.jobs() == ["src2"]


# ------------------------------------------------------------- composition
def test_data_manager_end_to_end(tmp_path):
    corpus = tmp_path / "docs"
    corpus.mkdir()
    (corpus / "guide.md").write_text("How to run jobs on the cluster.\n\n"
                                     "Use the batch scheduler." * 5)
    (corpus / "faq.txt").write_text("Frequently asked questions about "
                                    "storage quotas and disk space." * 5)
    catalog = CatalogService(str(tmp_path / "cat.db"))
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    dm = DataManager(
        data_path=str(tmp_path / "data"),
        catalog=catalog,
        vectorstore=store,
        sources_config={"local_files": {"paths": [str(corpus)]}},
    )
    result = dm.run_ingestion()
    assert result["collected"]["local_files"] == 2
    assert result["added"] == 2 and result["failed"] == 0
    assert dm.status["status"] == "done"
    res = store.hybrid_search("storage quotas", k=2)
    assert res[0][0].metadata["display_name"] == "faq.txt"

    # re-run: no-op (hash diff)
    r2 = dm.run_ingestion()
    assert r2["added"] == 0 and r2["removed"] == 0

    # reset drops everything then re-ingests
    r3 = dm.run_ingestion(reset=True)
    assert r3["added"] == 2
