"""Catalog + persistence + chunking + IndexManager diff-sync tests — the
analog of the reference's test_ingestion_pipeline_isolation.py /
test_vectorstore_manager_batch_commit.py / test_catalog_postgres tests."""

import numpy as np
import pytest

from archi_tpu.data.catalog import CatalogService
from archi_tpu.data.chunking import character_split, sliding_window_split
from archi_tpu.data.manager import IndexManager
from archi_tpu.data.persistence import PersistenceService
from archi_tpu.data.resource import Resource, ResourceMetadata
from archi_tpu.engine.vectorstore import TpuVectorStore
from tests.unit.test_vectorstore import FakeEmbeddings


@pytest.fixture
def stack(tmp_path):
    catalog = CatalogService(str(tmp_path / "catalog.db"))
    persistence = PersistenceService(str(tmp_path / "data"), catalog)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    manager = IndexManager(catalog, persistence, store, chunk_size=120,
                           batch_files=2)
    return catalog, persistence, store, manager


def _resource(text, name="doc", source="local_files"):
    return Resource(text, ResourceMetadata(display_name=name,
                                           source_type=source))


# ---------------------------------------------------------------- catalog
def test_catalog_upsert_and_status(stack):
    catalog, persistence, _store, _m = stack
    h = persistence.persist_resource(_resource("hello world", "a"))
    doc = catalog.get_document(h)
    assert doc["display_name"] == "a"
    assert doc["ingestion_status"] == "pending"
    catalog.update_ingestion_status(h, "embedding")
    catalog.update_ingestion_status(h, "failed", "boom")
    doc = catalog.get_document(h)
    assert doc["ingestion_status"] == "failed" and doc["ingestion_error"] == "boom"
    assert catalog.retry_failed() == 1
    assert catalog.get_document(h)["ingestion_status"] == "pending"


def test_catalog_lists_and_search(stack):
    catalog, persistence, _s, _m = stack
    persistence.persist_resource(_resource("alpha text", "alpha.txt"))
    persistence.persist_resource(_resource("beta text", "beta.txt", "links"))
    grouped = catalog.list_documents_grouped()
    assert set(grouped) == {"local_files", "links"}
    hits = catalog.search_documents("alpha")
    assert len(hits) == 1 and hits[0]["display_name"] == "alpha.txt"
    stats = catalog.stats()
    assert stats["total"] == 2


def test_catalog_soft_delete_and_selection(stack):
    catalog, persistence, _s, _m = stack
    h1 = persistence.persist_resource(_resource("one", "1"))
    h2 = persistence.persist_resource(_resource("two", "2"))
    assert catalog.enabled_hashes("conv") is None  # no selection → all
    catalog.set_document_enabled("conv", h1, False)
    assert catalog.enabled_hashes("conv") == {h2}
    catalog.delete_resource(h1)
    assert catalog.all_hashes() == {h2}


def test_migration_state_checkpoint(stack):
    catalog, *_ = stack
    assert catalog.get_migration_state("job") is None
    catalog.set_migration_state("job", {"phase": 1, "last_id": 42})
    assert catalog.get_migration_state("job") == {"phase": 1, "last_id": 42}


# --------------------------------------------------------------- chunking
def test_character_split_sizes():
    text = "\n\n".join(f"para {i} " + "x" * 50 for i in range(10))
    chunks = character_split(text, chunk_size=120, chunk_overlap=0)
    assert all(len(c) <= 120 for c in chunks)
    assert "".join(c.replace("\n\n", "") for c in chunks).count("para 0") == 1


def test_character_split_overlap():
    text = "\n\n".join(f"p{i}" for i in range(20))
    chunks = character_split(text, chunk_size=20, chunk_overlap=8)
    assert len(chunks) > 1
    # consecutive chunks share trailing pieces
    assert any(chunks[i].split("\n\n")[-1] in chunks[i + 1]
               for i in range(len(chunks) - 1))


def test_character_split_oversized_piece():
    chunks = character_split("y" * 5000, chunk_size=1000)
    assert all(len(c) <= 1000 for c in chunks)
    assert sum(len(c) for c in chunks) == 5000


def test_sliding_window():
    chunks = sliding_window_split("a" * 100, window=40, stride=30)
    assert chunks[0] == "a" * 40
    assert len(chunks) == 3


# ---------------------------------------------------------------- manager
def test_diff_sync_add_remove(stack):
    catalog, persistence, store, manager = stack
    h1 = persistence.persist_resource(_resource("the quick brown fox " * 20, "a"))
    h2 = persistence.persist_resource(_resource("vector search engines " * 20, "b"))
    res = manager.update_vectorstore()
    assert res["added"] == 2 and res["failed"] == 0
    assert store.count() > 2  # chunked
    assert catalog.get_document(h1)["ingestion_status"] == "embedded"

    # idempotent: nothing new
    res2 = manager.update_vectorstore()
    assert res2["added"] == 0 and res2["removed"] == 0

    # remove one from catalog → chunks removed from store
    persistence.delete_resource(h1)
    res3 = manager.update_vectorstore()
    assert res3["removed"] == 1
    assert manager.store_hashes() == {h2}


def test_per_file_isolation(stack, tmp_path):
    """One bad file fails; others embed (reference SAVEPOINT analog)."""
    catalog, persistence, store, manager = stack
    good = persistence.persist_resource(_resource("good text " * 50, "good"))
    # a catalog row pointing to an unreadable path
    catalog.upsert_resource("badhash", display_name="bad",
                            file_path=str(tmp_path / "missing.xyz"))
    res = manager.update_vectorstore()
    assert res["added"] == 1 and res["failed"] == 1
    assert catalog.get_document(good)["ingestion_status"] == "embedded"
    bad = catalog.get_document("badhash")
    assert bad["ingestion_status"] == "failed" and "parse" in bad["ingestion_error"]
    # failed doc is NOT retried on the next pass
    res2 = manager.update_vectorstore()
    assert res2["failed"] == 0 and res2["added"] == 0
    # explicit retry flips it back to pending (and fails again)
    res3 = manager.retry_failed()
    assert res3["failed"] == 1


def test_embed_failure_isolated_per_file(stack, monkeypatch):
    catalog, persistence, store, manager = stack
    h1 = persistence.persist_resource(_resource("alpha " * 50, "a"))
    h2 = persistence.persist_resource(_resource("POISON " * 50, "b"))

    real_add = store.add_texts

    def flaky_add(texts, metadatas=None, ids=None, **kw):
        if any("POISON" in t for t in texts):
            raise RuntimeError("embed blew up")
        return real_add(texts, metadatas, ids=ids, **kw)

    monkeypatch.setattr(store, "add_texts", flaky_add)
    res = manager.update_vectorstore()
    assert res["added"] == 1 and res["failed"] == 1
    assert catalog.get_document(h1)["ingestion_status"] == "embedded"
    assert catalog.get_document(h2)["ingestion_status"] == "failed"


def test_resume_after_partial_ingest(stack):
    """Crash-resume semantics: hashes already in the store are skipped."""
    catalog, persistence, store, manager = stack
    hashes = [persistence.persist_resource(_resource(f"text {i} " * 30, f"d{i}"))
              for i in range(5)]
    manager.update_vectorstore()
    # simulate a new manager process over the same state
    manager2 = IndexManager(catalog, persistence, store, chunk_size=120)
    res = manager2.update_vectorstore()
    assert res["added"] == 0 and res["removed"] == 0


def test_content_edit_is_remove_plus_add(stack):
    catalog, persistence, store, manager = stack
    r = _resource("version one content " * 20, "doc")
    h1 = persistence.persist_resource(r)
    manager.update_vectorstore()
    # edited content → new hash; old row deleted by collector flow
    r2 = _resource("version TWO content " * 20, "doc")
    h2 = persistence.persist_resource(r2)
    persistence.delete_resource(h1)
    res = manager.update_vectorstore()
    assert res["added"] == 1 and res["removed"] == 1
    assert manager.store_hashes() == {h2}


def test_parallel_parse_pipeline_isolation_and_order(tmp_path):
    """Parallel+pipelined parsing (parallel_workers config) preserves
    per-file fault isolation and syncs every good file, including at
    workers=1 (prefetch-driver deadlock regression)."""
    import numpy as np

    from archi_tpu.data.catalog import CatalogService
    from archi_tpu.data.manager import IndexManager
    from archi_tpu.data.persistence import PersistenceService
    from archi_tpu.data.resource import Resource, ResourceMetadata
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from tests.unit.test_vectorstore import FakeEmbeddings

    for workers in (1, 8):
        catalog = CatalogService(str(tmp_path / f"cat{workers}.db"))
        pers = PersistenceService(str(tmp_path / f"data{workers}"), catalog)
        store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
        mgr = IndexManager(catalog, pers, store, batch_files=4,
                           parallel_workers=workers)
        for i in range(11):
            meta = ResourceMetadata(display_name=f"d{i}.txt",
                                    source_type="local_files",
                                    extension=".txt")
            pers.persist_resource(Resource(
                f"{workers} searchable content number {i}", meta))
        # one unreadable doc: point its file_path at nothing and empty text
        bad_meta = ResourceMetadata(display_name="bad.bin",
                                    source_type="local_files",
                                    extension=".bin")
        bad_hash = pers.persist_resource(Resource("  ", bad_meta))
        result = mgr.update_vectorstore()
        assert result["added"] == 11
        assert result["failed"] == 1
        assert catalog.get_document(bad_hash)["ingestion_status"] == "failed"
        docs = [d for d in catalog.list_documents()
                if d["ingestion_status"] == "embedded"]
        assert len(docs) == 11
        res = store.hybrid_search(f"{workers} searchable number", k=3)
        assert res
