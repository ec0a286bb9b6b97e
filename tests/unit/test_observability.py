"""Metrics registry, data viewer, token streaming, concurrent ingest+query."""

import threading

import numpy as np
import pytest

from archi_tpu.data.catalog import CatalogService
from archi_tpu.data.data_viewer import DataViewerService
from archi_tpu.data.manager import IndexManager
from archi_tpu.data.persistence import PersistenceService
from archi_tpu.data.resource import Resource, ResourceMetadata
from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.utils.metrics import MetricsRegistry
from tests.unit.test_vectorstore import FakeEmbeddings


def test_metrics_registry_render():
    m = MetricsRegistry()
    m.inc("requests", labels={"route": "/chat"})
    m.inc("requests", 2, labels={"route": "/chat"})
    m.set_gauge("chunks", 42)
    m.observe("latency_seconds", 0.2)
    m.observe("latency_seconds", 3.0)
    out = m.render()
    assert 'requests_total{route="/chat"} 3.0' in out
    assert "chunks 42" in out
    assert "latency_seconds_count 2" in out
    assert 'latency_seconds_bucket{le="0.25"} 1' in out
    assert 'latency_seconds_bucket{le="+Inf"} 2' in out


def test_metrics_timer():
    m = MetricsRegistry()
    with m.timer("op_seconds"):
        pass
    assert "op_seconds_count 1" in m.render()


@pytest.fixture
def stack(tmp_path):
    catalog = CatalogService(str(tmp_path / "cat.db"))
    persistence = PersistenceService(str(tmp_path / "data"), catalog)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    manager = IndexManager(catalog, persistence, store, chunk_size=100)
    return catalog, persistence, store, manager


def test_data_viewer(stack):
    catalog, persistence, store, manager = stack
    h = persistence.persist_resource(Resource(
        "long document text " * 30,
        ResourceMetadata(display_name="doc.txt"),
    ))
    manager.update_vectorstore()
    viewer = DataViewerService(catalog, persistence, store)
    grouped = viewer.grouped_documents()
    assert "local_files" in grouped
    detail = viewer.document_detail(h)
    assert detail["display_name"] == "doc.txt"
    assert detail["content_length"] > 500
    assert len(detail["chunks"]) >= 2
    assert all(c["chunk_id"].startswith(h) for c in detail["chunks"])
    assert viewer.document_detail("nope") is None
    stats = viewer.stats()
    assert stats["chunks"] == len(detail["chunks"])
    assert stats["bm25_terms"] > 0


def test_qa_pipeline_token_streaming(stack):
    _c, _p, store, _m = stack
    store.add_texts(["the batch scheduler runs jobs"],
                    [{"display_name": "g.md"}])
    a = Archi("QAPipeline", vectorstore=store)
    events = list(a.stream(history=[("User", "how do jobs run?")]))
    kinds = [e.metadata.get("event", {}).get("type")
             for e in events if not e.final]
    assert "retrieval" in kinds
    final = events[-1]
    assert final.final and final.answer.startswith("ECHO:")
    assert final.source_documents


def test_concurrent_ingest_under_query_load(stack):
    """BASELINE config 5 semantics: streaming ingest with concurrent
    queries — no crashes, queries always see a consistent snapshot."""
    catalog, persistence, store, manager = stack
    for i in range(10):
        persistence.persist_resource(Resource(
            f"initial doc {i} about topic{i} " * 10,
            ResourceMetadata(display_name=f"init{i}"),
        ))
    manager.update_vectorstore()

    errors = []
    stop = threading.Event()

    def query_loop():
        while not stop.is_set():
            try:
                res = store.hybrid_search("topic3 doc", k=5)
                assert isinstance(res, list)
            except Exception as e:  # pragma: no cover
                errors.append(e)

    threads = [threading.Thread(target=query_loop) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for batch in range(5):
            for i in range(5):
                persistence.persist_resource(Resource(
                    f"streamed doc b{batch} i{i} fresh content " * 8,
                    ResourceMetadata(display_name=f"b{batch}i{i}"),
                ))
            r = manager.update_vectorstore()
            assert r["failed"] == 0
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=10)
    assert not errors, errors[:3]
    assert store.count() > 10
    res = store.hybrid_search("streamed fresh content", k=3)
    assert res and "streamed" in res[0][0].page_content
