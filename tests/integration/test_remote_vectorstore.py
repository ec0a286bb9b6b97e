"""RemoteVectorStore against a live data-manager service (the multi-process
serving seam: one process owns the TPU index, others query over HTTP)."""

import numpy as np
import pytest

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.bin.service_data_manager import build_app as build_data
from archi_tpu.engine.remote_vectorstore import RemoteVectorStore
from archi_tpu.retrievers import HybridRetriever


@pytest.fixture(scope="module")
def remote(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("remote")
    corpus = tmp / "corpus"
    corpus.mkdir()
    (corpus / "a.md").write_text("the batch scheduler runs jobs " * 5)
    (corpus / "b.md").write_text("storage quotas limit disk usage " * 5)
    ctx = build_context(overrides={
        "data_manager": {
            "embedding_name": "hash",
            "data_path": str(tmp / "data"),
            "db_path": str(tmp / "cat.db"),
            "sources": {"local_files": {"paths": [str(corpus)]}},
        },
    })
    ctx.data_manager.run_ingestion()
    app, _ = build_data(ctx=ctx, initial_ingestion=False)
    port = app.serve("127.0.0.1", 0, background=True)
    yield RemoteVectorStore(f"http://127.0.0.1:{port}"), ctx
    app.shutdown()


def test_remote_matches_local(remote):
    store, ctx = remote
    assert store.count() == ctx.vectorstore.count()
    local = ctx.vectorstore.hybrid_search("batch scheduler", k=2)
    over_http = store.hybrid_search("batch scheduler", k=2)
    assert [(d.metadata["display_name"], round(s, 4)) for d, s in local] == \
        [(d.metadata["display_name"], round(s, 4)) for d, s in over_http]
    sem = store.similarity_search_with_score("storage quotas", k=1)
    assert sem[0][0].metadata["display_name"] == "b.md"


def test_remote_through_retriever(remote):
    store, _ctx = remote
    r = HybridRetriever(store, k=2)
    results = r.invoke("disk usage quotas")
    assert results[0][0].metadata["display_name"] == "b.md"


def test_remote_is_read_only(remote):
    store, _ctx = remote
    with pytest.raises(NotImplementedError):
        store.add_texts(["nope"])
    with pytest.raises(NotImplementedError):
        store.delete(["x"])


def test_remote_enabled_ids_flow(remote):
    store, ctx = remote
    docs = ctx.catalog.list_documents()
    a_hash = next(d["resource_hash"] for d in docs
                  if d["display_name"] == "a.md")
    res = store.hybrid_search("batch scheduler jobs", k=5,
                              enabled_ids={a_hash})
    assert res and all(d.metadata["display_name"] == "a.md" for d, _s in res)
