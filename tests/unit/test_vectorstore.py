"""TpuVectorStore: the PostgresVectorStore-contract tests (the analog of
reference tests/unit/test_postgres_vectorstore.py, but against the real
engine instead of mocked SQL)."""

import zlib

import numpy as np
import pytest

from archi_tpu.engine.bm25 import analyze
from archi_tpu.engine.vectorstore import TpuVectorStore


class FakeEmbeddings:
    """Deterministic hash-based embeddings (unit-norm); docs sharing words
    are closer.  Stands in for JaxEmbedder to keep these tests fast."""

    dim = 64

    def _vec(self, text):
        v = np.zeros(self.dim, np.float32)
        for t in analyze(text):
            # zlib.crc32, not hash(): str hash is PYTHONHASHSEED-randomized,
            # which made near-tie rankings flip between test runs.
            rs = np.random.RandomState(zlib.crc32(t.encode()) % (2**31))
            v += rs.standard_normal(self.dim).astype(np.float32)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v + 1.0 / np.sqrt(self.dim)

    def embed_documents(self, texts):
        return [self._vec(t).tolist() for t in texts]

    def embed_query(self, text):
        return self._vec(text).tolist()


DOCS = [
    ("the quick brown fox jumps over the lazy dog", {"source": "a.txt", "collection": "default"}),
    ("postgres stores vectors using the pgvector extension", {"source": "b.txt", "collection": "default"}),
    ("tpu matrix units multiply large matrices quickly", {"source": "c.txt", "collection": "default"}),
    ("a fast brown fox leaps over sleeping dogs", {"source": "d.txt", "collection": "other"}),
]


@pytest.fixture
def store():
    s = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    s.add_texts([d for d, _ in DOCS], [m for _, m in DOCS],
                ids=[f"id{i}" for i in range(len(DOCS))])
    return s


def test_similarity_search(store):
    res = store.similarity_search_with_score("brown fox jumping", k=2)
    assert len(res) == 2
    assert "fox" in res[0][0].page_content
    assert res[0][1] >= res[1][1]


def test_metadata_filter(store):
    res = store.similarity_search_with_score(
        "brown fox", k=4, filter={"collection": "other"}
    )
    assert len(res) == 1
    assert res[0][0].metadata["source"] == "d.txt"


def test_hybrid_search_ranks_lexical_match(store):
    res = store.hybrid_search("pgvector extension", k=3,
                              semantic_weight=0.4, bm25_weight=0.6)
    assert res[0][0].metadata["source"] == "b.txt"


def test_hybrid_matches_manual_fusion(store):
    """combined = w_sem * semantic + w_b * bm25, over the full corpus."""
    q = "brown fox"
    w_s, w_b = 0.4, 0.6
    emb = np.asarray(store._embedding_function.embed_query(q), np.float32)
    sem_res = store.similarity_search_by_vector_with_score(emb, k=4)
    sem = {d.metadata["source"]: s for d, s in sem_res}
    bm = np.asarray(store.bm25.scores(q, store.index.capacity))
    combined = {}
    for row, (cid, text, meta) in store._row_data.items():
        combined[meta["source"]] = w_s * sem[meta["source"]] + w_b * bm[row]
    res = store.hybrid_search(q, k=4, semantic_weight=w_s, bm25_weight=w_b)
    got = {d.metadata["source"]: s for d, s in res}
    for src, val in got.items():
        np.testing.assert_allclose(val, combined[src], rtol=1e-3, atol=1e-4)
    # ranking order matches the manual fusion
    want_order = sorted(combined, key=combined.get, reverse=True)
    assert [d.metadata["source"] for d, _ in res] == want_order


def test_hybrid_semantic_fallback(store):
    """BM25 finds nothing → reference falls back to pure semantic scores."""
    res = store.hybrid_search("zzzunknownzzz qqqq", k=2)
    sem = store.similarity_search_with_score("zzzunknownzzz qqqq", k=2)
    assert [d.metadata["source"] for d, _ in res] == [
        d.metadata["source"] for d, _ in sem
    ]
    np.testing.assert_allclose(
        [s for _, s in res], [s for _, s in sem], rtol=1e-5
    )


def test_bm25_only_mode(store):
    res = store.hybrid_search("brown fox", k=2, semantic_weight=0.0,
                              bm25_weight=1.0)
    assert all("fox" in d.page_content for d, _ in res)


def test_upsert_replaces(store):
    store.add_texts(["totally new content about quantum chips"],
                    [{"source": "a.txt", "collection": "default"}], ids=["id0"])
    assert store.count() == 4
    res = store.similarity_search_with_score("quantum chips", k=1)
    assert res[0][0].metadata["source"] == "a.txt"
    # old content gone
    res2 = store.similarity_search_with_score("quick brown fox jumps", k=4)
    assert all("quick brown fox" not in d.page_content for d, _ in res2)


def test_delete(store):
    store.delete(["id1"])
    assert store.count() == 3
    res = store.similarity_search_with_score("pgvector extension", k=4)
    assert all(d.metadata["source"] != "b.txt" for d, _ in res)


def test_enabled_ids_selection(store):
    """3-tier doc-selection analog: restrict search to enabled chunk ids."""
    res = store.similarity_search_with_score(
        "brown fox", k=4, enabled_ids={"id1", "id2"}
    )
    assert {d.metadata["source"] for d, _ in res} == {"b.txt", "c.txt"}


def test_empty_store():
    s = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    assert s.similarity_search_with_score("anything", k=3) == []
    assert s.hybrid_search("anything", k=3) == []
    assert s.count() == 0


def test_save_load_roundtrip(tmp_path, store):
    store.delete(["id2"])  # exercise tombstone-compaction remap
    p = str(tmp_path / "ckpt")
    store.save(p)
    loaded = TpuVectorStore.load(p, FakeEmbeddings())
    assert loaded.count() == store.count()
    for q in ("brown fox", "pgvector extension"):
        a = [(d.metadata["source"], round(s, 3))
             for d, s in store.hybrid_search(q, k=3)]
        b = [(d.metadata["source"], round(s, 3))
             for d, s in loaded.hybrid_search(q, k=3)]
        assert a == b, (q, a, b)
    # loaded store stays writable
    loaded.add_texts(["fresh document about quasars"], [{"source": "new"}])
    res = loaded.similarity_search_with_score("quasars", k=1)
    assert res[0][0].metadata["source"] == "new"


def test_restart_resume_via_bootstrap(tmp_path):
    """Service restart: checkpoint loads and diff-sync is a no-op (no
    re-embedding)."""
    from archi_tpu.bin.bootstrap import build_context

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.md").write_text("alpha content " * 30)
    overrides = {
        "data_manager": {
            "embedding_name": "hash",
            "data_path": str(tmp_path / "data"),
            "db_path": str(tmp_path / "cat.db"),
            "sources": {"local_files": {"paths": [str(corpus)]}},
        },
    }
    ctx1 = build_context(overrides=overrides)
    ctx1.data_manager.run_ingestion()
    n = ctx1.vectorstore.count()
    assert n > 0
    ctx1.vectorstore.save(str(tmp_path / "data" / "engine_checkpoint"))

    calls = {"n": 0}
    ctx2 = build_context(overrides=overrides)
    real = ctx2.vectorstore._embedding_function.embed_documents

    def counting(texts):
        calls["n"] += 1
        return real(texts)

    ctx2.vectorstore._embedding_function.embed_documents = counting
    assert ctx2.vectorstore.count() == n  # checkpoint loaded
    r = ctx2.data_manager.run_ingestion()
    assert r["added"] == 0 and calls["n"] == 0  # nothing re-embedded
