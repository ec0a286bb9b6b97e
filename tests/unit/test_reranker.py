"""MaxSim reranker vs a NumPy reference + retriever integration."""

import numpy as np
import pytest

from archi_tpu.engine.reranker import (
    MaxSimReranker, RerankingRetriever, maxsim_scores,
)
from archi_tpu.models.bert import BertConfig
from archi_tpu.models.embedder import JaxEmbedder
from archi_tpu.models.tokenizer import WordPieceTokenizer
from archi_tpu.utils.documents import Document


def _ref_maxsim(q, qm, d, dm):
    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    q, d = norm(q), norm(d)
    out = []
    for c in range(d.shape[0]):
        total = 0.0
        for i in range(q.shape[0]):
            if qm[i] < 0.5:
                continue
            sims = [q[i] @ d[c, j] for j in range(d.shape[1]) if dm[c, j] > 0.5]
            total += max(sims) if sims else 0.0
        out.append(total / max(qm.sum(), 1.0))
    return np.array(out)


def test_maxsim_matches_reference(rng):
    sq, sd, h, c = 5, 9, 16, 3
    q = rng.standard_normal((sq, h)).astype(np.float32)
    qm = np.array([1, 1, 1, 0, 0], np.float32)
    d = rng.standard_normal((c, sd, h)).astype(np.float32)
    dm = np.ones((c, sd), np.float32)
    dm[1, 5:] = 0
    got = np.asarray(maxsim_scores(q, qm, d, dm))
    np.testing.assert_allclose(got, _ref_maxsim(q, qm, d, dm),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture
def embedder():
    cfg = BertConfig(vocab_size=512, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64,
                     max_position_embeddings=128)
    tok = WordPieceTokenizer.build_vocab(
        ["the quick brown fox batch scheduler storage quota gpu queue " * 2])
    return JaxEmbedder(config=cfg, tokenizer=tok, compute_dtype=np.float32)


def test_rerank_promotes_exact_token_overlap(embedder, monkeypatch):
    """With one-hot token embeddings MaxSim is exact lexical overlap, so the
    ordering is deterministic."""
    import jax.numpy as jnp
    import numpy as np

    rr = MaxSimReranker(embedder)
    vocab = {}

    def onehot_embed(texts, max_len):
        dim = 64
        toks = [t.split()[: max_len] for t in texts]
        ids = np.zeros((len(texts), max_len, dim), np.float32)
        mask = np.zeros((len(texts), max_len), np.float32)
        for r, ts in enumerate(toks):
            for j, t in enumerate(ts):
                vid = vocab.setdefault(t, len(vocab) % dim)
                ids[r, j, vid] = 1.0
                mask[r, j] = 1.0
        return jnp.asarray(ids), jnp.asarray(mask)

    monkeypatch.setattr(rr, "_token_embed", onehot_embed)
    docs = [
        (Document("storage quota information here"), 0.9),
        (Document("the quick brown fox"), 0.8),
        (Document("batch scheduler queue details"), 0.7),
    ]
    out = rr.rerank("quick brown fox", docs)
    assert out[0][0].page_content == "the quick brown fox"
    assert out[0][1] == pytest.approx(1.0)  # all 3 query tokens matched
    assert len(out) == 3


def test_rerank_runs_through_real_encoder(embedder):
    docs = [(Document("some content words"), 0.5),
            (Document("other body text"), 0.4)]
    out = MaxSimReranker(embedder).rerank("content words", docs)
    assert len(out) == 2 and all(isinstance(s, float) for _d, s in out)


def test_reranking_retriever(embedder):
    class FakeBase:
        def invoke(self, q):
            return [(Document(f"doc {i} filler"), 1.0 - i / 10)
                    for i in range(8)]

    rr = RerankingRetriever(FakeBase(), MaxSimReranker(embedder), k=3)
    out = rr.invoke("filler doc")
    assert len(out) == 3
    assert rr.invoke("") is not None  # empty query doesn't crash


def test_rerank_empty(embedder):
    assert MaxSimReranker(embedder).rerank("q", []) == []


def test_rerank_config_wires_reranking_retriever():
    """data_manager.retrievers.hybrid_retriever.rerank.enabled builds a
    RerankingRetriever over an over-fetching hybrid base."""
    import jax.numpy as jnp

    from archi_tpu.engine.reranker import RerankingRetriever
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from archi_tpu.models.bert import BertConfig
    from archi_tpu.models.embedder import JaxEmbedder
    from archi_tpu.orchestrator.archi import Archi

    cfg = BertConfig(vocab_size=512, hidden_size=32, num_layers=1,
                     num_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    embedder = JaxEmbedder(config=cfg, compute_dtype=jnp.float32,
                           max_length=32, attention_impl="xla")
    store = TpuVectorStore(embedder, dtype=jnp.float32)
    store.add_texts(["fox jumps high", "dog sleeps", "fox runs fast"])
    archi = Archi("QAPipeline", config={
        "data_manager": {"retrievers": {"hybrid_retriever": {
            "num_documents_to_retrieve": 2,
            "rerank": {"enabled": True, "overfetch": 3},
        }}},
    }, vectorstore=store)
    out = archi.invoke(history=[("User", "fox")])
    pipe = archi.pipeline
    assert isinstance(pipe.retriever, RerankingRetriever)
    assert pipe.retriever.k == 2
    assert pipe.retriever.base.k == 3
    assert len(out.source_documents) <= 2


def test_rerank_config_skipped_for_remote_store():
    """Remote vectorstores (no local encoder) keep the plain retriever."""
    from archi_tpu.engine.remote_vectorstore import RemoteVectorStore
    from archi_tpu.pipelines.qa import QAPipeline

    pipe = QAPipeline({
        "data_manager": {"retrievers": {"hybrid_retriever": {
            "rerank": {"enabled": True},
        }}},
    })
    pipe.update_retriever(RemoteVectorStore("http://127.0.0.1:1"))
    from archi_tpu.engine.reranker import RerankingRetriever

    assert not isinstance(pipe.retriever, RerankingRetriever)
