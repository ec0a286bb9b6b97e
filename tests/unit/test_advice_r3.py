"""Regression tests for the round-3 advisor findings (ADVICE.md r2):

- PQFlatIndex / IVFPQIndex save must preserve id types (stringified int ids
  broke id-based lookup/delete after reload — the exact bug FlatIndex.save
  already guards against)
- the batched query-embed path must not silently diverge from embed_query
  for embedders with a richer embed_query (no instruction_prefix contract)
- MicroBatcher.submit must support a timeout so a wedged run_batch can't
  strand serving threads forever
"""

import threading
import time

import numpy as np
import pytest

from archi_tpu.engine.batcher import MicroBatcher
from archi_tpu.engine.ivfpq_index import IVFPQIndex
from archi_tpu.engine.pq import PQCodec, PQFlatIndex
from archi_tpu.engine.vectorstore import TpuVectorStore


def _corpus(rng, n=512, d=32):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_pqflat_save_preserves_int_ids(rng, tmp_path):
    x = _corpus(rng)
    ids = list(range(100, 100 + x.shape[0]))
    idx = PQFlatIndex.build(x, ids, m=8, ksub=16, iters=2)
    path = str(tmp_path / "pq.npz")
    idx.save(path)
    loaded = PQFlatIndex.load(path)
    assert loaded._ids == ids
    assert all(isinstance(i, int) for i in loaded._ids)


def test_ivfpq_save_preserves_int_ids(rng, tmp_path):
    x = _corpus(rng)
    ids = list(range(x.shape[0]))
    idx = IVFPQIndex.build_device(x, ids, nlist=8, m=8, ksub=16,
                                  coarse_iters=2, pq_iters=2)
    path = str(tmp_path / "ivfpq.npz")
    idx.save(path)
    loaded = IVFPQIndex.load(path)
    assert loaded._ids == ids
    assert all(isinstance(i, int) for i in loaded._ids)


class RichQueryEmbedder:
    """embed_query is NOT prefix + embed_documents (e.g. an API flag or a
    pooling-mode switch) and the class declares no instruction_prefix —
    the store must fall back to per-query embed_query when batching."""

    dim = 16

    def _vec(self, text, query):
        rs = np.random.RandomState(len(text) + (1000 if query else 0))
        v = rs.standard_normal(self.dim).astype(np.float32)
        return (v / np.linalg.norm(v)).tolist()

    def embed_documents(self, texts):
        return [self._vec(t, query=False) for t in texts]

    def embed_query(self, text):
        return self._vec(text, query=True)


def test_batched_embed_falls_back_to_embed_query():
    store = TpuVectorStore(RichQueryEmbedder())
    store.add_texts([f"document number {i} about topic {i % 5}"
                     for i in range(40)])
    queries = ["topic 3", "document number 7", "something else"]
    batched = store.similarity_search_batch(queries, k=4)
    for q, got in zip(queries, batched):
        want = store.similarity_search_with_score(q, k=4)
        assert [d.metadata.get("chunk_id") for d, _ in got] == \
               [d.metadata.get("chunk_id") for d, _ in want]
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in want], rtol=1e-5)


def test_batched_embed_uses_one_pass_for_contract_embedders():
    """An embedder declaring instruction_prefix gets ONE embed_documents
    call for the whole batch (the fast path must not regress)."""
    calls = {"documents": 0, "query": 0}

    class ContractEmbedder(RichQueryEmbedder):
        instruction_prefix = ""

        def embed_documents(self, texts):
            calls["documents"] += 1
            return [self._vec(t, query=False) for t in texts]

        def embed_query(self, text):
            calls["query"] += 1
            return self._vec(text, query=False)

    store = TpuVectorStore(ContractEmbedder())
    store.add_texts([f"doc {i}" for i in range(20)])
    calls["documents"] = calls["query"] = 0
    store.similarity_search_batch(["a", "b", "c", "d"], k=2)
    assert calls == {"documents": 1, "query": 0}


def test_batcher_submit_timeout():
    release = threading.Event()

    def run_batch(sig, payloads):
        release.wait(10)
        return list(payloads)

    b = MicroBatcher(run_batch, max_batch=4, max_wait_s=0.001, workers=1)
    try:
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            b.submit("x", timeout=0.2)
        assert time.monotonic() - t0 < 5
    finally:
        release.set()
        b.close()


def test_batcher_default_timeout_from_ctor():
    def run_batch(sig, payloads):
        time.sleep(10)
        return list(payloads)

    b = MicroBatcher(run_batch, max_batch=4, max_wait_s=0.001, workers=1,
                     submit_timeout_s=0.2)
    try:
        with pytest.raises(TimeoutError):
            b.submit("x")
    finally:
        b.close()


def test_batcher_timed_out_request_dequeued():
    """A request that times out while still queued must be removed so a
    later worker doesn't waste a device pass on it."""
    gate = threading.Event()
    executed = []

    def run_batch(sig, payloads):
        executed.extend(payloads)
        gate.wait(5)
        return list(payloads)

    b = MicroBatcher(run_batch, max_batch=1, max_wait_s=0.001, workers=1)
    try:
        # occupy the single worker
        t = threading.Thread(target=lambda: b.submit("busy"))
        t.start()
        deadline = time.monotonic() + 2
        while "busy" not in executed and time.monotonic() < deadline:
            time.sleep(0.01)
        with pytest.raises(TimeoutError):
            b.submit("queued", timeout=0.1)
        gate.set()
        t.join(timeout=5)
        time.sleep(0.1)
        assert "queued" not in executed
    finally:
        gate.set()
        b.close()
