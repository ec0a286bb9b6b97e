"""Micro-batching serving path: [B, N] per-query bias in the fused
kernel, hybrid_search_batch parity with sequential calls, MicroBatcher
coalescing/grouping/error fan-out under real threads."""

import threading
import time


def _tie_tolerant_eq(got, want):
    """Batch-shaped and single-shaped matmuls can differ in the last ulp,
    swapping equal-scored docs — compare scores numerically and sources as
    rank-order-insensitive where scores tie."""
    gs = [round(s, 4) for _, s in got]
    ws = [round(s, 4) for _, s in want]
    if gs != ws:
        return False
    gsrc = [d.metadata["source"] for d, _ in got]
    wsrc = [d.metadata["source"] for d, _ in want]
    for i, (g, w) in enumerate(zip(gsrc, wsrc)):
        if g != w:
            # allowed only if this rank's score ties with a neighbor rank
            peers = {wsrc[j] for j in range(len(ws)) if ws[j] == ws[i]}
            if g not in peers:
                return False
    return True

import jax.numpy as jnp
import numpy as np
import pytest

from archi_tpu.engine.batcher import (MicroBatcher, hybrid_batcher,
                                      hybrid_signature)
from archi_tpu.engine.bm25 import analyze
from archi_tpu.engine.topk import topk_scores, xla_topk
from archi_tpu.engine.vectorstore import TpuVectorStore
from tests.unit.test_vectorstore import FakeEmbeddings


# -------------------------------------------------------- per-query bias
def test_topk_2d_bias_matches_per_query_calls(rng):
    corpus = rng.standard_normal((512, 32)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    bias = rng.uniform(0, 0.3, (4, 512)).astype(np.float32)
    v2, i2 = topk_scores(jnp.asarray(q), jnp.asarray(corpus),
                         jnp.asarray(bias), 512, k=5, impl="xla")
    for b in range(4):
        v1, i1 = topk_scores(jnp.asarray(q[b:b + 1]), jnp.asarray(corpus),
                             jnp.asarray(bias[b]), 512, k=5, impl="xla")
        np.testing.assert_allclose(np.asarray(v2)[b], np.asarray(v1)[0],
                                   rtol=1e-5)
        assert (np.asarray(i2)[b] == np.asarray(i1)[0]).all()


def test_fused_kernel_2d_bias_interpret(rng):
    """The Pallas kernel accepts per-query bias (interpret mode on CPU)."""
    from archi_tpu.ops.pallas_topk import fused_topk

    corpus = rng.standard_normal((256, 32)).astype(np.float32)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    bias = rng.uniform(0, 0.5, (3, 256)).astype(np.float32)
    vf, idf = fused_topk(jnp.asarray(q), jnp.asarray(corpus),
                         jnp.asarray(bias), 256, k=4, tile_n=64,
                         interpret=True)
    vx, idx = xla_topk(jnp.asarray(q), jnp.asarray(corpus),
                       jnp.asarray(bias), 256, k=4)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-4,
                               atol=1e-5)
    assert (np.asarray(idf) == np.asarray(idx)).all()


# ------------------------------------------------------ batched hybrid
@pytest.fixture
def store():
    s = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    texts = [f"document {i} about {'quantum chips' if i % 3 == 0 else 'web crawling spiders'} "
             f"topic{i % 7}" for i in range(60)]
    s.add_texts(texts, [{"source": f"d{i}.txt", "parity": str(i % 2)}
                        for i in range(60)])
    return s


def test_hybrid_batch_matches_sequential(store):
    queries = ["quantum chips", "web crawling", "topic3 document",
               "nonexistent zebra watermelon"]
    batched = store.hybrid_search_batch(queries, k=4)
    for q, got in zip(queries, batched):
        want = store.hybrid_search(q, k=4)
        assert _tie_tolerant_eq(got, want), q


def test_hybrid_batch_respects_filters(store):
    out = store.hybrid_search_batch(["quantum chips"] * 2, k=4,
                                    filter={"parity": "0"})
    for res in out:
        assert res and all(d.metadata["parity"] == "0" for d, _ in res)


# ---------------------------------------------------------- MicroBatcher
def test_batcher_coalesces_concurrent_requests():
    batch_sizes = []

    def run(sig, payloads):
        batch_sizes.append(len(payloads))
        time.sleep(0.01)
        return [p * 2 for p in payloads]

    mb = MicroBatcher(run, max_batch=16, max_wait_s=0.05)
    results = {}

    def client(i):
        results[i] = mb.submit(i)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert results == {i: i * 2 for i in range(12)}
    assert max(batch_sizes) > 1          # actually coalesced
    assert sum(batch_sizes) == 12


def test_batcher_groups_by_signature():
    seen = []

    def run(sig, payloads):
        seen.append((sig, sorted(payloads)))
        return list(payloads)

    mb = MicroBatcher(run, max_batch=8, max_wait_s=0.05)
    out = {}

    def client(i):
        out[i] = mb.submit(i, signature=("k", i % 2))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert out == {i: i for i in range(8)}
    for sig, payloads in seen:
        assert {p % 2 for p in payloads} == {sig[1]}   # never mixed


def test_batcher_error_fans_out_and_survives():
    def run(sig, payloads):
        if sig == "bad":
            raise ValueError("boom")
        return list(payloads)

    mb = MicroBatcher(run, max_batch=4, max_wait_s=0.01)
    with pytest.raises(ValueError):
        mb.submit(1, signature="bad")
    # worker must still serve afterwards
    assert mb.submit(7, signature="good") == 7
    mb.close()


def test_hybrid_batcher_end_to_end(store):
    mb = hybrid_batcher(store, max_wait_s=0.05)
    sig = hybrid_signature(4, 0.7, 0.3, None, None)
    results = {}

    def client(q):
        results[q] = mb.submit(q, signature=sig)

    queries = ["quantum chips", "web crawling", "topic2", "topic5"]
    threads = [threading.Thread(target=client, args=(q,)) for q in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    for q in queries:
        want = store.hybrid_search(q, k=4)
        assert _tie_tolerant_eq(results[q], want), q


def test_store_level_micro_batching_transparent(store):
    """enable_micro_batching routes hybrid_search through the scheduler
    with identical results, including concurrent callers."""
    want = {q: store.hybrid_search(q, k=3)
            for q in ("quantum chips", "web crawling")}
    store.enable_micro_batching(max_wait_ms=30)
    got = {}

    def client(q):
        got[q] = store.hybrid_search(q, k=3)

    threads = [threading.Thread(target=client, args=(q,)) for q in want]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    store._batcher.close()
    for q in want:
        assert _tie_tolerant_eq(got[q], want[q]), q


def test_bootstrap_micro_batch_config(tmp_path):
    import os
    import jax
    jax.config.update("jax_platforms", "cpu")
    from archi_tpu.bin.bootstrap import build_context
    ctx = build_context(overrides={
        "data_manager": {
            "embedding_name": "hash",
            "data_path": str(tmp_path / "data"),
            "db_path": str(tmp_path / "cat.db"),
            "serving": {"micro_batch": {"enabled": True, "max_wait_ms": 1}},
        },
    })
    assert getattr(ctx.vectorstore, "_batcher", None) is not None
    ctx.vectorstore._batcher.close()


class PrefixEmbeddings(FakeEmbeddings):
    """e5/bge-style: queries get an instruction prefix, documents don't."""
    instruction_prefix = "query: "

    def embed_query(self, text):
        return self._vec(self.instruction_prefix + text).tolist()


def test_hybrid_batch_applies_query_instruction_prefix():
    s = TpuVectorStore(PrefixEmbeddings(), dtype=np.float32)
    s.add_texts([f"text number {i} about subject{i % 5}" for i in range(30)],
                [{"source": f"s{i}"} for i in range(30)])
    for q in ("subject2", "text number 7"):
        got = s.hybrid_search_batch([q], k=3)[0]
        want = s.hybrid_search(q, k=3)
        assert [(d.metadata["source"], round(v, 4)) for d, v in got] == \
               [(d.metadata["source"], round(v, 4)) for d, v in want], q


def test_batch_falls_back_on_non_batched_bias_index():
    """ANN/sharded/segmented indexes are per-row-bias only: the batched
    path must run sequentially instead of crashing on a [B, N] bias."""
    from archi_tpu.engine.ann_index import AnnFlatIndex

    idx = AnnFlatIndex(64, dtype=np.float32, tile_n=256, nlist=4,
                       min_snapshot_rows=16)
    s = TpuVectorStore(FakeEmbeddings(), index=idx)
    s.add_texts([f"doc {i} about area{i % 4}" for i in range(64)],
                [{"source": f"a{i}"} for i in range(64)])
    idx.refresh_ann()
    assert idx._ivf is not None           # the snapshot path IS active
    out = s.hybrid_search_batch(["area2 doc", "area1"], k=3)
    for q, got in zip(("area2 doc", "area1"), out):
        want = s.hybrid_search(q, k=3)
        assert [(d.metadata["source"], round(v, 4)) for d, v in got] == \
               [(d.metadata["source"], round(v, 4)) for d, v in want]


def test_enable_micro_batching_twice_closes_old_batcher(store):
    store.enable_micro_batching(max_wait_ms=1)
    first = store._batcher
    store.enable_micro_batching(max_wait_ms=1)
    assert store._batcher is not first
    assert all(not w.is_alive() for w in first._workers)
    store._batcher.close()


def test_semantic_batch_matches_sequential(store):
    queries = ["quantum chips", "web crawling", "topic4"]
    batched = store.similarity_search_batch(queries, k=4)
    for q, got in zip(queries, batched):
        want = store.similarity_search_with_score(q, k=4)
        assert _tie_tolerant_eq(got, want), q


def test_semantic_batch_on_ann_index():
    """Semantic batching keeps a SHARED bias, so it runs fused even on
    indexes that reject the hybrid path's per-query bias."""
    from archi_tpu.engine.ann_index import AnnFlatIndex

    idx = AnnFlatIndex(64, dtype=np.float32, tile_n=256, nlist=4,
                       min_snapshot_rows=16)
    s = TpuVectorStore(FakeEmbeddings(), index=idx)
    s.add_texts([f"doc {i} about area{i % 4}" for i in range(64)],
                [{"source": f"a{i}"} for i in range(64)])
    idx.refresh_ann()
    out = s.similarity_search_batch(["area2 doc", "area1"], k=3)
    for q, got in zip(("area2 doc", "area1"), out):
        want = s.similarity_search_with_score(q, k=3)
        assert _tie_tolerant_eq(got, want), q


def test_semantic_routes_through_batcher(store):
    """Concurrent semantic calls coalesce (and hybrid + semantic requests
    never mix in one group: different signature kinds)."""
    from archi_tpu.utils.metrics import METRICS

    want_s = store.similarity_search_with_score("quantum chips", k=3)
    want_h = store.hybrid_search("web crawling", k=3)
    store.enable_micro_batching(max_wait_ms=30)
    before = METRICS.counter_value("archi_micro_batches_total")
    got = {}

    def sem():
        got["s"] = store.similarity_search_with_score("quantum chips", k=3)

    def hyb():
        got["h"] = store.hybrid_search("web crawling", k=3)

    threads = [threading.Thread(target=f) for f in (sem, sem, hyb, hyb)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    store._batcher.close()
    assert _tie_tolerant_eq(got["s"], want_s)
    assert _tie_tolerant_eq(got["h"], want_h)
    ran = METRICS.counter_value("archi_micro_batches_total") - before
    assert 2 <= ran <= 4   # at least one group per kind, never mixed


def test_hybrid_sequential_fallback_inside_worker_no_deadlock():
    """workers=1 + an index without batched-bias support + a BM25-miss
    query: the fallback path must not re-enter the batcher (deadlock)."""
    from archi_tpu.engine.ann_index import AnnFlatIndex

    idx = AnnFlatIndex(64, dtype=np.float32, tile_n=256, nlist=4,
                       min_snapshot_rows=16)
    s = TpuVectorStore(FakeEmbeddings(), index=idx)
    s.add_texts([f"doc {i} about area{i % 4}" for i in range(64)])
    idx.refresh_ann()
    s.enable_micro_batching(max_wait_ms=1, workers=1)
    done = {}

    def client():
        # a query no BM25 term matches → semantic fallback inside the
        # hybrid impl, running on the single batcher worker
        done["r"] = s.hybrid_search("zzzqqq nonexistent", k=2)

    t = threading.Thread(target=client)
    t.start()
    t.join(timeout=20)
    assert not t.is_alive(), "deadlocked in batcher re-entry"
    assert "r" in done
    s._batcher.close()


def test_hybrid_batch_on_sharded_mesh():
    """Per-query bias shards over the mesh row axis: batched hybrid is one
    fused shard_map pass on the 8-device CPU mesh."""
    from archi_tpu.engine.sharded_index import ShardedFlatIndex

    idx = ShardedFlatIndex(64, dtype=np.float32, tile_n=256)
    s = TpuVectorStore(FakeEmbeddings(), index=idx)
    s.add_texts([f"shard doc {i} about region{i % 5}" for i in range(96)],
                [{"source": f"r{i}"} for i in range(96)])
    assert idx.supports_batched_bias
    queries = ["region3 doc", "shard doc 7", "region1"]
    batched = s.hybrid_search_batch(queries, k=4)
    for q, got in zip(queries, batched):
        want = s._hybrid_search_impl(q, k=4)
        assert _tie_tolerant_eq(got, want), q


def test_batched_queries_under_concurrent_ingest():
    """Micro-batched searches racing a live ingest stream must never
    crash or return rows the metadata plane doesn't know (snapshot
    isolation holds through the batch path)."""
    s = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    s.add_texts([f"seed doc {i} about theme{i % 4}" for i in range(64)],
                [{"source": f"seed{i}"} for i in range(64)])
    s.enable_micro_batching(max_wait_ms=5, workers=2)
    stop = threading.Event()
    errors = []

    def ingester():
        i = 0
        while not stop.is_set():
            s.add_texts([f"live doc {i} about theme{i % 4} extra words"],
                        [{"source": f"live{i}"}])
            i += 1

    def querier(qid):
        try:
            for j in range(15):
                res = s.hybrid_search(f"theme{j % 4} doc", k=3)
                for d, v in res:
                    assert d.metadata["source"], "empty metadata"
                    assert v > -1e29
        except Exception as e:   # noqa: BLE001
            errors.append(e)

    ing = threading.Thread(target=ingester)
    qs = [threading.Thread(target=querier, args=(i,)) for i in range(4)]
    ing.start()
    for t in qs:
        t.start()
    for t in qs:
        t.join()
    stop.set()
    ing.join()
    s._batcher.close()
    assert not errors, errors


def test_hybrid_batch_on_hot_tail_index():
    """Per-query bias slices per segment: batched hybrid is fused on the
    streaming hot-tail configuration too."""
    from archi_tpu.engine.segmented_index import SegmentedFlatIndex

    idx = SegmentedFlatIndex(64, dtype=np.float32, tile_n=256,
                             merge_rows=64)
    s = TpuVectorStore(FakeEmbeddings(), index=idx)
    s.add_texts([f"cold doc {i} about zone{i % 5}" for i in range(96)],
                [{"source": f"c{i}"} for i in range(96)])
    idx.merge()
    s.add_texts([f"hot doc {i} about zone{i % 5}" for i in range(24)],
                [{"source": f"h{i}"} for i in range(24)])
    assert idx.supports_batched_bias
    assert len(idx.tail) > 0            # hot tail actually populated
    queries = ["zone3 doc", "hot doc 5", "cold doc 11"]
    batched = s.hybrid_search_batch(queries, k=4)
    for q, got in zip(queries, batched):
        want = s._hybrid_search_impl(q, k=4)
        assert _tie_tolerant_eq(got, want), q


def test_hybrid_batch_fused_on_ann_index():
    """Per-query bias rides the block-layout permute: batched hybrid is
    now FUSED on the ANN snapshot path too (ivf and ivfpq)."""
    from archi_tpu.engine.ann_index import AnnFlatIndex

    for kind in ("ivf", "ivfpq"):
        kw = {} if kind == "ivf" else {"pq_m": 8, "pq_refine_m": 8}
        idx = AnnFlatIndex(64, dtype=np.float32, tile_n=256, nlist=4,
                           min_snapshot_rows=16, snapshot_kind=kind,
                           async_refresh=False, **kw)
        assert idx.supports_batched_bias
        s = TpuVectorStore(FakeEmbeddings(), index=idx)
        s.add_texts([f"doc {i} about field{i % 4}" for i in range(64)],
                    [{"source": f"a{i}"} for i in range(64)])
        idx.refresh_ann()
        assert idx._ivf is not None
        queries = ["field2 doc", "field1", "doc 17"]
        batched = s.hybrid_search_batch(queries, k=3)
        for q, got in zip(queries, batched):
            want = s._hybrid_search_impl(q, k=3)
            assert _tie_tolerant_eq(got, want), (kind, q)


def test_hybrid_batch_nondivisible_group_on_ann():
    """Review r2-cont finding 1 (repro'd crash): when queries pad to a
    group multiple, the per-query bias must pad with them — an odd batch
    size through the IVF/IVFPQ grouped search must not reshape-crash."""
    from archi_tpu.engine.ann_index import AnnFlatIndex

    idx = AnnFlatIndex(64, dtype=np.float32, tile_n=256, nlist=4,
                       min_snapshot_rows=16, async_refresh=False)
    s = TpuVectorStore(FakeEmbeddings(), index=idx)
    s.add_texts([f"doc {i} about part{i % 4}" for i in range(64)],
                [{"source": f"a{i}"} for i in range(64)])
    idx.refresh_ann()
    for nb in (1, 3, 5, 7):   # odd sizes exercise the query pad path
        out = s.hybrid_search_batch([f"part{j % 4} doc" for j in range(nb)],
                                    k=3)
        assert len(out) == nb and all(out)


def test_mixed_type_enabled_ids_through_batcher(store):
    """int + str enabled_ids must not break signature construction."""
    store.enable_micro_batching(max_wait_ms=1)
    try:
        res = store.hybrid_search("quantum chips", k=3,
                                  enabled_ids={"d3.txt", 42})
        assert isinstance(res, list)
    finally:
        store._batcher.close()


def test_hybrid_batch_splits_oversized_bias(store, monkeypatch):
    """The [B, capacity] bias is budget-bounded: oversized batches split
    into sub-batches with unchanged results."""
    import archi_tpu.engine.vectorstore as vs_mod

    queries = ["quantum chips", "web crawling", "topic1", "topic5"]
    want = store.hybrid_search_batch(queries, k=3)
    # budget of 2 bias rows → the 4-query batch must split (and recurse)
    monkeypatch.setattr(vs_mod, "BIAS_BUDGET_BYTES",
                        2 * store.index.capacity * 4)
    got = store.hybrid_search_batch(queries, k=3)
    for g, w in zip(got, want):
        assert _tie_tolerant_eq(g, w)


def test_warmup_covers_all_buckets(store, monkeypatch):
    """warmup() with micro-batching enabled must exercise every
    power-of-two bucket at the configured k (each is a jit shape)."""
    seen = []
    orig = store.hybrid_search_batch

    def spy(queries, k=4, **kw):
        seen.append((len(queries), k))
        return orig(queries, k, **kw)

    monkeypatch.setattr(store, "hybrid_search_batch", spy)
    store.enable_micro_batching(max_batch=8, max_wait_ms=1)
    try:
        store.warmup(k=3)
    finally:
        store._batcher.close()
    assert {(1, 3), (2, 3), (4, 3), (8, 3)} <= set(seen), seen
