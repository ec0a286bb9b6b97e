"""HostVectorStore + exact rerank tier: strict PQ recall becomes
exact-bound when full vectors live host-side (docs/pq_scale.md)."""

import numpy as np
import pytest

import jax

from archi_tpu.engine.host_store import HostVectorStore, exact_rerank
from archi_tpu.engine.ivfpq_index import IVFPQIndex
from archi_tpu.engine.sharded_ivfpq import ShardedIVFPQIndex
from archi_tpu.ops.pallas_topk import NEG_INF

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


def _corpus(rng, n=4096, d=64, clusters=32):
    centers = rng.standard_normal((clusters, d)).astype(np.float32)
    x = centers[rng.integers(0, clusters, n)] + \
        0.15 * rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    x = _corpus(rng, n=4096, d=64)
    q = _corpus(rng, n=16, d=64)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    return rng, x, q, exact


def _recall(rows, exact):
    return sum(len(set(int(r) for r in rows[b]) & set(exact[b]))
               for b in range(exact.shape[0])) / exact.size


def test_store_append_gather_grow(tmp_path):
    store = HostVectorStore(8, capacity=16)
    a = np.arange(80, dtype=np.float32).reshape(10, 8) / 100
    rows = store.add(a)
    assert list(rows) == list(range(10))
    store.add(np.ones((2000, 8), np.float32))   # forces growth
    assert len(store) == 2010
    got = store.get([3, -1, 2005])
    np.testing.assert_allclose(got[0], a[3], atol=1e-3)
    assert (got[1] == 0).all()
    np.testing.assert_allclose(got[2], 1.0, atol=1e-3)


def test_store_memmap_reopen(tmp_path):
    p = str(tmp_path / "vecs.f16")
    store = HostVectorStore(8, path=p, capacity=1024)
    x = np.random.default_rng(0).standard_normal((100, 8)).astype(np.float32)
    store.add(x)
    store.flush()
    re = HostVectorStore(8, path=p)
    assert len(re) == 100
    np.testing.assert_allclose(re.get([7]), x[7:8], atol=2e-3)


def test_rerank_makes_strict_recall_exact(data):
    """With a host tier and enough over-fetch, strict@10 ~ the ANN's
    in-C recall — quantization noise no longer reorders the final k."""
    _, x, q, exact = data
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, refine_m=8, seed=0)
    store = HostVectorStore(64, capacity=4096)
    store.add(x)
    _, _, base = idx.search(q, k=10, nprobe=32)
    _, _, rr = idx.search(q, k=10, nprobe=32, rerank_store=store,
                          rerank_overfetch=10)
    assert _recall(rr, exact) > _recall(base, exact)
    assert _recall(rr, exact) >= 0.9


def test_rerank_scores_are_exact_ip(data):
    _, x, q, _ = data
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    store = HostVectorStore(64, capacity=4096)
    store.add(x)
    ids, vals, rows = idx.search(q[:4], k=5, nprobe=32, rerank_store=store)
    true_ip = np.stack([x[rows[b].astype(int)] @ q[b] for b in range(4)])
    np.testing.assert_allclose(vals, true_ip, atol=3e-3)  # f16 storage


def test_rerank_keeps_tombstones_dead(data):
    _, x, q, _ = data
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    store = HostVectorStore(64, capacity=4096)
    store.add(x)
    _, _, base = idx.search(q[:1], k=5, nprobe=32, rerank_store=store)
    bias = np.zeros(len(x), np.float32)
    for r in base[0]:
        bias[int(r)] = NEG_INF
    _, vals, rows = idx.search(q[:1], k=5, nprobe=32, bias=bias,
                               rerank_store=store)
    assert not {int(r) for r in rows[0]} & {int(r) for r in base[0]}
    assert (vals > NEG_INF / 2).all()


def test_rerank_carries_hybrid_bias(data):
    _, x, q, _ = data
    idx = IVFPQIndex.build(x, nlist=32, block=256, m=16, seed=0)
    store = HostVectorStore(64, capacity=4096)
    store.add(x)
    _, _, wide = idx.search(q[:1], k=50, nprobe=32)
    target = int(wide[0][-1])
    bias = np.zeros(len(x), np.float32)
    bias[target] = 5.0
    _, vals, rows = idx.search(q[:1], k=3, nprobe=32, bias=bias,
                               rerank_store=store, rerank_overfetch=20)
    assert int(rows[0][0]) == target
    assert vals[0][0] > 4.0   # exact ip + bias


def test_sharded_rerank_global_rows(data):
    _, x, q, exact = data
    idx = ShardedIVFPQIndex.build(
        x, None, devices=jax.devices()[:4], nlist=8, block=128, m=16,
        refine_m=8)
    store = HostVectorStore(64, capacity=4096)
    store.add(x)
    _, _, base = idx.search(q, k=10, nprobe=8)
    _, _, rr = idx.search(q, k=10, nprobe=8, rerank_store=store,
                          rerank_overfetch=10)
    assert _recall(rr, exact) >= _recall(base, exact)
    assert _recall(rr, exact) >= 0.85


def test_store_memmap_growth_preserves_rows(tmp_path):
    """Disk-backed growth extends the file in place — no data loss, no
    full-store RAM copy."""
    p = str(tmp_path / "grow.f16")
    store = HostVectorStore(8, path=p, capacity=1024)
    x = np.random.default_rng(1).standard_normal((100, 8)).astype(np.float32)
    store.add(x)
    store.add(np.ones((3000, 8), np.float32))    # forces growth past 1024
    assert len(store) == 3100
    np.testing.assert_allclose(store.get([42]), x[42:43], atol=2e-3)
    np.testing.assert_allclose(store.get([3050]), 1.0, atol=1e-3)
    store.flush()
    re = HostVectorStore(8, path=p)
    assert len(re) == 3100
    np.testing.assert_allclose(re.get([42]), x[42:43], atol=2e-3)
