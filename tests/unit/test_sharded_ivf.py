"""ShardedIVFIndex on the 8-device CPU mesh."""

import jax
import numpy as np

from archi_tpu.engine.sharded_ivf import ShardedIVFIndex
from tests.unit.test_ivf import _clustered_data, _norm
import pytest

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


def test_sharded_ivf_exact_at_full_probe(rng):
    x = _clustered_data(rng, n_clusters=16, per=100, d=32)
    ids = [f"c{i}" for i in range(len(x))]
    idx = ShardedIVFIndex.build(
        x, ids, devices=jax.devices(), nlist=8, block=64, dtype=np.float32,
    )
    assert len(idx.shards) == 8
    q = x[123] + 0.01 * rng.standard_normal(32).astype(np.float32)
    got, vals, rows = idx.search(q, k=10, nprobe=8)
    ref = _norm(q[None]) @ x.T
    top = np.argsort(-ref[0])[:10]
    assert got[0] == [f"c{i}" for i in top]


def test_sharded_ivf_recall_modest_probe(rng):
    x = _clustered_data(rng, n_clusters=32, per=64, d=32)
    idx = ShardedIVFIndex.build(
        x, list(range(len(x))), devices=jax.devices()[:4], nlist=16,
        block=64, dtype=np.float32,
    )
    queries = _norm(x[rng.choice(len(x), 16)] +
                    0.05 * rng.standard_normal((16, 32))).astype(np.float32)
    ref = queries @ x.T
    ref_top = np.argsort(-ref, axis=1)[:, :10]
    got, vals, rows = idx.search(queries, k=10, nprobe=4)
    recall = np.mean([
        len(set(int(r) for r in rows[b]) & set(ref_top[b])) / 10
        for b in range(16)
    ])
    assert recall >= 0.9, recall


def test_sharded_ivf_uneven_split(rng):
    """Row count not divisible by shard count."""
    x = _clustered_data(rng, n_clusters=4, per=33, d=16)  # 132 rows
    idx = ShardedIVFIndex.build(
        x, list(range(132)), devices=jax.devices()[:5], nlist=4,
        block=32, dtype=np.float32,
    )
    assert len(idx) == 132
    got, _, _ = idx.search(x[131], k=1, nprobe=4)
    assert got[0][0] == 131


def test_sharded_matches_single_device_ivf(rng):
    """Parity: sharded IVF at full probe == single-device IVF at full probe
    == brute force (mirrors test_sharded_index's parity tier)."""
    from archi_tpu.engine.ivf_index import IVFIndex

    x = _clustered_data(rng, n_clusters=16, per=64, d=32)
    ids = list(range(len(x)))
    sharded = ShardedIVFIndex.build(
        x, ids, devices=jax.devices(), nlist=8, block=64, dtype=np.float32)
    single = IVFIndex.build(x, ids, nlist=8, block=64, dtype=np.float32)
    queries = _norm(x[rng.choice(len(x), 8)] +
                    0.02 * rng.standard_normal((8, 32))).astype(np.float32)
    ref = queries @ x.T
    gs, vs, rs = sharded.search(queries, k=10, nprobe=8)
    g1, v1, r1 = single.search(queries, k=10, nprobe=8)
    for b in range(8):
        ref_top = set(np.argsort(-ref[b])[:10].tolist())
        assert set(int(r) for r in rs[b]) == ref_top
        assert set(int(r) for r in r1[b]) == ref_top
        np.testing.assert_allclose(np.sort(vs[b]), np.sort(v1[b]),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_global_ids_at_shard_seams(rng):
    """Rows on either side of every shard boundary must resolve to the
    correct GLOBAL id (SURVEY §7 'cross-shard merge correctness')."""
    n, d = 320, 16
    x = _norm(rng.standard_normal((n, d))).astype(np.float32)
    devices = jax.devices()[:4]
    idx = ShardedIVFIndex.build(x, list(range(n)), devices=devices,
                                nlist=4, block=32, dtype=np.float32)
    shard_size = int(np.ceil(n / len(devices)))
    for s in range(1, len(devices)):
        for row in (s * shard_size - 1, s * shard_size):
            got, vals, rows = idx.search(x[row], k=1, nprobe=4)
            assert int(rows[0][0]) == row, (s, row, rows)


def test_build_device_matches_host_build(rng):
    """IVFIndex.build_device (device gather path) == IVFIndex.build."""
    import jax.numpy as jnp

    from archi_tpu.engine.ivf_index import IVFIndex

    x = _clustered_data(rng, n_clusters=8, per=80, d=32)
    host = IVFIndex.build(x, None, nlist=8, block=64, iters=5, seed=3,
                          dtype=np.float32)
    dev = IVFIndex.build_device(jnp.asarray(x), nlist=8, block=64, iters=5,
                                seed=3, dtype=np.float32)
    assert len(dev) == len(x)
    queries = _norm(x[rng.choice(len(x), 8)] +
                    0.02 * rng.standard_normal((8, 32))).astype(np.float32)
    _g1, v1, r1 = host.search(queries, k=10, nprobe=8)
    _g2, v2, r2 = dev.search(queries, k=10, nprobe=8)
    for b in range(8):
        assert set(int(r) for r in r1[b]) == set(int(r) for r in r2[b])
        np.testing.assert_allclose(np.sort(v1[b]), np.sort(v2[b]),
                                   rtol=1e-4, atol=1e-4)
