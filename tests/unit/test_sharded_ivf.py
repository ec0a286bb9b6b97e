"""ShardedIVFIndex on the 8-device CPU mesh."""

import jax
import numpy as np

from archi_tpu.engine.sharded_ivf import ShardedIVFIndex
from tests.unit.test_ivf import _clustered_data, _norm


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
