"""ShardedIVFPQIndex on the 8-device CPU mesh: shard-seam correctness,
global bias slicing, merge parity with a single-device build."""

import jax
import numpy as np

from archi_tpu.engine.ivfpq_index import IVFPQIndex
from archi_tpu.engine.sharded_ivfpq import ShardedIVFPQIndex
from archi_tpu.ops.pallas_topk import NEG_INF
from tests.unit.test_ivf import _clustered_data, _norm
import pytest

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


def _recall(rows, exact):
    return sum(len(set(int(r) for r in rows[b]) & set(exact[b]))
               for b in range(exact.shape[0])) / exact.size


def test_sharded_ivfpq_self_recall(rng):
    x = _clustered_data(rng, n_clusters=16, per=100, d=32)
    ids = [f"c{i}" for i in range(len(x))]
    idx = ShardedIVFPQIndex.build(
        x, ids, devices=jax.devices(), nlist=8, block=64, m=8, refine_m=8)
    assert len(idx.shards) == 8 and len(idx) == 1600
    q = x[123] + 0.01 * rng.standard_normal(32).astype(np.float32)
    got, vals, rows = idx.search(q, k=5, nprobe=8)
    assert int(rows[0][0]) == 123 and got[0][0] == "c123"


def test_sharded_matches_single_device_quality(rng):
    """Sharding must not cost recall (same corpus, same total probes)."""
    x = _clustered_data(rng, n_clusters=32, per=64, d=32)
    xn = _norm(x)
    queries = _norm(x[rng.choice(len(x), 16)] +
                    0.05 * rng.standard_normal((16, 32)).astype(np.float32))
    exact = np.argsort(-(queries @ xn.T), axis=1)[:, :10]
    sharded = ShardedIVFPQIndex.build(
        x, None, devices=jax.devices()[:4], nlist=8, block=64, m=8,
        refine_m=8)
    single = IVFPQIndex.build(x, None, nlist=32, block=64, m=8, refine_m=8)
    rs = _recall(sharded.search(queries, k=10, nprobe=8)[2], exact)
    r1 = _recall(single.search(queries, k=10, nprobe=32)[2], exact)
    assert rs >= r1 - 0.1
    assert rs >= 0.6


def test_shard_seam_rows_resolve_globally(rng):
    """Rows near shard boundaries keep correct global ids."""
    x = _clustered_data(rng, n_clusters=16, per=100, d=32)
    idx = ShardedIVFPQIndex.build(
        x, None, devices=jax.devices()[:4], nlist=8, block=64, m=8,
        refine_m=8)
    shard_size = int(np.ceil(len(x) / 4))
    for probe_row in (shard_size - 1, shard_size, 2 * shard_size + 1):
        q = x[probe_row] + 0.005 * rng.standard_normal(32).astype(np.float32)
        _, _, rows = idx.search(q, k=3, nprobe=8)
        assert int(rows[0][0]) == probe_row


def test_global_bias_sliced_per_shard(rng):
    x = _clustered_data(rng, n_clusters=16, per=100, d=32)
    idx = ShardedIVFPQIndex.build(
        x, None, devices=jax.devices()[:4], nlist=8, block=64, m=8,
        refine_m=8)
    q = x[700]  # owned by shard 1 (shard_size=400)
    _, _, base = idx.search(q, k=5, nprobe=8)
    kill = {int(r) for r in base[0]}
    bias = np.zeros(len(x), np.float32)
    for r in kill:
        bias[r] = NEG_INF
    _, vals, rows = idx.search(q, k=5, nprobe=8, bias=bias)
    assert not {int(r) for r in rows[0]} & kill
    assert (vals > NEG_INF / 2).all()
    # finite boost on a row in ANOTHER shard must surface it
    bias2 = np.zeros(len(x), np.float32)
    bias2[1500] = 10.0   # shard 3
    _, _, rows2 = idx.search(q, k=3, nprobe=8, bias=bias2)
    assert int(rows2[0][0]) == 1500
