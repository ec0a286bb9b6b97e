"""ShardedFlatIndex on the virtual 8-device CPU mesh: parity vs FlatIndex
and vs NumPy brute force (SURVEY.md §7 stage 4)."""

import jax
import numpy as np
import pytest

from archi_tpu.engine.flat_index import FlatIndex
from archi_tpu.engine.sharded_index import ShardedFlatIndex, default_mesh

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return default_mesh()


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def test_sharded_matches_single_device(mesh, rng):
    d = 64
    tile = 256
    sharded = ShardedFlatIndex(d, mesh=mesh, dtype=np.float32, tile_n=tile)
    flat = FlatIndex(d, dtype=np.float32, tile_n=tile)
    emb = rng.standard_normal((5000, d)).astype(np.float32)
    ids = [f"c{i}" for i in range(5000)]
    sharded.add(emb, ids)
    flat.add(emb, ids)
    assert sharded.capacity % (8 * tile) == 0

    q = rng.standard_normal((4, d)).astype(np.float32)
    s_ids, s_vals, _ = sharded.search(q, k=10)
    f_ids, f_vals, _ = flat.search(q, k=10)
    np.testing.assert_allclose(s_vals, f_vals, rtol=1e-4, atol=1e-4)
    assert s_ids == f_ids


def test_sharded_matches_brute_force(mesh, rng):
    d = 32
    idx = ShardedFlatIndex(d, mesh=mesh, dtype=np.float32, tile_n=256)
    emb = rng.standard_normal((3000, d)).astype(np.float32)
    idx.add(emb, list(range(3000)))
    q = rng.standard_normal((2, d)).astype(np.float32)
    got_ids, vals, _ = idx.search(q, k=5)
    ref = _norm(q) @ _norm(emb).T
    top = np.argsort(-ref, axis=1)[:, :5]
    for b in range(2):
        assert got_ids[b] == list(top[b])


def test_sharded_delete_and_grow(mesh, rng):
    d = 16
    idx = ShardedFlatIndex(d, mesh=mesh, dtype=np.float32, tile_n=256)
    emb = rng.standard_normal((1000, d)).astype(np.float32)
    idx.add(emb, [f"a{i}" for i in range(1000)])
    cap0 = idx.capacity
    idx.delete(["a7"])
    got, _, _ = idx.search(emb[7], k=1)
    assert got[0][0] != "a7"
    # grow across the sharded-unit boundary
    emb2 = rng.standard_normal((4000, d)).astype(np.float32)
    idx.add(emb2, [f"b{i}" for i in range(4000)])
    assert idx.capacity >= cap0
    got2, _, _ = idx.search(emb2[1234], k=1)
    assert got2[0][0] == "b1234"


def test_sharded_partial_last_shard(mesh, rng):
    """n_rows smaller than one shard: other shards must contribute only
    NEG_INF and the merge must still be exact."""
    d = 16
    idx = ShardedFlatIndex(d, mesh=mesh, dtype=np.float32, tile_n=256)
    emb = rng.standard_normal((10, d)).astype(np.float32)
    idx.add(emb, list(range(10)))
    got, vals, _ = idx.search(emb[3], k=10)
    assert got[0][0] == 3
    assert all(g is not None for g in got[0])


def test_sharded_filter_mask(mesh, rng):
    d = 16
    idx = ShardedFlatIndex(d, mesh=mesh, dtype=np.float32, tile_n=256)
    emb = rng.standard_normal((100, d)).astype(np.float32)
    idx.add(emb, list(range(100)))
    mask = np.zeros(idx.capacity, np.float32)
    mask[40:60] = 1.0
    _, _, rows = idx.search(emb[5], k=5, filter_mask=mask)
    assert all(40 <= r < 60 for r in rows[0])


def test_growth_is_device_side(monkeypatch, rng):
    """Capacity growth must not round-trip the corpus through the host
    (VERDICT r1 weak #3): jax.device_get is forbidden during _grow_to."""
    import jax

    idx = ShardedFlatIndex(16, tile_n=256, dtype=np.float32)
    base_cap = idx.capacity
    vecs = rng.standard_normal((base_cap, 16)).astype(np.float32)
    idx.add(vecs, list(range(base_cap)))

    def forbidden(*a, **kw):
        raise AssertionError("host round-trip during sharded growth")

    monkeypatch.setattr(jax, "device_get", forbidden)
    more = rng.standard_normal((base_cap, 16)).astype(np.float32)
    idx.add(more, list(range(base_cap, 2 * base_cap)))
    assert idx.capacity >= 2 * base_cap
    # sharding preserved and data intact after the device-side reshuffle
    assert idx.emb.sharding == idx._row_sharding
    ids, vals, _ = idx.search(vecs[3], k=1)
    assert ids[0][0] == 3 and vals[0][0] > 0.99
    ids2, _, _ = idx.search(more[7], k=1)
    assert ids2[0][0] == base_cap + 7
