"""ShardedXlPQIndex: the beyond-HBM XL serving tier composed over the
8-device CPU mesh (VERDICT r3 item 2 — BASELINE config 4 'v5e pod slice').

Each shard = host bf16 plane + IVF-PQ snapshot + exact fresh tail +
tombstones; searches host-rerank per shard and merge globally.  Checks
run against NumPy brute force on the same (bf16-rounded) rows."""

import numpy as np
import pytest

import jax

from archi_tpu.engine.sharded_xl import ShardedXlPQIndex

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run

DIM = 32


def make_index(**kw):
    cfg = dict(nlist=16, block=32, pq_m=8, pq_refine_m=8,
               nprobe_blocks=10 ** 6, rerank_overfetch=16,
               min_snapshot_rows=256, build_block_rows=256,
               tile_n=128, dtype="float32")
    cfg.update(kw)
    return ShardedXlPQIndex(DIM, **cfg)


def corpus(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def brute_rows(v, q, k, alive=None, bias=None):
    import ml_dtypes
    # the host plane stores bf16 rows; ground truth must see the same bits
    vb = v.astype(ml_dtypes.bfloat16).astype(np.float32)
    s = q @ vb.T
    if bias is not None:
        s = s + bias
    if alive is not None:
        s = np.where(alive[None, :] > 0, s, -np.inf)
    return np.argsort(-s, axis=1)[:, :k]


@pytest.fixture(scope="module")
def built():
    """2,000 rows in 8 batches: crosses min_snapshot_rows on every shard
    (8 shards x 250) so snapshots BUILD and fresh tails stay non-empty."""
    v = corpus(2000)
    idx = make_index(min_snapshot_rows=128, build_block_rows=128)
    for i in range(8):
        idx.add(v[i * 250:(i + 1) * 250],
                ids=list(range(i * 250, (i + 1) * 250)))
    return idx, v


def test_shards_balanced_and_snapshots_built(built):
    idx, _ = built
    assert idx.n_shards == 8 and len(idx) == 2000
    sizes = [s.n_rows for s in idx.shards]
    assert max(sizes) - min(sizes) <= 250, sizes
    built_snaps = [s for s in idx.shards if s._n_snap > 0]
    assert built_snaps, "no shard ever adopted a snapshot"
    # fresh tails serve rows past each shard's snapshot boundary
    assert any(s.n_rows > s._n_snap for s in idx.shards)


def test_exact_recall_vs_brute_force(built):
    idx, v = built
    q = corpus(16, seed=9)
    ids, vals, rows = idx.search(q, k=10)
    exact = brute_rows(v, q, 10)
    rec = np.mean([len(set(map(int, rows[b])) & set(map(int, exact[b])))
                   for b in range(16)]) / 10
    assert rec >= 0.99, rec
    # ids are the chunk ids (== global rows in this fixture)
    assert ids[0][0] == int(rows[0][0])
    # scores are exact inner products of the stored (bf16) rows
    import ml_dtypes
    vb = v.astype(ml_dtypes.bfloat16).astype(np.float32)
    want = float(q[0] @ vb[int(rows[0][0])])
    assert abs(float(vals[0][0]) - want) < 5e-3


def test_self_query_top1(built):
    idx, v = built
    ids, _, _ = idx.search(v[123:124] + 1e-3, k=1)
    assert ids[0][0] == 123


def test_cross_shard_tombstones(built):
    idx, v = built
    q = v[777:778]
    ids, _, _ = idx.search(q, k=1)
    assert ids[0][0] == 777
    assert idx.delete([777]) == 1
    ids, _, rows = idx.search(q, k=5)
    assert 777 not in set(map(int, rows[0]))
    assert 777 not in {i for i in ids[0] if i is not None}
    # brute force agrees on the survivors
    alive = np.ones(2000)
    alive[777] = 0
    exact = brute_rows(v, q, 5, alive=alive)
    assert set(map(int, rows[0])) & set(map(int, exact[0]))


def test_global_bias_shared_and_batched(built):
    idx, v = built
    q = corpus(4, seed=3)
    # shared [N] bias: promote one specific row to the top everywhere
    bias = np.zeros(2000, np.float32)
    bias[1500] = 10.0
    _, _, rows = idx.search(q, k=3, bias=bias)
    assert all(int(r[0]) == 1500 for r in rows)
    # batched [B, N] bias: a different promoted row per query
    bb = np.zeros((4, 2000), np.float32)
    targets = [10, 600, 1100, 1900]   # spread across shards
    for b, t in enumerate(targets):
        bb[b, t] = 10.0
    _, _, rows = idx.search(q, k=3, bias=bb)
    assert [int(r[0]) for r in rows] == targets


def test_filter_mask_by_global_row(built):
    idx, v = built
    q = v[42:43]
    fm = np.zeros(2000, np.float32)
    fm[100:200] = 1.0   # only these rows visible
    _, vals, rows = idx.search(q, k=5, filter_mask=fm)
    got = [int(r) for r, val in zip(rows[0], vals[0]) if val > -1e29]
    assert got and all(100 <= r < 200 for r in got)
    exact = brute_rows(v, q, 5, alive=fm)
    assert got[0] == int(exact[0][0])


def test_k_larger_than_per_shard_rows():
    """k > rows-per-shard: merge must fill from multiple shards and pad
    honestly when k > total."""
    v = corpus(24, seed=5)
    idx = make_index(min_snapshot_rows=10 ** 9)   # tails only
    idx.add(v[:12], ids=list(range(12)))
    idx.add(v[12:], ids=list(range(12, 24)))
    q = corpus(2, seed=6)
    ids, vals, rows = idx.search(q, k=20)
    live = [int(r) for r, val in zip(rows[0], vals[0]) if val > -1e29]
    assert len(live) == 20
    exact = brute_rows(v, q, 20)
    assert set(live) == set(map(int, exact[0]))
    ids, vals, _ = idx.search(q, k=30)
    assert sum(1 for val in vals[0] if val > -1e29) == 24
    assert ids[0][-1] is None


def test_growth_after_snapshot_lands_in_tail_then_adopts(built):
    """Rows added after snapshots exist serve exactly from the tails, and
    refresh_snapshots() re-adopts them into the PQ tier."""
    idx, v = built
    extra = corpus(64, seed=11) + 0.0
    g = idx.add(extra, ids=[f"x{i}" for i in range(64)])
    assert len(g) == 64
    q = extra[7:8]
    ids, _, _ = idx.search(q, k=1)
    assert ids[0][0] == "x7"
    snaps_before = [s._n_snap for s in idx.shards]
    idx.refresh_snapshots()
    assert sum(s._n_snap for s in idx.shards) >= sum(snaps_before)
    ids, _, _ = idx.search(q, k=1)
    assert ids[0][0] == "x7"
    # cleanup for other module-scoped tests
    idx.delete([f"x{i}" for i in range(64)])


def test_save_load_roundtrip(tmp_path):
    v = corpus(600, seed=20)
    idx = make_index(min_snapshot_rows=128, build_block_rows=128)
    for i in range(3):
        idx.add(v[i * 200:(i + 1) * 200],
                ids=list(range(i * 200, (i + 1) * 200)))
    idx.delete([5])
    p = str(tmp_path / "sx")
    idx.save(p)
    idx2 = ShardedXlPQIndex.load(p)
    q = v[300:302]
    ids1, v1, r1 = idx.search(q, k=5)
    ids2, v2, r2 = idx2.search(q, k=5)
    # the reloaded tail re-uploads rows from the bf16 host plane, so
    # near-tie ranks can swap within bf16 resolution; compare as sets +
    # scores to bf16 tolerance
    assert set(ids1[0]) == set(ids2[0]) and set(ids1[1]) == set(ids2[1])
    np.testing.assert_allclose(np.sort(v1), np.sort(v2), atol=2e-3)
    _, _, rows = idx2.search(v[5:6], k=3)
    assert 5 not in set(map(int, rows[0]))


def test_adopt_stores_from_plane_views():
    """Bulk-load: one big corpus plane sliced into zero-copy per-shard
    views, adopted without add() — results match brute force and ids map
    shard-major global rows back to the original corpus order."""
    import ml_dtypes

    from archi_tpu.engine.host_store import HostVectorStore

    n, n_shards = 2048, 4
    v = corpus(n, seed=9)
    parent = HostVectorStore(DIM, dtype=ml_dtypes.bfloat16)
    parent.add(v)
    per = n // n_shards
    views = [HostVectorStore.view(parent, s * per, (s + 1) * per)
             for s in range(n_shards)]
    idx = make_index(devices=jax.devices()[:n_shards], stores=views,
                     normalize=False)
    idx.adopt_stores([[f"c{s * per + j}" for j in range(per)]
                      for s in range(n_shards)])
    assert len(idx) == n
    assert all(ix._n_snap == per for ix in idx.shards)

    rng = np.random.default_rng(10)
    qi = rng.integers(0, n, 8)
    q = v[qi] + 0.02 * rng.standard_normal((8, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids, vals, rows = idx.search(q, k=5)
    ref = brute_rows(v, q, 5)
    hit = np.mean([len({f"c{r}" for r in ref[b]} & set(ids[b])) / 5
                   for b in range(8)])
    assert hit >= 0.9, hit
    # global rows == original corpus rows (shard-major adopt order)
    assert all(ids[b][0] == f"c{int(rows[b][0])}" for b in range(8))
    assert all(int(rows[b][0]) == int(qi[b]) for b in range(8))
