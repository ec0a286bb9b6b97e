"""AnnFlatIndex (IVF snapshot + exact fresh tail) and the IVF bias
contract: tombstones/filters/hybrid ride the same per-row additive bias as
the fused flat kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from archi_tpu.engine.ann_index import AnnFlatIndex
from archi_tpu.engine.flat_index import FlatIndex
from archi_tpu.engine.ivf_index import IVFIndex

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


def _clustered(rng, n_clusters=8, per=64, d=32):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    x = np.repeat(centers, per, axis=0) + 0.2 * rng.standard_normal(
        (n_clusters * per, d)).astype(np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


# --------------------------------------------------------- IVF bias support
def test_ivf_bias_tombstones_and_hybrid(rng):
    x = _clustered(rng)
    ivf = IVFIndex.build(x, None, nlist=4, block=64, dtype=np.float32)
    q = x[10][None, :]
    # no bias: row 10 is its own best match
    _i, _v, rows = ivf.search(q, k=3, nprobe=4)
    assert rows[0][0] == 10
    # tombstone row 10 via NEG_INF bias
    bias = np.zeros(len(x), np.float32)
    bias[10] = -1e30
    _i, _v, rows2 = ivf.search(q, k=3, nprobe=4, bias=bias)
    assert 10 not in rows2[0]
    # finite bias boosts an arbitrary row to the top
    bias2 = np.zeros(len(x), np.float32)
    bias2[200] = 10.0
    _i, vals3, rows3 = ivf.search(q, k=2, nprobe=4, bias=bias2)
    assert rows3[0][0] == 200 and vals3[0][0] > 9.0


def test_ivf_bias_matches_flat_exactly_at_full_probe(rng):
    x = _clustered(rng)
    flat = FlatIndex(32, dtype=np.float32, tile_n=256)
    flat.add(x, list(range(len(x))))
    ivf = IVFIndex.build(x, None, nlist=8, block=64, dtype=np.float32)
    bias = rng.uniform(0, 0.5, len(x)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    _i, f_vals, f_rows = flat.search(q, k=10, bias=bias)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    _i, a_vals, a_rows = ivf.search(qn, k=10, nprobe=8, bias=bias,
                                    normalize_queries=False)
    for b in range(4):
        assert set(int(r) for r in a_rows[b]) == set(int(r) for r in f_rows[b])
        np.testing.assert_allclose(np.sort(a_vals[b]), np.sort(f_vals[b]),
                                   rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- AnnFlatIndex
@pytest.fixture
def ann_pair(rng):
    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8, nprobe=8,
                       min_snapshot_rows=256, refresh_fraction=0.5,
                       async_refresh=False)
    flat = FlatIndex(32, dtype=np.float32, tile_n=256)
    x = _clustered(rng)  # 512 rows
    ids = [f"c{i}" for i in range(len(x))]
    ann.add(x, ids)
    flat.add(x, ids)
    return ann, flat, x


def test_ann_matches_flat_at_full_probe(ann_pair, rng):
    ann, flat, x = ann_pair
    q = rng.standard_normal((3, 32)).astype(np.float32)
    ids_a, vals_a, rows_a = ann.search(q, k=10)
    assert ann._ivf is not None and ann._n_snap == 512  # snapshot built
    ids_f, vals_f, rows_f = flat.search(q, k=10)
    for b in range(3):
        assert set(int(r) for r in rows_a[b]) == set(int(r) for r in rows_f[b])
    assert ids_a[0][0] == ids_f[0][0]


def test_ann_fresh_rows_searched_exactly(ann_pair, rng):
    ann, flat, x = ann_pair
    _ = ann.search(x[0], k=1)  # trigger snapshot at 512 rows
    snap = ann._n_snap
    fresh = _clustered(rng, n_clusters=2, per=20)  # 40 rows < refresh frac
    ann.add(fresh, [f"f{i}" for i in range(40)])
    assert ann._n_snap == snap  # not refreshed yet
    # a freshly added vector must be findable immediately (exact tail)
    ids, vals, rows = ann.search(fresh[7], k=1)
    assert ids[0][0] == "f7" and vals[0][0] > 0.99


def test_ann_tombstones_filters_and_enabled_ids(ann_pair, rng):
    ann, flat, x = ann_pair
    _ = ann.search(x[0], k=1)
    ann.delete(["c10"])
    flat.delete(["c10"])
    _i, _v, rows = ann.search(x[10], k=3)
    assert 10 not in rows[0]
    fm = np.zeros(ann.capacity, np.float32)
    fm[5] = 1.0
    ids, _v, rows2 = ann.search(x[300], k=2, filter_mask=fm)
    assert rows2[0][0] == 5 and ids[0][0] == "c5"


def test_ann_small_corpus_stays_exact_flat(rng):
    ann = AnnFlatIndex(16, dtype=np.float32, tile_n=256,
                       min_snapshot_rows=10_000)
    x = _clustered(rng, n_clusters=2, per=30, d=16)
    ann.add(x, list(range(len(x))))
    _i, _v, rows = ann.search(x[3], k=1)
    assert rows[0][0] == 3 and ann._ivf is None


def test_ann_through_vectorstore_hybrid():
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from tests.unit.test_vectorstore import FakeEmbeddings

    ann = AnnFlatIndex(FakeEmbeddings.dim, dtype=np.float32, tile_n=256,
                       nlist=4, nprobe=4, min_snapshot_rows=4,
                       async_refresh=False)
    store = TpuVectorStore(FakeEmbeddings(), index=ann)
    store.add_texts(
        ["the quick brown fox", "lazy dog sleeps", "fox runs in forest",
         "cat naps", "fox hunts at dusk", "birds sing at dawn"],
        ids=[f"x{i}" for i in range(6)])
    res = store.hybrid_search("fox", k=3)
    assert ann._ivf is not None  # ANN path active
    assert res and all("fox" in d.page_content for d, _s in res)
    res2 = store.hybrid_search("fox", k=3, enabled_ids={"x2"})
    assert len(res2) == 1 and res2[0][0].page_content.startswith("fox runs")
    store.delete(["x0"])
    res3 = store.hybrid_search("quick brown fox", k=3)
    assert all(not d.page_content.startswith("the quick")
               for d, _s in res3)


def test_ann_compact_invalidates_snapshot(rng):
    """Compaction renumbers rows; a stale ANN snapshot would return wrong
    ids. The snapshot must be rebuilt from the compacted corpus."""
    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=4, nprobe=4,
                       min_snapshot_rows=64, refresh_fraction=10.0,
                       async_refresh=False)
    x = _clustered(rng, n_clusters=4, per=32)  # 128 rows
    ids = [f"c{i}" for i in range(len(x))]
    ann.add(x, ids)
    _ = ann.search(x[0], k=1)  # build snapshot
    assert ann._ivf is not None
    ann.delete([f"c{i}" for i in range(0, 50)])
    ann.compact()
    assert ann._ivf is None  # invalidated
    got, vals, _rows = ann.search(x[100], k=1)
    assert got[0][0] == "c100" and vals[0][0] > 0.99


# --------------------------------------------------------- ivfpq snapshot
@pytest.fixture
def annpq(rng):
    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8, nprobe=8,
                       min_snapshot_rows=256, refresh_fraction=0.5,
                       snapshot_kind="ivfpq", pq_m=8, pq_refine_m=8)
    x = _clustered(rng)
    ann.add(x, [f"c{i}" for i in range(len(x))])
    return ann, x


def test_ivfpq_snapshot_self_recall(annpq):
    ann, x = annpq
    ids, vals, rows = ann.search(x[37], k=5, nprobe=8)
    assert rows[0][0] == 37 and ids[0][0] == "c37"
    assert vals[0][0] > 0.9  # PQ-approximate, but near the true IP of 1.0


def test_ivfpq_fresh_rows_exact(annpq, rng):
    ann, x = annpq
    ann.refresh_ann()
    fresh = rng.standard_normal((4, 32)).astype(np.float32)
    fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
    new_rows = ann.add(fresh, [f"f{i}" for i in range(4)])
    ids, vals, rows = ann.search(fresh[2], k=3)
    assert rows[0][0] == new_rows[2] and ids[0][0] == "f2"
    assert vals[0][0] > 0.999  # fresh tail is scanned exactly


def test_ivfpq_tombstone_and_filter(annpq):
    ann, x = annpq
    _, _, base = ann.search(x[40], k=3, nprobe=8)
    ann.delete([f"c{int(base[0][0])}"])
    ids, _, rows = ann.search(x[40], k=3, nprobe=8)
    assert int(base[0][0]) not in set(int(r) for r in rows[0])
    fm = np.zeros(ann.capacity, np.float32)
    fm[100:110] = 1.0
    _, _, r2 = ann.search(x[40], k=5, nprobe=8, filter_mask=fm)
    assert all(100 <= int(r) < 110 for r in r2[0] if int(r) >= 0)


def test_bootstrap_builds_ivfpq(tmp_path):
    from archi_tpu.bin.bootstrap import _build_index
    idx = _build_index(32, {"type": "ivfpq", "nlist": 8, "pq_m": 8,
                            "pq_refine_m": 8, "dtype": "float32"})
    assert isinstance(idx, AnnFlatIndex)
    assert idx.snapshot_kind == "ivfpq" and idx.pq_m == 8


def test_async_refresh_keeps_serving(rng):
    """With async_refresh (default) a search never blocks on the snapshot
    build: results stay exact (flat or stale-snapshot + fresh tail) while
    the rebuild completes in the background."""
    import time as _time

    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8, nprobe=8,
                       min_snapshot_rows=256, refresh_fraction=0.1)
    assert ann.async_refresh
    x = _clustered(rng)
    ann.add(x, [f"c{i}" for i in range(len(x))])
    # first search kicks the background build and serves exactly meanwhile
    ids, vals, rows = ann.search(x[7], k=3)
    assert rows[0][0] == 7
    # wait for the background snapshot
    for _ in range(100):
        if ann._ivf is not None:
            break
        _time.sleep(0.05)
    assert ann._ivf is not None
    ids2, _, rows2 = ann.search(x[7], k=3, nprobe=8)
    assert rows2[0][0] == 7


def test_sync_refresh_mode(rng):
    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8,
                       min_snapshot_rows=256, async_refresh=False)
    x = _clustered(rng)
    ann.add(x, [f"c{i}" for i in range(len(x))])
    ann.search(x[3], k=2)        # inline build
    assert ann._ivf is not None


def test_ann_checkpoint_restores_snapshot(tmp_path, rng):
    """Tombstone-free saves persist the ANN snapshot: restart serves ANN
    immediately (no rebuild) in the configured mode."""
    x = _clustered(rng)
    for kind, kw in (("ivf", {}), ("ivfpq", {"pq_m": 8, "pq_refine_m": 8})):
        ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8,
                           min_snapshot_rows=256, snapshot_kind=kind,
                           async_refresh=False, **kw)
        ann.add(x, [f"c{i}" for i in range(len(x))])
        ann.refresh_ann()
        p = str(tmp_path / f"{kind}.npz")
        ann.save(p)
        re = AnnFlatIndex.load(p, nlist=8, min_snapshot_rows=256,
                               snapshot_kind=kind, async_refresh=False,
                               **kw)
        assert re._ivf is not None and re._n_snap == ann._n_snap, kind
        ids, _, rows = re.search(x[33], k=3, nprobe=8)
        assert int(rows[0][0]) == 33 and ids[0][0] == "c33"


def test_ann_checkpoint_drops_snapshot_on_tombstones(tmp_path, rng):
    """load() compacts tombstones (rows renumber) — a stale snapshot
    sidecar must NOT be reused."""
    x = _clustered(rng)
    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8,
                       min_snapshot_rows=256, async_refresh=False)
    ann.add(x, [f"c{i}" for i in range(len(x))])
    ann.refresh_ann()
    p = str(tmp_path / "tomb.npz")
    ann.save(p)                      # writes the sidecar
    ann.delete(["c5"])
    ann.save(p)                      # tombstoned save must remove it
    re = AnnFlatIndex.load(p, nlist=8, min_snapshot_rows=256,
                           async_refresh=False)
    assert re._ivf is None           # rebuilds instead of stale mapping
    ids, _, rows = re.search(x[40], k=3)
    assert ids[0][0] == "c40"


def test_bootstrap_restart_keeps_ann_mode(tmp_path):
    """index.type: ivfpq survives a service restart (was: silently
    downgraded to a flat index on checkpoint reload)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from archi_tpu.bin.bootstrap import build_context

    overrides = {
        "data_manager": {
            "embedding_name": "hash",
            "data_path": str(tmp_path / "data"),
            "db_path": str(tmp_path / "cat.db"),
            "index": {"type": "ivfpq", "nlist": 8, "pq_m": 8,
                      "pq_refine_m": 8, "min_snapshot_rows": 16,
                      "dtype": "float32", "async_refresh": False},
        },
    }
    ctx = build_context(overrides=overrides)
    ctx.vectorstore.add_texts([f"doc {i} about item{i % 4}"
                               for i in range(40)])
    ctx.vectorstore.index.refresh_ann()
    import os
    ckpt = os.path.join(str(tmp_path / "data"), "engine_checkpoint")
    ctx.vectorstore.save(ckpt)
    ctx2 = build_context(overrides=overrides)
    assert isinstance(ctx2.vectorstore.index, AnnFlatIndex)
    assert ctx2.vectorstore.index.snapshot_kind == "ivfpq"
    assert ctx2.vectorstore.index._ivf is not None   # snapshot reused
    res = ctx2.vectorstore.hybrid_search("item2 doc", k=3)
    assert res


def test_failed_background_refresh_recovers(rng, monkeypatch):
    """A refresh that raises must not wedge serving: the thread dies, the
    next search re-kicks, and a later successful build lands."""
    import time as _time

    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8,
                       min_snapshot_rows=256, refresh_fraction=0.1)
    x = _clustered(rng)
    ann.add(x, [f"c{i}" for i in range(len(x))])
    orig = AnnFlatIndex.refresh_ann
    calls = {"n": 0}

    def flaky(self):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected build failure")
        return orig(self)

    monkeypatch.setattr(AnnFlatIndex, "refresh_ann", flaky)
    ids, _, rows = ann.search(x[7], k=3)     # kicks the failing build
    assert int(rows[0][0]) == 7              # exact path still serves
    for _ in range(100):
        if not (ann._refresh_thread and ann._refresh_thread.is_alive()):
            break
        _time.sleep(0.02)
    ids2, _, rows2 = ann.search(x[9], k=3)   # re-kick (successful now)
    assert int(rows2[0][0]) == 9
    for _ in range(200):
        if ann._ivf is not None:
            break
        _time.sleep(0.05)
    assert calls["n"] >= 2 and ann._ivf is not None

def test_ivfpq_device_rerank_exact_scores(annpq):
    """With rerank_overfetch (default 4), reported scores are EXACT inner
    products (not ADC approximations) and strict recall is
    candidate-bound."""
    ann, x = annpq
    ids, vals, rows = ann.search(x[37], k=5, nprobe=8)
    true_ip = x[rows[0].astype(int)] @ x[37]
    assert np.abs(vals[0] - true_ip).max() < 2e-3, (vals[0], true_ip)


def test_ivfpq_rerank_respects_tombstones_and_bias(annpq):
    ann, x = annpq
    _, _, base = ann.search(x[40], k=3, nprobe=8)
    ann.delete([f"c{int(base[0][0])}"])
    _, vals, rows = ann.search(x[40], k=3, nprobe=8)
    assert int(base[0][0]) not in set(int(r) for r in rows[0])
    assert (vals > -1e29).all()
    # finite bias (hybrid analog) must ride into the exact score
    _, _, wide = ann.search(x[40], k=20, nprobe=8)
    target = int(wide[0][-1])
    bias = np.zeros(ann.capacity, np.float32)
    bias[target] = 5.0
    _, _, r2 = ann.search(x[40], k=3, nprobe=8, bias=bias)
    assert int(r2[0][0]) == target


def test_ivfpq_rerank_disabled_matches_adc(rng):
    ann = AnnFlatIndex(32, dtype=np.float32, tile_n=256, nlist=8, nprobe=8,
                       min_snapshot_rows=256, refresh_fraction=0.5,
                       snapshot_kind="ivfpq", pq_m=8, pq_refine_m=8,
                       rerank_overfetch=0)
    x = _clustered(rng)
    ann.add(x, [f"c{i}" for i in range(len(x))])
    ids, vals, rows = ann.search(x[37], k=5, nprobe=8)
    # ADC-approximate scores: same contract as before the rerank existed
    assert rows[0][0] == 37 and vals[0][0] > 0.9
