"""XL serving index: host full-precision plane + device IVF-PQ snapshot +
exact fresh tail (engine/xl_index.py).  Exactness: reported scores are
exact inner products end to end (ADC candidates are host-rescored), fresh
rows are found immediately, deletes stay dead across snapshot rebuilds,
and the bias/filter contract matches FlatIndex semantics."""

import numpy as np
import pytest

from archi_tpu.engine.xl_index import XlPQIndex
from archi_tpu.ops.pallas_topk import NEG_INF

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


def _corpus(rng, n, d=64, clusters=64, noise=0.12):
    centers = rng.standard_normal((clusters, d)).astype(np.float32)
    x = centers[rng.integers(0, clusters, n)] + \
        noise * rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _mk(rng, n=6144, **kw):
    kw.setdefault("nlist", 32)
    kw.setdefault("block", 128)
    kw.setdefault("pq_m", 16)
    kw.setdefault("pq_refine_m", 16)
    kw.setdefault("nprobe_blocks", 24)
    kw.setdefault("rerank_overfetch", 32)
    kw.setdefault("min_snapshot_rows", 2048)
    kw.setdefault("build_block_rows", 1024)
    kw.setdefault("tile_n", 256)
    idx = XlPQIndex(64, **kw)
    x = _corpus(rng, n)
    idx.add(x, [f"c{i}" for i in range(n)])
    return idx, x


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    idx, x = _mk(rng)
    return rng, idx, x


def test_snapshot_built_and_tail_small(setup):
    _, idx, x = setup
    assert idx._ivf is not None
    assert idx._n_snap >= 4096
    assert idx.n_rows == len(x)


def test_scores_are_exact(setup):
    """The snapshot tier host-rescores: reported scores must equal true
    inner products, not ADC approximations."""
    _, idx, x = setup
    ids, vals, rows = idx.search(x[37], k=5)
    assert rows[0][0] == 37 and ids[0][0] == "c37"
    true_ip = x[rows[0].astype(int)] @ x[37]
    assert np.abs(vals[0] - true_ip).max() < 2e-2   # bf16 host plane


def test_recall_vs_bruteforce(setup):
    _, idx, x = setup
    rng = np.random.default_rng(3)
    q = x[rng.choice(len(x), 8)] + 0.02 * rng.standard_normal(
        (8, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    _, _, rows = idx.search(q, k=10)
    rec = np.mean([len(set(rows[b].astype(int)) & set(exact[b])) / 10
                   for b in range(8)])
    assert rec >= 0.85, rec
    # every returned row must be within bf16 resolution of the true
    # top-10 boundary (the host plane is bf16: ties closer than ~4e-3
    # legitimately reorder — measured misses sit within 7e-4)
    for b in range(8):
        true = x @ q[b]
        t10 = true[exact[b]].min()
        assert (true[rows[b].astype(int)] >= t10 - 4e-3).all()


def test_fresh_rows_immediately_searchable(setup):
    rng, idx, x = setup
    fresh = _corpus(np.random.default_rng(77), 4)
    rows_new = idx.add(fresh, [f"f{i}" for i in range(4)])
    ids, vals, rows = idx.search(fresh[2], k=3)
    assert rows[0][0] == rows_new[2] and ids[0][0] == "f2"
    assert vals[0][0] > 0.99


def test_delete_stays_dead_everywhere(setup):
    _, idx, x = setup
    _, _, base = idx.search(x[40], k=3)
    victim = int(base[0][0])
    idx.delete([f"c{victim}"])
    ids, vals, rows = idx.search(x[40], k=5)
    assert victim not in set(int(r) for r in rows[0])
    assert (vals > NEG_INF / 2).all()


def test_filter_mask_and_bias():
    rng = np.random.default_rng(21)
    idx, x = _mk(rng, n=4096)
    fm = np.zeros(idx.capacity, np.float32)
    fm[100:120] = 1.0
    _, _, rows = idx.search(x[40], k=5, filter_mask=fm)
    assert all(100 <= int(r) < 120 for r in rows[0] if int(r) >= 0)
    # finite bias lifts a probed row (exact-score tier re-applies it)
    _, _, wide = idx.search(x[40], k=50)
    target = int(wide[0][-1])
    bias = np.zeros(idx.capacity, np.float32)
    bias[target] = 5.0
    _, _, r2 = idx.search(x[40], k=3, bias=bias)
    assert int(r2[0][0]) == target


def test_delete_survives_snapshot_rebuild():
    rng = np.random.default_rng(31)
    idx, x = _mk(rng, n=4096)
    _, _, base = idx.search(x[10], k=2)
    victim = int(base[0][0])
    idx.delete([f"c{victim}"])
    # force another rebuild over everything (victim now inside snapshot)
    idx.refresh_snapshot()
    _, _, rows = idx.search(x[10], k=5)
    assert victim not in set(int(r) for r in rows[0])


def test_per_query_bias_all_tiers(setup):
    """[B, N] bias applies row-wise on the snapshot (block-layout
    stream + host-rerank re-add) AND the fresh tail."""
    rng, idx, x = setup
    n = len(x)
    fresh = _corpus(np.random.default_rng(77), 8)
    idx2, x2 = _mk(np.random.default_rng(13), n=4096)
    idx2.add(fresh, [f"f{i}" for i in range(8)])
    assert idx2._n_snap >= 2048 and idx2.n_rows > idx2._n_snap
    # boost a snapshot row for query 0, a TAIL row for query 1.  The
    # boosted snapshot row must come from the query's own probed set
    # (bias rides the ADC scores but not the block RANKING, so a boost
    # cannot surface a row whose block was never probed — the documented
    # ANN approximation, same as refinement not resurrecting rows)
    q = np.stack([x2[500], x2[600]])
    _, _, base0 = idx2.search(q, k=20)
    t0 = int(next(r for r in base0[0][::-1] if 0 <= r < idx2._n_snap))
    t1 = idx2.n_rows - 3                      # fresh tail tier (exact)
    bias = np.zeros((2, idx2.n_rows), np.float32)
    bias[0, t0] = 5.0
    bias[1, t1] = 5.0
    ids, vals, rows = idx2.search(q, k=3, bias=bias)
    assert int(rows[0][0]) == t0 and int(rows[1][0]) == t1
    # boosted scores are exact-ip + bias on the snapshot tier
    true0 = float(x2[t0] @ (q[0] / np.linalg.norm(q[0])))
    assert abs(vals[0][0] - (true0 + 5.0)) < 2e-2
    # per-query isolation: q1's result must not carry q0's boost
    assert t0 != t1 and int(rows[1][0]) != t0
    # NEG_INF per-query kill stays dead
    bias2 = np.zeros((2, idx2.n_rows), np.float32)
    base = idx2.search(q, k=3)[2]
    bias2[0, int(base[0][0])] = NEG_INF
    _, _, r2 = idx2.search(q, k=3, bias=bias2)
    assert int(r2[0][0]) != int(base[0][0])
    assert int(r2[1][0]) == int(base[1][0])   # other query unaffected


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(41)
    idx, x = _mk(rng, n=4096)
    fresh = _corpus(np.random.default_rng(5), 3)
    idx.add(fresh, ["fa", "fb", "fc"])
    idx.delete(["c7"])
    p = str(tmp_path / "xl" / "index.npz")
    import os

    os.makedirs(os.path.dirname(p))
    idx.save(p)
    loaded = XlPQIndex.load(p)
    assert loaded.n_rows == idx.n_rows
    assert loaded._n_snap == idx._n_snap
    a = idx.search(x[33], k=5)
    b = loaded.search(x[33], k=5)
    assert a[0] == b[0]
    np.testing.assert_allclose(a[1], b[1], atol=2e-3)
    _, _, r2 = loaded.search(x[7], k=5)
    assert 7 not in set(int(r) for r in r2[0])
    ids, _, _ = loaded.search(fresh[1], k=1)
    assert ids[0][0] == "fb"


def test_bootstrap_builds_xl(tmp_path):
    from archi_tpu.bin.bootstrap import _build_index

    idx = _build_index(32, {"type": "ivfpq_xl", "nlist": 8, "pq_m": 8,
                            "pq_refine_m": 8, "min_snapshot_rows": 4096})
    assert isinstance(idx, XlPQIndex)
    assert idx.pq_m == 8 and idx.async_refresh
    assert idx.block_rank_sub == 8 and idx.cell_gate is None
    idx2 = _build_index(32, {"type": "ivfpq_xl", "nlist": 8, "pq_m": 8,
                             "pq_refine_m": 8, "block_rank_sub": 2,
                             "cell_gate": 4})
    assert idx2.block_rank_sub == 2 and idx2.cell_gate == 4


def test_probe_config_survives_save_load(tmp_path):
    """cell_gate / block_rank_sub ride the checkpoint config and the
    loaded snapshot's sub-centroids match the configured granularity."""
    rng = np.random.default_rng(43)
    idx, x = _mk(rng, n=4096, cell_gate=16, block_rank_sub=2,
                 extract="hier", hier_t=128)
    assert idx._ivf is not None
    assert idx._ivf._bc_sub == 2            # ensure ran with sub
    p = str(tmp_path / "xlp" / "index.npz")
    import os

    os.makedirs(os.path.dirname(p))
    idx.save(p)
    loaded = XlPQIndex.load(p)
    assert loaded.cell_gate == 16 and loaded.block_rank_sub == 2
    assert loaded.extract == "hier" and loaded.hier_t == 128
    assert loaded._ivf is not None and loaded._ivf._bc_sub == 2
    a = idx.search(x[33], k=5)
    b = loaded.search(x[33], k=5)
    assert a[0] == b[0]


def test_through_vectorstore():
    """The TpuVectorStore protocol: add_texts / hybrid search / delete."""
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from archi_tpu.models.hashed_embedder import HashedNgramEmbedder

    emb = HashedNgramEmbedder(dim=64)
    idx = XlPQIndex(64, nlist=8, block=128, pq_m=16, pq_refine_m=16,
                    min_snapshot_rows=1 << 30, tile_n=256)  # tail-only
    vs = TpuVectorStore(emb, index=idx)
    texts = [f"document about topic {i} with words w{i}" for i in range(40)]
    ids = vs.add_texts(texts, ids=[f"d{i}" for i in range(40)])
    res = vs.hybrid_search("document about topic 7 w7", k=3)
    assert res and "topic 7" in res[0][0].page_content
    vs.delete(["d7"])
    res2 = vs.hybrid_search("document about topic 7 w7", k=3)
    assert all("topic 7 " not in d.page_content for d, _ in res2)


def test_adopt_store_matches_add_path():
    """A pre-filled host plane adopted via adopt_store (bulk-load path,
    e.g. a disk-sliced corpus shard through HostVectorStore.view) serves
    the same results as the same rows ingested through add()."""
    from archi_tpu.engine.host_store import HostVectorStore

    rng = np.random.default_rng(5)
    idx_add, x = _mk(rng, n=4096)

    parent = HostVectorStore(64, dtype=np.float32)
    parent.add(x)
    view = HostVectorStore.view(parent, 0, len(parent))
    with pytest.raises(RuntimeError):
        view.add(x[:1])
    idx_adopt = XlPQIndex(
        64, store=view, nlist=32, block=128, pq_m=16, pq_refine_m=16,
        nprobe_blocks=24, rerank_overfetch=32, min_snapshot_rows=2048,
        build_block_rows=1024, tile_n=256, normalize=False)
    idx_adopt.adopt_store([f"c{i}" for i in range(len(x))])
    assert idx_adopt._n_snap == 4096 and len(idx_adopt) == 4096

    q = x[rng.integers(0, len(x), 8)] + 0.02 * rng.standard_normal(
        (8, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # both paths serve brute-force-quality results (the two snapshots
    # train independent k-means, so candidate sets — and the score dtype
    # of the default f16 RAM store vs this f32 view — may differ at the
    # margin; recall and score exactness are the adopt contract)
    exact = np.argsort(-(x.astype(np.float64) @ q.T.astype(np.float64)),
                       axis=0)[:5].T                       # [8, 5]
    for idx in (idx_add, idx_adopt):
        ids, vals, rows = idx.search(q, k=5)
        hit = np.mean([len({f"c{r}" for r in exact[b]} & set(ids[b])) / 5
                       for b in range(8)])
        assert hit >= 0.9, (idx, hit)
    # adopt path's scores are exact f32 inner products of returned rows
    _ids_b, vals_b, rows_b = idx_adopt.search(q, k=5)
    want = np.take_along_axis(x @ q.T, np.asarray(rows_b).T, axis=0).T
    np.testing.assert_allclose(np.asarray(vals_b), want,
                               rtol=2e-5, atol=2e-5)

    # view window really is a window (no copy): parent row 1 == view row 1
    assert np.shares_memory(view._buf, parent._buf)


def test_snapshot_source_builds_identical_snapshot():
    """An out-of-band snapshot_source (device-regenerable plane bits)
    must yield the same snapshot as the plane-upload build: same
    ranking structures, identical search results on the same queries.
    This is the no-reupload bulk-restore path the config-4 sharded
    runner uses (scripts/run_config4_sharded.py)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    x = _corpus(rng, 4096)
    kw = dict(nlist=32, block=128, pq_m=16, pq_refine_m=16,
              nprobe_blocks=24, rerank_overfetch=32,
              min_snapshot_rows=2048, build_block_rows=1024, tile_n=256,
              normalize=False)
    from archi_tpu.engine.host_store import HostVectorStore
    s1 = HostVectorStore(64, dtype=np.float32); s1.add(x)
    s2 = HostVectorStore(64, dtype=np.float32); s2.add(x)

    idx_plane = XlPQIndex(64, store=s1, **kw)
    idx_plane.adopt_store([f"c{i}" for i in range(len(x))])

    calls = []

    def source(i):
        calls.append(i)
        return jnp.asarray(x[i * 1024:(i + 1) * 1024])

    idx_src = XlPQIndex(64, store=s2, snapshot_source=source, **kw)
    idx_src.adopt_store([f"c{i}" for i in range(len(x))])
    assert calls, "snapshot_source was never consulted"

    q = x[rng.integers(0, len(x), 8)] + 0.02 * rng.standard_normal(
        (8, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids_a, vals_a, rows_a = idx_plane.search(q, k=5)
    ids_b, vals_b, rows_b = idx_src.search(q, k=5)
    assert ids_a == ids_b
    np.testing.assert_array_equal(np.asarray(rows_a), np.asarray(rows_b))
    np.testing.assert_allclose(np.asarray(vals_a), np.asarray(vals_b),
                               rtol=0, atol=0)
