"""SegmentedFlatIndex (hot tail): parity vs FlatIndex across merges,
tombstones, filters/bias alignment, and concurrent ingest+query."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from archi_tpu.engine.flat_index import FlatIndex
from archi_tpu.engine.segmented_index import SegmentedFlatIndex


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture
def pair():
    seg = SegmentedFlatIndex(32, dtype=jnp.float32, tile_n=256,
                             merge_rows=300, tail_tile_n=256)
    flat = FlatIndex(32, dtype=jnp.float32, tile_n=256)
    return seg, flat


def _add_batches(seg, flat, rng, n_batches=8, batch=100):
    for b in range(n_batches):
        vecs = rng.standard_normal((batch, 32)).astype(np.float32)
        ids = [f"c{b * batch + i}" for i in range(batch)]
        rows_s = seg.add(vecs, ids)
        rows_f = flat.add(vecs, ids)
        assert rows_s == rows_f  # GLOBAL numbering identical across merges


def test_parity_with_flat_across_merges(pair, rng):
    seg, flat = pair
    _add_batches(seg, flat, rng)
    assert seg.n_rows == flat.n_rows == 800
    assert seg.n_merged >= 300  # merged at least once (merge_rows=300)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    ids_s, vals_s, rows_s = seg.search(q, k=10)
    ids_f, vals_f, rows_f = flat.search(q, k=10)
    np.testing.assert_allclose(vals_s, vals_f, rtol=1e-5, atol=1e-5)
    assert [list(r) for r in rows_s] == [list(r) for r in rows_f]
    assert ids_s == ids_f


def test_delete_in_main_and_tail(pair, rng):
    seg, flat = pair
    _add_batches(seg, flat, rng)
    dead = ["c5", "c350", "c799"]  # main, main (post-merge), tail
    assert seg.delete(dead) == flat.delete(dead) == 3
    assert len(seg) == len(flat) == 797
    q = rng.standard_normal((3, 32)).astype(np.float32)
    _i_s, vals_s, rows_s = seg.search(q, k=20)
    _i_f, vals_f, rows_f = flat.search(q, k=20)
    np.testing.assert_allclose(vals_s, vals_f, rtol=1e-5, atol=1e-5)
    for rr in rows_s:
        assert 5 not in rr and 350 not in rr and 799 not in rr


def test_filter_and_bias_alignment_across_segments(pair, rng):
    """Caller-built per-global-row vectors must hit the same rows whether
    they live in main or tail."""
    seg, flat = pair
    _add_batches(seg, flat, rng)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    fm = np.zeros(seg.capacity, np.float32)
    fm[[10, 400, 777]] = 1.0  # main + merged + tail rows
    bias = np.zeros(seg.capacity, np.float32)
    bias[400] = 5.0
    _ids_s, vals_s, rows_s = seg.search(q, k=3, filter_mask=fm, bias=bias)
    _ids_f, vals_f, rows_f = flat.search(
        q, k=3, filter_mask=fm[: flat.capacity], bias=bias[: flat.capacity])
    assert [list(r) for r in rows_s] == [list(r) for r in rows_f]
    assert all(r[0] == 400 for r in rows_s)  # bias dominates
    np.testing.assert_allclose(vals_s, vals_f, rtol=1e-5, atol=1e-5)


def test_explicit_merge_and_compact(pair, rng):
    seg, flat = pair
    _add_batches(seg, flat, rng, n_batches=2)  # below merge threshold
    assert seg.tail.n_rows > 0
    seg.merge()
    assert seg.tail.n_rows == 0 and seg.n_merged == 200
    seg.delete(["c0", "c1"])
    seg.compact()
    assert len(seg) == 198
    got, vals, _ = seg.search(np.asarray(
        _norm(rng.standard_normal((1, 32))), np.float32), k=5)
    assert all(i is not None for i in got[0])


def test_id_rows_view_and_contains(pair, rng):
    seg, _flat = pair
    _add_batches(seg, _flat, rng)
    assert "c0" in seg._id_rows and "c799" in seg._id_rows
    assert seg._id_rows.get("c0") == [0]
    assert seg._id_rows.get("c799") == [799]
    assert seg._id_rows.get("nope") is None


def test_save_load_roundtrip(pair, rng, tmp_path):
    seg, _flat = pair
    _add_batches(seg, _flat, rng, n_batches=4)
    seg.delete(["c7"])
    p = str(tmp_path / "seg.npz")
    seg.save(p)
    loaded = SegmentedFlatIndex.load(p, merge_rows=300)
    assert len(loaded) == len(seg)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    _i1, v1, _r1 = seg.search(q, k=5)
    i2, v2, _r2 = loaded.search(q, k=5)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)


def test_concurrent_ingest_and_query(rng):
    """Queries racing adds + merges never miss previously-visible rows and
    never return duplicate rows."""
    seg = SegmentedFlatIndex(16, dtype=jnp.float32, tile_n=256,
                             merge_rows=128, tail_tile_n=256)
    base = rng.standard_normal((200, 16)).astype(np.float32)
    seg.add(base, list(range(200)))
    probe = np.asarray(_norm(base[:4]), np.float32)
    stop = threading.Event()
    errors: list = []

    def ingest():
        i = 0
        while not stop.is_set():
            vecs = rng.standard_normal((64, 16)).astype(np.float32)
            seg.add(vecs, list(range(1000 + 64 * i, 1000 + 64 * (i + 1))))
            i += 1

    th = threading.Thread(target=ingest, daemon=True)
    th.start()
    try:
        for _ in range(60):
            ids, vals, rows = seg.search(probe, k=8)
            for qi in range(4):
                rr = [int(r) for r in rows[qi]]
                if len(set(rr)) != len(rr):
                    errors.append(("dup", rr))
                if int(rows[qi][0]) != qi:  # its own vector stays rank-1
                    errors.append(("miss", qi, rr))
    finally:
        stop.set()
        th.join(timeout=10)
    assert not errors, errors[:5]


def test_vectorstore_over_segmented_index():
    """TpuVectorStore's global-row couplings (bm25 bias, enabled-ids masks,
    alive view, id lookups) hold over the hot-tail index."""
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from tests.unit.test_vectorstore import FakeEmbeddings

    idx = SegmentedFlatIndex(FakeEmbeddings().dim
                             if hasattr(FakeEmbeddings(), "dim") else 384,
                             dtype=jnp.float32, tile_n=256, merge_rows=3,
                             tail_tile_n=256)
    store = TpuVectorStore(FakeEmbeddings(), index=idx)
    store.add_texts(["the quick brown fox", "lazy dog sleeps"],
                    [{"source": "a"}, {"source": "b"}], ids=["x1", "x2"])
    store.add_texts(["fox runs through the forest", "cat naps quietly"],
                    [{"source": "c"}, {"source": "d"}], ids=["x3", "x4"])
    assert idx.n_merged > 0  # merged at merge_rows=3

    res = store.hybrid_search("fox", k=2)
    assert res and all("fox" in d.page_content for d, _s in res)

    # enabled-ids mask spans main + tail rows
    res2 = store.hybrid_search("fox", k=4, enabled_ids={"x3"})
    assert [d.metadata["source"] for d, _s in res2] == ["c"]

    # bm25-only ranking uses the alive view
    res3 = store.hybrid_search("fox", k=2, semantic_weight=0.0,
                               bm25_weight=1.0)
    assert res3 and all("fox" in d.page_content for d, _s in res3)

    # delete spans segments
    store.delete(["x1"])
    res4 = store.hybrid_search("quick brown", k=4)
    assert all(d.metadata["source"] != "a" for d, _s in res4)
    assert store.count() == 3


def test_vectorstore_checkpoint_roundtrip_keeps_hot_tail(tmp_path):
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from tests.unit.test_vectorstore import FakeEmbeddings

    idx = SegmentedFlatIndex(FakeEmbeddings.dim, dtype=jnp.float32,
                             tile_n=256, merge_rows=3, tail_tile_n=256)
    store = TpuVectorStore(FakeEmbeddings(), index=idx)
    store.add_texts(["fox one", "fox two", "dog three", "cat four"],
                    ids=[f"x{i}" for i in range(4)])
    p = str(tmp_path / "ckpt")
    store.save(p)
    loaded = TpuVectorStore.load(p, FakeEmbeddings(),
                                 index_cls=SegmentedFlatIndex)
    assert isinstance(loaded.index, SegmentedFlatIndex)
    assert loaded.count() == 4
    res = loaded.hybrid_search("fox", k=2)
    assert res and all("fox" in d.page_content for d, _s in res)
    # appends after reload still go through the tail
    loaded.add_texts(["fox five"], ids=["x5"])
    assert loaded.index.tail.n_rows >= 0  # surface intact
    assert loaded.count() == 5


def test_global_id_rows_keys_union():
    """store.ids() / diff-sync iterate index._id_rows.keys() — the
    hot-tail view must expose the union of both segments (regression:
    AttributeError crashed ingestion on hot_tail deployments)."""
    import numpy as np

    from archi_tpu.engine.segmented_index import SegmentedFlatIndex

    idx = SegmentedFlatIndex(8, merge_rows=4, dtype=np.float32)
    x = np.eye(8, dtype=np.float32)
    idx.add(x[:4], ids=[f"main-{i}" for i in range(4)])  # fills → merge
    idx.add(x[4:6], ids=["tail-0", "tail-1"])            # stays in tail
    keys = set(idx._id_rows.keys())
    assert {"tail-0", "tail-1"} <= keys
    assert any(k.startswith("main-") for k in keys)
    assert set(iter(idx._id_rows)) == keys
