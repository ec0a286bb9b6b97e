"""FlatIndex: add/search/delete/grow/save-load vs NumPy brute force."""

import numpy as np

from archi_tpu.engine.flat_index import FlatIndex


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def test_add_search_exact(rng):
    d = 64
    idx = FlatIndex(d, dtype=np.float32)
    emb = rng.standard_normal((200, d)).astype(np.float32)
    ids = [f"doc{i}" for i in range(200)]
    idx.add(emb, ids)
    q = rng.standard_normal((3, d)).astype(np.float32)

    got_ids, scores, _ = idx.search(q, k=5)
    ref = _norm(q) @ _norm(emb).T
    ref_top = np.argsort(-ref, axis=1)[:, :5]
    for b in range(3):
        assert got_ids[b] == [f"doc{i}" for i in ref_top[b]]
        np.testing.assert_allclose(
            scores[b], np.sort(ref[b])[::-1][:5], rtol=1e-3, atol=1e-3
        )


def test_growth_and_multiple_adds(rng):
    d = 32
    idx = FlatIndex(d, dtype=np.float32)
    total = 0
    for batch in [100, 500, 1500, 3000]:
        emb = rng.standard_normal((batch, d)).astype(np.float32)
        idx.add(emb, [f"c{total + i}" for i in range(batch)])
        total += batch
    assert len(idx) == total
    assert idx.capacity >= total
    got_ids, scores, _ = idx.search(rng.standard_normal(d).astype(np.float32), k=3)
    assert len(got_ids[0]) == 3


def test_delete_tombstone_then_compact(rng):
    d = 16
    idx = FlatIndex(d, dtype=np.float32)
    emb = rng.standard_normal((50, d)).astype(np.float32)
    idx.add(emb, [f"c{i}" for i in range(50)])
    q = emb[7]
    got_ids, _, _ = idx.search(q, k=1)
    assert got_ids[0][0] == "c7"
    idx.delete(["c7"])
    assert len(idx) == 49
    got_ids, _, _ = idx.search(q, k=1)
    assert got_ids[0][0] != "c7"
    idx.compact()
    assert len(idx) == 49
    got_ids, _, _ = idx.search(q, k=1)
    assert got_ids[0][0] != "c7"


def test_filter_mask(rng):
    d = 16
    idx = FlatIndex(d, dtype=np.float32)
    emb = rng.standard_normal((30, d)).astype(np.float32)
    idx.add(emb, [f"c{i}" for i in range(30)])
    mask = np.zeros(idx.capacity, np.float32)
    mask[10:20] = 1.0  # only rows 10..19 enabled
    got_ids, _, rows = idx.search(emb[5], k=3, filter_mask=mask)
    assert all(10 <= r < 20 for r in rows[0])


def test_save_load_roundtrip(tmp_path, rng):
    d = 24
    idx = FlatIndex(d, dtype=np.float32)
    emb = rng.standard_normal((40, d)).astype(np.float32)
    idx.add(emb, [f"c{i}" for i in range(40)])
    idx.delete(["c3", "c4"])
    p = str(tmp_path / "index.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    assert len(idx2) == 38
    q = emb[10]
    a = idx.search(q, k=5)[0]
    b = idx2.search(q, k=5)[0]
    assert a == b


def test_duplicate_ids_multiple_rows(rng):
    d = 8
    idx = FlatIndex(d, dtype=np.float32)
    emb = rng.standard_normal((4, d)).astype(np.float32)
    idx.add(emb, ["a", "a", "b", "b"])
    idx.delete(["a"])
    assert len(idx) == 2


def test_int8_quantized_index_recall(rng):
    """int8 storage: scores within quantization tolerance of f32 and
    top-10 recall >= 0.9 on random data."""
    d, n = 64, 2000
    emb = rng.standard_normal((n, d)).astype(np.float32)
    idx8 = FlatIndex(d, dtype="int8")
    idx32 = FlatIndex(d, dtype=np.float32)
    ids = [f"c{i}" for i in range(n)]
    idx8.add(emb, ids)
    idx32.add(emb, ids)
    q = rng.standard_normal((8, d)).astype(np.float32)
    ids8, v8, r8 = idx8.search(q, k=10)
    ids32, v32, r32 = idx32.search(q, k=10)
    recall = np.mean([
        len(set(r8[b]) & set(r32[b])) / 10 for b in range(8)
    ])
    assert recall >= 0.9, recall
    np.testing.assert_allclose(v8[:, 0], v32[:, 0], atol=0.03)


def test_int8_compact_and_save_load(tmp_path, rng):
    d = 32
    idx = FlatIndex(d, dtype="int8")
    emb = rng.standard_normal((50, d)).astype(np.float32)
    idx.add(emb, [f"c{i}" for i in range(50)])
    idx.delete(["c5"])
    idx.compact()
    got, vals, _ = idx.search(emb[7], k=1)
    assert got[0][0] == "c7" and vals[0][0] > 0.95
    p = str(tmp_path / "i8.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    got2, vals2, _ = idx2.search(emb[7], k=1)
    assert got2[0][0] == "c7" and vals2[0][0] > 0.95


def test_save_load_preserves_int_ids(tmp_path, rng):
    d = 16
    idx = FlatIndex(d, dtype=np.float32)
    emb = rng.standard_normal((5, d)).astype(np.float32)
    idx.add(emb, [10, 11, 12, 13, 14])  # integer ids
    p = str(tmp_path / "ints.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    assert idx2.delete([12]) == 1  # delete-by-original-int-id works
    got, _, _ = idx2.search(emb[0], k=1)
    assert got[0][0] == 10


def test_numpy_int_ids_roundtrip_save_load(tmp_path):
    """np.arange ids must reload as ints, not strings — np.int64 is not a
    Python int and used to fall through jsonable_ids' str() branch,
    breaking delete-by-id after reload."""
    import jax.numpy as jnp

    idx = FlatIndex(16, dtype=jnp.float32)
    v = np.random.default_rng(0).standard_normal((8, 16)).astype(np.float32)
    idx.add(v, ids=np.arange(8))
    p = str(tmp_path / "idx")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    ids, _, _ = idx2.search(v[3:4], k=1)
    assert ids[0][0] == 3 and isinstance(ids[0][0], int)
    assert idx2.delete([3]) == 1
