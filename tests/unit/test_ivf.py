"""IVF index + TPU k-means vs brute force."""

import numpy as np
import pytest

from archi_tpu.engine.flat_index import FlatIndex
from archi_tpu.engine.ivf_index import IVFIndex
from archi_tpu.engine.kmeans import kmeans


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _clustered_data(rng, n_clusters=20, per=100, d=32, spread=0.15):
    centers = _norm(rng.standard_normal((n_clusters, d)))
    pts = np.repeat(centers, per, axis=0) + spread * rng.standard_normal(
        (n_clusters * per, d))
    return _norm(pts).astype(np.float32)


def test_kmeans_clusters_separable_data(rng):
    x = _clustered_data(rng, n_clusters=8, per=50)
    centroids, assign = kmeans(x, 8, iters=20, seed=1)
    assign = np.asarray(assign)
    # points from the same true cluster should mostly share a label
    agree = 0
    for c in range(8):
        labels = assign[c * 50:(c + 1) * 50]
        agree += (labels == np.bincount(labels).argmax()).mean()
    assert agree / 8 > 0.9


def test_ivf_exact_when_nprobe_is_nlist(rng):
    x = _clustered_data(rng)
    ids = [f"c{i}" for i in range(len(x))]
    ivf = IVFIndex.build(x, ids, nlist=16, block=128, dtype=np.float32)
    q = x[37] + 0.01 * rng.standard_normal(32).astype(np.float32)
    got_ids, vals, rows = ivf.search(q, k=10, nprobe=16)

    ref = _norm(q[None]) @ x.T
    top = np.argsort(-ref[0])[:10]
    assert [int(r) for r in rows[0]] == list(top)


def test_ivf_recall_at_modest_nprobe(rng):
    x = _clustered_data(rng, n_clusters=32, per=64)
    ids = list(range(len(x)))
    ivf = IVFIndex.build(x, ids, nlist=32, block=128, dtype=np.float32)
    queries = _norm(x[rng.choice(len(x), 20)] +
                    0.05 * rng.standard_normal((20, 32))).astype(np.float32)
    ref = queries @ x.T
    ref_top = np.argsort(-ref, axis=1)[:, :10]
    _ids, _vals, rows = ivf.search(queries, k=10, nprobe=4)
    recall = np.mean([
        len(set(rows[b]) & set(ref_top[b])) / 10 for b in range(20)
    ])
    assert recall >= 0.9, recall


def test_ivf_from_flat_and_roundtrip(tmp_path, rng):
    x = _clustered_data(rng, n_clusters=4, per=40)
    flat = FlatIndex(32, dtype=np.float32)
    flat.add(x, [f"doc{i}" for i in range(len(x))])
    flat.delete(["doc3"])
    ivf = IVFIndex.from_flat(flat, nlist=4, block=64, dtype=np.float32)
    assert len(ivf) == len(x) - 1
    got_ids, _, _ = ivf.search(x[10], k=1, nprobe=4)
    assert got_ids[0][0] == "doc10"
    # tombstoned row is gone
    got3, _, _ = ivf.search(x[3], k=3, nprobe=4)
    assert "doc3" not in got3[0]

    p = str(tmp_path / "ivf.npz")
    ivf.save(p)
    ivf2 = IVFIndex.load(p, dtype=np.float32)
    a = ivf.search(x[10], k=5, nprobe=4)[0]
    b = ivf2.search(x[10], k=5, nprobe=4)[0]
    assert a == b


def test_ivf_small_corpus_fewer_rows_than_k(rng):
    x = _norm(rng.standard_normal((7, 16))).astype(np.float32)
    ivf = IVFIndex.build(x, list(range(7)), nlist=2, block=8, dtype=np.float32)
    ids, vals, rows = ivf.search(x[0], k=20, nprobe=2)
    real = [i for i in ids[0] if i is not None]
    assert set(real) == set(range(7))


def test_save_load_preserves_int_ids(tmp_path):
    """IVFIndex.save must round-trip integer ids as ints (the r2-advice
    id-stringification bug, fixed for PQ/IVFPQ, also lived here)."""
    import numpy as np

    from archi_tpu.engine.ivf_index import IVFIndex

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1024, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = IVFIndex.build(x, list(range(1024)), nlist=8, block=128)
    p = str(tmp_path / "ivf")
    idx.save(p)
    idx2 = IVFIndex.load(p)  # extension-less: save wrote ivf.npz
    ids, _, _ = idx2.search(x[3], k=1, nprobe=8)
    assert ids[0][0] == 3 and isinstance(ids[0][0], int)
