"""PQ codec + flat PQ index: quantization quality, ADC-vs-exact recall,
bias contract (tombstones/filters/hybrid), growth, save/load.

Pure-math tier vs NumPy brute force (SURVEY.md §4 analog of the reference's
mocked-SQL vectorstore tests).
"""

import numpy as np
import pytest

from archi_tpu.engine.pq import PQCodec, PQFlatIndex, adc_topk
from archi_tpu.ops.pallas_topk import NEG_INF

pytestmark = pytest.mark.heavy  # kernel/mesh tier — excluded from the fast default run


def _corpus(rng, n=4096, d=64, clusters=32):
    """Clustered unit vectors — realistic for PQ (pure iid gaussian is the
    worst case and recall targets there are meaningless)."""
    centers = rng.standard_normal((clusters, d)).astype(np.float32)
    x = centers[rng.integers(0, clusters, n)] + \
        0.15 * rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    x = _corpus(rng, n=4096, d=64)
    q = _corpus(rng, n=16, d=64)
    codec = PQCodec.train(x, m=16, iters=8, seed=0)
    return rng, x, q, codec


def test_codebook_shapes(setup):
    _, x, _, codec = setup
    assert codec.codebooks.shape == (16, 256, 4)
    codes = np.asarray(codec.encode(x))
    assert codes.shape == (4096, 16) and codes.dtype == np.uint8


def test_reconstruction_beats_random(setup):
    """Trained codebooks must reconstruct far better than untrained ones."""
    rng, x, _, codec = setup
    rec = np.asarray(codec.decode(codec.encode(x)))
    err = np.mean(np.sum((rec - x) ** 2, axis=1))
    bad = PQCodec(rng.standard_normal((16, 256, 4)).astype(np.float32))
    rec_bad = np.asarray(bad.decode(bad.encode(x)))
    err_bad = np.mean(np.sum((rec_bad - x) ** 2, axis=1))
    assert err < 0.25 * err_bad
    assert err < 0.15  # unit vectors: MSE well under norm


def test_lut_score_equals_decoded_ip(setup):
    """ADC score must equal q · decode(codes) exactly (same math)."""
    _, x, q, codec = setup
    codes = codec.encode(x[:128])
    luts = np.asarray(codec.luts(q[:4]))                  # [4, m, ksub]
    c = np.asarray(codes).astype(int)
    adc = np.stack([
        luts[b, np.arange(16), c].sum(axis=1) for b in range(4)
    ])
    exact_hat = np.asarray(codec.decode(codes)) @ np.asarray(q[:4]).T
    np.testing.assert_allclose(adc, exact_hat.T, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["gather", "onehot"])
def test_recall_vs_exact(setup, impl):
    """PQ's production contract is over-fetch: the exact top-10 must be
    inside the ADC top-100 (full-precision rerank is impossible at config-4
    scale — the original vectors don't fit on the chip)."""
    _, x, q, codec = setup
    idx = PQFlatIndex.build(x, codec=codec, tile=1024)
    _, _, rows = idx.search(q, k=100, impl=impl)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T          # [B, 10]
    hits = sum(len(set(rows[b]) & set(exact[b])) for b in range(q.shape[0]))
    recall = hits / (10 * q.shape[0])
    assert recall >= 0.9, recall
    # and strict @10 must still clear a sanity floor
    _, _, r10 = idx.search(q, k=10, impl=impl)
    hits10 = sum(len(set(r10[b]) & set(exact[b])) for b in range(q.shape[0]))
    assert hits10 / (10 * q.shape[0]) >= 0.35


def test_impls_agree(setup):
    _, x, q, codec = setup
    idx = PQFlatIndex.build(x, codec=codec, tile=1024)
    va, ra = idx.search_dispatch(q, k=10, impl="gather")
    vb, rb = idx.search_dispatch(q, k=10, impl="onehot")
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                               rtol=1e-2, atol=1e-2)
    # rankings may differ on bf16-level ties; top-1 must agree
    assert (np.asarray(ra)[:, 0] == np.asarray(rb)[:, 0]).mean() >= 0.9


def test_bias_tombstone_and_filter(setup):
    _, x, q, codec = setup
    idx = PQFlatIndex.build(x, codec=codec, tile=1024)
    _, _, base = idx.search(q[:2], k=5)
    kill = set(base[0]) | set(base[1])
    bias = np.zeros(len(x), np.float32)
    for r in kill:
        bias[r] = NEG_INF
    _, vals, rows = idx.search(q[:2], k=5, bias=bias)
    assert not (set(rows[0]) | set(rows[1])) & kill
    assert (vals > NEG_INF / 2).all()


def test_bias_hybrid_boost(setup):
    """A large finite bias must pull a row into the top-k (BM25 analog)."""
    _, x, q, codec = setup
    idx = PQFlatIndex.build(x, codec=codec, tile=1024)
    _, _, base = idx.search(q[:1], k=5)
    loser = int((set(range(len(x))) - set(base[0])).pop())
    bias = np.zeros(len(x), np.float32)
    bias[loser] = 10.0
    _, _, rows = idx.search(q[:1], k=5, bias=bias)
    assert rows[0][0] == loser


def test_growth_and_append(setup):
    _, x, q, codec = setup
    idx = PQFlatIndex(codec, capacity=256, tile=1024)
    idx.add(x[:200], ids=[f"a{i}" for i in range(200)])
    cap0 = idx.capacity
    idx.add(x[200:1200], ids=[f"b{i}" for i in range(1000)])
    assert idx.capacity > cap0 and len(idx) == 1200
    ids, _, rows = idx.search(q[:1], k=3)
    assert all(r < 1200 for r in rows[0])
    assert all(isinstance(i, str) for i in ids[0])


def test_empty_padding_never_returned(setup):
    _, x, q, codec = setup
    idx = PQFlatIndex(codec, capacity=4096, tile=1024)
    idx.add(x[:50])
    _, vals, rows = idx.search(q[:4], k=10)
    assert (rows < 50).all() and (vals > NEG_INF / 2).all()


def test_save_load_roundtrip(tmp_path, setup):
    _, x, q, codec = setup
    idx = PQFlatIndex.build(x[:500], ids=[f"d{i}" for i in range(500)],
                            codec=codec, tile=1024)
    p = str(tmp_path / "pq.npz")
    idx.save(p)
    loaded = PQFlatIndex.load(p)
    ia, va, _ = idx.search(q[:4], k=5)
    ib, vb, _ = loaded.search(q[:4], k=5)
    assert ia == ib
    np.testing.assert_allclose(va, vb, rtol=1e-5)
    # loaded index stays appendable
    loaded.add(x[500:600])
    assert len(loaded) == 600


def test_adc_topk_tiling_invariance(setup):
    """Same results whatever the tile split (merge correctness)."""
    import jax.numpy as jnp
    _, x, q, codec = setup
    codes_t = jnp.transpose(codec.encode(x[:2048]))
    luts = codec.luts(q[:4])
    bias = jnp.zeros((2048,), jnp.float32)
    v1, i1 = adc_topk(luts, codes_t, bias, 2000, k=7, tile=2048)
    v2, i2 = adc_topk(luts, codes_t, bias, 2000, k=7, tile=256)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    assert (np.asarray(i1) == np.asarray(i2)).all()


def test_pq_sweep_tool_runs():
    """benchmarking/pq_sweep returns honest three-way recall entries."""
    from archi_tpu.benchmarking.pq_sweep import run_pq_sweep
    res = run_pq_sweep(n=2048, d=32, m=8, refine_m=8, nlist=8, block=128,
                       nprobes=(2, 8), n_queries=8)
    assert len(res) == 2
    for e in res:
        assert {"recall_strict", "recall_in_100", "self_top1", "qps",
                "bytes_per_row"} <= set(e)
        assert e["recall_in_100"] >= e["recall_strict"] - 1e-9
    flat = run_pq_sweep(n=2048, d=32, m=8, nlist=8, flat=True, n_queries=8)
    assert flat[0]["index"] == "pq_flat"


# ------------------------------------------------------------------- OPQ
def _anisotropic(rng, n=2048, d=64, rank=6):
    """Variance concentrated in few directions (what real text embeddings
    look like — the fixture corpus puts 76% of variance in 16/384)."""
    basis = np.linalg.qr(rng.standard_normal((d, d)))[0].astype(np.float32)
    z = rng.standard_normal((n, rank)).astype(np.float32) * 3.0
    x = z @ basis[:rank] + 0.1 * rng.standard_normal((n, d)).astype(
        np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_opq_rotation_learned_and_orthogonal():
    rng = np.random.default_rng(21)
    x = _anisotropic(rng)
    codec = PQCodec.train(x, m=16, iters=6, seed=0, opq_iters=4)
    assert codec.rotation is not None
    r = np.asarray(codec.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(64), atol=1e-4)


def test_opq_cuts_reconstruction_error():
    rng = np.random.default_rng(21)
    x = _anisotropic(rng)
    plain = PQCodec.train(x, m=16, iters=8, seed=0)
    opq = PQCodec.train(x, m=16, iters=8, seed=0, opq_iters=4)
    def mse(c):
        rec = np.asarray(c.decode(c.encode(x)))
        return float(np.mean(np.sum((rec - x) ** 2, axis=1)))
    assert mse(opq) < 0.75 * mse(plain), (mse(opq), mse(plain))


def test_opq_improves_flat_recall_on_anisotropic():
    rng = np.random.default_rng(22)
    x = _anisotropic(rng)
    q = _anisotropic(rng, n=16)
    exact = np.argsort(-(x @ q.T), axis=0)[:10].T
    def recall(idx):
        _, _, rows = idx.search(q, k=10)
        return np.mean([len(set(rows[b]) & set(exact[b])) / 10
                        for b in range(16)])
    plain = PQFlatIndex.build(x, m=16, seed=0, tile=1024)
    opq_codec = PQCodec.train(x, m=16, iters=8, seed=0, opq_iters=4)
    rotated = PQFlatIndex.build(x, codec=opq_codec, tile=1024)
    assert recall(rotated) >= recall(plain)


def test_opq_lut_consistency_and_save_load(tmp_path):
    """ADC scores through the rotated codec still equal q·decode(codes),
    and the rotation survives save/load."""
    rng = np.random.default_rng(23)
    x = _anisotropic(rng, n=512)
    q = _anisotropic(rng, n=4)
    codec = PQCodec.train(x, m=16, iters=6, seed=0, opq_iters=3)
    codes = codec.encode(x[:64])
    luts = np.asarray(codec.luts(q))
    c = np.asarray(codes).astype(int)
    adc = np.stack([luts[b, np.arange(16), c].sum(axis=1) for b in range(4)])
    exact_hat = np.asarray(codec.decode(codes)) @ np.asarray(q).T
    np.testing.assert_allclose(adc, exact_hat.T, rtol=1e-3, atol=1e-3)

    idx = PQFlatIndex.build(x, codec=codec, tile=512)
    p = str(tmp_path / "opq.npz")
    idx.save(p)
    loaded = PQFlatIndex.load(p)
    assert loaded.codec.rotation is not None
    va, ra = idx.search_dispatch(q, k=5)
    vb, rb = loaded.search_dispatch(q, k=5)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-5)
    assert (np.asarray(ra) == np.asarray(rb)).all()
