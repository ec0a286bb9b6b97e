"""Fused top-k kernel vs NumPy brute force (analog of the reference's
mocked-SQL vectorstore tests, tests/unit/test_postgres_vectorstore.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from archi_tpu.engine.topk import alive_to_bias, topk_scores, xla_topk
from archi_tpu.ops.pallas_topk import fused_topk


def _brute(q, e, bias, n_active, k):
    scores = q.astype(np.float32) @ e.astype(np.float32).T + bias[None, :]
    scores[:, n_active:] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("n_active,n_pad", [(1000, 1024), (512, 512), (3000, 4096)])
def test_topk_matches_brute_force(rng, impl, n_active, n_pad):
    b, d, k = 4, 128, 10
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = np.zeros((n_pad, d), np.float32)
    e[:n_active] = rng.standard_normal((n_active, d), dtype=np.float32)
    alive = np.zeros(n_pad, np.float32)
    alive[:n_active] = 1.0
    dead = rng.choice(n_active, size=17, replace=False)
    alive[dead] = 0.0
    bias = np.where(alive > 0.5, 0.0, -1.0e30).astype(np.float32)

    vals, idx = topk_scores(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(bias), n_active, k=k,
        impl=impl, tile_n=512,
    )
    bv, bi = _brute(q, e, bias, n_active, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    got_scores = np.take_along_axis((q @ e.T), np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_scores, bv, rtol=1e-4, atol=1e-4)


def test_fused_topk_interpret_small(rng):
    b, d, n, k = 2, 64, 1024, 5
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = rng.standard_normal((n, d), dtype=np.float32)
    bias = np.zeros(n, np.float32)
    vals, idx = fused_topk(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(bias), n, k=k, tile_n=256,
        interpret=True,
    )
    bv, bi = _brute(q, e, bias, n, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_additive_bias_changes_ranking(rng):
    """Hybrid path: a large positive bias must promote a row to the top."""
    b, d, n, k = 1, 32, 512, 3
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = rng.standard_normal((n, d), dtype=np.float32)
    bias = np.zeros(n, np.float32)
    loser = 77
    bias[loser] = 100.0  # lexical boost
    for impl in ("xla", "pallas"):
        vals, idx = topk_scores(
            jnp.asarray(q), jnp.asarray(e), jnp.asarray(bias), n, k=k,
            impl=impl, tile_n=256,
        )
        assert int(np.asarray(idx)[0, 0]) == loser
        bv, _ = _brute(q, e, bias, n, k)
        np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)


def test_topk_k_larger_than_alive(rng):
    b, d, n_pad, n_active, k = 1, 32, 512, 3, 10
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = np.zeros((n_pad, d), np.float32)
    e[:n_active] = rng.standard_normal((n_active, d))
    alive = np.zeros(n_pad, np.float32)
    alive[:n_active] = 1.0
    bias = np.asarray(alive_to_bias(jnp.asarray(alive)))
    vals, idx = xla_topk(jnp.asarray(q), jnp.asarray(e), jnp.asarray(bias), n_active, k=k)
    vals = np.asarray(vals)
    assert (vals[0, :n_active] > -1e29).all()
    assert (vals[0, n_active:] <= -1e29).all()


def test_topk_k_larger_than_lanes_falls_back(rng):
    """k > 128 must route to the XLA path, not crash the fused kernel
    (found by probing search(k=50000) through FlatIndex)."""
    b, d, n = 2, 32, 4096
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = rng.standard_normal((n, d), dtype=np.float32)
    bias = np.zeros(n, np.float32)
    vals, idx = topk_scores(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(bias), n, k=300, impl="pallas"
    )
    assert vals.shape == (b, 300)
    bv, _ = _brute(q, e, bias, n, 300)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)


def test_topk_k_clamped_to_corpus(rng):
    b, d, n = 1, 16, 512
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = rng.standard_normal((n, d), dtype=np.float32)
    bias = np.zeros(n, np.float32)
    vals, idx = topk_scores(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(bias), n, k=10_000
    )
    assert vals.shape == (b, n)


def test_topk_k_zero(rng):
    """k=0 must return empty results, not crash the fused kernel
    (found by probing hybrid_search(k=0))."""
    q = rng.standard_normal((2, 16), dtype=np.float32)
    e = rng.standard_normal((512, 16), dtype=np.float32)
    bias = np.zeros(512, np.float32)
    for impl in ("xla", "pallas"):
        vals, idx = topk_scores(
            jnp.asarray(q), jnp.asarray(e), jnp.asarray(bias), 512, k=0, impl=impl
        )
        assert vals.shape == (2, 0) and idx.shape == (2, 0)


def test_fused_fallback_is_counted(rng):
    """k>128 silently loses the fused path — the fallback must be counted
    (VERDICT r1 weak #8)."""
    from archi_tpu.engine import topk as topk_mod

    corpus = rng.standard_normal((256, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    bias = np.zeros(256, np.float32)
    before = topk_mod.FUSED_FALLBACKS["count"]
    vals, idx = topk_mod.topk_scores(q, corpus, bias, 256, k=130,
                                     impl="pallas", tile_n=256)
    assert topk_mod.FUSED_FALLBACKS["count"] == before + 1
    assert vals.shape == (2, 130)


def test_topk_clustered_duplicates_pooling_fallback(rng):
    """Adversarial for the strided group-max pooling (r3 kernel): many
    EXACT duplicate rows force >= 2 survivors into one (row, group) —
    the conflict path must fall back to the full-width merge and stay
    exact vs brute force."""
    b, d, n, k = 4, 64, 2048, 10
    base_row = rng.standard_normal((1, d)).astype(np.float32)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e[100:400] = base_row          # 300 adjacent duplicates
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = np.concatenate([base_row / np.linalg.norm(base_row),
                        rng.standard_normal((b - 1, d)).astype(np.float32)])
    bias = np.zeros(n, np.float32)
    for impl in ("xla", "pallas"):
        vals, idx = topk_scores(jnp.asarray(q), jnp.asarray(e),
                                jnp.asarray(bias), n, k=k, impl=impl,
                                tile_n=256)
        bv, _bi = _brute(q, e, bias, n, k)
        np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4,
                                   atol=1e-4, err_msg=impl)
    # all k hits for the duplicate-query land inside the duplicate run
    ids0 = np.asarray(idx)[0]
    assert np.all((ids0 >= 100) & (ids0 < 400))


def test_topk_per_row_thresholds_2d_bias(rng):
    """Per-query 2-D bias through the per-row-threshold merge gate
    (r3 kernel): ranking must match brute force per query."""
    b, d, n, k = 4, 64, 2048, 8
    q = rng.standard_normal((b, d)).astype(np.float32)
    e = rng.standard_normal((n, d)).astype(np.float32)
    bias2 = (rng.standard_normal((b, n)) * 0.5).astype(np.float32)
    vals, idx = topk_scores(jnp.asarray(q), jnp.asarray(e),
                            jnp.asarray(bias2), n, k=k, impl="pallas",
                            tile_n=256)
    scores = q @ e.T + bias2
    bidx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    bv = np.take_along_axis(scores, bidx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.sort(np.asarray(idx), 1),
                                  np.sort(bidx, 1))
