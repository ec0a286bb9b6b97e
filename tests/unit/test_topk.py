"""Fused top-k kernel vs NumPy brute force (analog of the reference's
mocked-SQL vectorstore tests, tests/unit/test_postgres_vectorstore.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from archi_tpu.engine.topk import topk_scores, xla_topk
from archi_tpu.ops.pallas_topk import fused_topk


def _brute(q, e, alive, n_active, k):
    scores = q.astype(np.float32) @ e.astype(np.float32).T
    scores[:, ~(alive > 0.5)] = -np.inf
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
    # tombstone a few rows
    dead = rng.choice(n_active, size=17, replace=False)
    alive[dead] = 0.0

    vals, idx = topk_scores(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(alive), n_active, k=k, impl=impl
    )
    bv, bi = _brute(q, e, alive, n_active, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    # indices may differ on exact ties; compare via scores
    got_scores = np.take_along_axis(
        (q @ e.T), np.asarray(idx), axis=1
    )
    np.testing.assert_allclose(got_scores, bv, rtol=1e-4, atol=1e-4)


def test_fused_topk_interpret_small(rng):
    b, d, n, k = 2, 64, 1024, 5
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = rng.standard_normal((n, d), dtype=np.float32)
    alive = np.ones(n, np.float32)
    vals, idx = fused_topk(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(alive), n, k=k, tile_n=256,
        interpret=True,
    )
    bv, bi = _brute(q, e, alive, n, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_topk_k_larger_than_alive(rng):
    b, d, n_pad, n_active, k = 1, 32, 512, 3, 10
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = np.zeros((n_pad, d), np.float32)
    e[:n_active] = rng.standard_normal((n_active, d))
    alive = np.zeros(n_pad, np.float32)
    alive[:n_active] = 1.0
    vals, idx = xla_topk(jnp.asarray(q), jnp.asarray(e), jnp.asarray(alive), n_active, k=k)
    vals = np.asarray(vals)
    assert (vals[0, :n_active] > -1e29).all()
    assert (vals[0, n_active:] <= -1e29).all()


def test_topk_k_larger_than_lanes_falls_back(rng):
    """k > 128 must route to the XLA path, not crash the fused kernel
    (found by probing search(k=50000) through FlatIndex)."""
    b, d, n = 2, 32, 4096
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = rng.standard_normal((n, d), dtype=np.float32)
    alive = np.ones(n, np.float32)
    vals, idx = topk_scores(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(alive), n, k=300, impl="pallas"
    )
    assert vals.shape == (b, 300)
    bv, _ = _brute(q, e, alive, n, 300)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)


def test_topk_k_clamped_to_corpus(rng):
    b, d, n = 1, 16, 512
    q = rng.standard_normal((b, d), dtype=np.float32)
    e = rng.standard_normal((n, d), dtype=np.float32)
    alive = np.ones(n, np.float32)
    vals, idx = topk_scores(
        jnp.asarray(q), jnp.asarray(e), jnp.asarray(alive), n, k=10_000
    )
    assert vals.shape == (b, n)
