"""Top-k scoring dispatch: fused Pallas kernel on TPU, XLA elsewhere.

Replaces the reference's SQL KNN scan
(``src/data_manager/vectorstore/postgres_vectorstore.py:272-364``).  Two
implementations with identical semantics:

- ``xla_topk``: plain ``Q @ E.T`` + mask + ``jax.lax.top_k``.  XLA fuses the
  mask into the matmul epilogue; the [B, N] score matrix is materialized, so
  this wins only for small corpora (or on CPU in tests).
- ``fused_topk`` (``archi_tpu.ops.pallas_topk``): streaming kernel, one HBM
  pass over the corpus, no score materialization.  The default on TPU.

Selection is automatic by backend, overridable via ``impl=``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from archi_tpu.ops.pallas_topk import NEG_INF, fused_topk


@functools.partial(jax.jit, static_argnames=("k",))
def xla_topk(queries, corpus, alive, n_active, *, k=10):
    """Reference/fallback implementation. Same signature as fused_topk."""
    b, d = queries.shape
    n_pad = corpus.shape[0]
    scores = jnp.dot(
        queries.astype(corpus.dtype), corpus.T, preferred_element_type=jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n_pad), 1)
    valid = (col < jnp.asarray(n_active, jnp.int32)) & (alive[None, :] > 0.5)
    scores = jnp.where(valid, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


def _on_tpu() -> bool:
    """True when the default backend is real TPU hardware.

    The platform may register as 'tpu' or (via tunneled plugins) 'axon', so
    check the device kind too.
    """
    try:
        if jax.default_backend() == "tpu":
            return True
        dev = jax.devices()[0]
        return "TPU" in getattr(dev, "device_kind", "")
    except Exception:  # pragma: no cover
        return False


def topk_scores(queries, corpus, alive, n_active, *, k=10, impl="auto", tile_n=2048):
    """Top-k inner products of ``queries`` against the padded ``corpus``.

    Args:
      queries: [B, D] float array (need not be normalized; cosine semantics
        come from the index storing normalized embeddings).
      corpus: [N_pad, D] padded corpus, N_pad a multiple of ``tile_n``.
      alive: [N_pad] float mask; tombstoned rows are 0.
      n_active: scalar int; rows >= n_active are padding.
      k: number of neighbors.
      impl: "auto" | "pallas" | "xla".
    Returns:
      (vals [B, k] f32, idx [B, k] i32) — idx are physical row positions.
    """
    k = min(int(k), int(corpus.shape[0]))
    if impl == "auto":
        impl = "pallas" if (_on_tpu() and corpus.shape[0] >= tile_n) else "xla"
    if impl == "pallas":
        # The fused kernel keeps the running top-k in a [B, 128]-lane VMEM
        # buffer; larger k (a rarity — hybrid over-fetch caps at 128) and
        # non-tile-multiple corpora fall back to XLA.
        if corpus.shape[0] % tile_n != 0 or k > 128:
            impl = "xla"
        else:
            return fused_topk(
                queries, corpus, alive, n_active, k=k, tile_n=tile_n,
                interpret=not _on_tpu(),
            )
    return xla_topk(queries, corpus, alive, n_active, k=k)
