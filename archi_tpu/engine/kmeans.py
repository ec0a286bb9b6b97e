"""Batched Lloyd's k-means on TPU — the IVF centroid trainer.

The TPU-native replacement for pgvector's IVFFlat list training
(``src/cli/templates/init.sql:287-289``).  Assignment is one big MXU matmul
(``x @ centroids.T`` + argmax) and the update is a segment-sum — both
XLA-friendly, so training a 1M x 384 corpus into 1024 lists takes seconds
per iteration on a single chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _assign(x, centroids, *, k):
    # cosine/IP assignment (inputs normalized by caller)
    scores = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def _update(x, assign, *, k):
    sums = jax.ops.segment_sum(x.astype(jnp.float32), assign, num_segments=k)
    counts = jax.ops.segment_sum(
        jnp.ones((x.shape[0],), jnp.float32), assign, num_segments=k
    )
    means = sums / jnp.maximum(counts[:, None], 1.0)
    # re-normalize for cosine; empty clusters keep their previous centroid
    norms = jnp.linalg.norm(means, axis=1, keepdims=True)
    means = means / jnp.maximum(norms, 1e-12)
    return means, counts


def kmeans(
    x: np.ndarray | jax.Array,
    k: int,
    *,
    iters: int = 15,
    seed: int = 0,
    batch: int = 1 << 18,
):
    """→ (centroids [k, D] f32, assignments [N] i32).

    x must be L2-normalized (cosine k-means).  Large N is processed in
    device batches so HBM holds at most one batch + centroids.
    """
    # keep x in its stored dtype (bf16 corpora stay 2 bytes/elem in HBM —
    # an 8M x 384 corpus as f32 would not leave room for the IVF blocks);
    # matmuls accumulate in f32, segment sums cast per batch.
    x = jnp.asarray(x)
    n, d = x.shape
    k = min(k, n)
    # bound the [batch, k] f32 assignment-score buffer to ~1 GB — at
    # nlist=4096 the default 262k batch would materialize 4.3 GB and OOM
    # next to a device-resident corpus (config-4 builds)
    batch = min(batch, max(8192, (1 << 28) // max(k, 1)))
    rng = np.random.default_rng(seed)
    init_idx = rng.choice(n, size=k, replace=False)
    centroids = x[jnp.asarray(np.sort(init_idx))].astype(jnp.float32)

    n_batches = max(1, int(np.ceil(n / batch)))
    for _ in range(iters):
        if n_batches == 1:
            assign = _assign(x, centroids, k=k)
            new_c, counts = _update(x, assign, k=k)
        else:
            sums = jnp.zeros((k, d), jnp.float32)
            counts = jnp.zeros((k,), jnp.float32)
            for b in range(n_batches):
                xb = x[b * batch:(b + 1) * batch]
                ab = _assign(xb, centroids, k=k)
                sums = sums + jax.ops.segment_sum(
                    xb.astype(jnp.float32), ab, num_segments=k)
                counts = counts + jax.ops.segment_sum(
                    jnp.ones((xb.shape[0],), jnp.float32), ab,
                    num_segments=k,
                )
            means = sums / jnp.maximum(counts[:, None], 1.0)
            new_c = means / jnp.maximum(
                jnp.linalg.norm(means, axis=1, keepdims=True), 1e-12
            )
        # keep old centroid where a cluster went empty
        centroids = jnp.where(counts[:, None] > 0, new_c, centroids)

    if n_batches == 1:
        assign = _assign(x, centroids, k=k)
    else:
        assign = jnp.concatenate([
            _assign(x[b * batch:(b + 1) * batch], centroids, k=k)
            for b in range(n_batches)
        ])
    return centroids, assign
