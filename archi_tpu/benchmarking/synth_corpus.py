"""Deterministic clustered synthetic corpus for BASELINE config 4.

One definition shared by the build/sweep (``scripts/run_config4.py``) and
the host-store fill (``scripts/fill_host_store.py``): both must see
bit-identical blocks, and TPU vs CPU backends do NOT produce identical
bits for this generator (verified: normal/rsqrt precision differs), so
every consumer must generate on the same backend and share this exact
function.

Corpus model: N_CLUSTERS = N/64 unit-norm cluster centers, each row a
center + 0.3σ noise, renormalized — 64 near-duplicates per cluster, the
adversarial density for PQ strict recall (``docs/pq_scale.md``).  Centers
derive lazily from ``fold_in(PRNGKey(7), cluster_id)`` so 1.5M+ centers
never materialize; blocks are pure functions of (key, block_id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

D = 384
BLOCK_ROWS = 1 << 20


def make_block_fn(key, n_blocks: int, *, d: int = D,
                  block_rows: int = BLOCK_ROWS):
    """→ ``block_fn(i) -> [block_rows, d] bf16 device array`` (jitted)."""
    n_clusters = max(1024, (n_blocks * block_rows) // 64)

    @jax.jit
    def gen_block_(key, i):
        kb = jax.random.fold_in(key, i)
        cid = jax.random.randint(jax.random.fold_in(kb, 0), (block_rows,),
                                 0, n_clusters)
        ckeys = jax.vmap(lambda c: jax.random.fold_in(
            jax.random.PRNGKey(7), c))(cid)
        centers = jax.vmap(
            lambda k: jax.random.normal(k, (d,), jnp.float32))(ckeys)
        noise = 0.3 * jax.random.normal(jax.random.fold_in(kb, 1),
                                        (block_rows, d), jnp.float32)
        v = centers + noise
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                            1e-12)
        return v.astype(jnp.bfloat16)

    def block_fn(i):
        return gen_block_(key, i)

    return block_fn
