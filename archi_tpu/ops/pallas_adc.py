"""Fused PQ-ADC scoring kernel: one-hot built in VMEM, contracted on the
MXU, never materialized in HBM.

The XLA formulation of TPU ADC (``engine/pq.py`` / ``engine/ivfpq_index``)
expands codes into per-subspace one-hot matrices and contracts them with
the query LUTs.  XLA materializes those masks: at a 393k-slot candidate
set that is ~19 GB of HBM write+read per batch — the measured stage-1
floor (~10-30 ms) is exactly that traffic, not compute.

This kernel tiles the candidate axis; per tile it loads only the uint8
codes (m bytes/row), loops subspaces building the ``[ksub, T]`` one-hot in
VMEM scratch-free registers, and accumulates ``lut_j @ onehot`` into a
``[G, T]`` f32 block.  HBM traffic drops to the code bytes — ~500x less.

Layouts (chosen for TPU tiling):
- ``codes_t [m, S]`` uint8 — subspace-major so the kernel's per-j row
  slice is contiguous (the [S, m=48] layout would lane-pad 48→128).
- ``luts [m, G, ksub]`` f32 — leading-dim j indexing inside the loop.

Used by both the IVF-PQ grouped search (candidate sets) and the flat PQ
scan (corpus tiles).  CPU/tests run the interpreter or the XLA fallback —
semantics are identical (parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adc_kernel(lut_ref, codes_ref, out_ref, *, m, ksub):
    """lut_ref [m, G, ksub] f32; codes_ref [m, T] u8; out_ref [G, T] f32.

    The subspace loop is a STATIC Python unroll (m is small and fixed):
    Mosaic cannot prove alignment for a dynamic row index into the uint8
    VMEM tile (int8 sublane tiling), and static indices also let it
    pipeline the per-j one-hot + dot chain."""
    g = out_ref.shape[0]
    t = out_ref.shape[1]
    acc = jnp.zeros((g, t), jnp.float32)
    for j in range(m):
        codes_j = codes_ref[j, :].astype(jnp.int32)            # [T]
        oh = (codes_j[None, :] ==
              jax.lax.broadcasted_iota(jnp.int32, (ksub, t), 0)
              ).astype(jnp.bfloat16)                           # [ksub, T]
        lut_j = lut_ref[j].astype(jnp.bfloat16)                # [G, ksub]
        acc = acc + jnp.dot(lut_j, oh,
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret"))
def adc_scores(luts_mgk, codes_t, *, tile: int = 2048,
               interpret: bool = False):
    """→ scores [G, S] f32 where scores[g, s] = Σ_j luts[j, g, codes[j, s]].

    luts_mgk: [m, G, ksub] f32; codes_t: [m, S] uint8, S % tile == 0.
    """
    m, g, ksub = luts_mgk.shape
    s = codes_t.shape[1]
    assert s % tile == 0, (s, tile)
    kernel = functools.partial(_adc_kernel, m=m, ksub=ksub)
    return pl.pallas_call(
        kernel,
        grid=(s // tile,),
        in_specs=[
            pl.BlockSpec((m, g, ksub), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, s), jnp.float32),
        interpret=interpret,
    )(luts_mgk, codes_t)


def adc_scores_xla(luts_mgk, codes_t):
    """Reference/fallback with identical semantics (any backend)."""
    def step(acc, lut_codes):
        lut_j, codes_j = lut_codes             # [G, ksub], [S]
        oh = (codes_j[None, :].astype(jnp.int32) ==
              jax.lax.broadcasted_iota(
                  jnp.int32, (lut_j.shape[1], codes_j.shape[0]), 0)
              ).astype(jnp.bfloat16)
        return acc + jnp.dot(lut_j.astype(jnp.bfloat16), oh,
                             preferred_element_type=jnp.float32), None

    g = luts_mgk.shape[1]
    s = codes_t.shape[1]
    acc0 = jnp.zeros((g, s), jnp.float32)
    out, _ = jax.lax.scan(step, acc0, (luts_mgk, codes_t))
    return out
