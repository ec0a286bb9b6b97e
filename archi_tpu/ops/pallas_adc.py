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


def _adc_lut16_kernel(lut_ref, packed_ref, out_ref, *, m, group_js=8):
    """4-bit ADC: lut_ref [m, G, 16] f32; packed_ref [m//2, T] u8 (low
    nibble = subspace 2b, high nibble = 2b+1); out_ref [G, T] f32.

    Subspaces are processed ``group_js`` at a time: their 16-row one-hots
    stack into a [16*group_js, T] block contracted in ONE MXU dot
    (K=128 at group_js=8) — 8x fewer VPU compares than ksub=256 at the
    same bytes/row, and full-K matmuls.
    """
    g = out_ref.shape[0]
    t = out_ref.shape[1]
    acc = jnp.zeros((g, t), jnp.float32)
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, t), 0)
    for j0 in range(0, m, group_js):
        ohs = []
        luts = []
        for j in range(j0, min(j0 + group_js, m)):
            byte = packed_ref[j // 2, :].astype(jnp.int32)     # [T]
            nib = (byte & 15) if j % 2 == 0 else (byte >> 4)
            ohs.append((nib[None, :] == iota16).astype(jnp.bfloat16))
            luts.append(lut_ref[j].astype(jnp.bfloat16))       # [G, 16]
        oh = jnp.concatenate(ohs, axis=0)                      # [16*gj, T]
        lut = jnp.concatenate(luts, axis=1)                    # [G, 16*gj]
        acc = acc + jnp.dot(lut, oh, preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def adc_scores_lut16(luts_mgk, packed_t, *, tile: int = 2048,
                     interpret: bool = False):
    """4-bit ADC scores [G, S]: luts_mgk [m, G, 16] f32, packed_t
    [m//2, S] u8 with two codes per byte (lo nibble = even subspace)."""
    m, g, ksub = luts_mgk.shape
    assert ksub == 16, ksub
    s = packed_t.shape[1]
    assert s % tile == 0 and packed_t.shape[0] == m // 2
    kernel = functools.partial(_adc_lut16_kernel, m=m)
    return pl.pallas_call(
        kernel,
        grid=(s // tile,),
        in_specs=[
            pl.BlockSpec((m, g, 16), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m // 2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, s), jnp.float32),
        interpret=interpret,
    )(luts_mgk, packed_t)


def pack_nibbles(codes):
    """[N, m] uint8 4-bit codes → [N, m//2] packed (lo nibble = even j)."""
    codes = jnp.asarray(codes)
    lo = codes[:, 0::2].astype(jnp.uint8)
    hi = codes[:, 1::2].astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_nibbles(packed):
    """[..., m//2] packed → [..., m] uint8 codes (inverse of pack)."""
    packed = jnp.asarray(packed)
    lo = packed & 15
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(
        *packed.shape[:-1], packed.shape[-1] * 2).astype(jnp.uint8)


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
