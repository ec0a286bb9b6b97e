"""IVF-PQ: coarse inverted-file cells over PQ-coded residuals — the
100M-rows-on-one-chip index (BASELINE config 4).

Two-level structure, the TPU answer to what faiss calls IVFPQ (the
reference's pgvector has nothing at this scale — IVFFlat keeps
full-precision vectors, ``src/cli/templates/init.sql:287-289``):

1. **Coarse**: cosine k-means centroids (``engine.kmeans``, MXU); a query
   scans centroids and probes the ``nprobe`` best cells.
2. **Fine**: each row stores only ``m`` uint8 PQ codes of its RESIDUAL
   ``r = x - centroid[cell]``.  Residuals are ~2-4x smaller in norm than
   the vectors, so the same code budget quantizes much finer — this is the
   recall lever that flat PQ lacks.  The reported score is
   ``q·centroid + q·r̂  ~=  q·x`` — the coarse term comes free from the
   probe matmul.

Memory at 100M x 384-d, nlist 64k, m=48: codes 4.8 GB + centroids 100 MB
+ layout tables ~ well inside one v5e's 16 GB.  Full-corpus bf16 would be
77 GB.

Layout and search reuse the IVF machinery (``engine.ivf_index``): rows are
re-ordered cell-contiguously into fixed ``[n_blocks, blk, m]`` uint8 blocks
(static shapes; a query gathers whole blocks), queries run in groups so
candidate scoring is real matmuls, and the per-row additive-bias contract
(tombstones / filters as NEG_INF, hybrid BM25 as finite values) rides the
same block-layout path.  ADC uses the one-hot MXU contraction measured
6-13x faster than TPU gathers in ``engine.pq``.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.engine.flat_index import jsonable_ids, load_npz
from archi_tpu.engine.ivf_index import _bias_to_block_layout, cell_block_layout
from archi_tpu.engine.kmeans import kmeans
from archi_tpu.engine.pq import PQCodec, _split_subspaces, _pq_assign
from archi_tpu.ops.pallas_topk import NEG_INF


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "group",
                                              "with_bias", "adc_impl",
                                              "approx_extract",
                                              "approx_recall", "hier_t"))
def _ivfpq_search(queries, centroids, code_blocks, block_rows_valid,
                  cell_blocks, codebooks, rot1, bias_by_slot, *, k, nprobe,
                  group=8, with_bias=False, adc_impl="xla",
                  approx_extract=False, approx_recall=0.95, hier_t=0):
    """queries [B, D] (B % group == 0); code_blocks [n_blocks, blk, mc] u8
    where mc = m (8-bit codes) or m//2 (packed 4-bit nibbles, ksub=16);
    codebooks [m, ksub, ds]; rot1 [D, D] — the stage-1 OPQ rotation
    (identity when OPQ is off), applied to the LUT query stream only (the
    coarse centroid scores use the unrotated query); rest as
    ``_ivf_search``.
    → (vals [B, k], flat candidate positions [B, k] = block_id*blk + slot).

    Score of a candidate = q·centroid(owning cell) + ADC(q, residual codes)
    [+ bias].  adc_impl:
    - "xla": one-hot MXU contraction per subspace (any backend),
    - "pallas": fused VMEM one-hot kernel (8-bit codes, TPU),
    - "lut16": fused 4-bit kernel over packed nibbles (TPU) — 8x fewer
      VPU compares at the same bytes/row.
    """
    from archi_tpu.ops.pallas_adc import (adc_scores, adc_scores_lut16,
                                          adc_scores_xla, unpack_nibbles)

    blk = code_blocks.shape[1]
    m, ksub, ds = codebooks.shape
    packed = code_blocks.shape[2] == m // 2 and ksub == 16
    max_bpc = cell_blocks.shape[1]
    d = queries.shape[1]
    per_q = nprobe * max_bpc  # block slots owned by each query
    bias2d = with_bias and bias_by_slot.ndim == 3

    def one_group(args):  # qg [G, D], bias_g [G, nb, blk] | placeholder
        qg, bias_g = args
        g_sz = qg.shape[0]
        cscores = jnp.dot(qg, centroids.T,
                          preferred_element_type=jnp.float32)
        cv, cells = jax.lax.top_k(cscores, nprobe)           # [G, nprobe]
        bids = cell_blocks[cells].reshape(-1)                # [G*per_q]
        valid_block = bids >= 0
        safe = jnp.where(valid_block, bids, 0)
        p = safe.shape[0]
        cand = code_blocks[safe].reshape(p * blk, -1)        # [P*blk, mc] u8

        qg_r = jnp.dot(qg, rot1, preferred_element_type=jnp.float32)
        luts = jnp.einsum(
            "gmd,mkd->mgk", qg_r.reshape(g_sz, m, ds), codebooks,
            preferred_element_type=jnp.float32)              # [m, G, ksub]

        tile = 1024 if blk % 1024 == 0 else blk
        if adc_impl == "lut16":
            scores = adc_scores_lut16(luts, jnp.transpose(cand), tile=tile)
        elif adc_impl == "pallas":
            scores = adc_scores(luts, jnp.transpose(cand), tile=tile)
        else:
            codes_t = jnp.transpose(
                unpack_nibbles(cand) if packed else cand)     # [m, P*blk]
            scores = adc_scores_xla(luts, codes_t)

        # + q·centroid of the probed cell that owns each slot.  Flat block
        # slot s belongs to query s // per_q and its probe (s % per_q) //
        # max_bpc; non-owned (query, slot) pairs get the wrong centroid
        # score here but are masked to NEG_INF below, so adding the owner's
        # cscore broadcast across the group is exact.
        probe_of_slot = (
            jax.lax.broadcasted_iota(jnp.int32, (g_sz, per_q), 1) // max_bpc)
        cslot = jnp.take_along_axis(cv, probe_of_slot, axis=1)  # [G, per_q]
        scores = scores + jnp.repeat(cslot.reshape(-1), blk)[None, :]

        owner = jax.lax.broadcasted_iota(jnp.int32, (g_sz, p), 1) // per_q
        mine = owner == jax.lax.broadcasted_iota(jnp.int32, (g_sz, p), 0)
        slot_ok = mine & valid_block[None, :]
        row_ok = block_rows_valid[safe].reshape(-1) > 0.5     # [P*blk]
        mask = jnp.repeat(slot_ok, blk, axis=1) & row_ok[None, :]
        if with_bias and bias2d:
            scores = scores + bias_g[:, safe, :].reshape(g_sz, -1)
        elif with_bias:
            scores = scores + bias_by_slot[safe].reshape(-1)[None, :]
        scores = jnp.where(mask, scores, NEG_INF)
        kk = min(k, scores.shape[1])
        w = scores.shape[1]
        if hier_t > 0 and w % blk == 0 and p * min(hier_t, blk) >= kk:
            # hierarchical exact-per-block extraction — see
            # _ivfpq_search_blocks for the design note
            bt = min(hier_t, blk)
            s3 = scores.reshape(g_sz, p, blk)
            v3, p3 = jax.lax.top_k(s3, bt)               # [G, p, bt]
            fp = (jax.lax.broadcasted_iota(jnp.int32, (g_sz, p, bt), 1)
                  * blk + p3).reshape(g_sz, -1)
            vals, f = jax.lax.top_k(v3.reshape(g_sz, -1), kk)
            pos = jnp.take_along_axis(fp, f, axis=1)
            g = safe[pos // blk] * blk + pos % blk
            return vals, g.astype(jnp.int32)
        if (approx_extract and kk >= 64 and w % blk == 0 and blk >= 256
                and w >= 16 * kk and w // blk >= 8):
            # Wide-k candidate extraction via TPU ApproxTopK (PartialReduce)
            # instead of the full sort lax.top_k lowers to — the stage-1
            # candidate set feeds a refinement rescore (and usually a host
            # exact rerank), so a recall_target'd extraction loses nothing
            # the overfetch didn't already budget for.  One hazard: the
            # reduction windows are CONTIGUOUS in the last dim, and
            # near-duplicate corpus rows sit in ADJACENT slots of the same
            # cell block (cell-contiguous reorder) — a window would keep
            # one survivor per duplicate run.  The strided relayout below
            # scatters formerly-adjacent slots w//blk apart (>> any window
            # ApproxTopK picks for kk >= 64), so duplicate runs land in
            # distinct windows; the r-direction neighbors it creates are
            # one whole block apart in the cell — uncorrelated clusters.
            r_dim = w // blk
            s2 = jnp.swapaxes(
                scores.reshape(g_sz, r_dim, blk), 1, 2).reshape(g_sz, w)
            vals, f = jax.lax.approx_max_k(
                s2, kk, recall_target=approx_recall)
            pos = (f % r_dim) * blk + f // r_dim
        else:
            vals, pos = jax.lax.top_k(scores, kk)
        g = safe[pos // blk] * blk + pos % blk
        return vals, g.astype(jnp.int32)

    b = queries.shape[0]
    n_groups = b // group
    qs = queries.reshape(n_groups, group, d)
    if bias2d:
        bias_gs = bias_by_slot.reshape(
            n_groups, group, *bias_by_slot.shape[1:])
    else:
        bias_gs = jnp.zeros((n_groups, group, 1, 1), jnp.float32)
    vals, gpos = jax.lax.map(one_group, (qs, bias_gs))
    return vals.reshape(b, -1), gpos.reshape(b, -1)


@functools.partial(jax.jit, static_argnames=("k", "nprobe_blocks", "group",
                                              "with_bias", "adc_impl",
                                              "approx_extract",
                                              "approx_recall", "cell_gate",
                                              "sub", "hier_t"))
def _ivfpq_search_blocks(queries, centroids, block_centroids, block_cell,
                         code_blocks, block_rows_valid, codebooks, rot1,
                         bias_by_slot, *, k, nprobe_blocks, group=1,
                         with_bias=False, adc_impl="xla",
                         approx_extract=False, approx_recall=0.95,
                         cell_gate: int | None = None, sub: int = 1,
                         hier_t: int = 0):
    """Block-budget probing: rank individual code BLOCKS by their own
    mini-centroid score and ADC exactly ``nprobe_blocks`` blocks per query.

    Cell probing (``_ivfpq_search``) gathers ``max_bpc`` blocks for every
    probed cell — work scales with the SKEW of the k-means cell sizes
    (the padding waste is pure overhead), and a big cell that ranks high
    drags all of its blocks in even when the query's true neighbors fill
    one of them.  Here the second-level quantizer is free: blocks are
    already cell-contiguous, so a per-block centroid (mean of the block's
    rows) ranks exactly where high scorers live, at single-block
    granularity, and the probe budget is exact — ``nprobe_blocks * blk``
    slots, no padding.  Scoring is unchanged: candidates are still scored
    as q·centroid(owning cell) + ADC(residual codes) [+ bias], so results
    are identical to cell probing whenever both probe sets cover the same
    blocks.
    """
    from archi_tpu.ops.pallas_adc import (adc_scores, adc_scores_lut16,
                                          adc_scores_xla, unpack_nibbles)

    blk = code_blocks.shape[1]
    m, ksub, ds = codebooks.shape
    packed = code_blocks.shape[2] == m // 2 and ksub == 16
    b, d = queries.shape
    npb = nprobe_blocks

    # One [B, nlist] + one [B, n_blocks] MXU scan for the whole batch
    # (NOT per group — the block-centroid matrix streams from HBM once).
    cscores_all = jnp.dot(queries, centroids.T,
                          preferred_element_type=jnp.float32)
    bscores = jnp.dot(queries.astype(block_centroids.dtype),
                      block_centroids.T,
                      preferred_element_type=jnp.float32)  # [B, nb*sub]
    if sub > 1:
        # Sub-block ranking: block_centroids holds `sub` mini-centroids
        # per block (block-major layout); a block ranks by its BEST
        # sub-centroid.  A 512-row block spans several natural clusters,
        # so its mean dilutes the one cluster the query matches ~sub-fold
        # — measured at 100M (64-dupe clusters), missed GT rows' blocks
        # ranked ~2000th by diluted mean while their cells ranked ~200th.
        # Max-pooling over finer means recovers the undiluted signal.
        bscores = bscores.reshape(b, -1, sub).max(axis=2)  # [B, n_blocks]
    if cell_gate is not None and cell_gate < centroids.shape[0]:
        # Two-level gate: only blocks whose owning cell ranks in the
        # query's top-`cell_gate` cells compete in the block ranking.
        # Block mini-centroids are diluted means (several natural clusters
        # per block), so ungated ranking races a ~0.3-sigma signal against
        # the max of n_blocks noise draws; gating shrinks the noise field
        # by nlist/cell_gate at the cost of one [B, n_blocks] gather.
        cv, _ = jax.lax.top_k(cscores_all, cell_gate)      # [B, P]
        tau = cv[:, -1:]                                   # [B, 1]
        cs_blk = jnp.take(cscores_all, block_cell, axis=1)  # [B, n_blocks]
        bscores = jnp.where(cs_blk >= tau, bscores, NEG_INF)
    _, bids_all = jax.lax.top_k(bscores, npb)              # [B, npb]
    # owning-cell coarse score of every probed block, per owner query
    cs_own = jnp.take_along_axis(
        cscores_all, block_cell[bids_all], axis=1)         # [B, npb]
    q_rot = jnp.dot(queries, rot1, preferred_element_type=jnp.float32)

    bias2d = with_bias and bias_by_slot.ndim == 3

    def one_group(args):  # per-group: gather + ADC + extract
        qg_r, bids, cs_g, bias_g = args
        g_sz = qg_r.shape[0]
        bflat = bids.reshape(-1)                           # [P], P = G*npb
        p = bflat.shape[0]
        cand = code_blocks[bflat].reshape(p * blk, -1)     # [P*blk, mc] u8

        luts = jnp.einsum(
            "gmd,mkd->mgk", qg_r.reshape(g_sz, m, ds), codebooks,
            preferred_element_type=jnp.float32)            # [m, G, ksub]
        tile = 1024 if blk % 1024 == 0 else blk
        if adc_impl == "lut16":
            scores = adc_scores_lut16(luts, jnp.transpose(cand), tile=tile)
        elif adc_impl == "pallas":
            scores = adc_scores(luts, jnp.transpose(cand), tile=tile)
        else:
            codes_t = jnp.transpose(
                unpack_nibbles(cand) if packed else cand)  # [m, P*blk]
            scores = adc_scores_xla(luts, codes_t)

        # + q·centroid(owning cell).  Slot s (block bp = s // blk) is owned
        # by query bp // npb; cs_g.reshape(-1)[bp] is that owner's coarse
        # score, so the broadcast add is exact for owned slots and wrong
        # only where the owner mask kills the score anyway.
        scores = scores + jnp.repeat(cs_g.reshape(-1), blk)[None, :]

        owner = jax.lax.broadcasted_iota(jnp.int32, (g_sz, p), 1) // npb
        mine = owner == jax.lax.broadcasted_iota(jnp.int32, (g_sz, p), 0)
        row_ok = block_rows_valid[bflat].reshape(-1) > 0.5
        mask = jnp.repeat(mine, blk, axis=1) & row_ok[None, :]
        if with_bias and bias2d:
            scores = scores + bias_g[:, bflat, :].reshape(g_sz, -1)
        elif with_bias:
            scores = scores + bias_by_slot[bflat].reshape(-1)[None, :]
        scores = jnp.where(mask, scores, NEG_INF)

        kk = min(k, scores.shape[1])
        w = scores.shape[1]
        if hier_t > 0 and w % blk == 0 and p * min(hier_t, blk) >= kk:
            # Hierarchical exact-per-block extraction: lax.top_k over the
            # FULL probed width is a sort of nprobe_blocks*blk slots per
            # query (4.2M at the config-4 headline) and dominates the
            # device step at high probe budgets.  Selecting the top
            # `hier_t` WITHIN each 512-slot block first (cheap: batched
            # short-row sorts) and then merging the p*hier_t survivors
            # exactly cuts the final sort width by blk/hier_t (8-16x).
            # The only loss vs exact: a block contributing > hier_t of
            # the true top-kk candidates gets truncated.  Blocks are
            # cell-contiguous, so that happens when one near-duplicate
            # cluster inside a block outpopulates hier_t — size hier_t
            # at >= the corpus's duplicate-cluster size (the config-4
            # measurement: hier_t=64 = cluster size, zero recall loss).
            bt = min(hier_t, blk)
            s3 = scores.reshape(g_sz, p, blk)
            v3, p3 = jax.lax.top_k(s3, bt)               # [G, p, bt]
            fp = (jax.lax.broadcasted_iota(jnp.int32, (g_sz, p, bt), 1)
                  * blk + p3).reshape(g_sz, -1)
            vals, f = jax.lax.top_k(v3.reshape(g_sz, -1), kk)
            pos = jnp.take_along_axis(fp, f, axis=1)
        elif (approx_extract and kk >= 64 and w % blk == 0 and blk >= 256
                and w >= 16 * kk and w // blk >= 8):
            # same strided anti-duplicate relayout as _ivfpq_search
            r_dim = w // blk
            s2 = jnp.swapaxes(
                scores.reshape(g_sz, r_dim, blk), 1, 2).reshape(g_sz, w)
            vals, f = jax.lax.approx_max_k(
                s2, kk, recall_target=approx_recall)
            pos = (f % r_dim) * blk + f // r_dim
        else:
            vals, pos = jax.lax.top_k(scores, kk)
        g = bflat[pos // blk] * blk + pos % blk
        return vals, g.astype(jnp.int32)

    n_groups = b // group
    qs = q_rot.reshape(n_groups, group, d)
    bids_gs = bids_all.reshape(n_groups, group, npb)
    cs_gs = cs_own.reshape(n_groups, group, npb)
    if bias2d:
        bias_gs = bias_by_slot.reshape(
            n_groups, group, *bias_by_slot.shape[1:])
    else:
        bias_gs = jnp.zeros((n_groups, group, 1, 1), jnp.float32)
    vals, gpos = jax.lax.map(one_group, (qs, bids_gs, cs_gs, bias_gs))
    return vals.reshape(b, -1), gpos.reshape(b, -1)


@functools.partial(jax.jit, static_argnames=("k", "packed"))
def _refine_rescore(vals, rows, luts2, refine_codes, *, k, packed=False):
    """Re-score stage-1 candidates with the refinement codebook.

    vals/rows [B, C] from stage 1 (rows are ORIGINAL row ids, -1 dead);
    luts2 [B, m2, ksub]; refine_codes [N, m2] uint8 (or [N, m2//2] packed
    nibbles when ksub=16) in original row order.
    → (vals [B, k], rows [B, k]).  Dead/tombstoned slots (NEG_INF) stay
    dead — adding a finite ADC term cannot resurrect them.
    """
    b, c = vals.shape
    safe = jnp.clip(rows, 0, refine_codes.shape[0] - 1)
    rc = refine_codes[safe]                                # [B, C, mc]
    if packed:
        from archi_tpu.ops.pallas_adc import unpack_nibbles

        rc = unpack_nibbles(rc)
    rc = rc.astype(jnp.int32)                              # [B, C, m2]
    adc2 = jnp.sum(
        jnp.take_along_axis(
            luts2[:, None, :, :],                          # [B, 1, m2, ksub]
            rc[:, :, :, None], axis=3
        )[..., 0], axis=-1)                                # [B, C]
    scores = jnp.where(vals > NEG_INF / 2, vals + adc2, vals)
    kk = min(k, c)
    nv, pos = jax.lax.top_k(scores, kk)
    return nv, jnp.take_along_axis(rows, pos, axis=1)


class IVFPQIndex:
    """Built from a device-resident snapshot of normalized embeddings.

    Optional **refinement stage** (``refine_m > 0``, faiss-IVFPQR style):
    a second PQ codebook encodes the residual left over after stage 1
    (``x - centroid - decode1(codes1)``), stored in ORIGINAL row order so
    it needs no cell reorder (the 2x-buffer reorder peak is what caps
    stage-1 size at 100M rows).  Search re-scores the stage-1 top-C with
    the refinement ADC — candidate-bound, so its cost is O(B*C*m2), not
    O(corpus).
    """

    def __init__(self, centroids, codec: PQCodec, code_blocks, block_rows,
                 cell_blocks, ids, *, refine_codec: PQCodec | None = None,
                 refine_codes=None, block_centroids=None):
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.codec = codec
        # avoid a same-dtype astype copy: at 100M rows the code blocks are
        # ~5 GB and a transient duplicate is the difference between fitting
        # and OOM (buffer donation is not honored through the tunnel)
        if isinstance(code_blocks, jax.Array) and \
                code_blocks.dtype == jnp.uint8:
            self.code_blocks = code_blocks
        else:
            self.code_blocks = self._h2d(
                np.asarray(code_blocks).astype(np.uint8, copy=False))
        self.block_rows = np.asarray(block_rows)   # [n_blocks, blk] (-1 pad)
        # int32 on host BEFORE upload (halves the transfer, skips the int64
        # device buffer); validity mask derived on device, not re-uploaded
        self._block_rows_dev = jnp.asarray(
            self.block_rows.astype(np.int32, copy=False))
        self.block_rows_valid = (self._block_rows_dev >= 0).astype(
            jnp.float32)
        self.cell_blocks = jnp.asarray(cell_blocks, jnp.int32)
        self._ids = list(ids) if ids is not None else None
        # occupied SLOTS (> distinct rows when spill duplicates exist) —
        # cached: block_rows is ~0.5 GB at 100M scale and the spill check
        # on every ADC-only search() must not rescan it
        self._n_slots = int((self.block_rows >= 0).sum())
        self._n_rows = self._n_slots if ids is None else len(self._ids)
        self.nlist = self.centroids.shape[0]
        self.block = self.code_blocks.shape[1]
        self.dim = self.centroids.shape[1]
        # packed 4-bit mode: ksub=16 codes stored two-per-byte
        self.packed = (codec.ksub == 16 and
                       self.code_blocks.shape[2] == codec.m // 2)
        # host mirrors of large code arrays (populated by build_streaming,
        # which pays for the d2h when HBM still has headroom); save()
        # prefers these over re-downloading under post-build pressure
        self._host_mirror: dict[str, np.ndarray] = {}
        # block-budget probing state: per-block mini-centroids (lazily
        # decoded from the codes on first use — see ensure_block_centroids)
        # and the block → owning-cell map derived from cell_blocks.
        self.block_centroids = (None if block_centroids is None
                                else jnp.asarray(block_centroids))
        # sub-block ranking granularity: blocks rank by the MAX of `sub`
        # finer mini-centroids (set via ensure_block_centroids(sub=) or
        # the block_rank_sub config knob; derived from shape on load)
        self._bc_sub = (1 if block_centroids is None else
                        max(1, int(self.block_centroids.shape[0]
                                   // self.code_blocks.shape[0])))
        self.block_rank_sub = self._bc_sub
        cb_h = np.asarray(cell_blocks)
        n_blocks = self.code_blocks.shape[0]
        bc_map = np.zeros((n_blocks,), np.int32)
        valid_cb = cb_h >= 0
        bc_map[cb_h[valid_cb]] = (
            np.nonzero(valid_cb.reshape(-1))[0] // cb_h.shape[1]
        ).astype(np.int32)
        self._block_cell_dev = jnp.asarray(bc_map)
        self.refine_codec = refine_codec
        if refine_codes is None:
            self.refine_codes = None
        elif isinstance(refine_codes, jax.Array) and \
                refine_codes.dtype == jnp.uint8:
            self.refine_codes = refine_codes   # no astype copy (see above)
        else:
            self.refine_codes = self._h2d(
                np.asarray(refine_codes).astype(np.uint8, copy=False))

    @staticmethod
    def _h2d(arr_np: np.ndarray, chunk_bytes: int = 32 << 20):
        """Host->device upload in bounded slices (the mirror of ``_d2h``:
        this rig's relay bounds single staged transfers, and a one-shot
        jnp.asarray of a multi-GB code array would also transiently
        double host RAM).  Chunks land in a donated device buffer via
        dynamic_update_slice — no transient device-side duplicate."""
        if arr_np.nbytes <= chunk_bytes or arr_np.ndim == 0 \
                or not arr_np.shape[0]:
            return jnp.asarray(arr_np)
        rows = max(1, int(chunk_bytes) // max(1, arr_np.nbytes
                                              // arr_np.shape[0]))
        upd = jax.jit(
            lambda b, c, s: jax.lax.dynamic_update_slice_in_dim(b, c, s, 0),
            donate_argnums=0)
        buf = jnp.zeros(arr_np.shape, arr_np.dtype)
        s = 0
        while s < arr_np.shape[0]:
            if s + rows > arr_np.shape[0]:
                # tail: re-slice the LAST full window (rewrites a few
                # already-written rows with identical data) so every
                # chunk has one shape -> ONE compiled program total
                s = arr_np.shape[0] - rows
            buf = upd(buf, jnp.asarray(arr_np[s:s + rows]),
                      jnp.asarray(s, jnp.int32))
            s += rows
        return buf

    def _id_of(self, row: int):
        return self._ids[row] if self._ids is not None else row

    def __len__(self) -> int:
        return self._n_rows

    # ------------------------------------------------------------------ build
    @staticmethod
    def _train_codecs(r_sample, m, refine_m, *, ksub, pq_iters, seed, ns,
                      opq_iters=0):
        """Stage-1 codec on coarse residuals (optionally OPQ-rotated);
        optional refinement codec on what stage 1 leaves behind.  The
        leftover r2 = r - decode(encode(r)) is computed in the ORIGINAL
        space (decode un-rotates), so the refine codec can learn its own
        rotation independently."""
        codec = PQCodec.train(r_sample, m, ksub=ksub, iters=pq_iters,
                              seed=seed, sample=ns, opq_iters=opq_iters)
        codec2 = None
        if refine_m:
            r2 = r_sample - codec.decode(codec.encode(r_sample))
            codec2 = PQCodec.train(r2, refine_m, ksub=ksub, iters=pq_iters,
                                   seed=seed + 1, sample=ns,
                                   opq_iters=opq_iters)
        return codec, codec2

    @classmethod
    def build_device(cls, x, ids=None, *, nlist: int = 1024,
                     block: int = 512, m: int = 48, ksub: int = 256,
                     coarse_iters: int = 10, pq_iters: int = 12,
                     seed: int = 0, train_sample: int = 1 << 18,
                     encode_block: int = 1 << 20,
                     refine_m: int = 0, opq_iters: int = 0) -> "IVFPQIndex":
        """Build from a DEVICE-resident normalized corpus ``x [N, D]``.

        Only the 4-byte/row assignment vector round-trips the host (for the
        block-layout computation); residuals are formed, PQ-trained, and
        encoded on device in blocks, then reordered with ONE device gather
        of the (tiny) codes."""
        x = jnp.asarray(x)
        n, d = x.shape
        nlist = max(1, min(nlist, n))
        centroids, assign = kmeans(x, nlist, iters=coarse_iters, seed=seed)
        assign = jnp.asarray(assign)

        # PQ on residuals: train on a sample, encode everything, in blocks
        # so HBM never holds corpus + residuals at full scale.
        rng = np.random.default_rng(seed)
        ns = min(n, train_sample)
        rows = jnp.asarray(np.sort(rng.choice(n, size=ns, replace=False)))
        r_sample = x[rows].astype(jnp.float32) - centroids[assign[rows]]
        codec, codec2 = cls._train_codecs(
            r_sample, m, refine_m, ksub=ksub, pq_iters=pq_iters, seed=seed,
            ns=ns, opq_iters=opq_iters)
        del r_sample

        from archi_tpu.ops.pallas_adc import pack_nibbles

        pack4 = ksub == 16

        @jax.jit
        def encode_resid(xb, ab):
            rb = xb.astype(jnp.float32) - centroids[ab]
            codes = _pq_assign(_split_subspaces(codec._rotate(rb), m),
                               codec.codebooks, ksub=codec.ksub)
            c1 = jnp.transpose(codes).astype(jnp.uint8)      # [Nb, m]
            c1_out = pack_nibbles(c1) if pack4 else c1
            if codec2 is None:
                return c1_out, c1_out
            r2 = rb - codec.decode(c1)   # decode un-rotates: original space
            codes2 = _pq_assign(_split_subspaces(codec2._rotate(r2),
                                                 refine_m),
                                codec2.codebooks, ksub=codec2.ksub)
            c2 = jnp.transpose(codes2).astype(jnp.uint8)
            return c1_out, (pack_nibbles(c2) if pack4 else c2)

        parts, rparts = [], []
        for s in range(0, n, encode_block):
            c1, c2 = encode_resid(x[s: s + encode_block],
                                  assign[s: s + encode_block])
            parts.append(c1)
            if codec2 is not None:
                rparts.append(c2)
        codes = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        refine_codes = None
        if codec2 is not None:
            refine_codes = (rparts[0] if len(rparts) == 1
                            else jnp.concatenate(rparts))

        assign_h = np.asarray(assign)
        gather, cb = cell_block_layout(assign_h, nlist, block)
        n_blocks = gather.shape[0] // block
        safe = jnp.asarray(np.where(gather >= 0, gather, 0))
        mc = int(codes.shape[1])   # m, or m//2 when nibble-packed
        code_blocks = jax.jit(
            lambda cc, ss: cc[ss].reshape(n_blocks, block, mc)
        )(codes, safe)
        block_rows = gather.reshape(n_blocks, block)
        return cls(centroids, codec, code_blocks, block_rows, cb, ids,
                   refine_codec=codec2, refine_codes=refine_codes)

    @classmethod
    def build(cls, embeddings, ids=None, **kw) -> "IVFPQIndex":
        """Host-array convenience wrapper (tests / small corpora)."""
        x = np.asarray(embeddings, np.float32)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return cls.build_device(jnp.asarray(x), ids, **kw)

    @classmethod
    def build_streaming(cls, block_fn, n_blocks: int, block_rows: int,
                        ids=None, *, nlist: int = 2048, block: int = 1024,
                        m: int = 48, ksub: int = 256, coarse_iters: int = 8,
                        pq_iters: int = 10, seed: int = 0,
                        train_blocks: int = 2,
                        train_sample: int = 1 << 18,
                        pq_train_sample: int = 1 << 18,
                        refine_m: int = 0,
                        opq_iters: int = 0,
                        spill_frac: float = 0.0) -> "IVFPQIndex":
        """Build when the corpus can NEVER be fully device-resident
        (config 4: 100M x 384 bf16 = 77 GB vs 16 GB HBM).

        ``block_fn(i) -> [block_rows, D]`` yields normalized corpus blocks
        (device arrays); it MUST be deterministic in ``i`` — the corpus is
        streamed in two passes (the tunneled backend does not honor buffer
        donation, so a single-pass design would double-allocate its staging
        buffers at exactly the scale where that cannot fit):

        1. **assign pass**: coarse-assign every block; only the 4 B/row
           assignment vector lands on the host.
        2. layout computed on host → **encode pass**: re-generate each
           block, PQ-encode its residuals, scatter codes STRAIGHT into
           their final cell-contiguous positions (one small scatter per
           block; refinement codes append in original order).

        Peak HBM = final code blocks (N*m bytes) + refine codes churn +
        one corpus block — ~12 GB at N=100M, m=48, refine_m=32.

        ``spill_frac`` > 0 enables **probe-spill** (the multi-assignment
        idea behind ScaNN's spilled trees / SOAR): the ``spill_frac``
        of rows with the SMALLEST top-1 → top-2 coarse-score margin (the
        cell-boundary rows, whose misrank is what bounds probe-budget
        recall — VERDICT r3 weak #1) are ADDITIONALLY encoded into their
        second-nearest cell's blocks.  Both copies carry the same
        ORIGINAL row id, so search semantics are unchanged except that
        the candidate stream can contain duplicates — the host rerank
        dedups them (``exact_rerank``); code size grows by spill_frac.
        Caveat: the refinement ADC indexes refine codes by original row,
        which matches the PRIMARY copy's stage-1 code — with a rerank
        tier that mismatch is irrelevant (the host rescore is exact); on
        the ADC-only path spilled duplicates carry a slightly-off refined
        score (still a strict upper bound of extra candidates — the
        primary copy is always present too).
        """
        rng = np.random.default_rng(seed)

        # ---- 1. train coarse + codecs on sampled blocks
        tb = [jnp.asarray(block_fn(i), jnp.float32)
              for i in sorted(rng.choice(n_blocks,
                                         size=min(train_blocks, n_blocks),
                                         replace=False))]
        sample = jnp.concatenate(tb) if len(tb) > 1 else tb[0]
        if sample.shape[0] > train_sample:
            keep = jnp.asarray(np.sort(rng.choice(
                sample.shape[0], size=train_sample, replace=False)))
            sample = sample[keep]
        ns = int(sample.shape[0])
        nlist = max(1, min(nlist, ns))
        centroids, s_assign = kmeans(sample, nlist, iters=coarse_iters,
                                     seed=seed)
        # The codecs train on a SUBSAMPLE of the coarse-training sample:
        # only the coarse quantizer needs ~100 rows/cell at large nlist,
        # while _train_codecs materializes several [ns, D] f32 arrays
        # (encode/decode round-trip for the refinement residual) — at
        # ns=2M that alone exhausts HBM.
        pq_ns = min(ns, pq_train_sample)
        if pq_ns < ns:
            pk = jnp.asarray(np.sort(rng.choice(ns, size=pq_ns,
                                                replace=False)))
            resid = sample[pk] - centroids[s_assign[pk]]
        else:
            resid = sample - centroids[s_assign]
        codec, codec2 = cls._train_codecs(
            resid, m, refine_m, ksub=ksub, pq_iters=pq_iters, seed=seed,
            ns=pq_ns, opq_iters=opq_iters)
        del sample, resid, tb

        # ---- pass A: assignments only (host keeps 4 B/row).  Row-chunked
        # ON DEVICE via lax.map: the [rows, nlist] f32 score matrix must
        # stay ~1 GB (a full 1M-row block at nlist=16384 would be 68 GB);
        # one download per block, not per chunk (the relay round-trip
        # would dominate otherwise)
        a_chunk = max(8192, (1 << 28) // max(nlist, 1))
        while block_rows % a_chunk:
            a_chunk //= 2

        # bf16 inputs + f32 accumulation: assignment is a nearest-centroid
        # argmax — input rounding moves only knife-edge ties (either cell
        # is equally valid; the index stores whatever was assigned), and
        # the bf16 MXU path is ~4x the f32 throughput (1.3 PFLOP of
        # assign matmuls at 100M x nlist=16k)
        cent_bf = centroids.astype(jnp.bfloat16)
        spill = float(spill_frac) > 0.0 and nlist > 1

        @jax.jit
        def assign_block(xb):
            def one(xc):
                cs = jnp.dot(xc.astype(jnp.bfloat16), cent_bf.T,
                             preferred_element_type=jnp.float32)
                if spill:
                    v2, i2 = jax.lax.top_k(cs, 2)
                    return (i2.astype(jnp.int32),
                            (v2[:, 0] - v2[:, 1]).astype(jnp.float32))
                return jnp.argmax(cs, axis=1).astype(jnp.int32)

            xb2 = xb.reshape(block_rows // a_chunk, a_chunk, xb.shape[1])
            out = jax.lax.map(one, xb2)
            if spill:
                i2, mg = out
                return (i2.reshape(block_rows, 2), mg.reshape(block_rows))
            return out.reshape(block_rows)

        n = n_blocks * block_rows
        assign_h = np.empty((n,), np.int32)
        assign2_h = np.empty((n,), np.int32) if spill else None
        margin_h = np.empty((n,), np.float32) if spill else None
        for i in range(n_blocks):
            s = i * block_rows
            if spill:
                i2, mg = jax.device_get(assign_block(
                    jnp.asarray(block_fn(i))))
                assign_h[s: s + block_rows] = i2[:, 0]
                assign2_h[s: s + block_rows] = i2[:, 1]
                margin_h[s: s + block_rows] = mg
            else:
                assign_h[s: s + block_rows] = np.asarray(
                    assign_block(jnp.asarray(block_fn(i))))

        # ---- layout on host over ENTRIES (rows + spilled duplicates);
        # block_rows maps slots to ORIGINAL rows so everything downstream
        # (bias by row, ids, refine codes, host rerank) is unchanged
        if spill:
            tau = float(np.quantile(margin_h, spill_frac))
            extra = np.nonzero(margin_h <= tau)[0]   # sorted by row
            assign_ext = np.concatenate([assign_h, assign2_h[extra]])
        else:
            extra = np.zeros((0,), np.int64)
            assign_ext = assign_h
        n_ent = n + extra.shape[0]
        orig_ext = np.concatenate([np.arange(n, dtype=np.int64), extra])
        gather, cb = cell_block_layout(assign_ext, nlist, block)
        nb = gather.shape[0] // block
        dest = np.empty((n_ent,), np.int64)
        alive = gather >= 0
        dest[gather[alive]] = np.nonzero(alive)[0]
        gather = np.where(alive, orig_ext[np.clip(gather, 0, None)], -1)

        # ---- pass B: stage-1 encode + scatter into final layout.
        # The un-donated scatter double-buffers code_flat (2x N*mc bytes
        # transiently); nothing else big is live during this pass.
        from archi_tpu.ops.pallas_adc import pack_nibbles, unpack_nibbles

        pack4 = ksub == 16
        mc = m // 2 if pack4 else m

        @jax.jit
        def encode1_block(xb, ab):
            rb = xb.astype(jnp.float32) - centroids[ab]
            codes = _pq_assign(_split_subspaces(codec._rotate(rb), m),
                               codec.codebooks, ksub=codec.ksub)
            c1 = jnp.transpose(codes).astype(jnp.uint8)
            return pack_nibbles(c1) if pack4 else c1

        @jax.jit
        def scatter_codes(flat, c1, pos):
            return flat.at[pos].set(c1)

        @jax.jit
        def encode_scatter_spill(flat, xb, idx, ab, pos):
            # spilled duplicates: same corpus rows, SECOND-nearest cell's
            # residual; padded entries carry pos >= flat rows → dropped
            xs = jnp.take(xb, idx, axis=0)
            rb = xs.astype(jnp.float32) - centroids[ab]
            codes = _pq_assign(_split_subspaces(codec._rotate(rb), m),
                               codec.codebooks, ksub=codec.ksub)
            c1 = jnp.transpose(codes).astype(jnp.uint8)
            c1 = pack_nibbles(c1) if pack4 else c1
            return flat.at[pos].set(c1, mode="drop")

        # fixed spill-chunk size per corpus block so ONE compiled program
        # covers every block (padded entries are dropped by position)
        s_max = 0
        if spill and extra.shape[0]:
            per_blk = np.bincount(extra // block_rows, minlength=n_blocks)
            s_max = int(per_blk.max())
            s_max += (-s_max) % 128 or 128   # pad granule

        code_flat = jnp.zeros((nb * block, mc), jnp.uint8)
        for i in range(n_blocks):
            s = i * block_rows
            ab = jnp.asarray(assign_h[s: s + block_rows])
            xb = jnp.asarray(block_fn(i))
            c1 = encode1_block(xb, ab)
            code_flat = scatter_codes(code_flat, c1,
                                      jnp.asarray(dest[s: s + block_rows]))
            if s_max:
                js, je = np.searchsorted(extra, [s, s + block_rows])
                idx = np.zeros((s_max,), np.int32)
                cells = np.zeros((s_max,), np.int32)
                pos = np.full((s_max,), nb * block, np.int64)  # OOB = drop
                cnt = je - js
                idx[:cnt] = (extra[js:je] - s).astype(np.int32)
                cells[:cnt] = assign2_h[extra[js:je]]
                pos[:cnt] = dest[n + js: n + je]
                code_flat = encode_scatter_spill(
                    code_flat, xb, jnp.asarray(idx), jnp.asarray(cells),
                    jnp.asarray(pos))
        code_flat.block_until_ready()
        # Host mirror of the settled stage-1 codes, pulled NOW — the one
        # moment HBM holds only code_flat (~N*mc bytes) and nothing else
        # big, so the sliced d2h has maximal headroom.  save() then never
        # re-downloads under post-build pressure (observed: even 1-8 MB
        # slice pulls RESOURCE_EXHAUSTED once refine codes + mirrors of
        # the build were resident).  ~N*mc bytes of host RAM.
        codes_host = cls._d2h(code_flat)

        # ---- pass C (refine only): regenerate blocks, decode the settled
        # stage-1 codes back (gather by dest position — no re-encode), PQ
        # the leftover residual.  Parts are staged through HOST RAM
        # (N*m2 bytes) and uploaded once: a device-side concatenate would
        # put stage-1 codes + parts + output live simultaneously — over
        # HBM at 100M.
        refine_host = None
        if codec2 is not None:
            @jax.jit
            def refine_block(flat, xb, ab, pos):
                rb = xb.astype(jnp.float32) - centroids[ab]
                c1 = flat[pos]
                r2 = rb - codec.decode(
                    unpack_nibbles(c1) if pack4 else c1)
                codes2 = _pq_assign(_split_subspaces(codec2._rotate(r2),
                                                     refine_m),
                                    codec2.codebooks, ksub=codec2.ksub)
                c2 = jnp.transpose(codes2).astype(jnp.uint8)
                return pack_nibbles(c2) if pack4 else c2

            refine_host = np.empty(
                (n, refine_m // 2 if pack4 else refine_m), np.uint8)
            for i in range(n_blocks):
                s = i * block_rows
                refine_host[s: s + block_rows] = np.asarray(refine_block(
                    code_flat, jnp.asarray(block_fn(i)),
                    jnp.asarray(assign_h[s: s + block_rows]),
                    jnp.asarray(dest[s: s + block_rows])))

        # Reshape BEFORE the refine upload, then free the flat alias: the
        # standalone reshape dispatch double-buffers the ~N*mc stage-1
        # codes (donation is not honored through the tunnel), and with
        # spill both copies + resident refine codes cross HBM
        # (2x5.5 + 4.8 GB at 100M rows / spill 0.15 — the r4 build OOM).
        # Ordered this way the peaks are 2x stage-1, THEN stage-1 +
        # refine — each ~5 GB under the old combined peak.
        code_blocks = code_flat.reshape(nb, block, mc)
        code_blocks.block_until_ready()
        code_flat.delete()
        refine_codes = (jnp.asarray(refine_host)
                        if refine_host is not None else None)
        block_rows_map = gather.reshape(nb, block)
        idx = cls(centroids, codec, code_blocks, block_rows_map, cb, ids,
                  refine_codec=codec2, refine_codes=refine_codes)
        # with spill the slot count exceeds the row count (duplicates);
        # len() must stay the number of DISTINCT rows
        idx._n_rows = n if ids is None else len(idx._ids)
        # host mirrors (already paid for above / staged by pass C) let
        # save() skip every large d2h
        idx._host_mirror = {"code_blocks": codes_host.reshape(nb, block, mc)}
        if codec2 is not None:
            idx._host_mirror["refine_codes"] = refine_host
        return idx

    # ------------------------------------------------------- block centroids
    def ensure_block_centroids(self, *, chunk_blocks: int = 256,
                               dtype=jnp.float32, sub: int | None = None):
        """Per-block mini-centroids for block-budget probing, decoded from
        the stored codes (centroid(cell) + mean decoded residual over the
        block's valid rows, L2-normalized).  Needs no corpus access, so it
        works on a loaded index; quantization error is the PQ error —
        negligible for ranking blocks.  Cached; included in save().

        sub: mini-centroids per block — the block ranks by the MAX of its
        `sub` sub-slice means (block rows are appended in ingest order, so
        natural clusters are near-contiguous within a block and finer
        means stay near-pure).  sub=1 is the classic diluted whole-block
        mean; sub=8 at block=512 gives 64-row granularity.  Defaults to
        ``self.block_rank_sub``.

        dtype: bf16 halves the [n_blocks*sub, D] footprint and the
        per-batch HBM stream at small-block scale (100M rows / block=256
        → 393k blocks); ranking signals are ~0.1-1.0 apart, far above
        bf16 rounding."""
        if sub is None:
            sub = self.block_rank_sub
        sub = max(1, int(sub))
        nb, blk, mc = self.code_blocks.shape
        if blk % sub:
            raise ValueError(f"block={blk} not divisible by sub={sub}")
        if (self.block_centroids is not None and self._bc_sub == sub
                and self.block_centroids.dtype == jnp.dtype(dtype)):
            # cache hit requires the DTYPE too: a loaded index carries its
            # saved (typically bf16) matrix, and a later f32 request must
            # rebuild, not silently return the coarser one
            return self.block_centroids
        if self.packed:
            from archi_tpu.ops.pallas_adc import unpack_nibbles

        sb = blk // sub
        parts = []
        for s in range(0, nb, chunk_blocks):
            e = min(s + chunk_blocks, nb)
            cb = e - s
            flat = self.code_blocks[s:e].reshape(cb * blk, mc)
            if self.packed:
                flat = unpack_nibbles(flat)
            # decode row-chunks internally ([m, chunk, ds] is lane-padded
            # ds→128 on TPU, so one big decode would materialize ~16x)
            dec = self.codec.decode(flat)                    # [cB*blk, D]
            valid_c = self.block_rows_valid[s:e]             # [cB, blk]
            dec = dec.reshape(cb, blk, -1) * valid_c[:, :, None]
            d = dec.shape[-1]
            cnt = valid_c.reshape(cb, sub, sb).sum(axis=2)   # [cB, sub]
            mean_r = dec.reshape(cb, sub, sb, d).sum(axis=2) \
                / jnp.maximum(cnt, 1.0)[:, :, None]          # [cB, sub, D]
            bc = self.centroids[self._block_cell_dev[s:e]][:, None, :] \
                + mean_r
            # zero all-pad sub-slices: a zero vector scores 0, far below
            # any real match's cosine, so it never enters the top budget
            bc = bc * (cnt > 0).astype(jnp.float32)[:, :, None]
            bc = bc / jnp.maximum(
                jnp.linalg.norm(bc, axis=2, keepdims=True), 1e-12)
            parts.append(bc.reshape(cb * sub, d).astype(dtype))
        bc = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        self.block_centroids = bc
        self._bc_sub = sub
        self.block_rank_sub = sub
        return bc

    # ----------------------------------------------------------------- search
    def search_dispatch(self, queries, k: int = 10, *, nprobe: int = 64,
                        nprobe_blocks: int | None = None,
                        cell_gate: int | None = None,
                        bias=None, normalize_queries: bool = True,
                        vmem_budget_rows: int = 1 << 17,
                        refine_overfetch: int = 8,
                        extract: str = "auto",
                        approx_recall: float = 0.95,
                        hier_t: int = 64):
        """Device-only: → (vals [B, k] f32 dev, original rows [B, k] i32 dev,
        -1 for dead slots).  With a refinement stage, stage 1 over-fetches
        ``refine_overfetch * k`` candidates and the refinement ADC re-ranks
        them down to k.

        extract: stage-1 candidate extraction.  "exact" = lax.top_k (a full
        sort over every probed slot — the measured wall-clock majority at
        high nprobe x wide k); "approx" = TPU ApproxTopK at
        ``approx_recall``; "hier" = per-block top-``hier_t`` partial
        selection then an exact merge of the survivors (cuts the final
        sort width blk/hier_t-fold; lossless unless one block holds
        > hier_t of the true top-k — size hier_t >= the corpus's
        near-duplicate cluster size); "auto" = approx only when a
        refinement stage will re-rank the candidates anyway (and we're on
        TPU, and stage-1 k is wide enough to matter).

        nprobe_blocks: when set, probe by BLOCK budget instead of cell
        count — rank individual code blocks by per-block mini-centroid
        score and ADC exactly this many blocks per query (see
        ``_ivfpq_search_blocks``); ``nprobe`` is then ignored."""
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        nprobe = min(nprobe, self.nlist)
        max_bpc = int(self.cell_blocks.shape[1])
        if nprobe_blocks is not None:
            nprobe_blocks = int(min(nprobe_blocks,
                                    self.code_blocks.shape[0]))
            self.ensure_block_centroids()
        # measured v5e optimum (8.4M, nlist=4096): candidate work scales
        # ~G^2 per group (each member re-scores the whole group's gathered
        # blocks), so small groups win — target ~128k candidate slots per
        # group, never more than 4 queries
        if nprobe_blocks is not None:
            rows_per_q = max(nprobe_blocks * self.block, 1)
        else:
            rows_per_q = max(nprobe * max_bpc * self.block, 1)
        group = max(1, min(4, vmem_budget_rows // rows_per_q, b))
        pad = (-b) % group
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.zeros((pad, self.dim), jnp.float32)], axis=0)
        if normalize_queries:
            queries = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        if bias is not None:
            bb = jnp.asarray(bias, jnp.float32)
            if bb.ndim == 2 and pad:
                # queries were padded to a group multiple — the per-query
                # bias batch axis must pad with them (reshape into groups
                # crashes otherwise)
                bb = jnp.concatenate(
                    [bb, jnp.zeros((pad, bb.shape[1]), jnp.float32)], axis=0)
            bias_by_slot = _bias_to_block_layout(
                bb, self._block_rows_dev,
                self.block_rows_valid)
        else:
            bias_by_slot = self.block_rows_valid  # placeholder, unused
        k1 = k
        if self.refine_codec is not None:
            probed_rows = (nprobe_blocks * self.block
                           if nprobe_blocks is not None
                           else nprobe * max_bpc * self.block)
            k1 = min(max(k * refine_overfetch, 64), probed_rows)
        from archi_tpu.utils.hardware import on_tpu

        adc_impl = ("lut16" if self.packed else "pallas") if on_tpu() \
            else "xla"
        if extract == "auto":
            # approx only when stage-1 k is an OVERFETCH the refine stage
            # prunes (k1 > k): at k1 == k the extraction picks the final
            # candidate set itself, and ApproxTopK's recall_target comes
            # straight out of candidate recall (measured -4pp at 8.4M)
            approx = (on_tpu() and self.refine_codec is not None
                      and k1 >= 256 and k1 > k)
        else:
            approx = extract == "approx"
        ht = int(hier_t) if extract == "hier" else 0
        rot1 = (self.codec.rotation if self.codec.rotation is not None
                else jnp.eye(self.dim, dtype=jnp.float32))
        if nprobe_blocks is not None:
            vals, gpos = _ivfpq_search_blocks(
                queries, self.centroids, self.block_centroids,
                self._block_cell_dev, self.code_blocks,
                self.block_rows_valid, self.codec.codebooks, rot1,
                bias_by_slot, k=k1, nprobe_blocks=nprobe_blocks,
                group=group, with_bias=bias is not None, adc_impl=adc_impl,
                approx_extract=approx, approx_recall=float(approx_recall),
                cell_gate=(None if cell_gate is None else int(cell_gate)),
                sub=self._bc_sub, hier_t=ht,
            )
        else:
            vals, gpos = _ivfpq_search(
                queries, self.centroids, self.code_blocks,
                self.block_rows_valid, self.cell_blocks,
                self.codec.codebooks,
                rot1, bias_by_slot, k=k1, nprobe=nprobe, group=group,
                with_bias=bias is not None, adc_impl=adc_impl,
                approx_extract=approx, approx_recall=float(approx_recall),
                hier_t=ht,
            )
        vals, gpos = vals[:b], gpos[:b]
        rows = jnp.where(
            vals > -1e29,
            jnp.take(self._block_rows_dev.reshape(-1), gpos),
            -1,
        ).astype(jnp.int32)
        if self.refine_codec is not None:
            luts2 = self.refine_codec.luts(queries[:b])
            vals, rows = _refine_rescore(
                vals, rows, luts2, self.refine_codes, k=k,
                packed=(self.refine_codec.ksub == 16 and
                        self.refine_codes.shape[1]
                        == self.refine_codec.m // 2))
        return vals, rows

    def search(self, queries, k: int = 10, *, nprobe: int = 64,
               nprobe_blocks: int | None = None,
               cell_gate: int | None = None, bias=None,
               normalize_queries: bool = True,
               vmem_budget_rows: int = 1 << 17,
               rerank_store=None, rerank_overfetch: int = 4,
               refine_overfetch: int | None = None, extract: str = "auto",
               approx_recall: float = 0.95, hier_t: int = 64):
        """bias: f32 by ORIGINAL row — same contract as IVFIndex.search.

        rerank_store: optional ``HostVectorStore`` holding the full
        vectors (row-aligned with this index).  When given, the device
        returns ``rerank_overfetch * k`` ADC candidates and the host tier
        re-scores them exactly — strict recall becomes exact-bound instead
        of quantization-bound (``docs/pq_scale.md``)."""
        if refine_overfetch is None:
            # with a host exact-rerank tier, stage-1 returns exactly the
            # rerank candidate set (k1 == C): the refinement rescore is a
            # pure reorder the host redoes exactly, so over-fetching for
            # it costs device time and adds nothing (measured at 8.4M:
            # rfo=8 approx 131 ms vs rfo=1 exact 31 ms at EQUAL candidate
            # recall).  Without the rerank tier the refine ADC is the
            # final scorer and over-fetch genuinely buys strict recall.
            refine_overfetch = 1 if rerank_store is not None else 8
        k1 = k if rerank_store is None else max(k, rerank_overfetch * k)
        spill_dup = self._n_slots > self._n_rows
        if rerank_store is None and spill_dup:
            # spilled rows can occupy two of the top-k slots; over-fetch so
            # the post-dedup truncation still returns k live rows
            k1 = 2 * k
        vals, rows = self.search_dispatch(
            queries, k1, nprobe=nprobe, nprobe_blocks=nprobe_blocks,
            cell_gate=cell_gate, bias=bias,
            normalize_queries=normalize_queries,
            vmem_budget_rows=vmem_budget_rows,
            refine_overfetch=refine_overfetch, extract=extract,
            approx_recall=approx_recall, hier_t=hier_t)
        if rerank_store is not None:
            from archi_tpu.engine.host_store import exact_rerank

            q = np.asarray(queries, np.float32)
            if q.ndim == 1:
                q = q[None, :]
            if normalize_queries:
                q = q / np.maximum(
                    np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            # one tree fetch, not two sequential np.asarray pulls — on a
            # relay-tunneled device each blocking pull is a full RTT
            vals_h, rows_h = jax.device_get((vals, rows))
            vals, rows = exact_rerank(rerank_store, q, vals_h, rows_h,
                                      k=k, bias=bias)
        vals = np.asarray(vals)
        rows_out = np.asarray(rows)
        if rerank_store is None and spill_dup:
            # spilled index, no rerank tier: the ADC top-k can hold the
            # same original row twice — keep the better-scored copy
            # (vals are already descending per query, so the first
            # occurrence mark_duplicate_rows keeps is the best)
            from archi_tpu.engine.host_store import mark_duplicate_rows

            dup = mark_duplicate_rows(rows_out)
            vals = np.where(dup, NEG_INF, vals)
            rows_out = np.where(dup, -1, rows_out)
            order = np.argsort(-vals, axis=1, kind="stable")
            vals = np.take_along_axis(vals, order, axis=1)[:, :k]
            rows_out = np.take_along_axis(rows_out, order, axis=1)[:, :k]
        ids_out = [
            [self._id_of(int(r)) if int(r) >= 0 else None for r in rr]
            for rr in rows_out
        ]
        return ids_out, vals, rows_out

    # -------------------------------------------------------------- serialize
    @staticmethod
    def _d2h(arr, chunk_bytes: int = 8 << 20) -> np.ndarray:
        """Device->host copy in bounded slices.

        A one-shot np.asarray of a multi-GB code array stages the whole
        transfer at once, which exhausts the transfer path at 100M-row
        scale (observed: RESOURCE_EXHAUSTED saving ~5.5 GB refine codes;
        a 256 MB slice ALSO exhausted it — this rig's TPU relay bounds a
        single staged transfer somewhere under that, the same reason the
        host-store fill uploads in 3 MB sub-slices).  Small slices land
        in one preallocated host buffer; on a ResourceExhausted the
        chunk halves and the slice retries (floor 1 MB).
        """
        arr = jnp.asarray(arr)
        if arr.ndim == 0 or not arr.shape[0] or arr.nbytes <= (1 << 20):
            return np.asarray(arr)
        row_bytes = max(1, arr.nbytes // arr.shape[0])
        rows = max(1, int(chunk_bytes) // row_bytes)
        out = np.empty(arr.shape, dtype=np.dtype(arr.dtype))
        s = 0
        while s < arr.shape[0]:
            try:
                out[s:s + rows] = np.asarray(arr[s:s + rows])
                s += rows
            except Exception:
                if rows == 1 or rows * row_bytes <= (1 << 20):
                    # can't shrink further (a single row may exceed the
                    # 1 MB floor) — surface the real failure
                    raise
                rows = max(1, rows // 2)
        return out

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        extra = {}
        if self.refine_codec is not None:
            extra["refine_codebooks"] = np.asarray(
                self.refine_codec.codebooks)
            if self.refine_codec.rotation is not None:
                extra["refine_rotation"] = np.asarray(
                    self.refine_codec.rotation)
            extra["refine_codes"] = (
                self._host_mirror.get("refine_codes")
                if self._host_mirror.get("refine_codes") is not None
                else self._d2h(self.refine_codes))
        if self.block_centroids is not None:
            # bf16 can't round-trip plain npz (numpy loads the custom
            # dtype as void V2) — store a uint16 bit view
            bc = self._d2h(self.block_centroids.astype(jnp.bfloat16))
            extra["block_centroids_u16"] = bc.view(np.uint16)
        arrays = dict(
            centroids=self._d2h(self.centroids),
            code_blocks=(self._host_mirror.get("code_blocks")
                         if self._host_mirror.get("code_blocks") is not None
                         else self._d2h(self.code_blocks)),
            block_rows=self.block_rows,
            cell_blocks=self._d2h(self.cell_blocks),
            **self.codec.save_arrays(),
            **extra,
            meta=json.dumps({"ids": None if self._ids is None
                             else jsonable_ids(self._ids),
                             # distinct rows (slots > rows under spill)
                             "n_rows": self._n_rows}),
        )
        # PQ codes are near-uniform bytes: zlib buys ~nothing and costs
        # minutes at the 10 GB scale — store big indexes uncompressed
        total = sum(getattr(a, "nbytes", 0) for a in arrays.values())
        savez = np.savez if total > (2 << 30) else np.savez_compressed
        savez(path, **arrays)

    @classmethod
    def load(cls, path: str, *, drop_refine: bool = False) -> "IVFPQIndex":
        """drop_refine: skip the refine codec + its codes entirely (never
        uploaded to the device).  Safe whenever searches run with
        ``refine_overfetch=1`` + an exact host rerank tier: the refine
        stage then reorders the same candidate set the host rescores
        exactly, so it cannot change results — and its ~5.3 GB of codes
        (at 100M rows, m=96 packed) are the HBM headroom the sub=16
        block-centroid ranking needs."""
        z = load_npz(path)
        meta = json.loads(str(z["meta"]))
        codec = PQCodec.from_arrays(
            {"codebooks": z["codebooks"],
             **({"rotation": z["rotation"]} if "rotation" in z else {})})
        codec2 = refine_codes = None
        if drop_refine:
            pass
        elif "refine_codebooks" in z:
            codec2 = PQCodec.from_arrays(
                {"codebooks": z["refine_codebooks"],
                 **({"rotation": z["refine_rotation"]}
                    if "refine_rotation" in z else {})})
            refine_codes = z["refine_codes"]
        bc = None
        if "block_centroids_u16" in z:
            import ml_dtypes

            bc = np.asarray(z["block_centroids_u16"]).view(
                ml_dtypes.bfloat16)
        elif "block_centroids" in z:   # older f32 checkpoints
            bc = z["block_centroids"]
        idx = cls(z["centroids"], codec, z["code_blocks"], z["block_rows"],
                  z["cell_blocks"], meta["ids"], refine_codec=codec2,
                  refine_codes=refine_codes, block_centroids=bc)
        if meta.get("n_rows") is not None:
            idx._n_rows = int(meta["n_rows"])
        return idx
