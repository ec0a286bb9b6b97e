"""IVF (inverted-file) approximate index on TPU.

The TPU-native equivalent of pgvector's IVFFlat index
(``src/cli/templates/init.sql:287-289``): chunks are k-means-clustered into
``nlist`` cells (``archi_tpu.engine.kmeans``, trained on the MXU) and a
query scans only the ``nprobe`` nearest cells.

TPU layout (static shapes — SURVEY.md §7 "hard parts"):
- Rows are re-ordered cell-contiguously into fixed-size **blocks**
  ``[n_blocks, block, D]``; a cell owns ``ceil(n_c / block)`` blocks.
- ``cell_blocks [nlist, max_bpc]`` maps each cell to its block ids (-1 pad),
  so a query's candidate set is a *gather of whole blocks* — MXU/HBM
  friendly, no ragged shapes.
- Per query: centroid matmul → top-nprobe cells → gather their blocks →
  one fused score+top-k over the gathered candidates.  Queries in a batch
  run under ``lax.map`` (each probes different cells).

Exactness: ``nprobe = nlist`` degenerates to exact search (used in tests);
recall/QPS trade-off is swept by the benchmark harness.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.engine.flat_index import jsonable_ids, load_npz
from archi_tpu.engine.kmeans import kmeans
from archi_tpu.ops.pallas_topk import NEG_INF


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "group",
                                              "with_bias"))
def _ivf_search(queries, centroids, blocks, block_rows_valid, cell_blocks,
                bias_by_slot, *, k, nprobe, group=8, with_bias=False):
    """queries [B, D] (B % group == 0); blocks [n_blocks, blk, D];
    block_rows_valid [n_blocks, blk]; cell_blocks [nlist, max_bpc] i32;
    bias_by_slot [n_blocks, blk] f32 — or [B, n_blocks, blk] for per-query
    bias (batched hybrid) — additive bias in BLOCK layout (tombstones /
    filters as NEG_INF, hybrid BM25 as finite values; ignored unless
    with_bias).
    → (vals [B, k], flat candidate positions [B, k] = block_id*blk + slot).

    Queries are processed in groups of ``group``: one [G, P*blk] matmul per
    group against the concatenation of every group member's probed blocks
    (a per-query ownership mask keeps results exact).  A per-query loop
    would degrade each score to a vector-matrix product at ~0.1% MXU
    utilization; grouping turns it into a real matmul.
    """
    blk = blocks.shape[1]
    max_bpc = cell_blocks.shape[1]
    d = queries.shape[1]
    per_q = nprobe * max_bpc  # block slots owned by each query
    bias2d = with_bias and bias_by_slot.ndim == 3

    def one_group(args):  # qg [G, D], bias_g [G, nb, blk] | unused
        qg, bias_g = args
        g_sz = qg.shape[0]
        cscores = jnp.dot(qg, centroids.T,
                          preferred_element_type=jnp.float32)
        _cv, cells = jax.lax.top_k(cscores, nprobe)          # [G, nprobe]
        bids = cell_blocks[cells].reshape(-1)                # [G*per_q]
        valid_block = bids >= 0
        safe = jnp.where(valid_block, bids, 0)
        cand = blocks[safe].reshape(-1, d)                   # [P*blk, D]
        scores = jnp.dot(qg, cand.T,
                         preferred_element_type=jnp.float32)  # [G, P*blk]
        if with_bias and bias2d:
            bb = bias_g[:, safe, :]                          # [G, P, blk]
            scores = scores + bb.reshape(g_sz, -1)
        elif with_bias:
            scores = scores + bias_by_slot[safe].reshape(-1)[None, :]
        # ownership: block slot p was probed by query p // per_q; each query
        # scores only its own slots (duplicates across queries are scored
        # redundantly but masked per owner, so results stay exact)
        p = safe.shape[0]
        owner = jax.lax.broadcasted_iota(jnp.int32, (g_sz, p), 1) // per_q
        mine = owner == jax.lax.broadcasted_iota(jnp.int32, (g_sz, p), 0)
        slot_ok = mine & valid_block[None, :]
        row_ok = block_rows_valid[safe].reshape(-1) > 0.5     # [P*blk]
        mask = jnp.repeat(slot_ok, blk, axis=1) & row_ok[None, :]
        scores = jnp.where(mask, scores, NEG_INF)
        kk = min(k, scores.shape[1])
        vals, pos = jax.lax.top_k(scores, kk)
        g = safe[pos // blk] * blk + pos % blk
        return vals, g.astype(jnp.int32)

    b = queries.shape[0]
    n_groups = b // group
    qs = queries.reshape(n_groups, group, d)
    if bias2d:
        bias_gs = bias_by_slot.reshape(
            n_groups, group, *bias_by_slot.shape[1:])
    else:   # placeholder rides along so the map xs structure is static
        bias_gs = jnp.zeros((n_groups, group, 1, 1), jnp.float32)
    vals, gpos = jax.lax.map(one_group, (qs, bias_gs))
    return vals.reshape(b, -1), gpos.reshape(b, -1)


def cell_block_layout(assign_h: np.ndarray, nlist: int, block: int):
    """Cell-contiguous block layout from host k-means assignments.

    → (gather [n_blocks*block] i64 source row per slot (-1 pad),
       cell_blocks [nlist, max_bpc] i32).  Shared by IVFIndex and
    IVFPQIndex — the layout is identical whether blocks hold vectors or
    PQ codes."""
    counts = np.bincount(assign_h, minlength=nlist)
    order = np.argsort(assign_h, kind="stable")   # rows cell-contiguous
    bpc = np.maximum(-(-counts // block), 1)      # blocks per cell (>=1)
    n_blocks = int(bpc.sum())
    block_first = np.concatenate([[0], np.cumsum(bpc)])
    src_off = np.concatenate([[0], np.cumsum(counts)])
    gather = np.full((n_blocks * block,), -1, np.int64)
    for c in range(nlist):  # nlist iterations, each a vectorized slice
        cnt = int(counts[c])
        dst = int(block_first[c]) * block
        gather[dst: dst + cnt] = order[src_off[c]: src_off[c] + cnt]
    cb = np.full((nlist, int(bpc.max())), -1, np.int32)
    for c in range(nlist):
        cb[c, : bpc[c]] = np.arange(block_first[c], block_first[c + 1])
    return gather, cb


@jax.jit
def _bias_to_block_layout(bias, block_rows, block_rows_valid):
    """[N] (or per-query [B, N]) original-row bias → [n_blocks, blk]
    (resp. [B, n_blocks, blk]) block-layout bias (one device gather; pad
    rows get 0 — they're masked by block_rows_valid)."""
    safe_rows = jnp.clip(block_rows, 0, bias.shape[-1] - 1)
    if bias.ndim == 2:
        return bias[:, safe_rows] * block_rows_valid[None]
    return bias[safe_rows] * block_rows_valid


class IVFIndex:
    """Built from a snapshot of (normalized) embeddings + ids."""

    def __init__(self, centroids, blocks, block_rows, cell_blocks, ids,
                 *, dtype=jnp.bfloat16):
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.blocks = jnp.asarray(blocks).astype(dtype)
        self.block_rows = np.asarray(block_rows)       # [n_blocks, blk] -> original row (-1 pad)
        self._block_rows_dev = jnp.asarray(self.block_rows, jnp.int32)
        self.block_rows_valid = jnp.asarray(
            (self.block_rows >= 0).astype(np.float32))
        self.cell_blocks = jnp.asarray(cell_blocks, jnp.int32)
        # ids=None → identity mapping (row IS the id); avoids materializing
        # an 8M-entry python list for synthetic/benchmark corpora.
        self._ids = list(ids) if ids is not None else None
        self._n_rows = int((self.block_rows >= 0).sum()) if ids is None \
            else len(self._ids)
        self.nlist = self.centroids.shape[0]
        self.block = self.blocks.shape[1]
        self.dim = self.blocks.shape[2]

    def _id_of(self, row: int):
        return self._ids[row] if self._ids is not None else row

    def __len__(self) -> int:
        return self._n_rows

    # ------------------------------------------------------------------ build
    @classmethod
    def build(cls, embeddings, ids, *, nlist: int = 1024, block: int = 512,
              iters: int = 10, seed: int = 0, dtype=jnp.bfloat16):
        x = np.asarray(embeddings, np.float32)
        n, d = x.shape
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.maximum(norms, 1e-12)
        nlist = max(1, min(nlist, n))
        centroids, assign = kmeans(x, nlist, iters=iters, seed=seed)
        assign = np.asarray(assign)

        blocks_list, rows_list, cell_blocks = [], [], []
        for c in range(nlist):
            rows = np.nonzero(assign == c)[0]
            my_blocks = []
            for s in range(0, max(len(rows), 1), block):
                chunk_rows = rows[s: s + block]
                buf = np.zeros((block, d), np.float32)
                rbuf = np.full((block,), -1, np.int64)
                if len(chunk_rows):
                    buf[: len(chunk_rows)] = x[chunk_rows]
                    rbuf[: len(chunk_rows)] = chunk_rows
                my_blocks.append(len(blocks_list))
                blocks_list.append(buf)
                rows_list.append(rbuf)
                if len(chunk_rows) == 0:
                    break
            cell_blocks.append(my_blocks)
        max_bpc = max(len(b) for b in cell_blocks)
        cb = np.full((nlist, max_bpc), -1, np.int32)
        for c, bl in enumerate(cell_blocks):
            cb[c, : len(bl)] = bl
        return cls(
            np.asarray(centroids), np.stack(blocks_list),
            np.stack(rows_list), cb, ids, dtype=dtype,
        )

    @classmethod
    def build_device(cls, x, ids=None, *, nlist: int = 1024,
                     block: int = 512, iters: int = 10, seed: int = 0,
                     dtype=jnp.bfloat16):
        """Build from a DEVICE-resident normalized corpus ``x [N, D]``.

        The host-side ``build`` uploads the full corpus twice (k-means input
        + reordered blocks) — ~26 GB through the axon relay at 8M x 384.
        Here only the 4-byte/row assignment vector round-trips: k-means runs
        on the already-resident corpus, the host computes the
        cell-contiguous block layout from the assignments (vectorized
        argsort), and the reorder is ONE device gather.
        """
        x = jnp.asarray(x)
        n, d = x.shape
        nlist = max(1, min(nlist, n))
        centroids, assign = kmeans(x, nlist, iters=iters, seed=seed)
        assign_h = np.asarray(assign)
        gather, cb = cell_block_layout(assign_h, nlist, block)
        n_blocks = gather.shape[0] // block
        safe = jnp.asarray(np.where(gather >= 0, gather, 0))
        blocks = jax.jit(
            lambda xx, ss: xx[ss].reshape(n_blocks, block, d).astype(dtype)
        )(x, safe)
        block_rows = gather.reshape(n_blocks, block)
        return cls(centroids, blocks, block_rows, cb, ids, dtype=dtype)

    @classmethod
    def from_flat(cls, flat_index, **kw):
        """Snapshot a FlatIndex's live rows into an IVF index."""
        n = flat_index.n_rows
        emb = np.asarray(flat_index.emb[:n].astype(jnp.float32))
        alive = np.asarray(flat_index.alive[:n]) > 0.5
        ids = [flat_index._ids[r] for r in range(n) if alive[r]]
        return cls.build(emb[alive], ids, **kw)

    # ----------------------------------------------------------------- search
    def search_dispatch(self, queries, k: int = 10, *, nprobe: int = 64,
                        bias=None, normalize_queries: bool = True,
                        vmem_budget_rows: int = 1 << 17):
        """Device-only: → (vals [B, k] f32 dev, original_rows [B, k] i32 dev
        with -1 for dead slots).  Callers combining with other scans (the
        ANN fresh-tail) stay on device until one final pull."""
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        nprobe = min(nprobe, self.nlist)
        # group size bounded so a group's gathered candidates stay within
        # the HBM scratch budget: rows_per_group = G * nprobe * max_bpc * blk
        max_bpc = int(self.cell_blocks.shape[1])
        # measured v5e optimum (8.4M, nlist=4096): candidate work scales
        # ~G^2 per group (each member re-scores the whole group's gathered
        # blocks), so small groups win — target ~128k candidate slots per
        # group, never more than 4 queries
        rows_per_q = max(nprobe * max_bpc * self.block, 1)
        group = max(1, min(4, vmem_budget_rows // rows_per_q, b))
        pad = (-b) % group
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.zeros((pad, self.dim), jnp.float32)], axis=0)
        if normalize_queries:
            qn = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        else:
            qn = queries
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
        vals, gpos = _ivf_search(
            qn, self.centroids, self.blocks, self.block_rows_valid,
            self.cell_blocks, bias_by_slot, k=k, nprobe=nprobe, group=group,
            with_bias=bias is not None,
        )
        vals, gpos = vals[:b], gpos[:b]
        # device-side slot → original-row mapping (-1 where the slot lost)
        rows = jnp.where(
            vals > -1e29,
            jnp.take(self._block_rows_dev.reshape(-1), gpos),
            -1,
        ).astype(jnp.int32)
        return vals, rows

    def search(self, queries, k: int = 10, *, nprobe: int = 64,
               bias=None, normalize_queries: bool = True,
               vmem_budget_rows: int = 1 << 17):
        """bias: optional f32 vector indexed by ORIGINAL row (the flat
        index's physical rows when built via from_flat/prefix) — carries
        tombstones/filters as NEG_INF and hybrid BM25 as finite values,
        the same additive-bias contract as the fused flat kernel."""
        vals, rows = self.search_dispatch(
            queries, k, nprobe=nprobe, bias=bias,
            normalize_queries=normalize_queries,
            vmem_budget_rows=vmem_budget_rows)
        vals = np.asarray(vals)
        rows_out = np.asarray(rows)
        ids_out = [
            [self._id_of(int(r)) if int(r) >= 0 else None for r in rr]
            for rr in rows_out
        ]
        return ids_out, vals, rows_out

    # -------------------------------------------------------------- serialize
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path,
            centroids=np.asarray(self.centroids),
            blocks=np.asarray(self.blocks.astype(jnp.float32)),
            block_rows=self.block_rows,
            cell_blocks=np.asarray(self.cell_blocks),
            meta=json.dumps({"ids": None if self._ids is None
                             else jsonable_ids(self._ids)}),
        )

    @classmethod
    def load(cls, path: str, *, dtype=jnp.bfloat16) -> "IVFIndex":
        z = load_npz(path)
        meta = json.loads(str(z["meta"]))
        return cls(z["centroids"], z["blocks"], z["block_rows"],
                   z["cell_blocks"], meta["ids"], dtype=dtype)
