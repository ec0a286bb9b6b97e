"""XL serving index: corpora beyond HBM scale with full serving semantics.

``AnnFlatIndex`` keeps the full-precision corpus in HBM (its exact
fresh-tail scan and device rerank read it), which caps it at ~20M 384-d
rows on one v5e.  BASELINE config 4 proved the pieces for 100M+ on one
chip: IVF-PQ codes on device (96 B/row), full-precision rows in a host
memmap (``engine/host_store.py`` — the analog of the reference keeping
full vectors in Postgres, ``src/cli/templates/init.sql:266``), and an
exact host rerank of the device's top-C candidates.  This class composes
them into a SERVING index with the TpuVectorStore contract:

- global row layout: the IVF-PQ snapshot covers rows ``[0, n_snap)``;
  rows added since live in a device-resident exact FRESH TAIL
  (``FlatIndex``), so recall never degrades with snapshot staleness;
- the host store holds ALL rows and is the source of truth: snapshot
  rebuilds stream it back through the device encoder, and the exact
  rerank reads it;
- deletes tombstone everywhere at once (device alive mask for the
  snapshot bias + the tail's own alive) — a dead row can't resurface
  from any tier;
- hybrid BM25 bias / metadata filters / per-conversation enablement ride
  the same per-row additive-bias contract as every other index —
  including per-query [B, N] bias (micro-batched hybrid serving), which
  flows through all three tiers.  ANN caveat (shared with AnnFlatIndex):
  a positive bias rides the ADC scores of PROBED candidates; it cannot
  surface a snapshot row whose block the probe budget skipped (the tail
  is exact, so fresh rows always see their bias).

Searches: ADC block-budget probe over the snapshot → top-C candidates →
host exact rescore; exact device scan of the tail; host merge.  Scores
are exact inner products end to end.

Scale notes: rebuilds stream the corpus host→device once (fine on
host-attached TPUs; on this rig's relay use the out-of-process builder
for 10M+ — ``scripts/ann_builder.py``).  The device footprint is
codes (~96 B/row) + the tail, not the corpus.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.engine.flat_index import FlatIndex, _l2_normalize, \
    jsonable_ids, load_npz
from archi_tpu.engine.host_store import HostVectorStore, exact_rerank
from archi_tpu.engine.ivfpq_index import IVFPQIndex
from archi_tpu.ops.pallas_topk import NEG_INF

logger = logging.getLogger(__name__)


class XlPQIndex:
    """Beyond-HBM serving index (host plane + PQ snapshot + exact tail)."""

    # per-query [B, N] bias is supported on every tier: the snapshot's
    # block-layout bias stream, the host rerank's per-row pick, and the
    # exact tail — so micro-batched hybrid serving fuses here too.  The
    # vectorstore's BIAS_BUDGET splitter bounds the [B, N] footprint.
    supports_batched_bias = True

    def __init__(self, dim: int, *, store_path: Optional[str] = None,
                 store: Optional[HostVectorStore] = None,
                 nlist: int = 4096, block: int = 512,
                 pq_m: int = 48, pq_refine_m: int = 48, ksub: int = 16,
                 nprobe_blocks: int = 128, cell_gate: int | None = None,
                 block_rank_sub: int = 8, rerank_overfetch: int = 16,
                 extract: str = "auto", hier_t: int = 64,
                 pq_spill: float = 0.0, pq_opq_iters: int = 0,
                 min_snapshot_rows: int = 1 << 17,
                 refresh_fraction: float = 0.25,
                 build_block_rows: int = 1 << 17,
                 async_refresh: bool = False,
                 dtype=jnp.bfloat16, tile_n: int = 4096,
                 normalize: bool = True, snapshot_source=None, **_kw):
        import ml_dtypes

        self.dim = int(dim)
        self.dtype = jnp.dtype(dtype)
        self.tile_n = int(tile_n)
        self.normalize = bool(normalize)
        self.nlist = int(nlist)
        self.block = int(block)
        self.pq_m = int(pq_m)
        self.pq_refine_m = int(pq_refine_m)
        self.ksub = int(ksub)
        self.nprobe_blocks = int(nprobe_blocks)
        # two-level gate for block ranking (see IVFPQIndex cell_gate)
        self.cell_gate = None if cell_gate is None else int(cell_gate)
        # sub-block ranking granularity (max over `sub` finer means per
        # block — see IVFPQIndex.ensure_block_centroids)
        self.block_rank_sub = max(1, int(block_rank_sub))
        # stage-1 candidate extraction ("auto" | "exact" | "approx" |
        # "hier"); hier_t sizes the per-block partial selection — set it
        # >= the corpus's near-duplicate cluster size (see
        # IVFPQIndex.search_dispatch)
        self.extract = str(extract)
        self.hier_t = int(hier_t)
        # snapshot build treatments (see IVFPQIndex.build_streaming /
        # docs/pq_scale.md: probe-spill multi-assignment + OPQ rotation)
        self.pq_spill = float(pq_spill)
        self.pq_opq_iters = int(pq_opq_iters)
        self.rerank_overfetch = int(rerank_overfetch)
        self.min_snapshot_rows = int(min_snapshot_rows)
        self.refresh_fraction = float(refresh_fraction)
        self.build_block_rows = int(build_block_rows)
        self.async_refresh = bool(async_refresh)
        # optional out-of-band snapshot block provider: maps snapshot
        # block index i -> a device array holding host-plane rows
        # [i*build_block_rows, (i+1)*build_block_rows) (bit-identical
        # when upcast to f32).  Lets bulk-restore/benchmark paths whose
        # plane contents are device-regenerable (or device-resident
        # elsewhere) rebuild snapshots WITHOUT uploading the plane
        # through the host->device link — at the 77 GB design scale the
        # relay upload would dominate the build.  Runtime-injected, not
        # serialized; adds/refreshes fall back to the plane upload when
        # the refresh covers a partial block.
        self.snapshot_source = snapshot_source

        self.store = store if store is not None else HostVectorStore(
            dim, path=store_path, dtype=ml_dtypes.bfloat16)
        # fresh tail: device-exact; holds rows [n_snap, n_rows) with the
        # SAME chunk ids (its physical row r = global n_snap + r)
        self.tail = FlatIndex(dim, dtype=dtype, tile_n=tile_n,
                              normalize=False)  # rows pre-normalized here
        self._ivf: Optional[IVFPQIndex] = None
        self._n_snap = 0
        # snapshot-tier tombstones as a device additive bias [n_snap]
        # (0 = alive, NEG_INF = dead); rebuilt at each snapshot adoption
        self._snap_bias = jnp.zeros((0,), jnp.float32)
        self._ids: list = []          # global row -> chunk id (None = dead)
        self._id_rows: dict = {}      # chunk id -> [global rows]
        self._n_dead = 0
        self._lock = threading.Lock()          # guards snapshot swaps
        self._build_lock = threading.Lock()    # serializes rebuilds
        self._refresh_thread: Optional[threading.Thread] = None
        # health signal: consecutive snapshot-refresh failures. Serving
        # stays correct on the stale snapshot + exact tail, but the tail
        # grows unboundedly while this climbs — operators/monitors must
        # be able to see it (refresh resets it to 0 on success)
        self.refresh_failures = 0

    # ------------------------------------------------------------------ size
    def __len__(self) -> int:
        return self.n_rows - self._n_dead

    @property
    def n_rows(self) -> int:
        return len(self._ids)

    @property
    def capacity(self) -> int:
        # host-plane capacity: masks/bias vectors are sized to this
        return max(self.n_rows, 1)

    @property
    def alive(self):
        """[capacity] device f32 (protocol: pure-lexical ranking path)."""
        cap = self.capacity
        snap_alive = (self._snap_bias[:min(self._n_snap, cap)]
                      > NEG_INF / 2).astype(jnp.float32)
        n_tail = max(0, min(self.n_rows - self._n_snap, cap))
        tail_alive = self.tail.alive[:n_tail]
        out = jnp.concatenate([snap_alive, tail_alive])
        if out.shape[0] < cap:
            out = jnp.pad(out, (0, cap - out.shape[0]))
        return out

    # ----------------------------------------------------------------- write
    def adopt_store(self, ids: Sequence[Any], *,
                    refresh: bool = True) -> None:
        """Register rows that ALREADY exist in the host plane.

        The production bulk-load path for planes filled out of process —
        e.g. a corpus shard disk-sliced from a larger store, or a plane
        written by a separate ingest job (the same adopt pattern as the
        out-of-process ANN build).  ``ids[i]`` names host-plane row i;
        must cover the whole plane, may only be called on a fresh index.
        With ``refresh`` the PQ snapshot is built immediately (streams
        the plane through the device encoder); rows are pre-normalized
        by contract, matching ``add``'s post-normalize state.
        """
        n = len(self.store)
        assert self.n_rows == 0, "adopt_store requires a fresh index"
        assert len(ids) == n, (len(ids), n)
        self._ids = list(ids)
        for r, i in enumerate(self._ids):
            self._id_rows.setdefault(i, []).append(r)
        if refresh:
            self.refresh_snapshot()
        elif n:
            # no snapshot yet: serve the whole plane via the exact tail
            self.tail.add(self.store.get(np.arange(n)), self._ids)

    def add(self, embeddings, ids: Sequence[Any]) -> list[int]:
        embeddings = np.asarray(embeddings, np.float32)
        n = embeddings.shape[0]
        assert embeddings.shape == (n, self.dim), embeddings.shape
        assert len(ids) == n
        if n == 0:
            return []
        if self.normalize:
            embeddings = embeddings / np.maximum(
                np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12)
        offset = self.n_rows
        self.store.add(embeddings)            # host plane (source of truth)
        self.tail.add(embeddings, ids)        # device exact tier
        rows = list(range(offset, offset + n))
        self._ids.extend(ids)
        for r, i in zip(rows, ids):
            self._id_rows.setdefault(i, []).append(r)
        self._maybe_refresh()
        return rows

    def delete(self, ids: Sequence[Any]) -> int:
        rows: list[int] = []
        for i in ids:
            rows.extend(self._id_rows.pop(i, []))
        if not rows:
            return 0
        snap_rows = [r for r in rows if r < self._n_snap]
        if snap_rows:
            idx = jnp.asarray(np.asarray(snap_rows, np.int32))
            with self._lock:
                self._snap_bias = self._snap_bias.at[idx].set(NEG_INF)
        # the tail holds the same chunk ids for its rows; its delete is a
        # no-op for snapshot-only ids
        self.tail.delete([i for i in ids])
        for r in rows:
            self._ids[r] = None
        self._n_dead += len(rows)
        return len(rows)

    # --------------------------------------------------------------- refresh
    def _needs_refresh(self) -> bool:
        n_tail = self.n_rows - self._n_snap
        if self.n_rows < self.min_snapshot_rows:
            return False
        if self._n_snap == 0:
            return True
        return n_tail >= self.refresh_fraction * max(self._n_snap, 1)

    def _maybe_refresh(self) -> None:
        if not self._needs_refresh():
            return
        if not self.async_refresh:
            # a refresh failure must not propagate out of add(): the rows
            # ARE appended (host plane + exact tail) and serving stays
            # correct on the stale snapshot — raising here would desync
            # callers that track rows (e.g. ShardedXlPQIndex's global map)
            try:
                self.refresh_snapshot()
            except Exception:
                self.refresh_failures += 1
                logger.exception(
                    "xl snapshot refresh failed (%d consecutive); serving "
                    "continues on the stale tier", self.refresh_failures)
            return
        with self._build_lock:
            t = self._refresh_thread
            if t is not None and t.is_alive():
                return

            def guarded():
                try:
                    self.refresh_snapshot()
                except Exception:
                    self.refresh_failures += 1
                    logger.exception(
                        "xl snapshot refresh failed (%d consecutive); "
                        "serving continues on the stale tier",
                        self.refresh_failures)

            t = threading.Thread(target=guarded, name="xl-refresh",
                                 daemon=True)
            self._refresh_thread = t
            t.start()

    def refresh_snapshot(self) -> None:
        """Rebuild the IVF-PQ snapshot from the host plane.

        Covers the largest ``build_block_rows`` multiple of the corpus;
        the remainder stays in the exact tail.  The tail is then rebuilt
        to hold only rows past the new snapshot boundary (re-uploaded
        from the host plane with their ids; tombstones reapplied)."""
        with self._build_lock:
            n = self.n_rows
            br = min(self.build_block_rows, max(n, 1))
            n_blocks = n // br
            if n_blocks < 1:
                return
            n_snap_new = n_blocks * br
            buf = self.store._buf

            if self.snapshot_source is not None \
                    and br == self.build_block_rows:
                src = self.snapshot_source

                def block_fn(i):
                    # provider contract: bits == plane rows upcast to f32
                    return jnp.asarray(src(i)).astype(jnp.float32)
            else:
                def block_fn(i):
                    return jnp.asarray(
                        np.asarray(buf[i * br:(i + 1) * br], np.float32))

            nlist = max(1, min(self.nlist, n_snap_new))
            ivf = IVFPQIndex.build_streaming(
                block_fn, n_blocks, br,
                nlist=nlist, block=min(self.block, n_snap_new),
                m=self.pq_m, ksub=self.ksub, refine_m=self.pq_refine_m,
                train_blocks=min(2, n_blocks),
                spill_frac=self.pq_spill, opq_iters=self.pq_opq_iters)
            ivf.ensure_block_centroids(dtype=jnp.bfloat16,
                                       sub=self.block_rank_sub)

            # snapshot tombstone bias from the global id table
            dead = np.zeros((n_snap_new,), np.float32)
            for r in range(n_snap_new):
                if self._ids[r] is None:
                    dead[r] = NEG_INF
            snap_bias = jnp.asarray(dead)

            # rebuild the tail for rows [n_snap_new, n)
            tail = FlatIndex(self.dim, dtype=self.dtype, tile_n=self.tile_n,
                             normalize=False)
            alive_tail = [r for r in range(n_snap_new, n)
                          if self._ids[r] is not None]
            if n > n_snap_new:
                rows_np = np.arange(n_snap_new, n)
                emb = self.store.get(rows_np)
                ids = [self._ids[r] for r in rows_np]
                # dead rows get a placeholder id then an immediate
                # tombstone so physical positions stay global-aligned
                ph = [i if i is not None else ("__dead__", r)
                      for r, i in zip(rows_np, ids)]
                tail.add(emb, ph)
                dead_ph = [p for p in ph if isinstance(p, tuple)]
                if dead_ph:
                    tail.delete(dead_ph)
            del alive_tail

            with self._lock:
                self._ivf = ivf
                self._n_snap = n_snap_new
                self._snap_bias = snap_bias
                self.tail = tail
            self.refresh_failures = 0
            logger.info("xl snapshot refreshed: %d rows (PQ) + %d tail",
                        n_snap_new, n - n_snap_new)

    # ---------------------------------------------------------------- search
    def search_dispatch_parts(self, queries, k: int = 10, *,
                              filter_mask=None, bias=None, impl="auto",
                              nprobe_blocks: int | None = None):
        """Launch the device work of both tiers WITHOUT blocking.

        → (device_parts, ctx): fetch ``device_parts`` (a flat list of jax
        arrays) with one ``jax.device_get`` tree call — possibly batched
        with other shards' parts (``ShardedXlPQIndex``) — then pass the
        fetched values to ``search_finalize_parts`` for the host rerank +
        tier merge.  ``queries`` must already be L2-normalized [B, D]."""
        queries = np.asarray(queries, np.float32)
        b = queries.shape[0]
        with self._lock:
            ivf, n_snap, snap_bias = self._ivf, self._n_snap, self._snap_bias
            tail = self.tail

        # host-side combined finite bias + filter kill-mask by global row
        fm = None
        if filter_mask is not None:
            fm = np.asarray(filter_mask, np.float32)
        ub = None
        if bias is not None:
            ub = np.asarray(bias, np.float32)   # [N] shared or [B, N]

        parts: list = []
        ctx = {"queries": queries, "k": k, "b": b, "n_snap": n_snap,
               "has_snap": False, "has_tail": False, "rb": None}
        qd = jnp.asarray(queries)
        if ivf is not None and n_snap > 0:
            sb = snap_bias
            if fm is not None:
                # rows past the mask's length are excluded (the FlatIndex
                # convention: a short mask zero-pads)
                fs = np.full((n_snap,), NEG_INF, np.float32)
                m = fm[:n_snap]
                fs[:len(m)][m > 0.0] = 0.0
                sb = sb + jnp.asarray(fs)
            if ub is not None and ub.ndim == 1:
                sb = sb + jnp.asarray(
                    np.pad(ub[:n_snap], (0, n_snap - min(len(ub), n_snap))))
            elif ub is not None:
                # per-query bias: shared parts broadcast over the batch
                u2 = np.zeros((b, n_snap), np.float32)
                w = min(ub.shape[1], n_snap)
                u2[:, :w] = ub[:, :w]
                sb = sb[None, :] + jnp.asarray(u2)           # [B, n_snap]
            c = max(k, self.rerank_overfetch * k)
            vals_d, rows_d = ivf.search_dispatch(
                qd, k=c, nprobe_blocks=(nprobe_blocks or
                                        self.nprobe_blocks),
                cell_gate=self.cell_gate,
                bias=sb, normalize_queries=False, refine_overfetch=1,
                extract=self.extract, hier_t=self.hier_t)
            parts += [vals_d, rows_d]
            ctx["has_snap"] = True
            ctx["c"] = c
            # finite bias for the host rescore (NEG_INF slots stay dead)
            rb = None
            if ub is not None and ub.ndim == 1:
                rb = np.zeros((n_snap,), np.float32)
                rb[:min(len(ub), n_snap)] = ub[:n_snap]
            elif ub is not None:
                rb = np.zeros((b, n_snap), np.float32)
                w = min(ub.shape[1], n_snap)
                rb[:, :w] = ub[:, :w]
            ctx["rb"] = rb

        n_tail = self.n_rows - n_snap
        if n_tail > 0 and len(tail) > 0:
            t_fm = None
            if fm is not None:
                t_fm = np.zeros((tail.capacity,), np.float32)
                seg = fm[n_snap:n_snap + tail.capacity]
                t_fm[:len(seg)] = seg
            t_b = None
            if ub is not None and ub.ndim == 1:
                t_b = np.zeros((tail.capacity,), np.float32)
                seg = ub[n_snap:n_snap + tail.capacity]
                t_b[:len(seg)] = seg
            elif ub is not None:
                t_b = np.zeros((b, tail.capacity), np.float32)
                seg = ub[:, n_snap:n_snap + tail.capacity]
                t_b[:, :seg.shape[1]] = seg
            tv, tr = tail.search_dispatch(qd, k=min(k, max(len(tail), 1)),
                                          filter_mask=t_fm, bias=t_b,
                                          impl=impl)
            parts += [tv, tr]
            ctx["has_tail"] = True
        return parts, ctx

    def search_finalize_parts(self, ctx, fetched: list):
        """Host half: exact rerank of the snapshot candidates against the
        host plane, tail offset, tier merge.  ``fetched`` = host values of
        the arrays ``search_dispatch_parts`` returned, in order.
        → (vals [B, k], rows [B, k]) — LOCAL rows of this index."""
        queries, k, b = ctx["queries"], ctx["k"], ctx["b"]
        n_snap = ctx["n_snap"]
        parts_v, parts_r = [], []
        i = 0
        if ctx["has_snap"]:
            vals_h, rows_h = fetched[i], fetched[i + 1]
            i += 2
            sv, sr = exact_rerank(self.store, queries, vals_h, rows_h,
                                  k=min(k, ctx["c"]), bias=ctx["rb"])
            parts_v.append(sv)
            parts_r.append(sr)
        if ctx["has_tail"]:
            tv, tr = fetched[i], fetched[i + 1]
            i += 2
            parts_v.append(np.asarray(tv, np.float32))
            parts_r.append(np.where(np.asarray(tv) > -1e29,
                                    np.asarray(tr, np.int64) + n_snap, -1))

        if not parts_v:
            vals = np.full((b, k), NEG_INF, np.float32)
            rows = np.full((b, k), -1, np.int64)
        else:
            av = np.concatenate(parts_v, axis=1)
            ar = np.concatenate(parts_r, axis=1)
            kk = min(k, av.shape[1])
            order = np.argsort(-av, axis=1)[:, :kk]
            vals = np.take_along_axis(av, order, axis=1)
            rows = np.take_along_axis(ar, order, axis=1)
            if kk < k:
                vals = np.pad(vals, ((0, 0), (0, k - kk)),
                              constant_values=NEG_INF)
                rows = np.pad(rows, ((0, 0), (0, k - kk)),
                              constant_values=-1)
        return vals, rows

    def search(self, queries, k: int = 10, *, filter_mask=None, bias=None,
               impl="auto", nprobe_blocks: int | None = None):
        queries = np.asarray(queries, np.float32)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if self.normalize:
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        parts, ctx = self.search_dispatch_parts(
            queries, k, filter_mask=filter_mask, bias=bias, impl=impl,
            nprobe_blocks=nprobe_blocks)
        vals, rows = self.search_finalize_parts(ctx, jax.device_get(parts))
        ids = [
            [self._ids[int(r)] if (v > -1e29 and 0 <= r < self.n_rows)
             else None
             for r, v in zip(rr, vv)]
            for rr, vv in zip(rows, vals)
        ]
        return ids, vals, rows

    # -------------------------------------------------------------- persist
    def save(self, path: str) -> None:
        """``path`` is the npz prefix (TpuVectorStore passes index.npz).
        The snapshot codes save to ``<path>.ivfpq.npz``; the host plane is
        its own memmap (path recorded, or embedded when RAM-backed)."""
        base = path[:-4] if path.endswith(".npz") else path
        extra = {}
        if self._ivf is not None:
            self._ivf.save(base + ".ivfpq")
            extra["snap_bias"] = np.asarray(self._snap_bias)
        n_tail = self.n_rows - self._n_snap
        if n_tail > 0:
            extra["tail_emb"] = np.asarray(
                self.store._buf[self._n_snap:self.n_rows], np.float32)
        if self.store.path is None:
            extra["store_rows"] = np.asarray(
                self.store._buf[:self.n_rows], np.float32)
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            meta=json.dumps({
                "dim": self.dim, "n_snap": self._n_snap,
                "ids": jsonable_ids(self._ids),
                "store_path": self.store.path,
                "config": {
                    "nlist": self.nlist, "block": self.block,
                    "pq_m": self.pq_m, "pq_refine_m": self.pq_refine_m,
                    "ksub": self.ksub,
                    "nprobe_blocks": self.nprobe_blocks,
                    "cell_gate": self.cell_gate,
                    "block_rank_sub": self.block_rank_sub,
                    "extract": self.extract,
                    "hier_t": self.hier_t,
                    "rerank_overfetch": self.rerank_overfetch,
                    "pq_spill": self.pq_spill,
                    "pq_opq_iters": self.pq_opq_iters,
                    "min_snapshot_rows": self.min_snapshot_rows,
                    "refresh_fraction": self.refresh_fraction,
                    "build_block_rows": self.build_block_rows,
                }}),
            **extra)

    @classmethod
    def load(cls, path: str, **kw) -> "XlPQIndex":
        import ml_dtypes

        z = load_npz(path)
        meta = json.loads(str(z["meta"]))
        cfg = dict(meta["config"])
        cfg.update(kw)
        store = None
        if meta["store_path"] is None:
            store = HostVectorStore(meta["dim"], dtype=ml_dtypes.bfloat16)
            store.add(np.asarray(z["store_rows"], np.float32))
        idx = cls(meta["dim"],
                  store=store, store_path=meta["store_path"], **cfg)
        if store is None and len(idx.store) != len(meta["ids"]):
            raise ValueError(
                f"host plane at {meta['store_path']} has {len(idx.store)} "
                f"rows; checkpoint expects {len(meta['ids'])}")
        ids = meta["ids"]
        idx._ids = list(ids)
        for r, i in enumerate(ids):
            if i is not None:
                idx._id_rows.setdefault(i, []).append(r)
        idx._n_dead = sum(1 for i in ids if i is None)
        idx._n_snap = meta["n_snap"]
        base = path[:-4] if path.endswith(".npz") else path
        if os.path.exists(base + ".ivfpq.npz"):
            idx._ivf = IVFPQIndex.load(base + ".ivfpq")
            idx._ivf.ensure_block_centroids(dtype=jnp.bfloat16,
                                            sub=idx.block_rank_sub)
            idx._snap_bias = jnp.asarray(z["snap_bias"])
        n_tail = len(ids) - idx._n_snap
        if n_tail > 0:
            emb = np.asarray(z["tail_emb"], np.float32) \
                if "tail_emb" in z else idx.store.get(
                    np.arange(idx._n_snap, len(ids)))
            rows_np = np.arange(idx._n_snap, len(ids))
            ph = [ids[r] if ids[r] is not None else ("__dead__", int(r))
                  for r in rows_np]
            idx.tail.add(np.asarray(emb, np.float32), ph)
            dead_ph = [p for p in ph if isinstance(p, tuple)]
            if dead_ph:
                idx.tail.delete(dead_ph)
        return idx
