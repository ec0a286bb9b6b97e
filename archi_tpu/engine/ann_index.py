"""ANN-accelerated serving index: IVF snapshot + exact fresh-row tail.

Makes ``data_manager.index.type: ivf`` a REAL serving mode (the pgvector
IVFFlat analog, reference ``init.sql:287-289``) instead of offline sweep
tooling: ingest stays on the incremental FlatIndex plane, and queries run
against a periodically refreshed IVF snapshot of the corpus prefix plus an
EXACT scan of the rows added since the snapshot — the same
snapshot+fresh-tail shape as ``SegmentedFlatIndex``, with the cold segment
ANN-compressed instead of merely cold.

The full additive-bias contract survives ANN: tombstones, metadata
filters, per-conversation enablement, and hybrid BM25 all ride the same
per-row bias vector, permuted into IVF block layout by one device gather
(``_bias_to_block_layout``).  At ``nprobe == nlist`` results are exact
(parity-tested vs FlatIndex); smaller nprobe trades recall for QPS per the
sweep in ``docs/ivf_scale.md``.  Caveat shared with every ANN index:
highly selective filters can empty the probed cells — over-fetch (raise k
or nprobe) for narrow document selections.
"""

from __future__ import annotations

import functools
import logging
import threading

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.engine.flat_index import FlatIndex, _l2_normalize
from archi_tpu.engine.ivf_index import IVFIndex
from archi_tpu.engine.topk import alive_to_bias, topk_scores

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("k",))
def _exact_rescore(emb, queries, vals, rows, row_bias, *, k):
    """Device-side exact rerank of ANN candidates against the
    full-precision buffer (the serving analog of config 4's host tier —
    here the vectors are already in HBM, so the rescore is one gather +
    matvec).  vals/rows [B, C] (NEG_INF = dead, stays dead); row_bias
    [capacity] or [B, capacity] carries tombstones/filters/hybrid bias.
    → (vals [B, k], rows [B, k]); scores become exact-bound."""
    safe = jnp.clip(rows, 0, emb.shape[0] - 1)
    cand = emb[safe].astype(jnp.float32)                  # [B, C, D]
    ex = jnp.einsum("bcd,bd->bc", cand, queries.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    if row_bias.ndim == 2:
        picked = jnp.take_along_axis(row_bias, safe, axis=1)
    else:
        picked = row_bias[safe]
    ex = ex + picked
    scores = jnp.where(vals > -1e29, ex, vals)
    top_vals, pos = jax.lax.top_k(scores, k)
    return top_vals, jnp.take_along_axis(rows, pos, axis=1)


@jax.jit
def _merge_topk(a_vals, a_rows, f_vals, f_rows, n_snap):
    """Disjoint-range segment merge: ANN rows < n_snap, fresh rows are
    tail-relative → shifted.  → top-k of the union, on device."""
    vals = jnp.concatenate([a_vals, f_vals], axis=1)
    rows = jnp.concatenate(
        [a_rows, jnp.where(f_vals > -1e29, f_rows + n_snap, -1)], axis=1)
    k = a_vals.shape[1]
    top_vals, pos = jax.lax.top_k(vals, k)
    top_rows = jnp.take_along_axis(rows, pos, axis=1)
    return top_vals, top_rows


class AnnFlatIndex(FlatIndex):
    """FlatIndex whose searches are IVF-accelerated over a snapshot.

    Args (beyond FlatIndex):
      nlist / nprobe: IVF cells and default probes.
      min_snapshot_rows: corpus size before the first snapshot is built
        (small corpora scan exactly — ANN buys nothing).
      refresh_fraction: rebuild when fresh rows exceed this fraction of the
        snapshot (fresh rows are scanned exactly meanwhile, so recall never
        degrades with staleness — only the exact-tail cost grows).
    """

    #: per-query [B, N] bias permutes into block layout per query and
    #: slices per segment — batched hybrid runs fused over the snapshot
    supports_batched_bias = True

    def __init__(self, dim: int, *, nlist: int = 1024, nprobe: int = 64,
                 nprobe_blocks: int | None = None,
                 cell_gate: int | None = None,
                 block_rank_sub: int = 8,
                 min_snapshot_rows: int = 1 << 15,
                 refresh_fraction: float = 0.25,
                 snapshot_kind: str = "ivf", pq_m: int = 48,
                 pq_refine_m: int = 48, rerank_overfetch: int = 4,
                 extract: str = "auto", hier_t: int = 64,
                 async_refresh: bool = True, **kw):
        """snapshot_kind: "ivf" (full-precision cells — pgvector-IVFFlat
        analog) or "ivfpq" (PQ-coded residual cells + refinement — 16x
        smaller snapshot, for corpora beyond bf16 HBM scale; see
        ``engine/ivfpq_index.py``).  pq_m / pq_refine_m only apply to
        "ivfpq".

        async_refresh: rebuild the snapshot on a background thread instead
        of inline in the search path — an IVF build is seconds-to-minutes
        at scale, and the staleness is harmless (fresh rows are scanned
        exactly, so only the exact-tail cost grows until the swap).

        Caveat measured on the tunneled single-chip rig: median query
        latency stays ~0.1 s during a background build, but individual
        queries can stall behind the build's non-preemptible device/compile
        stretches (one ~170 s spike observed during a 196 s build at 256k
        rows; co-located deployments compile in seconds, shrinking the
        worst case accordingly).  True isolation needs a second chip."""
        super().__init__(dim, **kw)
        if snapshot_kind not in ("ivf", "ivfpq"):
            raise ValueError(f"unknown snapshot_kind {snapshot_kind!r}")
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        # block-budget probing (ivfpq only): rank individual code blocks
        # by mini-centroid score instead of probing whole padded cells —
        # see IVFPQIndex.search_dispatch(nprobe_blocks=...)
        self.nprobe_blocks = (None if nprobe_blocks is None
                              else int(nprobe_blocks))
        # two-level gate for block-budget probing: only blocks owned by
        # the query's top-`cell_gate` cells compete in the block ranking
        self.cell_gate = None if cell_gate is None else int(cell_gate)
        # sub-block ranking: blocks rank by the MAX of `sub` finer means
        # (see IVFPQIndex.ensure_block_centroids; only materialized when
        # nprobe_blocks probing is actually used)
        self.block_rank_sub = max(1, int(block_rank_sub))
        self.min_snapshot_rows = int(min_snapshot_rows)
        self.refresh_fraction = float(refresh_fraction)
        self.snapshot_kind = snapshot_kind
        self.pq_m = int(pq_m)
        self.pq_refine_m = int(pq_refine_m)
        # ivfpq only: over-fetch C = rerank_overfetch * k ADC candidates
        # and exact-rescore them against the device-resident full-precision
        # buffer — strict recall becomes candidate-bound, not
        # quantization-bound, for one gather+matvec.  0 disables.
        self.rerank_overfetch = int(rerank_overfetch)
        # stage-1 extraction knobs for the PQ snapshot (see
        # IVFPQIndex.search_dispatch; ignored for snapshot_kind="ivf")
        self.extract = str(extract)
        self.hier_t = int(hier_t)
        self.async_refresh = bool(async_refresh)
        self._ivf = None  # IVFIndex | IVFPQIndex
        self._n_snap = 0
        self._ann_lock = threading.Lock()     # guards (_ivf, _n_snap) swaps
        self._build_lock = threading.Lock()   # serializes rebuilds
        self._compact_epoch = 0
        self._refresh_thread: threading.Thread | None = None
        self._kick_lock = threading.Lock()

    # ---------------------------------------------------------------- refresh
    def _needs_refresh(self) -> bool:
        if self.n_rows < self.min_snapshot_rows:
            return False
        fresh = self.n_rows - self._n_snap
        return fresh > max(self.refresh_fraction * max(self._n_snap, 1),
                           0 if self._ivf is None else 1)

    def refresh_ann(self) -> None:
        """Rebuild the IVF snapshot from the current corpus prefix.

        The BUILD runs outside ``_ann_lock`` — it is seconds-to-minutes at
        scale and searches read ``(_ivf, _n_snap)`` under that lock, so
        holding it across the build would stall every query for the whole
        rebuild (review r2-cont finding).  ``_build_lock`` serializes
        concurrent rebuild attempts; only the swap takes ``_ann_lock``.
        A compact() racing the build bumps ``_compact_epoch`` — the stale
        snapshot (old row numbering) is discarded instead of swapped in.
        """
        with self._build_lock:
            n = self.n_rows
            if n < self.min_snapshot_rows:
                return
            epoch = self._compact_epoch
            with self._buf_lock:
                emb_snap = self.emb
            x = emb_snap[:n]
            if self.dtype == jnp.int8:
                x = x.astype(jnp.float32) / 127.0
            if self.snapshot_kind == "ivfpq":
                from archi_tpu.engine.ivfpq_index import IVFPQIndex

                ivf = IVFPQIndex.build_device(
                    x, nlist=min(self.nlist, n), block=512,
                    m=self.pq_m, refine_m=self.pq_refine_m)
                ivf.block_rank_sub = self.block_rank_sub
            else:
                ivf = IVFIndex.build_device(
                    x, nlist=min(self.nlist, n), block=512,
                    dtype=self.dtype if self.dtype != jnp.int8
                    else jnp.bfloat16)
            # warm the NEW snapshot's search program BEFORE swapping it in:
            # the first post-swap query otherwise pays the compile (measured
            # 169 s through the remote-compile tunnel at 256k rows) on a
            # caller thread.  k=10 covers the dominant program; other k
            # values share most of it.
            try:
                probe = jnp.zeros((1, self.dim), jnp.float32)
                v, _r = ivf.search_dispatch(probe, k=10,
                                            nprobe=self.nprobe)
                jax.block_until_ready(v)
            except Exception:
                logger.exception("ANN snapshot warmup failed (serving "
                                 "continues; first query will compile)")
            with self._ann_lock:
                if self._compact_epoch != epoch:
                    logger.info("ANN snapshot discarded: compaction "
                                "renumbered rows during the build")
                    return
                self._ivf, self._n_snap = ivf, n
            logger.info("ANN snapshot refreshed (%s): %d rows, nlist=%d",
                        self.snapshot_kind, n, ivf.nlist)

    def compact(self) -> None:
        """Compaction renumbers physical rows — the IVF snapshot's
        block_rows would map to the OLD numbering, so invalidate it (the
        next search rebuilds from the compacted corpus)."""
        super().compact()
        with self._ann_lock:
            self._ivf = None
            self._n_snap = 0
            self._compact_epoch += 1

    # ------------------------------------------------------------- persist
    def save(self, path: str) -> None:
        """Checkpoint rows (FlatIndex) + the ANN snapshot when it is safe
        to reuse: ``load`` compacts tombstones (physical rows renumber),
        so the snapshot sidecar is written only for tombstone-free saves
        — at 100M rows that skips an ~18-minute rebuild on restart."""
        import json as _json
        import os as _os

        # stale sidecars go FIRST: a crash after super().save() wrote a
        # tombstoned npz but before the removal would leave a sidecar whose
        # row map silently mismatches the compacted reload
        for sfx in (".ann.npz", ".ann.json"):
            try:
                _os.remove(path + sfx)
            except FileNotFoundError:
                pass
        super().save(path)
        with self._ann_lock:
            ivf, n_snap = self._ivf, self._n_snap
        if ivf is not None and self._n_dead == 0:
            ivf.save(path + ".ann.npz")
            with open(path + ".ann.json", "w") as f:
                _json.dump({"n_snap": int(n_snap),
                            "kind": self.snapshot_kind}, f)

    @classmethod
    def load(cls, path: str, **extra) -> "AnnFlatIndex":
        import json as _json
        import os as _os

        idx = super().load(path, **extra)
        meta_p, snap_p = path + ".ann.json", path + ".ann.npz"
        if _os.path.exists(meta_p) and _os.path.exists(snap_p):
            try:
                with open(meta_p) as f:
                    m = _json.load(f)
                if m.get("kind") == idx.snapshot_kind                         and m.get("n_snap", 0) <= idx.n_rows:
                    if idx.snapshot_kind == "ivfpq":
                        from archi_tpu.engine.ivfpq_index import IVFPQIndex

                        idx._ivf = IVFPQIndex.load(snap_p)
                        idx._ivf.block_rank_sub = idx.block_rank_sub
                    else:
                        idx._ivf = IVFIndex.load(snap_p)
                    idx._n_snap = int(m["n_snap"])
            except Exception:
                logger.exception("ANN snapshot sidecar unreadable; "
                                 "will rebuild")
        return idx

    # ------------------------------------------- out-of-process building
    def export_corpus(self, path: str) -> None:
        """Checkpoint the corpus for an OUT-OF-PROCESS snapshot build
        (``scripts/ann_builder.py``).  On a single chip, an in-process
        rebuild contends with serving for non-preemptible device/compile
        stretches; production deployments instead export the corpus,
        build the IVF/IVF-PQ snapshot in a separate process (another
        chip, or the CPU backend), and ``adopt_snapshot`` the result.
        The export records the compaction epoch so a snapshot whose row
        numbering went stale (compact() renumbers) is refused at adopt.
        """
        import json as _json

        with self._buf_lock:
            n = self.n_rows
        FlatIndex.save(self, path)           # rows only, no ANN sidecar
        with open(path + ".export.json", "w") as f:
            _json.dump({"epoch": self._compact_epoch, "n_rows": int(n),
                        "kind": self.snapshot_kind}, f)

    def adopt_snapshot(self, path: str, *, warm: bool = True) -> bool:
        """Swap in a snapshot built out-of-process from ``export_corpus``
        output.  → True if adopted; False (logged) when the export is
        stale (compaction since export, kind mismatch, missing files).
        """
        import json as _json
        import os as _os

        meta_p, snap_p = path + ".ann.json", path + ".ann.npz"
        exp_p = path + ".export.json"
        if not (_os.path.exists(meta_p) and _os.path.exists(snap_p)):
            logger.warning("adopt_snapshot: no sidecar at %s", path)
            return False
        try:
            with open(meta_p) as f:
                m = _json.load(f)
            exp = {}
            if _os.path.exists(exp_p):
                with open(exp_p) as f:
                    exp = _json.load(f)
            if m.get("kind") != self.snapshot_kind:
                logger.warning("adopt_snapshot: kind %s != %s",
                               m.get("kind"), self.snapshot_kind)
                return False
            if exp.get("epoch", self._compact_epoch) != self._compact_epoch:
                logger.warning("adopt_snapshot: corpus compacted since "
                               "export; snapshot row numbering is stale")
                return False
            if m.get("n_snap", 0) > self.n_rows:
                logger.warning("adopt_snapshot: snapshot covers %s rows, "
                               "index has %s", m.get("n_snap"), self.n_rows)
                return False
            if self.snapshot_kind == "ivfpq":
                from archi_tpu.engine.ivfpq_index import IVFPQIndex

                ivf = IVFPQIndex.load(snap_p)
                ivf.block_rank_sub = self.block_rank_sub
            else:
                ivf = IVFIndex.load(snap_p)
        except Exception:
            logger.exception("adopt_snapshot: unreadable sidecar")
            return False
        if warm:
            try:
                probe = jnp.zeros((1, self.dim), jnp.float32)
                v, _r = ivf.search_dispatch(probe, k=10,
                                            nprobe=self.nprobe)
                jax.block_until_ready(v)
            except Exception:
                logger.exception("adopted-snapshot warmup failed; first "
                                 "query will compile")
        with self._ann_lock:
            self._ivf, self._n_snap = ivf, int(m["n_snap"])
        logger.info("adopted out-of-process ANN snapshot: %d rows",
                    self._n_snap)
        return True

    def _kick_refresh(self) -> None:
        """Start a background snapshot rebuild if one isn't running
        (atomic check-and-spawn: concurrent searches — e.g. 2 batcher
        workers — must not double a minutes-long rebuild)."""
        def guarded():
            try:
                self.refresh_ann()
            except Exception:
                # a failed rebuild must not crash the thread loudly or
                # wedge anything: serving continues on the exact path /
                # stale snapshot, and the next search re-kicks
                logger.exception("background ANN refresh failed; "
                                 "serving continues, will retry")

        with self._kick_lock:
            t = self._refresh_thread
            if t is not None and t.is_alive():
                return
            t = threading.Thread(target=guarded,
                                 name="ann-refresh", daemon=True)
            self._refresh_thread = t
            t.start()

    # ---------------------------------------------------------------- search
    def search(self, queries, k: int = 10, *, filter_mask=None, bias=None,
               impl="auto", nprobe: int | None = None):
        if self._needs_refresh():
            if self.async_refresh:
                # serve from the stale snapshot (or the exact flat path if
                # none exists yet) + exact fresh tail while the rebuild
                # runs off the query path (p99 protection)
                self._kick_refresh()
            else:
                self.refresh_ann()
        with self._ann_lock:
            ivf, n_snap = self._ivf, self._n_snap
        if ivf is None:
            return super().search(queries, k, filter_mask=filter_mask,
                                  bias=bias, impl=impl)
        queries = jnp.asarray(queries, jnp.float32)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if self.normalize:
            queries = _l2_normalize(queries)

        # combined per-row bias over GLOBAL rows (same math as FlatIndex)
        with self._buf_lock:
            emb_snap, alive_snap, n_rows = self.emb, self.alive, self.n_rows
        alive = alive_snap
        if filter_mask is not None:
            fm = jnp.asarray(filter_mask, jnp.float32)
            if fm.shape[0] < self.capacity:
                fm = jnp.pad(fm, (0, self.capacity - fm.shape[0]))
            alive = alive * fm
        row_bias = alive_to_bias(alive)
        if bias is not None:
            from archi_tpu.engine.topk import pad_bias_rows

            row_bias = row_bias + pad_bias_rows(bias, self.capacity)

        k_eff = min(k, max(len(self), 1))
        # ANN over the snapshot (bias permuted to block layout internally;
        # queries already normalized — don't re-normalize scaled hybrids)
        npb = (self.nprobe_blocks
               if self.snapshot_kind == "ivfpq" else None)
        rr = (self.rerank_overfetch
              if self.snapshot_kind == "ivfpq" else 0)
        k_ann = max(k_eff, rr * k_eff) if rr else k_eff
        k_ann = min(k_ann, max(n_snap, 1))
        extra = {"nprobe_blocks": npb} if npb is not None else {}
        if npb is not None and self.cell_gate is not None:
            extra["cell_gate"] = self.cell_gate
        if rr and self.snapshot_kind == "ivfpq":
            # stage-1 returns exactly the rescore candidate set; the PQ
            # refinement rescore would be a pure reorder of it (same
            # argument as the host-rerank tier in ivfpq_index.search)
            extra["refine_overfetch"] = 1
        if self.snapshot_kind == "ivfpq":
            extra["extract"] = self.extract
            extra["hier_t"] = self.hier_t
        a_vals, a_rows = ivf.search_dispatch(
            queries, k=k_ann, nprobe=nprobe or self.nprobe, bias=row_bias,
            normalize_queries=False, **extra)
        if rr and k_ann > k_eff:
            # exact rescore of the over-fetched ADC candidates against the
            # full-precision buffer (row_bias re-applied exactly: the ADC
            # score already included it, the exact score replaces it)
            a_vals, a_rows = _exact_rescore(
                emb_snap, queries, a_vals, a_rows, row_bias, k=k_eff)
        # EXACT scan of the fresh rows [n_snap, n_rows) — static shapes per
        # snapshot (recompiles only at refresh)
        f_vals, f_rows = topk_scores(
            queries, emb_snap[n_snap:], row_bias[..., n_snap:],
            jnp.asarray(n_rows - n_snap, jnp.int32),
            k=k_eff, impl="xla", tile_n=self.tile_n)
        # merge ON DEVICE and pull once (each host pull is a full relay
        # round trip on this rig)
        vals_d, rows_d = _merge_topk(a_vals, a_rows, f_vals, f_rows,
                                     jnp.int32(n_snap))
        vals = np.asarray(vals_d)
        rows = np.asarray(rows_d)
        ids = [
            [self._ids[r] if (v > -1e29 and 0 <= r < len(self._ids))
             else None
             for r, v in zip(rr, vv)]
            for rr, vv in zip(rows, vals)
        ]
        return ids, vals, rows
