"""Hot-tail segmented index: O(tail) appends under query load.

SURVEY §7's last hard part — "streaming ingest under query load (BASELINE
config 5): double-buffered index segments or an un-jitted 'hot tail'
segment merged periodically".  ``FlatIndex`` appends are functional (no
donation — snapshot isolation for concurrent readers), which costs one
full-capacity device copy per batch: ~6 GB at 8M rows, the p99/max spikes
in ``docs/streaming_ingest.md``.  ``SegmentedFlatIndex`` keeps a small hot
TAIL segment that absorbs appends (copies are O(tail capacity)) and merges
into the cold MAIN segment only every ``merge_rows`` rows — one O(main)
copy amortized over many batches.

Correctness invariants:
- GLOBAL row numbering is stable across merges: main owns rows
  [0, n_merged), the tail's physical row i is global ``n_merged + i``, and
  a merge writes the tail block at main offset ``n_merged`` — positions
  never move, so caller-built per-row vectors (BM25 bias, filter masks,
  tombstones) stay aligned.
- A search may race a merge; segments are searched tail-FIRST, so a row is
  observed in the old tail, the new main, or both — never neither.  The
  k-merge dedupes by global row (duplicates carry identical scores).  A
  merge epoch counter retries the (rare) case where a merge completes
  between reading ``n_merged`` and snapshotting the tail.
- Tombstones, ids, and dead counts transfer exactly at merge (raw buffer
  block copy + bookkeeping shift — rows are NOT re-normalized or
  re-quantized).
"""

from __future__ import annotations

import threading
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np

import jax

from archi_tpu.engine.flat_index import FlatIndex, _write_block


@jax.jit
def _combine_segments(m_vals, m_rows, t_vals, t_rows, n_merged):
    vals = jnp.concatenate([m_vals, t_vals], axis=1)
    rows = jnp.concatenate([m_rows, t_rows + n_merged], axis=1)
    return vals, rows


class _GlobalIdRows:
    """Dict-like view of id → [global rows] over both segments."""

    def __init__(self, idx: "SegmentedFlatIndex"):
        self._idx = idx

    def get(self, key, default=None):
        rows = list(self._idx.main._id_rows.get(key, ()))
        shift = self._idx.n_merged
        rows.extend(r + shift for r in self._idx.tail._id_rows.get(key, ()))
        return rows if rows else default

    def __contains__(self, key) -> bool:
        return (key in self._idx.main._id_rows
                or key in self._idx.tail._id_rows)

    def pop(self, key, default=None):
        rows = self.get(key, default)
        self._idx.main._id_rows.pop(key, None)
        self._idx.tail._id_rows.pop(key, None)
        return rows

    def keys(self):
        # union preserving main-then-tail order; the store's ids() /
        # diff-sync iterate this (a tail-only chunk must not be invisible
        # to the hash diff or it re-embeds every sync)
        seen = dict.fromkeys(self._idx.main._id_rows)
        seen.update(dict.fromkeys(self._idx.tail._id_rows))
        return list(seen)

    def __iter__(self):
        return iter(self.keys())


class SegmentedFlatIndex:
    """FlatIndex-compatible surface over a cold MAIN + hot TAIL segment."""

    #: seg_vec slices the row axis of [N] or [B, N] bias alike, and both
    #: segments are FlatIndexes — batched hybrid runs fused
    supports_batched_bias = True

    def __init__(self, dim: int, *, dtype=jnp.bfloat16, tile_n: int = 4096,
                 normalize: bool = True, metric: str = "cosine",
                 merge_rows: int = 1 << 16, tail_tile_n: int = 512):
        self.main = FlatIndex(dim, dtype=dtype, tile_n=tile_n,
                              normalize=normalize, metric=metric)
        self.merge_rows = int(merge_rows)
        self.tail = self._fresh_tail(dim, dtype, tail_tile_n, normalize,
                                     metric)
        self._lock = threading.RLock()
        self._merge_epoch = 0

    def _fresh_tail(self, dim, dtype, tile_n, normalize, metric) -> FlatIndex:
        t = FlatIndex(dim, dtype=dtype, tile_n=tile_n,
                      normalize=normalize, metric=metric)
        # pre-size to the merge threshold: the tail keeps ONE static shape
        # for its whole lifetime, so its scan kernel compiles once and is
        # reused across merges (growth-driven recompiles measured ~1.9 s
        # each through the remote-compile tunnel)
        t._grow_to(self.merge_rows)
        return t

    # -------------------------------------------------- FlatIndex surface
    @property
    def dim(self) -> int:
        return self.main.dim

    @property
    def dtype(self):
        return self.main.dtype

    @property
    def tile_n(self) -> int:
        return self.main.tile_n

    @property
    def normalize(self) -> bool:
        return self.main.normalize

    @property
    def n_merged(self) -> int:
        return self.main.n_rows

    @property
    def n_rows(self) -> int:
        return self.main.n_rows + self.tail.n_rows

    @property
    def capacity(self) -> int:
        # upper bound for caller-built per-global-row vectors
        return self.main.capacity + self.tail.capacity

    @property
    def alive(self):
        """[capacity] liveness aligned to GLOBAL rows (rarely used: the
        bm25-only ranking path builds its bias from this)."""
        nm = self.n_merged
        parts = [self.main.alive[:nm], self.tail.alive]
        used = nm + self.tail.capacity
        if used < self.capacity:
            parts.append(jnp.zeros((self.capacity - used,), jnp.float32))
        return jnp.concatenate(parts)

    @property
    def _id_rows(self):
        return _GlobalIdRows(self)

    @property
    def _n_dead(self) -> int:
        return self.main._n_dead + self.tail._n_dead

    def __len__(self) -> int:
        return len(self.main) + len(self.tail)

    def _global_id(self, row: int):
        if row < self.n_merged:
            ids = self.main._ids
            return ids[row] if row < len(ids) else None
        r = row - self.n_merged
        ids = self.tail._ids
        return ids[r] if r < len(ids) else None

    # ----------------------------------------------------------------- write
    def add(self, embeddings, ids: Sequence[Any]) -> list[int]:
        with self._lock:
            base = self.n_merged
            rows = self.tail.add(embeddings, ids)
            out = [base + r for r in rows]
            if self.tail.n_rows >= self.merge_rows:
                self.merge()
            return out

    def merge(self) -> None:
        """Fold the tail into the main segment (one O(main) copy)."""
        with self._lock:
            t = self.tail
            n_t = t.n_rows
            if n_t == 0:
                return
            m = self.main
            offset = m.n_rows
            m._grow_to(offset + n_t)
            # raw block transfer: dtype rows + alive (tombstones) verbatim;
            # the whole tail-capacity buffer is written (padding rows are
            # dead and land on main padding), keeping the write shape static
            block = t.emb
            if offset + block.shape[0] > m.capacity:
                m._grow_to(offset + block.shape[0])
            new_emb, new_alive = _write_block(
                m.emb, m.alive, block, t.alive, offset)
            with m._buf_lock:
                m.emb, m.alive = new_emb, new_alive
            m._ids.extend(t._ids[:n_t])
            for i, rows in t._id_rows.items():
                m._id_rows.setdefault(i, []).extend(r + offset for r in rows)
            m.n_rows = offset + n_t
            m._n_dead += t._n_dead
            self.tail = self._fresh_tail(t.dim, t.dtype, t.tile_n,
                                         t.normalize, t.metric)
            self._merge_epoch += 1

    def delete(self, ids: Sequence[Any]) -> int:
        with self._lock:
            return self.main.delete(ids) + self.tail.delete(ids)

    def compact(self) -> None:
        with self._lock:
            self.merge()
            self.main.compact()

    # ---------------------------------------------------------------- search
    def search(self, queries, k: int = 10, *, filter_mask=None, bias=None,
               impl="auto"):
        queries = np.asarray(queries, np.float32)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]

        def seg_vec(vec, start: int, seg_cap: int):
            if vec is None:
                return None
            v = np.asarray(vec)
            # row-vector [N] or per-query [B, N] (batched hybrid): the
            # segment slice is always along the LAST (row) axis
            return v[..., start: start + seg_cap]

        # Dispatch BOTH segment scans before blocking on either: the device
        # (or relay) round-trips overlap instead of serializing.
        for _attempt in range(8):
            epoch0 = self._merge_epoch
            nm = self.n_merged
            # tail FIRST: a racing merge duplicates rows (deduped below)
            # rather than dropping them
            t_vals_d, t_rows_d = self.tail.search_dispatch(
                queries, k,
                filter_mask=seg_vec(filter_mask, nm, self.tail.capacity),
                bias=seg_vec(bias, nm, self.tail.capacity), impl=impl)
            if self._merge_epoch == epoch0:
                break
        m_vals_d, m_rows_d = self.main.search_dispatch(
            queries, k,
            filter_mask=seg_vec(filter_mask, 0, self.main.capacity),
            bias=seg_vec(bias, 0, self.main.capacity), impl=impl)
        # combine ON DEVICE so the host pulls the same number of arrays as a
        # single-segment search (each pull is a full relay round trip here)
        vals_d, rows_d = _combine_segments(m_vals_d, m_rows_d, t_vals_d,
                                           t_rows_d, jnp.int32(nm))
        b = queries.shape[0]
        vals = np.asarray(vals_d)
        rows = np.asarray(rows_d)
        k_eff = min(k, vals.shape[1])
        out_ids, out_vals, out_rows = [], [], []
        for qi in range(b):
            order = np.argsort(-vals[qi], kind="stable")
            seen: set[int] = set()
            ids_q, vals_q, rows_q = [], [], []
            for j in order:
                r = int(rows[qi, j])
                v = float(vals[qi, j])
                if r in seen:
                    continue  # merge-race duplicate (identical score)
                seen.add(r)
                ids_q.append(self._global_id(r) if v > -1e29 else None)
                vals_q.append(v)
                rows_q.append(r)
                if len(rows_q) == k_eff:
                    break
            out_ids.append(ids_q)
            out_vals.append(vals_q)
            out_rows.append(rows_q)
        return (out_ids, np.asarray(out_vals, np.float32),
                np.asarray(out_rows, np.int64))

    # ------------------------------------------------------------- serialize
    def save(self, path: str) -> None:
        with self._lock:
            self.merge()
            self.main.save(path)

    @classmethod
    def load(cls, path: str, **kw) -> "SegmentedFlatIndex":
        main = FlatIndex.load(path)
        idx = cls(main.dim, dtype=main.dtype, tile_n=main.tile_n,
                  normalize=main.normalize, metric=main.metric, **kw)
        idx.main = main
        return idx


