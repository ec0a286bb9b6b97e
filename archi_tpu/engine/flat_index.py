"""TPU-resident flat (exact) vector index.

Replaces the reference's pgvector ``document_chunks(embedding vector(N))``
plane (``src/cli/templates/init.sql:266-292``) and the KNN/similarity SQL in
``src/data_manager/vectorstore/postgres_vectorstore.py:272-364``.  Instead of
a Postgres table + HNSW index, the corpus lives as a padded device array
``[capacity, D]`` scanned by a fused Pallas matmul+top-k kernel — exact
search, so recall@k vs brute force is 1.0 by construction.

XLA-friendly incremental ingest (SURVEY.md §7 "hard parts"):
- **Static shapes / no recompiles**: capacity is a power of two; appends are
  bucketed ``dynamic_update_slice`` writes, so growth triggers at most
  O(log N) distinct compiled shapes.
- **Deletes are tombstones** (an ``alive`` mask multiplied into scores), not
  array surgery; ``compact()`` reclaims space.  The reference instead issues
  hard SQL DELETEs (``manager.py:234``).
- **Snapshot isolation**: writes are functional updates (no donation) and
  buffer swaps happen under a small lock, so searches running concurrently
  with ingest always read a consistent (emb, alive, n_rows) snapshot
  (BASELINE config 5: streaming ingest under query load).

Chunk identity: each row has an int64-able position; the caller (the
vectorstore manager / catalog) maps rows to chunk ids + metadata.  This class
keeps only ``row -> chunk_id`` (opaque python objects) for convenience.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.engine.topk import alive_to_bias, topk_scores

MIN_CAPACITY = 1024
_WRITE_BUCKETS = (256, 1024, 4096, 16384, 65536)


def _round_capacity(n: int, tile_n: int) -> int:
    cap = MIN_CAPACITY
    while cap < n:
        cap *= 2
    return max(cap, tile_n)


def _bucket(n: int) -> int:
    for b in _WRITE_BUCKETS:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(n)))


def load_npz(path):
    """np.load that tolerates the extension np.savez appends on save
    (``save("x")`` writes ``x.npz``; ``load("x")`` must still work)."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    return np.load(path, allow_pickle=False)


def jsonable_ids(ids):
    """Serialize row ids preserving int/str types.

    Stringifying integer ids on save broke delete-by-id after reload (the
    caller's int key no longer matched the loaded str id) — every index
    serializer must round-trip ids through this helper.  numpy integer
    scalars (np.int64 is NOT a Python int) land as ints too, or ids fed
    from ``np.arange`` would come back as strings.
    """
    import numbers

    return [
        i if (i is None or isinstance(i, (str, int)))
        else int(i) if isinstance(i, numbers.Integral)
        else str(i)
        for i in ids
    ]


# NOTE: no buffer donation here.  Donating the old buffer invalidates it for
# queries already in flight (XLA raises "Buffer has been deleted or donated"
# under concurrent ingest + search — BASELINE config 5).  Functional updates
# give readers snapshot isolation: the old buffer stays alive until its last
# reader drops it.  Cost: one extra device copy per append batch.
@jax.jit
def _write_block(emb, alive, block, alive_block, offset):
    emb = jax.lax.dynamic_update_slice(emb, block, (offset, 0))
    alive = jax.lax.dynamic_update_slice(alive, alive_block, (offset,))
    return emb, alive


@jax.jit
def _mask_rows(alive, rows_onehot):
    return alive * (1.0 - rows_onehot)


@jax.jit
def _l2_normalize(x):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


class FlatIndex:
    """Exact cosine/IP index over a padded device array."""

    #: accepts [B, N] per-query bias in search (batched hybrid); subclasses
    #: whose bias plumbing is row-vector-only override this to False and
    #: TpuVectorStore.hybrid_search_batch falls back to sequential calls
    supports_batched_bias = True

    def __init__(
        self,
        dim: int,
        *,
        dtype=jnp.bfloat16,
        tile_n: int = 4096,
        normalize: bool = True,
        metric: str = "cosine",
    ):
        self.dim = int(dim)
        self.dtype = jnp.dtype(dtype)
        self.tile_n = int(tile_n)
        self.normalize = bool(normalize) and metric == "cosine"
        self.metric = metric
        # guards (emb, alive, n_rows) swaps so searches read a consistent
        # snapshot while ingest runs concurrently
        self._buf_lock = threading.Lock()
        self._reset_buffers()  # sets capacity, n_rows (high-water mark,
        # incl. tombstones), emb, alive, _ids, _id_rows, _n_dead

    # ------------------------------------------------------------------ size
    def __len__(self) -> int:
        return self.n_rows - self._n_dead

    @property
    def n_active(self) -> int:
        return self.n_rows

    # ----------------------------------------------------------------- write
    def _grow_to(self, n: int) -> None:
        new_cap = _round_capacity(n, self.tile_n)
        if new_cap <= self.capacity:
            return
        pad = new_cap - self.capacity
        new_emb = jnp.concatenate(
            [self.emb, jnp.zeros((pad, self.dim), self.dtype)], axis=0
        )
        new_alive = jnp.concatenate(
            [self.alive, jnp.zeros((pad,), jnp.float32)]
        )
        with self._buf_lock:
            self.emb, self.alive = new_emb, new_alive
            self.capacity = new_cap

    def add(self, embeddings, ids: Sequence[Any]) -> list[int]:
        """Append embeddings; returns assigned physical rows."""
        embeddings = jnp.asarray(embeddings)
        n = embeddings.shape[0]
        assert embeddings.shape == (n, self.dim), embeddings.shape
        assert len(ids) == n
        if n == 0:
            return []
        if self.normalize:
            embeddings = _l2_normalize(embeddings)
        if self.dtype == jnp.int8:
            # symmetric quantization of unit-norm rows: round(127 * x)
            embeddings = jnp.clip(
                jnp.round(embeddings.astype(jnp.float32) * 127.0), -127, 127
            ).astype(jnp.int8)
        else:
            embeddings = embeddings.astype(self.dtype)

        offset = self.n_rows
        self._grow_to(offset + n)
        bucket = _bucket(n)
        block = jnp.zeros((bucket, self.dim), self.dtype).at[:n].set(embeddings)
        alive_block = (
            jnp.zeros((bucket,), jnp.float32)
            .at[:n]
            .set(1.0)
        )
        # Clamp so the bucketed write never runs past capacity.
        if offset + bucket > self.capacity:
            self._grow_to(offset + bucket)
        new_emb, new_alive = _write_block(
            self.emb, self.alive, block, alive_block, offset
        )
        with self._buf_lock:
            self.emb, self.alive = new_emb, new_alive
        rows = list(range(offset, offset + n))
        self._ids.extend(ids)
        for r, i in zip(rows, ids):
            self._id_rows.setdefault(i, []).append(r)
        self.n_rows += n
        return rows

    def delete(self, ids: Sequence[Any]) -> int:
        """Tombstone all rows belonging to the given chunk ids."""
        rows: list[int] = []
        for i in ids:
            rows.extend(self._id_rows.pop(i, []))
        if not rows:
            return 0
        onehot = np.zeros((self.capacity,), np.float32)
        onehot[np.asarray(rows, np.int64)] = 1.0
        new_alive = _mask_rows(self.alive, jnp.asarray(onehot))
        with self._buf_lock:
            self.alive = new_alive
        for r in rows:
            self._ids[r] = None
        self._n_dead += len(rows)
        return len(rows)

    def _reset_buffers(self) -> None:
        """Fresh empty buffers at minimum capacity (subclasses re-shard)."""
        self.capacity = _round_capacity(self._min_capacity(), self.tile_n)
        self.n_rows = 0
        self.emb = jnp.zeros((self.capacity, self.dim), self.dtype)
        self.alive = jnp.zeros((self.capacity,), jnp.float32)
        self._ids = []
        self._id_rows = {}
        self._n_dead = 0

    def _min_capacity(self) -> int:
        return MIN_CAPACITY

    def compact(self) -> None:
        """Physically drop tombstoned rows (host round-trip; call rarely)."""
        if self._n_dead == 0:
            return
        emb = np.asarray(self.emb[: self.n_rows].astype(jnp.float32))
        if self.dtype == jnp.int8:
            emb = emb / 127.0  # dequantize; re-add re-quantizes
        keep = [r for r in range(self.n_rows) if self._ids[r] is not None]
        ids = [self._ids[r] for r in keep]
        emb = emb[keep]
        self._reset_buffers()
        if len(ids):
            # rows were normalized already; bypass re-normalization
            saved = self.normalize
            self.normalize = False
            self.add(emb, ids)
            self.normalize = saved

    # ---------------------------------------------------------------- search
    def search_dispatch(self, queries, k: int = 10, *, filter_mask=None,
                        bias=None, impl="auto"):
        """Dispatch the scan and return DEVICE (vals, rows) — callers that
        scan several segments (SegmentedFlatIndex) launch all segments
        before blocking, so per-call host/relay latency isn't paid twice."""
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.normalize:
            queries = _l2_normalize(queries)
        with self._buf_lock:  # consistent (emb, alive, n_rows) snapshot
            emb_snap, alive_snap, n_rows_snap = \
                self.emb, self.alive, self.n_rows
        alive = alive_snap
        if filter_mask is not None:
            fm = jnp.asarray(filter_mask, jnp.float32)
            if fm.shape[0] < self.capacity:
                fm = jnp.pad(fm, (0, self.capacity - fm.shape[0]))
            alive = alive * fm
        row_bias = alive_to_bias(alive)
        if bias is not None:
            # [N] shared or [B, N] per-query (batched hybrid); broadcasts
            from archi_tpu.engine.topk import pad_bias_rows

            row_bias = row_bias + pad_bias_rows(bias, self.capacity)
        k_eff = min(k, max(len(self), 1))
        return topk_scores(
            queries, emb_snap, row_bias, n_rows_snap, k=k_eff, impl=impl,
            tile_n=self.tile_n,
        )

    def search(self, queries, k: int = 10, *, filter_mask=None, bias=None,
               impl="auto"):
        """Top-k search.

        Args:
          queries: [B, D] or [D].
          filter_mask: optional [capacity] (or [n_rows]) 0/1 float mask for
            metadata filtering / per-conversation doc enablement (analog of
            the JSONB filters + 3-tier selection in
            ``postgres_vectorstore.py:317-332``, ``init.sql:315-336``).
          bias: optional [capacity] additive f32 per-row score bias (carries
            ``bm25_weight * bm25`` in hybrid search; queries should then be
            pre-scaled by semantic_weight by the caller).
        Returns:
          (ids: list[list[chunk_id]], scores [B, k] np.f32, rows [B, k]).
        """
        vals, rows = self.search_dispatch(queries, k, filter_mask=filter_mask,
                                          bias=bias, impl=impl)
        squeeze = np.asarray(queries).ndim == 1
        vals = np.asarray(vals)
        rows = np.asarray(rows)
        ids = [
            [self._ids[r] if (v > -1e29 and r < len(self._ids)) else None
             for r, v in zip(rr, vv)]
            for rr, vv in zip(rows, vals)
        ]
        return ids, vals, rows

    # ------------------------------------------------------------- serialize
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        emb_f32 = np.asarray(self.emb[: self.n_rows].astype(jnp.float32))
        if self.dtype == jnp.int8:
            emb_f32 = emb_f32 / 127.0
        np.savez_compressed(
            path,
            emb=emb_f32,
            alive=np.asarray(self.alive[: self.n_rows]),
            meta=json.dumps(
                {
                    "dim": self.dim,
                    "dtype": self.dtype.name,
                    "tile_n": self.tile_n,
                    "metric": self.metric,
                    "ids": jsonable_ids(self._ids),
                }
            ),
        )

    @classmethod
    def load(cls, path: str, **extra) -> "FlatIndex":
        """extra: subclass constructor kwargs (e.g. AnnFlatIndex's
        nlist/nprobe/snapshot_kind on a typed restart)."""
        z = load_npz(path)
        meta = json.loads(str(z["meta"]))
        idx = cls(
            meta["dim"], dtype=meta["dtype"], tile_n=meta["tile_n"],
            metric=meta["metric"], **extra,
        )
        emb = z["emb"]
        alive = z["alive"]
        ids = meta["ids"]
        keep = alive > 0.5
        if keep.any():
            saved = idx.normalize
            idx.normalize = False
            idx.add(emb[keep], [i for i, kp in zip(ids, keep) if kp])
            idx.normalize = saved
        return idx
