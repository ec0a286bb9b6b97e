"""Sharded XL serving tier: the beyond-HBM index composed with the mesh.

BASELINE config 4 names a v5e POD SLICE; ``XlPQIndex`` proved the serving
shape on one chip (host full-precision plane + device IVF-PQ snapshot +
device exact fresh tail + tombstones + exact host rerank — see
``engine/xl_index.py``).  This composes S of them over a device mesh with
the full serving contract preserved (VERDICT r3 item 2):

- **per-shard codes + fresh tail + tombstones**: each device owns an
  ``XlPQIndex`` whose host plane is its own memmap (on a multi-host pod
  each host process memmaps only its shard — the per-host rerank tier);
- **dense global rows**: rows are numbered in insertion order across the
  whole tier (the ``TpuVectorStore`` bias/filter/enablement contract is
  a vector indexed by global row, so global rows must stay dense under
  growth); a host-side map routes global row ↔ (shard, local row).
  Incoming batches go to the currently-smallest shard, so shards stay
  balanced without splitting a batch;
- **overlapped fan-out**: every shard's device work (ADC probe + tail
  scan) is dispatched asynchronously first (``search_dispatch_parts``),
  fetched in ONE ``jax.device_get`` tree call (each blocking pull costs
  a relay RTT), then host-reranked per shard against that shard's memmap
  and k-way merged globally — the same dispatch/merge shape as
  ``ShardedIVFPQIndex`` with the XL tiers inside;
- **snapshot adopt across shards**: each shard refreshes its own IVF-PQ
  snapshot from its own host plane on its own growth schedule (adds
  trigger ``_maybe_refresh`` per shard), so a refresh never blocks the
  other shards' serving.

Exactness: per-shard results are exact inner products (host-reranked
snapshot candidates + exact tail), so merging per-shard top-k gives the
true top-k of the union of candidate sets — cross-shard recall equals
single-index recall at equal probe budget (tested:
``tests/unit/test_sharded_xl.py``).

Reference mapping: pgvector's single-Postgres ANN plane
(``src/cli/templates/init.sql:282-292``) has no multi-node analog; this
is the scaling story the reference lacks (SURVEY §2.9, §5.8).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.engine.flat_index import jsonable_ids, load_npz
from archi_tpu.engine.xl_index import XlPQIndex
from archi_tpu.ops.pallas_topk import NEG_INF


class ShardedXlPQIndex:
    supports_batched_bias = True

    def __init__(self, dim: int, *, devices=None, store_dir: str | None =
                 None, stores=None, normalize: bool = True,
                 snapshot_sources=None, **xl_kw):
        """``store_dir``: per-shard host memmaps land there
        (``shard<j>.bf16``); None keeps every shard's plane in RAM.
        ``stores``: pre-built per-shard ``HostVectorStore``s instead
        (e.g. zero-copy ``HostVectorStore.view`` windows over one big
        corpus plane — pair with ``adopt_stores``).
        ``snapshot_sources``: optional per-shard out-of-band snapshot
        block providers (see ``XlPQIndex.snapshot_source``).
        ``xl_kw`` forwards to each shard's ``XlPQIndex`` (nlist, pq_m,
        nprobe_blocks, min_snapshot_rows, build_block_rows, ...)."""
        self.dim = int(dim)
        self.normalize = bool(normalize)
        self.devices = list(devices if devices is not None
                            else jax.devices())
        self.store_dir = store_dir
        if store_dir:
            os.makedirs(store_dir, exist_ok=True)
        if stores is not None:
            assert len(stores) == len(self.devices), \
                (len(stores), len(self.devices))
        self.shards: list[XlPQIndex] = []
        for j, dev in enumerate(self.devices):
            sp = (os.path.join(store_dir, f"shard{j}.bf16")
                  if store_dir else None)
            if stores is not None:
                xl_kw = dict(xl_kw, store=stores[j])
                sp = None
            if snapshot_sources is not None:
                xl_kw = dict(xl_kw, snapshot_source=snapshot_sources[j])
            with jax.default_device(dev):
                # shards see pre-normalized rows/queries (one normalize at
                # the wrapper); async refresh stays off so CPU-mesh tests
                # are deterministic — flip per shard via xl_kw if wanted
                self.shards.append(XlPQIndex(
                    dim, store_path=sp, normalize=False, **xl_kw))
        # dense global rows: insertion order across the tier.  All row
        # bookkeeping lives in geometrically-grown numpy buffers (valid
        # prefix = n_rows / _gcount[s]) — per-add np.concatenate or
        # per-search list→array conversion would be O(N) hot-path work
        # at the 100M-row scale this tier targets
        self._shard_of = np.zeros((0,), np.int32)    # global row -> shard
        self._local_of = np.zeros((0,), np.int64)    # global row -> local
        self._grows = [np.zeros((0,), np.int64) for _ in self.shards]
        self._gcount = [0 for _ in self.shards]      # valid prefix per shard
        self._alive_buf = np.zeros((0,), np.float32)
        self._ids: list = []                         # global row -> id
        self._id_rows: dict = {}                     # id -> [global rows]
        self._n_dead = 0

    def _global_rows(self, s: int) -> np.ndarray:
        return self._grows[s][:self._gcount[s]]

    @staticmethod
    def _grown(buf: np.ndarray, used: int, extra: int,
               fill=0) -> np.ndarray:
        if used + extra <= buf.shape[0]:
            return buf
        cap = max(used + extra, 2 * buf.shape[0], 1024)
        out = np.full((cap,), fill, buf.dtype)
        out[:used] = buf[:used]
        return out

    # ------------------------------------------------------------------ size
    def __len__(self) -> int:
        return len(self._ids) - self._n_dead

    @property
    def n_rows(self) -> int:
        return len(self._ids)

    @property
    def capacity(self) -> int:
        return max(self.n_rows, 1)

    @property
    def n_shards(self) -> int:
        return len(self.shards)

    @property
    def alive(self):
        """[capacity] f32 by GLOBAL row (pure-lexical ranking path)."""
        n = self.n_rows
        if n == 0:
            return jnp.zeros((self.capacity,), jnp.float32)
        return jnp.asarray(self._alive_buf[:n])

    # ----------------------------------------------------------------- write
    def add(self, embeddings, ids: Sequence[Any]) -> list[int]:
        embeddings = np.asarray(embeddings, np.float32)
        n = embeddings.shape[0]
        assert len(ids) == n
        if n == 0:
            return []
        if self.normalize:
            embeddings = embeddings / np.maximum(
                np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12)
        # whole batch to the smallest shard: balanced over time, and the
        # shard's snapshot-refresh accounting sees one coherent append
        s = int(np.argmin([ix.n_rows for ix in self.shards]))
        shard = self.shards[s]
        with jax.default_device(self.devices[s]):
            local = shard.add(embeddings, ids)
        g0 = self.n_rows
        grows = list(range(g0, g0 + n))
        self._shard_of = self._grown(self._shard_of, g0, n)
        self._shard_of[g0:g0 + n] = s
        self._local_of = self._grown(self._local_of, g0, n)
        self._local_of[g0:g0 + n] = np.asarray(local, np.int64)
        gc = self._gcount[s]
        self._grows[s] = self._grown(self._grows[s], gc, n)
        self._grows[s][gc:gc + n] = np.arange(g0, g0 + n, dtype=np.int64)
        self._gcount[s] = gc + n
        self._alive_buf = self._grown(self._alive_buf, g0, n)
        self._alive_buf[g0:g0 + n] = 1.0
        self._ids.extend(ids)
        for g, i in zip(grows, ids):
            self._id_rows.setdefault(i, []).append(g)
        return grows

    def delete(self, ids: Sequence[Any]) -> int:
        grows: list[int] = []
        for i in ids:
            grows.extend(self._id_rows.pop(i, []))
        if not grows:
            return 0
        # each owning shard tombstones by id (snapshot bias + tail alive)
        shard_set = {int(self._shard_of[g]) for g in grows}
        for s in shard_set:
            self.shards[s].delete(list(ids))
        for g in grows:
            self._ids[g] = None
        self._alive_buf[np.asarray(grows, np.int64)] = 0.0
        self._n_dead += len(grows)
        return len(grows)

    def refresh_snapshots(self) -> None:
        """Force a snapshot rebuild on every shard (adds trigger per-shard
        refresh automatically; this is the bulk-adopt hook)."""
        for s, shard in enumerate(self.shards):
            with jax.default_device(self.devices[s]):
                shard.refresh_snapshot()

    def adopt_stores(self, ids_per_shard, *, refresh: bool = True) -> None:
        """Register pre-filled per-shard host planes (``XlPQIndex.
        adopt_store``): the bulk-load path for corpus shards disk-sliced
        from one big plane via ``HostVectorStore.view`` — no re-upload
        through ``add``.  Global rows are assigned shard-major in shard
        order; may only be called on a fresh tier."""
        assert self.n_rows == 0, "adopt_stores requires a fresh tier"
        for s, ids in enumerate(ids_per_shard):
            with jax.default_device(self.devices[s]):
                self.shards[s].adopt_store(ids, refresh=refresh)
            n = len(ids)
            g0 = self.n_rows
            self._shard_of = self._grown(self._shard_of, g0, n)
            self._shard_of[g0:g0 + n] = s
            self._local_of = self._grown(self._local_of, g0, n)
            self._local_of[g0:g0 + n] = np.arange(n, dtype=np.int64)
            self._grows[s] = self._grown(self._grows[s], 0, n)
            self._grows[s][:n] = np.arange(g0, g0 + n, dtype=np.int64)
            self._gcount[s] = n
            self._alive_buf = self._grown(self._alive_buf, g0, n)
            self._alive_buf[g0:g0 + n] = 1.0
            self._ids.extend(ids)
            for j, i in enumerate(ids):
                self._id_rows.setdefault(i, []).append(g0 + j)

    # ---------------------------------------------------------------- search
    def _slice_to_shard(self, vec: Optional[np.ndarray], s: int,
                        fill: float = 0.0) -> Optional[np.ndarray]:
        """Global-row vector ([N] or [B, N]) → this shard's local layout."""
        if vec is None:
            return None
        g = self._global_rows(s)
        shard_n = self.shards[s].n_rows
        if vec.ndim == 1:
            out = np.full((shard_n,), fill, np.float32)
            valid = g < vec.shape[0]
            out[self._local_of[g[valid]]] = vec[g[valid]]
        else:
            out = np.full((vec.shape[0], shard_n), fill, np.float32)
            valid = g < vec.shape[1]
            out[:, self._local_of[g[valid]]] = vec[:, g[valid]]
        return out

    def search(self, queries, k: int = 10, *, filter_mask=None, bias=None,
               impl="auto", nprobe_blocks: int | None = None,
               profile: dict | None = None):
        """``profile``: optional dict that receives per-phase wall times
        (``dispatch_s`` / ``fetch_s`` / ``rerank_s`` / ``merge_s``) plus
        ``fetch_bytes`` — the cross-shard traffic of the query.  Feeds the
        trace/metrics plane and ``scripts/bench_shard_scaling.py``."""
        import time as _time
        _t0 = _time.perf_counter()
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.normalize:
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        b = queries.shape[0]
        fm = None if filter_mask is None \
            else np.asarray(filter_mask, np.float32)
        ub = None if bias is None else np.asarray(bias, np.float32)

        # phase 1: dispatch every shard's device work (non-blocking)
        dispatched = []
        for s, shard in enumerate(self.shards):
            if shard.n_rows == 0:
                continue
            # short-mask convention (FlatIndex): rows past the global
            # mask's length are EXCLUDED — fill=0 preserves that per shard
            sfm = self._slice_to_shard(fm, s)
            sub = self._slice_to_shard(ub, s)
            with jax.default_device(self.devices[s]):
                parts, ctx = shard.search_dispatch_parts(
                    queries, k, filter_mask=sfm, bias=sub, impl=impl,
                    nprobe_blocks=nprobe_blocks)
            dispatched.append((s, parts, ctx))

        if not dispatched:
            vals = np.full((b, k), NEG_INF, np.float32)
            rows = np.full((b, k), -1, np.int64)
            return [[None] * k for _ in range(b)], vals, rows

        _t1 = _time.perf_counter()
        # phase 2: ONE tree fetch across all shards (relay-RTT-bound)
        fetched = jax.device_get([parts for _s, parts, _c in dispatched])
        _t2 = _time.perf_counter()

        # phase 3: per-shard host rerank + local→global row mapping
        all_v, all_r = [], []
        for (s, _parts, ctx), host_parts in zip(dispatched, fetched):
            sv, sr = self.shards[s].search_finalize_parts(ctx, host_parts)
            gmap = self._global_rows(s)
            ok = (sv > -1e29) & (sr >= 0) & (sr < gmap.shape[0])
            gr = np.where(ok, gmap[np.clip(sr, 0, gmap.shape[0] - 1)], -1)
            all_v.append(np.where(ok, sv, NEG_INF))
            all_r.append(gr)

        _t3 = _time.perf_counter()
        av = np.concatenate(all_v, axis=1)
        ar = np.concatenate(all_r, axis=1)
        kk = min(k, av.shape[1])
        order = np.argsort(-av, axis=1)[:, :kk]
        vals = np.take_along_axis(av, order, axis=1)
        rows = np.take_along_axis(ar, order, axis=1)
        if kk < k:
            vals = np.pad(vals, ((0, 0), (0, k - kk)),
                          constant_values=NEG_INF)
            rows = np.pad(rows, ((0, 0), (0, k - kk)), constant_values=-1)
        ids = [
            [self._ids[int(r)] if (v > -1e29 and 0 <= r < self.n_rows)
             else None
             for r, v in zip(rr, vv)]
            for rr, vv in zip(rows, vals)
        ]
        if profile is not None:
            flat = jax.tree_util.tree_leaves(fetched)
            profile.update(
                dispatch_s=_t1 - _t0, fetch_s=_t2 - _t1,
                rerank_s=_t3 - _t2,
                merge_s=_time.perf_counter() - _t3,
                fetch_bytes=int(sum(a.nbytes for a in flat)))
        return ids, vals, rows

    # -------------------------------------------------------------- persist
    def save(self, path: str) -> None:
        base = path[:-4] if path.endswith(".npz") else path
        for s, shard in enumerate(self.shards):
            shard.save(f"{base}.shard{s}")
        n = self.n_rows
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            shard_of=self._shard_of[:n], local_of=self._local_of[:n],
            meta=json.dumps({
                "dim": self.dim, "n_shards": self.n_shards,
                "ids": jsonable_ids(self._ids),
                "store_dir": self.store_dir,
                "normalize": self.normalize,
            }))

    @classmethod
    def load(cls, path: str, *, devices=None, **xl_kw) -> \
            "ShardedXlPQIndex":
        z = load_npz(path)
        meta = json.loads(str(z["meta"]))
        base = path[:-4] if path.endswith(".npz") else path
        idx = cls.__new__(cls)
        idx.dim = meta["dim"]
        idx.normalize = bool(meta.get("normalize", True))
        idx.devices = list(devices if devices is not None
                           else jax.devices())[:meta["n_shards"]]
        if len(idx.devices) != meta["n_shards"]:
            raise ValueError(
                f"checkpoint has {meta['n_shards']} shards; "
                f"{len(idx.devices)} devices available")
        idx.store_dir = meta["store_dir"]
        idx.shards = []
        for s, dev in enumerate(idx.devices):
            with jax.default_device(dev):
                idx.shards.append(XlPQIndex.load(f"{base}.shard{s}",
                                                 **xl_kw))
        idx._shard_of = np.asarray(z["shard_of"], np.int32)
        idx._local_of = np.asarray(z["local_of"], np.int64)
        # vectorized shard partition (a per-row Python loop is minutes of
        # work + multi-GB int lists at the 100M rows this tier targets)
        idx._grows = [np.nonzero(idx._shard_of == s)[0].astype(np.int64)
                      for s in range(len(idx.shards))]
        idx._gcount = [g.shape[0] for g in idx._grows]
        ids = meta["ids"]
        idx._ids = list(ids)
        idx._alive_buf = np.fromiter((i is not None for i in ids),
                                     np.float32, count=len(ids))
        idx._id_rows = {}
        for g, i in enumerate(ids):
            if i is not None:
                idx._id_rows.setdefault(i, []).append(g)
        idx._n_dead = sum(1 for i in ids if i is None)
        return idx
