"""Sharded IVF-PQ: config 4's pod-slice shape with PQ-compressed shards.

Same fan-out/merge design as ``ShardedIVFIndex`` (rows partitioned
contiguously across devices, per-shard search, bytes-sized host merge),
but each device holds an ``IVFPQIndex`` — so the per-chip capacity is set
by the CODE size, not the vector size.  Capacity math at 384-d:

| per-chip index | rows/chip (16 GB) | 100M needs |
|---|---|---|
| bf16 IVF blocks | ~20M | 5+ chips |
| IVF-PQ m=48+48  | ~120M | ONE chip  |

i.e. a 4-chip slice holds ~500M chunks, or trades the headroom for
larger refinement codecs / full-precision rerank tiers.

The global additive-bias contract (tombstones / filters / hybrid BM25 by
global row) is supported: each shard receives the slice of the bias
vector covering its contiguous row range.
"""

from __future__ import annotations

import jax
import numpy as np

from archi_tpu.engine.ivfpq_index import IVFPQIndex


class ShardedIVFPQIndex:
    def __init__(self, shards: list[IVFPQIndex], offsets: list[int], ids):
        self.shards = shards
        self.offsets = offsets  # global row offset per shard
        self._ids = list(ids) if ids is not None else None
        self._n = sum(len(s) for s in shards)

    def __len__(self) -> int:
        return self._n

    @classmethod
    def build(cls, embeddings, ids=None, *, devices=None, nlist: int = 1024,
              block: int = 512, m: int = 48, refine_m: int = 48,
              seed: int = 0, **kw):
        """Partition rows contiguously across devices; one IVF-PQ each."""
        devices = list(devices if devices is not None else jax.devices())
        x = np.asarray(embeddings, np.float32)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        n = x.shape[0]
        n_shards = len(devices)
        shard_size = int(np.ceil(n / n_shards))
        shards, offsets = [], []
        for s, dev in enumerate(devices):
            lo, hi = s * shard_size, min((s + 1) * shard_size, n)
            if lo >= hi:
                continue
            with jax.default_device(dev):
                shard = IVFPQIndex.build(
                    x[lo:hi], None,
                    nlist=max(1, min(nlist, hi - lo)), block=block,
                    m=m, refine_m=refine_m, seed=seed + s, **kw)
            shards.append(shard)
            offsets.append(lo)
        return cls(shards, offsets, ids)

    def search(self, queries, k: int = 10, *, nprobe: int = 64,
               nprobe_blocks: int | None = None,
               cell_gate: int | None = None, bias=None,
               refine_overfetch: int | None = None, rerank_store=None,
               rerank_overfetch: int = 4):
        """Fan out (async dispatch → shards search concurrently), merge the
        per-shard (vals, global rows) on the host.  bias: f32 by GLOBAL
        row; each shard gets its contiguous slice.  rerank_store: optional
        global-row-aligned ``HostVectorStore`` for the exact final tier."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if bias is not None:
            bias = np.asarray(bias, np.float32)
        if refine_overfetch is None:
            # same resolution as IVFPQIndex.search: with a host rerank the
            # refine rescore is a pure reorder of the candidate set
            refine_overfetch = 1 if rerank_store is not None else 8
        k1 = k if rerank_store is None else max(k, rerank_overfetch * k)

        dispatched = []
        for shard, lo in zip(self.shards, self.offsets):
            sb = None if bias is None else bias[lo: lo + len(shard)]
            dispatched.append((lo, shard.search_dispatch(
                queries, k=k1, nprobe=nprobe, nprobe_blocks=nprobe_blocks,
                cell_gate=cell_gate,
                bias=sb, refine_overfetch=refine_overfetch)))
        # one tree fetch across all shards (each blocking np.asarray pull
        # costs a full RTT on a relay-tunneled device)
        fetched = jax.device_get([(v, r) for _lo, (v, r) in dispatched])
        all_vals = np.concatenate([v for v, _r in fetched], axis=1)
        all_rows = np.concatenate([
            np.where(r >= 0, r.astype(np.int64) + lo, -1)
            for (_v, r), (lo, _d) in zip(fetched, dispatched)
        ], axis=1)                                            # [B, S*k]
        if rerank_store is not None:
            from archi_tpu.engine.host_store import exact_rerank

            qn = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
            vals, rows = exact_rerank(rerank_store, qn, all_vals, all_rows,
                                      k=k, bias=bias)
        else:
            order = np.argsort(-all_vals, axis=1)[:, :k]
            vals = np.take_along_axis(all_vals, order, axis=1)
            rows = np.take_along_axis(all_rows, order, axis=1)
        ids_out = [
            [(self._ids[int(r)] if self._ids is not None else int(r))
             if (v > -1e29 and r >= 0) else None
             for r, v in zip(rr, vv)]
            for rr, vv in zip(rows, vals)
        ]
        return ids_out, vals, rows
