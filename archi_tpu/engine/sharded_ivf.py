"""Sharded IVF: approximate search over corpora larger than one chip's HBM.

BASELINE config 4 (100M synthetic chunks on a pod slice): the corpus rows
are partitioned across the mesh's devices; each device holds an independent
IVF sub-index (its own centroids + cell-blocked rows) pinned to that
device's memory.  A query fans out to every shard (dispatches are async, so
shards search concurrently), then the per-shard (k scores, k global rows)
merge on the host — the same bytes-sized merge as ``ShardedFlatIndex``,
just without needing a single jit program across shards, which keeps each
shard's gather/top-k local to its device.

Capacity math: a v5e (16 GB) holds ~20M rows at 384-d f32 blocks or ~40M
bf16; 100M rows span a 4–8 chip slice.  Row ids are global; shard s owns
rows [s*shard_size, (s+1)*shard_size).
"""

from __future__ import annotations

import jax
import numpy as np

from archi_tpu.engine.ivf_index import IVFIndex


class ShardedIVFIndex:
    def __init__(self, shards: list[IVFIndex], offsets: list[int], ids):
        self.shards = shards
        self.offsets = offsets  # global row offset per shard
        self._ids = list(ids)

    def __len__(self) -> int:
        return len(self._ids)

    @classmethod
    def build(cls, embeddings, ids, *, devices=None, nlist: int = 1024,
              block: int = 512, iters: int = 10, seed: int = 0,
              dtype=None):
        """Partition rows round-robin-contiguously across devices and build
        one IVF per device."""
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.bfloat16
        devices = list(devices if devices is not None else jax.devices())
        x = np.asarray(embeddings, np.float32)
        n = x.shape[0]
        n_shards = len(devices)
        shard_size = int(np.ceil(n / n_shards))
        shards, offsets = [], []
        for s, dev in enumerate(devices):
            lo, hi = s * shard_size, min((s + 1) * shard_size, n)
            if lo >= hi:
                continue
            sub_ids = list(range(lo, hi))  # local->global row mapping
            with jax.default_device(dev):
                shard = IVFIndex.build(
                    x[lo:hi], sub_ids,
                    nlist=max(1, min(nlist, hi - lo)),
                    block=block, iters=iters, seed=seed + s, dtype=dtype,
                )
            shards.append(shard)
            offsets.append(lo)
        return cls(shards, offsets, ids)

    def search(self, queries, k: int = 10, *, nprobe: int = 64):
        """Fan out to all shards (async dispatch → concurrent devices),
        merge per-shard top-k on the host."""
        queries = np.asarray(queries, np.float32)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        b = queries.shape[0]

        per_shard = [s.search(queries, k=k, nprobe=nprobe)
                     for s in self.shards]
        all_vals = np.concatenate([vals for _i, vals, _r in per_shard],
                                  axis=1)                      # [B, S*k]
        # each shard's ids ARE global rows (built with local->global maps)
        all_rows = np.concatenate([
            np.array([[g if g is not None else -1 for g in row]
                      for row in ids], dtype=np.int64)
            for ids, _v, _r in per_shard
        ], axis=1)
        order = np.argsort(-all_vals, axis=1)[:, :k]
        vals = np.take_along_axis(all_vals, order, axis=1)
        rows = np.take_along_axis(all_rows, order, axis=1)
        ids_out = [
            [self._ids[int(r)] if (v > -1e29 and 0 <= int(r) < len(self._ids))
             else None
             for r, v in zip(rr, vv)]
            for rr, vv in zip(rows, vals)
        ]
        return ids_out, vals, rows
