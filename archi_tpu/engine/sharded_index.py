"""Corpus-sharded flat index over a TPU device mesh.

The reference has NO distributed compute — its "distributed system" is
Docker services around one Postgres (SURVEY.md §2.9, §5.8).  This is the
TPU-native scaling story: the chunk axis of the embedding matrix is sharded
across devices with ``NamedSharding(P("data", None))``; a query runs the
fused top-k kernel independently per shard under ``shard_map``, then an ICI
``all_gather`` of the per-shard (k scores, k global rows) — bytes, not MBs —
feeds a replicated k-way merge.  Multi-host pods extend the same mesh over
DCN with no code change.

Correctness at shard seams (SURVEY.md §7 "hard parts"):
- global row ids = local row + shard_id * shard_capacity,
- per-shard n_active clamps so partially-filled shards mask padding,
- a shard with fewer than k live rows contributes NEG_INF entries that lose
  the merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from archi_tpu.engine.flat_index import MIN_CAPACITY, FlatIndex
from archi_tpu.engine.topk import _on_tpu, topk_scores


def default_mesh(axis: str = "data", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "tile_n", "impl", "bias2d"),
)
def _sharded_search(queries, emb, bias, n_rows, *, mesh, axis, k, tile_n,
                    impl, bias2d=False):
    """queries [B, D] replicated; emb [N_pad, D] sharded on rows; bias
    [N_pad] (shared) or [B, N_pad] (per-query, bias2d=True — batched
    hybrid) sharded on the row axis.  Returns replicated (vals [B, k],
    global_rows [B, k])."""
    n_shards = mesh.shape[axis]
    shard_cap = emb.shape[0] // n_shards

    def local(q, e_loc, b_loc, n_tot):
        shard = jax.lax.axis_index(axis)
        local_active = jnp.clip(n_tot - shard * shard_cap, 0, shard_cap)
        vals, rows = topk_scores(
            q, e_loc, b_loc, local_active, k=k, tile_n=tile_n, impl=impl
        )
        grows = rows + shard * shard_cap
        # [n_shards, B, k] each — k is tiny, this rides ICI.
        av = jax.lax.all_gather(vals, axis)
        ar = jax.lax.all_gather(grows, axis)
        b = q.shape[0]
        av = jnp.transpose(av, (1, 0, 2)).reshape(b, n_shards * vals.shape[1])
        ar = jnp.transpose(ar, (1, 0, 2)).reshape(b, n_shards * vals.shape[1])
        mvals, mpos = jax.lax.top_k(av, min(k, av.shape[1]))
        mrows = jnp.take_along_axis(ar, mpos, axis=1)
        return mvals, mrows.astype(jnp.int32)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None),
                  P(None, axis) if bias2d else P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, emb, bias, n_rows)


class ShardedFlatIndex(FlatIndex):
    """FlatIndex whose corpus rows are sharded across a device mesh."""

    #: per-query [B, N] bias shards over the row axis (P(None, "data"))
    #: and rides the same shard_map — batched hybrid works on the mesh
    supports_batched_bias = True

    def __init__(self, dim: int, *, mesh: Mesh | None = None,
                 axis: str = "data", **kw):
        self.mesh = mesh if mesh is not None else default_mesh(axis)
        self.axis = axis
        self.n_shards = self.mesh.shape[axis]
        self._row_sharding = NamedSharding(self.mesh, P(axis, None))
        self._vec_sharding = NamedSharding(self.mesh, P(axis))
        self._vec2d_sharding = NamedSharding(self.mesh, P(None, axis))
        super().__init__(dim, **kw)

    def _min_capacity(self) -> int:
        return max(MIN_CAPACITY, self.n_shards * self.tile_n)

    def _reset_buffers(self) -> None:
        # capacity must split evenly into tile-aligned shards
        unit = self.n_shards * self.tile_n
        cap = unit
        while cap < self._min_capacity():
            cap *= 2
        self.capacity = cap
        self.n_rows = 0
        self.emb = jnp.zeros((self.capacity, self.dim), self.dtype)
        self.alive = jnp.zeros((self.capacity,), jnp.float32)
        self._ids = []
        self._id_rows = {}
        self._n_dead = 0
        self._reshard()

    def _reshard(self) -> None:
        self.emb = jax.device_put(self.emb, self._row_sharding)
        self.alive = jax.device_put(self.alive, self._vec_sharding)

    def _grow_to(self, n: int) -> None:
        # Round up so every shard stays tile-aligned.
        unit = self.n_shards * self.tile_n
        target = max(self._min_capacity(), n)
        cap = unit
        while cap < target:
            cap *= 2
        if cap <= self.capacity:
            return
        pad = cap - self.capacity
        # Device-side growth: zero-pad under jit with the row sharding as
        # the output sharding — GSPMD moves the rows that change shards over
        # ICI.  (A host round-trip here was ~6 GB through the relay per
        # doubling at 8M x 384 bf16 — VERDICT r1 weak #3.)  Growths are
        # doublings, so the per-size compile is amortized away.
        grow = jax.jit(
            lambda e, a: (jnp.pad(e, ((0, pad), (0, 0))),
                          jnp.pad(a, ((0, pad),))),
            out_shardings=(self._row_sharding, self._vec_sharding),
        )
        new_emb, new_alive = grow(self.emb, self.alive)
        with self._buf_lock:
            self.emb, self.alive = new_emb, new_alive
            self.capacity = cap

    def add(self, embeddings, ids) -> list[int]:
        rows = super().add(embeddings, ids)
        # keep buffers sharded after jit writes (donated writes preserve the
        # input sharding, but first-write after growth may not)
        if getattr(self.emb, "sharding", None) != self._row_sharding:
            self._reshard()
        return rows

    def search(self, queries, k: int = 10, *, filter_mask=None, bias=None,
               impl="auto"):
        from archi_tpu.engine.flat_index import _l2_normalize
        from archi_tpu.engine.topk import alive_to_bias

        queries = jnp.asarray(queries, jnp.float32)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if self.normalize:
            queries = _l2_normalize(queries)
        with self._buf_lock:  # consistent snapshot vs concurrent ingest
            emb_snap, alive_snap = self.emb, self.alive
            capacity_snap, n_rows_snap = self.capacity, self.n_rows
        alive = alive_snap
        if filter_mask is not None:
            fm = jnp.asarray(filter_mask, jnp.float32)
            if fm.shape[0] < capacity_snap:
                fm = jnp.pad(fm, (0, capacity_snap - fm.shape[0]))
            alive = alive * fm[:capacity_snap]
        row_bias = alive_to_bias(alive)
        if bias is not None:
            from archi_tpu.engine.topk import pad_bias_rows

            row_bias = row_bias + pad_bias_rows(bias, capacity_snap)
        bias2d = row_bias.ndim == 2
        row_bias = jax.device_put(
            row_bias, self._vec2d_sharding if bias2d else self._vec_sharding)

        k_eff = min(k, max(len(self), 1))
        impl_eff = impl
        if impl == "auto":
            impl_eff = "pallas" if (
                _on_tpu() and capacity_snap // self.n_shards >= self.tile_n
            ) else "xla"
        vals, rows = _sharded_search(
            queries, emb_snap, row_bias,
            jnp.asarray(n_rows_snap, jnp.int32),
            mesh=self.mesh, axis=self.axis, k=k_eff, tile_n=self.tile_n,
            impl=impl_eff, bias2d=bias2d,
        )
        vals = np.asarray(vals)
        rows = np.asarray(rows)
        ids = [
            [self._ids[r] if (v > -1e29 and r < len(self._ids)) else None
             for r, v in zip(rr, vv)]
            for rr, vv in zip(rows, vals)
        ]
        return ids, vals, rows
