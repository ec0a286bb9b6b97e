"""Cross-shard merge overhead at fixed corpus size (VERDICT r4 item 5).

SURVEY §5.8 claims the sharded-search collective is "bytes, not MBs";
this measures it.  Fixed total rows (default 1M x 384), shard counts
1/2/4/8 on the virtual CPU mesh, two tiers:

- ``ShardedFlatIndex``: full search vs a scan-only shard_map (identical
  per-shard top-k, NO all_gather/merge) — the delta is the collective +
  replicated k-way merge cost; logical collective traffic is
  ``S * B * k * 8`` bytes (f32 vals + i32 rows).
- ``ShardedXlPQIndex``: per-phase wall times from ``search(profile=...)``
  (dispatch / fetch / host-rerank / merge) + measured fetch bytes.

Honesty note (recorded in the artifact): the 8 virtual CPU devices
timeshare ONE physical core, so per-shard scan time does not drop with
shard count here — the signal is the MERGE column scaling (and staying
microscopic vs the scan), not absolute QPS.  On real v5e ICI the
collective is faster than this CPU emulation, not slower.

Usage: python scripts/bench_shard_scaling.py [OUT.json] [--rows N]
           [--skip-xl]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from archi_tpu.engine.sharded_index import (  # noqa: E402
    ShardedFlatIndex, _sharded_search)
from archi_tpu.engine.sharded_xl import ShardedXlPQIndex  # noqa: E402
from archi_tpu.engine.topk import topk_scores  # noqa: E402

B, K, TRIALS, NQ = 32, 10, 5, 8


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "k", "tile_n",
                                             "impl"))
def _scan_only(queries, emb, bias, n_rows, *, mesh, axis, k, tile_n, impl):
    """The per-shard half of ``_sharded_search`` with NO collective: each
    shard computes its local top-k and the results stay sharded.  The
    full-search delta vs this is the all_gather + replicated merge."""
    n_shards = mesh.shape[axis]
    shard_cap = emb.shape[0] // n_shards

    def local(q, e_loc, b_loc, n_tot):
        shard = jax.lax.axis_index(axis)
        local_active = jnp.clip(n_tot - shard * shard_cap, 0, shard_cap)
        return topk_scores(q, e_loc, b_loc, local_active, k=k,
                           tile_n=tile_n, impl=impl)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P()),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )(queries, emb, bias, n_rows)


def bench_flat(n_total: int, devices, rng) -> dict:
    s = len(devices)
    mesh = Mesh(np.asarray(devices), ("data",))
    idx = ShardedFlatIndex(384, mesh=mesh, normalize=False)
    chunk = 1 << 17
    for i0 in range(0, n_total, chunk):
        n = min(chunk, n_total - i0)
        v = rng.standard_normal((n, 384), np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        idx.add(v, list(range(i0, i0 + n)))
    emb, alive = idx.emb, idx.alive
    from archi_tpu.engine.topk import alive_to_bias

    bias = jax.device_put(alive_to_bias(alive), idx._vec_sharding)
    n_rows = jnp.asarray(idx.n_rows, jnp.int32)

    def qbatch():
        q = rng.standard_normal((B, 384), np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    # warm both jits
    np.asarray(_sharded_search(qbatch(), emb, bias, n_rows, mesh=mesh,
                               axis="data", k=K, tile_n=idx.tile_n,
                               impl="xla")[0])
    np.asarray(_scan_only(qbatch(), emb, bias, n_rows, mesh=mesh,
                          axis="data", k=K, tile_n=idx.tile_n,
                          impl="xla")[0])

    def timed(fn):
        best = float("inf")
        for _ in range(TRIALS):
            qs = [qbatch() for _ in range(NQ)]
            t0 = time.perf_counter()
            for q in qs:
                out = fn(q)
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / NQ)
        return best

    full_s = timed(lambda q: _sharded_search(
        q, emb, bias, n_rows, mesh=mesh, axis="data", k=K,
        tile_n=idx.tile_n, impl="xla"))
    scan_s = timed(lambda q: _scan_only(
        q, emb, bias, n_rows, mesh=mesh, axis="data", k=K,
        tile_n=idx.tile_n, impl="xla"))
    return {
        "shards": s,
        "rows": n_total,
        "full_ms_per_batch32": round(full_s * 1e3, 2),
        "scan_only_ms_per_batch32": round(scan_s * 1e3, 2),
        "merge_overhead_ms": round((full_s - scan_s) * 1e3, 2),
        "collective_bytes_per_batch": s * B * K * 8,
        "query_qps": round(B / full_s, 1),
    }


def bench_xl(n_total: int, devices, rng) -> dict:
    s = len(devices)
    idx = ShardedXlPQIndex(
        384, devices=devices, normalize=False, nlist=256,
        min_snapshot_rows=1 << 16, build_block_rows=1 << 17)
    chunk = 1 << 17
    t_build0 = time.perf_counter()
    for i0 in range(0, n_total, chunk):
        n = min(chunk, n_total - i0)
        v = rng.standard_normal((n, 384), np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        idx.add(v, list(range(i0, i0 + n)))
    idx.refresh_snapshots()
    build_s = time.perf_counter() - t_build0

    def qbatch():
        q = rng.standard_normal((B, 384), np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    idx.search(qbatch(), k=K)  # warm
    best = None
    for _ in range(TRIALS):
        prof: dict = {}
        t0 = time.perf_counter()
        idx.search(qbatch(), k=K, profile=prof)
        prof["total_s"] = time.perf_counter() - t0
        if best is None or prof["total_s"] < best["total_s"]:
            best = prof
    snap_rows = sum(ix._n_snap for ix in idx.shards)
    return {
        "shards": s,
        "rows": n_total,
        "snapshot_rows": int(snap_rows),
        "build_s": round(build_s, 1),
        "dispatch_ms": round(best["dispatch_s"] * 1e3, 2),
        "fetch_ms": round(best["fetch_s"] * 1e3, 2),
        "rerank_ms": round(best["rerank_s"] * 1e3, 2),
        "merge_ms": round(best["merge_s"] * 1e3, 2),
        "fetch_bytes_per_batch": best["fetch_bytes"],
        "ms_per_batch32": round(best["total_s"] * 1e3, 2),
        "query_qps": round(B / best["total_s"], 1),
    }


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args and not args[0].startswith("-") \
        else "benchmark_results/r5/shard_scaling.json"
    n_total = int(args[args.index("--rows") + 1]) if "--rows" in args \
        else 1 << 20
    devices = jax.devices()
    assert len(devices) >= 8, devices
    rng = np.random.default_rng(11)
    flat_rows, xl_rows = [], []
    for s in (1, 2, 4, 8):
        r = bench_flat(n_total, devices[:s], rng)
        print("flat", json.dumps(r), flush=True)
        flat_rows.append(r)
    if "--skip-xl" not in args:
        for s in (1, 2, 4, 8):
            r = bench_xl(n_total, devices[:s], rng)
            print("xl", json.dumps(r), flush=True)
            xl_rows.append(r)
    payload = {
        "setup": (
            f"fixed total rows = {n_total}, dim 384, virtual CPU mesh "
            "(8 devices timesharing ONE physical core — per-shard scan "
            "does not speed up here; the measurement is the merge/"
            "collective columns vs shard count, and that they stay "
            "bytes-sized and ~flat while shard count grows)"),
        "batch": B, "k": K, "trials": TRIALS,
        "sharded_flat": flat_rows,
        "sharded_xl": xl_rows,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
