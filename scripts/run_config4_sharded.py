"""BASELINE config 4 THROUGH the sharded XL serving tier (VERDICT r5
item 7): the 100M corpus served by ``ShardedXlPQIndex`` — per-shard host
plane + IVF-PQ snapshot + exact host rerank + global merge — not just by
the single-chip ``IVFPQIndex`` the headline sweep uses.

One real chip plays all shards (``devices=[tpu0]*S`` — per-shard device
work serializes, so QPS here is a lower bound on a real S-chip slice
where dispatches overlap over ICI; recall is EXACTLY what a pod slice
would return, since per-shard results are exact host-rescored inner
products and the merge is a global top-k).  The corpus plane is the
run_config4 host store, disk-sliced into zero-copy per-shard views
(``HostVectorStore.view``) and bulk-adopted (``adopt_stores``) — the
snapshot builds stream each shard's plane through the device encoder
with the SAME treatments as the single-index sweep (spill 0.15, OPQ 4).

Parity protocol: equal TOTAL probe budget (per-shard ``nprobe_blocks`` =
budget/S) and equal TOTAL exact-rerank candidates (per-shard overfetch =
C/(k*S)) vs the single-index sweep rows in CONFIG4_r05.json.

Usage: python scripts/run_config4_sharded.py [out.json]
          [--shards 4] [--blocks-per-shard 24] [--merge-into CONFIG4.json]
          [--store /tmp/archi_host_store/config4.bf16]
          [--budgets 2048,4096,8192]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args and not args[0].startswith("-") \
        else "benchmark_results/r5/cfg4_sharded_xl.json"
    n_shards = int(args[args.index("--shards") + 1]) \
        if "--shards" in args else 4
    bps = int(args[args.index("--blocks-per-shard") + 1]) \
        if "--blocks-per-shard" in args else 24
    store_path = args[args.index("--store") + 1] if "--store" in args \
        else "/tmp/archi_host_store/config4.bf16"
    budgets = [int(x) for x in (
        args[args.index("--budgets") + 1] if "--budgets" in args
        else "2048,4096,8192").split(",")]
    merge_into = args[args.index("--merge-into") + 1] \
        if "--merge-into" in args else None

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/archi_tpu_jax_cache")
    import jax.numpy as jnp
    import ml_dtypes

    from archi_tpu.benchmarking.synth_corpus import BLOCK_ROWS, D, \
        make_block_fn
    from archi_tpu.benchmarking.timing import measure_relay_rtt
    from archi_tpu.engine.host_store import HostVectorStore
    from archi_tpu.engine.sharded_xl import ShardedXlPQIndex
    from archi_tpu.engine.topk import topk_scores

    B, K = 32, 10
    per_shard = bps * BLOCK_ROWS
    N = n_shards * per_shard
    # the parent plane was filled for the FULL 96-block generator; any
    # prefix of it is valid only if we regenerate GT with the same
    # n_blocks parameterization — so require the full-size store and use
    # its first N rows with the matching 96-block block_fn
    parent = HostVectorStore(D, path=store_path, capacity=96 * BLOCK_ROWS,
                             dtype=ml_dtypes.bfloat16)
    total_blocks = len(parent) // BLOCK_ROWS
    assert N <= len(parent), (N, len(parent))
    block_fn = make_block_fn(jax.random.PRNGKey(0), total_blocks)

    dev = jax.devices()[0]
    views = [HostVectorStore.view(parent, s * per_shard, (s + 1) * per_shard)
             for s in range(n_shards)]
    t0 = time.time()
    # snapshot sources: each shard's plane slice is exactly bps generator
    # blocks, so its snapshot builds from device-REGENERATED blocks (bit-
    # identical to the plane, verified below) instead of uploading the
    # 77 GB plane back through the relay at ~MB/s
    sources = [
        (lambda i, s=s: block_fn(s * bps + i)) for s in range(n_shards)]
    for s in (0, n_shards - 1):
        probe = np.array([0, per_shard // 2, per_shard - 1])
        dev_rows = np.stack([
            np.asarray(block_fn(int((s * per_shard + r) // BLOCK_ROWS))
                       [int(r % BLOCK_ROWS)]) for r in probe])
        assert np.array_equal(
            dev_rows.view(np.uint16),
            np.asarray(views[s]._buf[probe]).view(np.uint16)), \
            f"shard {s} plane rows != device-regenerated rows"
    print("snapshot sources verified bit-identical vs shard planes",
          flush=True)
    idx = ShardedXlPQIndex(
        D, devices=[dev] * n_shards, stores=views, normalize=False,
        snapshot_sources=sources,
        nlist=16384 // n_shards, block=512, pq_m=96, pq_refine_m=96,
        ksub=16, pq_spill=0.15, pq_opq_iters=4,
        rerank_overfetch=max(1, 320 // (K * n_shards)),
        build_block_rows=BLOCK_ROWS, min_snapshot_rows=1 << 17)
    idx.adopt_stores([list(range(s * per_shard, (s + 1) * per_shard))
                      for s in range(n_shards)])
    build_s = time.time() - t0
    print(f"adopted+built {n_shards} shards x {per_shard} rows "
          f"in {build_s:.0f}s", flush=True)

    # --- queries: noisy copies of stored rows (same protocol as
    # run_config4, same seed stream)
    rng = np.random.default_rng(1)
    q_src = np.sort(rng.choice(N, B, replace=False))
    q = parent._buf[q_src].astype(np.float32)
    q = q + 0.03 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qd = jnp.asarray(q)

    # --- exact GT: f32 streaming scan over the first N rows' blocks
    t0 = time.time()
    parts_v, parts_r = [], []
    zero_bias = jnp.zeros((BLOCK_ROWS,), jnp.float32)
    for i in range(N // BLOCK_ROWS):
        v, r = topk_scores(qd, block_fn(i).astype(jnp.float32), zero_bias,
                           BLOCK_ROWS, k=K, impl="pallas")
        parts_v.append(v)
        parts_r.append(r + i * BLOCK_ROWS)
    av = jnp.concatenate(parts_v, axis=1)
    ar = jnp.concatenate(parts_r, axis=1)
    mv, mp = jax.lax.top_k(av, K)
    exact = np.asarray(jnp.take_along_axis(ar, mp, axis=1))
    print(f"exact GT scan: {time.time() - t0:.0f}s", flush=True)

    q64 = q.astype(np.float64)
    gt_tau = np.empty(B, np.float64)
    for b in range(B):
        g = parent._buf[exact[b]].astype(np.float64)
        gt_tau[b] = float(np.min(g @ q64[b]))

    rtt = measure_relay_rtt()
    sweep = []
    for budget in budgets:
        per_probe = max(1, budget // n_shards)
        prof: dict = {}
        ids, vals, rows = idx.search(qd, k=K, nprobe_blocks=per_probe,
                                     profile=prof)
        strict = float(np.mean([
            len(set(np.asarray(rows)[b]) & set(exact[b])) / K
            for b in range(B)]))
        hits = 0
        for b in range(B):
            rb = np.unique(np.asarray(rows[b], np.int64))
            g = parent._buf[np.clip(rb, 0, len(parent) - 1)].astype(
                np.float64)
            hits += min(K, int(np.sum(g @ q64[b] >= gt_tau[b] - 1e-9)))
        score_rec = hits / (B * K)
        top1 = float(np.mean(np.asarray(rows)[:, 0] == q_src))

        # QPS: unchained disjoint batches, relay RTT subtracted once per
        # batch (the sharded search syncs internally; the real-slice
        # number overlaps shard dispatches that serialize here)
        reps, trials, best = 6, 3, float("inf")
        qvars = []
        for _ in range(trials * reps):
            qv = q + 0.01 * rng.standard_normal(q.shape).astype(np.float32)
            qv /= np.linalg.norm(qv, axis=1, keepdims=True)
            qvars.append(qv)
        for t in range(trials):
            tt = time.time()
            for qv in qvars[t * reps:(t + 1) * reps]:
                idx.search(qv, k=K, nprobe_blocks=per_probe)
            # one tree fetch per search — subtract exactly one RTT
            # (dispatch uploads are async); undercorrecting is the
            # honest direction
            best = min(best, max((time.time() - tt) / reps - rtt, 1e-9))
        sweep.append({
            "total_probe_blocks": budget,
            "per_shard_probe_blocks": per_probe,
            "total_rerank_c": K * idx.shards[0].rerank_overfetch * n_shards,
            "recall_strict_at_10": round(strict, 3),
            "recall_score_at_10": round(score_rec, 4),
            "self_top1": round(top1, 3),
            "ms_per_batch32": round(best * 1e3, 1),
            "query_qps": round(B / best, 1),
            "phase_ms": {k2: round(v2 * 1e3, 1)
                         for k2, v2 in prof.items() if k2.endswith("_s")},
            "fetch_bytes_per_batch": prof.get("fetch_bytes"),
        })
        print(json.dumps(sweep[-1]), flush=True)

    payload = {
        "config": f"BASELINE config 4 served THROUGH ShardedXlPQIndex: "
                  f"{n_shards} shards x {per_shard} rows on ONE v5e chip "
                  f"(devices=[tpu0]*{n_shards}; per-shard work serializes "
                  f"— QPS is a lower bound on a real {n_shards}-chip "
                  f"slice; recall is exactly the pod-slice result). "
                  f"Per-shard: zero-copy plane view + IVF-PQ snapshot "
                  f"(spill 0.15, OPQ 4, nlist={16384 // n_shards}) + "
                  f"exact host rerank; global top-k merge.",
        "rows": int(N), "dim": D, "shards": n_shards,
        "build_s": round(build_s, 1),
        "relay_rtt_ms": round(rtt * 1e3, 1),
        "parity_protocol": "equal TOTAL probe budget (per-shard = "
                           "budget/S) and equal total exact-rerank "
                           "candidates (320) vs the single-index "
                           "rerank_sweep rows",
        "sweep": sweep,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
    if merge_into and os.path.exists(merge_into):
        with open(merge_into) as f:
            base = json.load(f)
        base["sharded_xl"] = payload
        with open(merge_into, "w") as f:
            json.dump(base, f, indent=2)
        print(f"merged into {merge_into} as 'sharded_xl'", flush=True)


if __name__ == "__main__":
    main()
