"""Concurrent-serving micro-batch benchmark (engine level).

T client threads issue single hybrid-shaped queries against a 1M x 384
bf16 device corpus through ``engine.batcher.MicroBatcher``; requests
coalesce into fused ``topk_scores`` batches (shared zero bias — the
per-query-bias stream is parity-tested in
``tests/integration/test_micro_batch_serving.py``; here the corpus scan
itself is the cost being amortized).  Batches pad to power-of-two
buckets so every live shape is pre-compiled by the warmup pass.

This reproduces the docs/serving.md table; the max_batch sweep shows
the ceiling moving with the large-batch kernel auto-tiling (batch-256
fused scans run ~78k QPS standalone).

Usage: python scripts/bench_serving.py [--clients 256] [--batches 32,256]
"""

from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np


def main() -> None:
    args = sys.argv[1:]
    clients = (int(args[args.index("--clients") + 1])
               if "--clients" in args else 256)
    batches = [int(x) for x in (
        args[args.index("--batches") + 1] if "--batches" in args
        else "32,128,256").split(",")]
    per_client = (int(args[args.index("--per-client") + 1])
                  if "--per-client" in args else 40)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/archi_tpu_jax_cache")
    import jax.numpy as jnp

    from archi_tpu.engine.batcher import MicroBatcher
    from archi_tpu.engine.topk import topk_scores

    N, D, K = 1 << 20, 384, 10
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D),
                               jnp.float32).astype(jnp.bfloat16)
    bias = jnp.zeros((N,), jnp.float32)
    n_act = jnp.asarray(N, jnp.int32)
    jax.block_until_ready(corpus)

    results = {"clients": clients, "rows": N, "dim": D, "k": K,
               "per_client": per_client, "sweep": []}

    rng = np.random.default_rng(3)
    queries = rng.standard_normal((clients * per_client, D)) \
        .astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    def run_once(max_batch: int):
        batch_sizes = []

        def run_batch(sig, reqs):
            q = jnp.asarray(np.stack(reqs))
            b = q.shape[0]
            bp = 1 << (b - 1).bit_length()          # pow2 bucket
            if bp > b:
                q = jnp.concatenate(
                    [q, jnp.zeros((bp - b, D), jnp.float32)])
            v, i = topk_scores(q, corpus, bias, n_act, k=K, impl="pallas")
            v, i = np.asarray(v), np.asarray(i)
            batch_sizes.append(b)
            return [(v[j], i[j]) for j in range(b)]

        mb = MicroBatcher(run_batch, max_batch=max_batch,
                          max_wait_s=0.004, workers=4)
        # warmup: compile every pow2 bucket <= max_batch
        bsz = 1
        while bsz <= max_batch:
            qs = queries[:bsz]
            run_batch(None, list(qs))
            bsz *= 2
        del batch_sizes[:]

        done = threading.Barrier(clients + 1)

        def client(cid):
            my = queries[cid * per_client:(cid + 1) * per_client]
            done.wait()
            for q in my:
                mb.submit(q)
            done.wait()

        ts = [threading.Thread(target=client, args=(c,))
              for c in range(clients)]
        for t in ts:
            t.start()
        done.wait()
        t0 = time.time()
        done.wait()
        dt = time.time() - t0
        for t in ts:
            t.join()
        mb.close()
        total = clients * per_client
        entry = {
            "max_batch": max_batch,
            "qps": round(total / dt, 1),
            "mean_batch": round(float(np.mean(batch_sizes)), 1)
            if batch_sizes else 0.0,
            "n_batches": len(batch_sizes),
        }
        results["sweep"].append(entry)
        print(json.dumps(entry), flush=True)

    # request-at-a-time baseline: same threads, no coalescing
    def run_unbatched():
        lock = threading.Lock()   # one device call at a time per worker
        sem = threading.Semaphore(4)

        def one(q):
            with sem:
                v, i = topk_scores(jnp.asarray(q[None]), corpus, bias,
                                   n_act, k=K, impl="pallas")
                return np.asarray(v)

        one(queries[0])            # compile b=1
        done = threading.Barrier(clients + 1)

        def client(cid):
            my = queries[cid * per_client:(cid + 1) * per_client]
            done.wait()
            for q in my:
                one(q)
            done.wait()

        ts = [threading.Thread(target=client, args=(c,))
              for c in range(clients)]
        for t in ts:
            t.start()
        done.wait()
        t0 = time.time()
        done.wait()
        dt = time.time() - t0
        for t in ts:
            t.join()
        results["unbatched_qps"] = round(clients * per_client / dt, 1)
        print(json.dumps({"unbatched_qps": results["unbatched_qps"]}),
              flush=True)

    run_unbatched()
    for mbs in batches:
        run_once(mbs)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
