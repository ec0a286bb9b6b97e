"""BASELINE config 3 — MS MARCO-scale single-chip slice.

Config 3 is "MS MARCO passage 8.8M chunks, bge-base 768-d, flat index
sharded over 4 chips, fused top-k + ICI merge".  This image has ONE chip
and no dataset egress, so this run covers the per-chip slice at the exact
shape: an 8.8M x 768 bf16 device corpus scanned by the fused kernel
(13.5 GB — a 4-chip mesh holds it with 4x headroom), self-recall checked
against stored rows.  The cross-chip half (per-shard top-k + ICI all_gather
merge) is validated on the 8-device CPU mesh
(tests/unit/test_sharded_index.py) and by the driver's dryrun; the bge-base
encoder half measured 93.7 TFLOP/s / 2041 seq/s (docs/roofline.md).

Usage: python scripts/run_config3.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CONFIG3_r02.json"
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/archi_tpu_jax_cache")
    import jax.numpy as jnp

    from archi_tpu.benchmarking.ivf_sweep import synthetic_corpus_device
    from archi_tpu.engine.topk import topk_scores

    D, B, K = 768, 32, 10
    TILE = 4096
    N = ((8_800_000 + TILE - 1) // TILE) * TILE  # 8,802,304 rows
    t0 = time.time()
    corpus = synthetic_corpus_device(N, D, clustered=True, seed=0)
    gen_s = time.time() - t0
    bias = jnp.zeros((N,), jnp.float32)

    # self-recall: noisy copies of stored rows must rank their source first
    rng = np.random.default_rng(1)
    q_idx = np.sort(rng.choice(N, B, replace=False))
    q = np.array(corpus[jnp.asarray(q_idx)].astype(jnp.float32))
    q += 0.03 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    vals, rows = topk_scores(jnp.asarray(q), corpus, bias, N, k=K,
                             impl="pallas")
    top1 = np.asarray(rows)[:, 0]
    self_recall = float(np.mean(top1 == q_idx))

    # QPS: chained batches, scalar sync, runtime RTT subtracted
    from archi_tpu.benchmarking.timing import measure_relay_rtt

    r = measure_relay_rtt()
    steps = 15
    key = jax.random.PRNGKey(2)
    best = float("inf")
    for trial in range(3):  # relay-side contention varies run to run
        t0 = time.time()
        for i in range(steps):
            qd = jax.random.normal(
                jax.random.fold_in(key, trial * 100 + i), (B, D),
                jnp.float32)
            vals, rows = topk_scores(qd, corpus, bias, N, k=K,
                                     impl="pallas")
        float(jnp.sum(vals))
        best = min(best, max(time.time() - t0 - r, 1e-9))
    dt = best
    qps = steps * B / dt
    scan_ms = dt / steps * 1e3
    gbps = N * D * 2 / (dt / steps) / 1e9

    payload = {
        "config": "BASELINE config 3 single-chip slice: 8.8M x 768 bf16 "
                  "fused exact scan (cross-chip merge CPU-mesh validated; "
                  "bge-base encoder in docs/roofline.md)",
        "rows": int(N), "dim": D, "corpus_gb": round(N * D * 2 / 1e9, 1),
        "corpus_gen_s": round(gen_s, 1),
        "self_recall_top1": self_recall,
        "batch": B, "k": K,
        "scan_ms_per_batch": round(scan_ms, 2),
        "query_qps": round(qps, 1),
        "scan_gb_per_s": round(gbps, 1),
        "relay_rtt_ms": round(r * 1e3, 1),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
