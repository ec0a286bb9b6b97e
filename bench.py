"""Headline benchmark: fused-kernel query throughput at 1M chunks, 384-d.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference (archi) publishes no absolute numbers (BASELINE.md) — its
retrieval plane is pgvector SQL.  The measured stand-in baseline here is the
same exact top-k scan done the reference's pre-TPU way (host CPU, fp32
brute force over identical work), so vs_baseline = TPU QPS / host QPS.
BASELINE.md's north-star target is >=10x per chip.

Timing notes (see .claude/skills/verify/SKILL.md): this box reaches the TPU
through an HTTP relay, so (a) the corpus is generated ON DEVICE (uploading
1.5GB through the relay takes minutes), (b) syncs download a single scalar
(`float(jnp.sum(v))`) — pulling large arrays through the relay corrupts
timing, (c) one relay RTT is subtracted.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    # persistent compilation cache: repeat runs (e.g. the driver's) skip the
    # 1-2 min first-compile through the remote-compile tunnel
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/archi_tpu_jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from archi_tpu.engine.topk import _on_tpu, topk_scores

    N, D, B, K = 1 << 20, 384, 32, 10
    NQ = 50
    corpus = jax.random.normal(
        jax.random.PRNGKey(0), (N, D), jnp.float32
    ).astype(jnp.bfloat16)
    bias = jnp.zeros((N,), jnp.float32)
    queries = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (B, D), jnp.float32)
        for i in range(NQ)
    ]
    impl = "pallas" if _on_tpu() else "xla"

    # compile + stage all inputs on device
    v, i = topk_scores(queries[0], corpus, bias, N, k=K, impl=impl)
    float(jnp.sum(v))
    for q in queries:
        v, i = topk_scores(q, corpus, bias, N, k=K, impl=impl)
    float(jnp.sum(v))

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for q in queries:
            v, i = topk_scores(q, corpus, bias, N, k=K, impl=impl)
        float(jnp.sum(v))
        best = min(best, max(time.time() - t0 - 0.030, 1e-9))  # - 1 RTT
    tpu_qps = NQ * B / best

    # Host-CPU fp32 brute force on a slice, scaled (full 1M scan on one core
    # is minutes; a 1/32 slice keeps the bench fast, scaling is linear).
    M = N // 32
    rng = np.random.default_rng(0)
    sub = rng.standard_normal((M, D), dtype=np.float32)
    q0 = rng.standard_normal((B, D), dtype=np.float32)
    t0 = time.time()
    scores = q0 @ sub.T
    _idx = np.argpartition(-scores, K, axis=1)[:, :K]
    host_elapsed = (time.time() - t0) * (N / M)
    host_qps = B / host_elapsed

    out = {
        "metric": "query_qps_1M_chunks_384d_bf16_batch32",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / host_qps, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
