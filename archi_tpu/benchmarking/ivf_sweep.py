"""IVF nprobe sweep: the recall/QPS trade-off chart (BASELINE config 4).

Usage:
  python -m archi_tpu.benchmarking.ivf_sweep --n 262144 --d 384 \
      --nlist 512 --nprobe 4,16,64,256 [--clustered]

Builds a synthetic corpus (clustered by default — the realistic case; pass
--uniform for the worst case), trains IVF on device, and prints recall@k vs
the exact flat scan plus per-config QPS, as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synthetic_corpus(n: int, d: int, *, clustered: bool = True,
                     n_clusters: int = 1024, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if clustered:
        centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
        assign = rng.integers(0, n_clusters, n)
        x = centers[assign] + 0.3 * rng.standard_normal((n, d)).astype(
            np.float32)
    else:
        x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x


def synthetic_corpus_device(n: int, d: int, *, clustered: bool = True,
                            n_clusters: int = 1024, seed: int = 0,
                            dtype=None, chunk: int = 1 << 18):
    """Clustered corpus generated ON DEVICE (normalized) — at 8M x 384 a
    host corpus would cost ~12 GB through the axon relay; here nothing is
    uploaded.  One jit with ``lax.map`` over row blocks bounds peak HBM to
    the bf16 output + one f32 block (buffer donation is not honored by the
    tunneled backend, so donated-write loops double-allocate)."""
    import functools

    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    n_blocks = max(1, n // chunk)
    while n % n_blocks:  # nearest divisor (block rows must tile n exactly)
        n_blocks -= 1
    block_rows = n // n_blocks

    @functools.partial(jax.jit, static_argnames=())
    def gen(key):
        centers = jax.random.normal(jax.random.fold_in(key, 0),
                                    (n_clusters, d), jnp.float32)
        keys = jax.random.split(jax.random.fold_in(key, 1), n_blocks)

        def block(k):
            ka, kb = jax.random.split(k)
            if clustered:
                assign = jax.random.randint(ka, (block_rows,), 0, n_clusters)
                v = centers[assign] + 0.3 * jax.random.normal(
                    kb, (block_rows, d), jnp.float32)
            else:
                v = jax.random.normal(kb, (block_rows, d), jnp.float32)
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            return v.astype(dtype)

        return jax.lax.map(block, keys).reshape(n, d)

    return gen(jax.random.PRNGKey(seed))


def run_sweep(n: int = 1 << 18, d: int = 384, *, nlist: int = 512,
              block: int = 512, nprobes=(4, 16, 64, 256), n_queries: int = 64,
              k: int = 10, clustered: bool = True, iters: int = 10,
              seed: int = 0, device: bool = False) -> list[dict]:
    from archi_tpu.engine.ivf_index import IVFIndex

    if device:
        import jax.numpy as jnp

        from archi_tpu.engine.topk import topk_scores

        x_dev = synthetic_corpus_device(n, d, clustered=clustered, seed=seed)
        rng = np.random.default_rng(seed + 1)
        q_idx = np.sort(rng.choice(n, n_queries, replace=False))
        queries = np.array(x_dev[jnp.asarray(q_idx)].astype(jnp.float32))
        queries += 0.05 * rng.standard_normal((n_queries, d)).astype(
            np.float32)
        queries /= np.maximum(
            np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        # exact ground truth on device (the engine's own exact scan)
        bias = jnp.zeros((n,), jnp.float32)
        _v, ref_top = topk_scores(jnp.asarray(queries), x_dev, bias, n, k=k)
        ref_top = np.asarray(ref_top)
        t0 = time.time()
        ivf = IVFIndex.build_device(x_dev, nlist=nlist, block=block,
                                    iters=iters, seed=seed)
        build_s = time.time() - t0
        del x_dev
    else:
        x = synthetic_corpus(n, d, clustered=clustered, seed=seed)
        rng = np.random.default_rng(seed + 1)
        q_idx = rng.choice(n, n_queries, replace=False)
        queries = x[q_idx] + 0.05 * rng.standard_normal(
            (n_queries, d)).astype(np.float32)

        # exact ground truth (host brute force)
        ref = queries @ x.T
        ref_top = np.argsort(-ref, axis=1)[:, :k]

        t0 = time.time()
        ivf = IVFIndex.build(x, list(range(n)), nlist=nlist, block=block,
                             iters=iters, seed=seed)
        build_s = time.time() - t0

    results = []
    for nprobe in nprobes:
        nprobe = min(nprobe, nlist)
        _ids, _vals, rows = ivf.search(queries, k=k, nprobe=nprobe)  # warm+compile
        t0 = time.time()
        _ids, _vals, rows = ivf.search(queries, k=k, nprobe=nprobe)
        elapsed = max(time.time() - t0, 1e-9)
        recall = float(np.mean([
            len(set(rows[b]) & set(ref_top[b])) / k
            for b in range(n_queries)
        ]))
        entry = {
            "n": n, "d": d, "nlist": nlist, "nprobe": nprobe, "k": k,
            "recall": round(recall, 4),
            "qps": round(n_queries / elapsed, 1),
            "build_s": round(build_s, 1),
            "clustered": clustered,
        }
        results.append(entry)
        print(json.dumps(entry))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--nlist", type=int, default=512)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--nprobe", default="4,16,64,256")
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--uniform", action="store_true",
                    help="worst-case uniform random corpus")
    ap.add_argument("--device", action="store_true",
                    help="generate corpus + build on device (8M-scale)")
    args = ap.parse_args()
    run_sweep(
        args.n, args.d, nlist=args.nlist, block=args.block,
        nprobes=[int(p) for p in args.nprobe.split(",")],
        n_queries=args.queries, k=args.k, clustered=not args.uniform,
        device=args.device,
    )


if __name__ == "__main__":
    main()
