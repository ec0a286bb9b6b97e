"""PQ / IVF-PQ sweep: compression vs recall vs QPS (BASELINE config 4
tooling — the 100M single-chip run itself is ``scripts/run_config4.py``).

Usage:
  python -m archi_tpu.benchmarking.pq_sweep --n 262144 --d 384 \
      --m 48 --refine-m 48 --nlist 512 --nprobe 4,16,64 [--flat]

Sweeps nprobe for IVF-PQ (or tile-scan for flat PQ with ``--flat``),
printing recall vs the exact scan, code memory vs bf16 corpus memory, and
QPS as JSON lines.  Honesty: recall is reported three ways — strict@k,
@k-in-100 (over-fetch), and self-top1 for noisy-copy queries — because PQ
strict recall is resolution-bounded on near-duplicate-dense corpora (see
``docs/pq_scale.md``).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from archi_tpu.benchmarking.ivf_sweep import synthetic_corpus


def fixture_embeddings():
    """The deterministic quality-fixture corpus through the hashed-ngram
    embedder — the most realistic (anisotropic) corpus available offline;
    OPQ gains show here, not on isotropic synthetics."""
    from archi_tpu.benchmarking.fixture import fixture_corpus
    from archi_tpu.models.hashed_embedder import HashedNgramEmbedder

    docs, _q = fixture_corpus()
    emb = HashedNgramEmbedder(384)
    x = np.asarray(emb.embed_documents([t for _n, t, _m in docs]),
                   np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def run_pq_sweep(n: int = 1 << 18, d: int = 384, *, m: int = 48,
                 refine_m: int = 0, ksub: int = 256, nlist: int = 512,
                 block: int = 512, nprobes=(4, 16, 64), n_queries: int = 64,
                 k: int = 10, clustered: bool = True, seed: int = 0,
                 flat: bool = False, opq_iters: int = 0,
                 corpus=None) -> list[dict]:
    if corpus is not None:
        x = np.asarray(corpus, np.float32)
        n, d = x.shape
    else:
        x = synthetic_corpus(n, d, clustered=clustered, seed=seed)
    rng = np.random.default_rng(seed + 1)
    n_queries = min(n_queries, n)
    q_idx = rng.choice(n, n_queries, replace=False)
    queries = x[q_idx] + 0.05 * rng.standard_normal(
        (n_queries, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ref_top = np.argsort(-(queries @ x.T), axis=1)[:, :min(k, n)]

    bytes_per_row = m + (refine_m if refine_m else 0)
    compression = d * 2 / bytes_per_row     # vs bf16

    results = []
    if flat:
        from archi_tpu.engine.pq import PQFlatIndex

        t0 = time.time()
        codec = None
        if opq_iters:
            from archi_tpu.engine.pq import PQCodec

            codec = PQCodec.train(x, m, ksub=ksub, seed=seed,
                                  opq_iters=opq_iters)
        idx = PQFlatIndex.build(x, m=m, ksub=ksub, seed=seed, codec=codec)
        build_s = time.time() - t0
        probe_cfgs = [None]
    else:
        from archi_tpu.engine.ivfpq_index import IVFPQIndex

        t0 = time.time()
        idx = IVFPQIndex.build(x, nlist=nlist, block=block, m=m,
                               ksub=ksub, refine_m=refine_m, seed=seed,
                               opq_iters=opq_iters)
        build_s = time.time() - t0
        probe_cfgs = [min(p, nlist) for p in nprobes]

    for nprobe in probe_cfgs:
        kw = {} if nprobe is None else {"nprobe": nprobe}
        _ids, _vals, rows = idx.search(queries, k=k, **kw)      # warm
        t0 = time.time()
        _ids, _vals, rows = idx.search(queries, k=k, **kw)
        elapsed = max(time.time() - t0, 1e-9)
        strict = float(np.mean([
            len(set(rows[b]) & set(ref_top[b])) / k
            for b in range(n_queries)]))
        _, _, wide = idx.search(queries, k=min(100, n), **kw)
        in100 = float(np.mean([
            len(set(wide[b]) & set(ref_top[b])) / k
            for b in range(n_queries)]))
        top1 = float(np.mean(rows[:, 0] == q_idx))
        entry = {
            "n": n, "d": d, "m": m, "refine_m": refine_m,
            "bytes_per_row": bytes_per_row,
            "compression_vs_bf16": round(compression, 1),
            "index": "pq_flat" if flat else "ivfpq",
            "opq_iters": opq_iters,
            **({} if nprobe is None else {"nlist": nlist, "nprobe": nprobe}),
            "recall_strict": round(strict, 4),
            "recall_in_100": round(in100, 4),
            "self_top1": round(top1, 4),
            "qps": round(n_queries / elapsed, 1),
            "build_s": round(build_s, 1),
        }
        results.append(entry)
        print(json.dumps(entry))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--m", type=int, default=48)
    ap.add_argument("--refine-m", type=int, default=0)
    ap.add_argument("--nlist", type=int, default=512)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--nprobe", default="4,16,64")
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--uniform", action="store_true")
    ap.add_argument("--flat", action="store_true",
                    help="flat PQ (exhaustive ADC) instead of IVF-PQ")
    ap.add_argument("--opq", type=int, default=0,
                    help="OPQ rotation iterations (0 = off)")
    ap.add_argument("--fixture", action="store_true",
                    help="use the quality-fixture corpus (anisotropic "
                         "hashed-ngram embeddings) instead of synthetic")
    args = ap.parse_args()
    run_pq_sweep(
        args.n, args.d, m=args.m, refine_m=args.refine_m,
        nlist=args.nlist, block=args.block,
        nprobes=tuple(int(p) for p in args.nprobe.split(",")),
        n_queries=args.queries, k=args.k, clustered=not args.uniform,
        flat=args.flat, opq_iters=args.opq,
        corpus=fixture_embeddings() if args.fixture else None)


if __name__ == "__main__":
    main()
