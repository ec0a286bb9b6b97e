"""Where do the last 0.6% of config-4 strict@10 misses come from?

The r5 probe ablation (benchmark_results/r5/cfg4_12_*.json) found
strict@10 pinned at exactly 0.994 across EVERY treatment (f32
mini-centroids, cell gate, sub=16, hier_t=32) AND every probe budget
256->1024 at 12.58M rows — insensitive to both ranking precision and
coverage.  This classifies each individual miss:

- ``in_candidates``: the missed ground-truth row WAS in the device's
  top-C candidate set but the exact host rerank ordered it below rank
  k — a SCORING-RESOLUTION miss (bf16-quantized vectors scored by two
  different accumulators: Pallas bf16 dot with f32 accumulate for the
  ground truth vs host f32 BLAS for the rerank), not an index defect;
- ``not_in_candidates``: the row never reached the candidate set even
  at the widest probe — a GEOMETRY miss (its block is never ranked
  into the probe budget);
- ``gt_boundary_gap``: the exact-score gap between the query's rank-10
  and rank-11 ground-truth rows.  Gaps at or below bf16 resolution
  (~0.004 at score ~1.0) make the strict@10 metric itself ambiguous —
  two exact scorers can legitimately disagree on the boundary row.

Usage: python scripts/diag_cfg4_misses.py [OUT.json] [--rows N]
           [--index /tmp/cfg4_12_idx] [--store .../cfg4_12.bf16]
           [--probe 1024] [--rerank-c 320]
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
        else "benchmark_results/r5/cfg4_12_miss_diag.json"

    def opt(flag, default, cast):
        return cast(args[args.index(flag) + 1]) if flag in args else default

    rows = opt("--rows", 12582912, int)
    index_path = opt("--index", "/tmp/cfg4_12_idx", str)
    store_path = opt("--store", "/tmp/archi_host_store/cfg4_12.bf16", str)
    probe = opt("--probe", 1024, int)
    rerank_c = opt("--rerank-c", 320, int)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/archi_tpu_jax_cache")
    import jax.numpy as jnp
    import ml_dtypes

    from archi_tpu.benchmarking.synth_corpus import BLOCK_ROWS, D, \
        make_block_fn
    from archi_tpu.engine.host_store import HostVectorStore, \
        mark_duplicate_rows
    from archi_tpu.engine.ivfpq_index import IVFPQIndex
    from archi_tpu.engine.topk import topk_scores

    B, K = 32, 10
    n_blocks = rows // BLOCK_ROWS
    block_fn = make_block_fn(jax.random.PRNGKey(0), n_blocks)
    store = HostVectorStore(D, path=store_path, capacity=rows,
                            dtype=ml_dtypes.bfloat16)
    assert len(store) == rows, (len(store), rows)
    idx = IVFPQIndex.load(index_path)
    idx.ensure_block_centroids(dtype=jnp.float32)
    jax.block_until_ready(idx.block_centroids)

    # identical query protocol to run_config4.py
    rng = np.random.default_rng(1)
    q_src = np.sort(rng.choice(rows, B, replace=False))
    q = np.stack([
        np.array(block_fn(int(r // BLOCK_ROWS))[int(r % BLOCK_ROWS)],
                 dtype=np.float32) for r in q_src])
    q = q + 0.03 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qd = jnp.asarray(q)

    # exact ground truth at k+1 (for the boundary-gap stat), Pallas scan
    t0 = time.time()
    parts_v, parts_r = [], []
    zero_bias = jnp.zeros((BLOCK_ROWS,), jnp.float32)
    for i in range(n_blocks):
        v, r = topk_scores(qd, block_fn(i), zero_bias, BLOCK_ROWS,
                           k=K + 1, impl="pallas")
        parts_v.append(v)
        parts_r.append(r + i * BLOCK_ROWS)
    av = jnp.concatenate(parts_v, axis=1)
    ar = jnp.concatenate(parts_r, axis=1)
    mv, mp = jax.lax.top_k(av, K + 1)
    gt_rows = np.asarray(jnp.take_along_axis(ar, mp, axis=1))
    gt_vals = np.asarray(mv)
    print(f"GT scan {time.time()-t0:.0f}s", flush=True)

    # device candidates at the widest ablation probe
    cv, cr = idx.search_dispatch(qd, k=rerank_c, nprobe_blocks=probe,
                                 refine_overfetch=1)
    cand_vals, cand_rows = jax.device_get((cv, cr))

    # the exact host rerank the sweep used
    from archi_tpu.engine.host_store import exact_rerank

    fv, fr = exact_rerank(store, q, cand_vals, cand_rows, k=K)

    # host exact f32 scores for GT rows (for gap stats)
    def host_score(b, row):
        vec = np.asarray(store.get(np.array([row]))[0], np.float32)
        return float(vec @ q[b])

    per_query = []
    n_miss = n_in_cand = 0
    boundary_gaps, miss_margins = [], []
    dup = mark_duplicate_rows(cand_rows)
    for b in range(B):
        gt10 = set(int(r) for r in gt_rows[b, :K])
        got = set(int(r) for r in fr[b])
        missed = sorted(gt10 - got)
        cset = set(int(r) for r, d in zip(cand_rows[b], dup[b]) if not d)
        gap = float(gt_vals[b, K - 1] - gt_vals[b, K])
        boundary_gaps.append(gap)
        for r in missed:
            n_miss += 1
            in_c = r in cset
            n_in_cand += int(in_c)
            # margin: exact f32 host score of the missed row minus the
            # WEAKEST returned row's score (how far below the boundary
            # the rerank placed it — resolution-scale => tie territory)
            margin = host_score(b, r) - float(fv[b, K - 1])
            miss_margins.append(margin)
            per_query.append({
                "query": b, "missed_row": int(r),
                "in_candidate_set": bool(in_c),
                "margin_vs_rank10": round(margin, 6),
                "gt_boundary_gap": round(gap, 6),
            })
    strict = 1.0 - n_miss / (B * K)
    payload = {
        "rows": rows, "probe_blocks": probe, "rerank_c": rerank_c,
        "strict_at_10": round(strict, 4),
        "n_missed": n_miss,
        "n_missed_in_candidate_set": n_in_cand,
        "n_missed_geometry": n_miss - n_in_cand,
        "gt_boundary_gap_median": round(float(np.median(boundary_gaps)), 6),
        "gt_boundary_gap_p10": round(float(np.percentile(boundary_gaps,
                                                         10)), 6),
        "miss_margins": [round(m, 6) for m in sorted(miss_margins)],
        "bf16_resolution_at_1": 0.0039,
        "misses": per_query,
        "note": (
            "in_candidate_set misses are scoring-resolution ties (the "
            "exact rerank HAD the row and placed it within |margin| of "
            "rank 10 — margins at bf16 resolution mean two exact scorers "
            "can disagree); geometry misses never reached the candidate "
            "set at the widest probe."),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(json.dumps({k: payload[k] for k in (
        "strict_at_10", "n_missed", "n_missed_in_candidate_set",
        "n_missed_geometry", "gt_boundary_gap_median")}), flush=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
