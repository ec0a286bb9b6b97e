"""BASELINE config 4 — 100M synthetic chunks, IVF-PQ, recall/QPS sweep,
WITH the host exact-rerank tier closing strict recall.

The baseline envisioned this on a v5e POD SLICE (100M x 384 bf16 = 77 GB
corpus, sharded).  This run does something stronger with the ONE chip this
rig has: IVF-PQ with a refinement stage (``archi_tpu.engine.ivfpq_index``)
puts all 100M rows in ~9.8 GB of uint8 codes — the corpus itself is never
device-resident; blocks are generated, coarse-assigned, and residual-
encoded in a two-pass stream.

Production-shaped rerank tier (the analog of the reference keeping full
vectors in Postgres, ``src/cli/templates/init.sql:266``): the same rows
live host-side in a 77 GB bf16 memmap (``scripts/fill_host_store.py``),
and ``IVFPQIndex.search(rerank_store=...)`` re-scores the device's top-C
ADC candidates exactly — strict recall becomes candidate-bound instead of
quantization-bound.  The sweep measures nprobe x rerank-C so the
recall-vs-QPS cost of the gather+rescore is a published number, not a
metric note.

Ground truth is exact: queries are noisy copies of stored rows, and the
exact top-10 comes from a streaming fused scan that re-generates each
corpus block (deterministic by block id) and merges per-block top-k.

Honesty notes (printed into the JSON):
- the corpus is clustered (n_clusters = N/64, 64 near-duplicates per
  cluster, ~0.002 score gaps) — the adversarial density for PQ;
- QPS is best-of-3 unchained disjoint batches with runtime-measured relay
  RTT subtracted; rerank-path QPS includes the host gather+rescore.

Usage: python scripts/run_config4.py [out.json] [--rows N] [--quick]
       [--store /tmp/archi_host_store/config4.bf16] [--no-rerank]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _measure_qps(search_fn, q, rng, *, rtt_s: float, reps: int = 8,
                 trials: int = 3, sync=None) -> float:
    """Best-of-``trials`` mean seconds/batch over unchained disjoint query
    batches (pre-staged device inputs; immune to repeat-caching)."""
    import jax
    import jax.numpy as jnp

    qvars = []
    for _ in range(trials * reps):
        qv = q + 0.01 * rng.standard_normal(q.shape).astype(np.float32)
        qv /= np.linalg.norm(qv, axis=1, keepdims=True)
        qvars.append(jnp.asarray(qv))
    jax.block_until_ready(qvars[-1])
    best = float("inf")
    for t in range(trials):
        batch = qvars[t * reps:(t + 1) * reps]
        t0 = time.time()
        out = None
        for qv in batch:
            out = search_fn(qv)
        if sync is not None:
            sync(out)
        best = min(best, max((time.time() - t0 - rtt_s) / reps, 1e-9))
    return best


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = args[0] if args and not args[0].startswith("-") \
        else "CONFIG4_r03.json"
    quick = "--quick" in args
    no_rerank = "--no-rerank" in args
    store_path = "/tmp/archi_host_store/config4.bf16"
    if "--store" in args:
        store_path = args[args.index("--store") + 1]
    rows = None
    if "--rows" in args:
        rows = int(args[args.index("--rows") + 1])
    # --gt-only / --gt-cache split the run into two processes: queries +
    # exact GT scan + store identity check need block_fn regens whose f32
    # generator intermediates (~1.5 GB/block) OOM the chip once 13+ GB of
    # codes + sub=16 block centroids are resident.  The GT builder runs
    # with NO index and saves {q, q_src, exact}; the sweep process loads
    # them and never touches block_fn.
    gt_cache = args[args.index("--gt-cache") + 1] if "--gt-cache" in args \
        else None
    gt_only = "--gt-only" in args

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/archi_tpu_jax_cache")
    import jax.numpy as jnp
    import ml_dtypes

    from archi_tpu.benchmarking.synth_corpus import BLOCK_ROWS, D, \
        make_block_fn
    from archi_tpu.engine.host_store import HostVectorStore
    from archi_tpu.engine.ivfpq_index import IVFPQIndex

    B, K = 32, 10
    N_BLOCKS = (8 if quick else 96) if rows is None \
        else max(1, rows // BLOCK_ROWS)
    N = N_BLOCKS * BLOCK_ROWS

    block_fn = make_block_fn(jax.random.PRNGKey(0), N_BLOCKS)
    have_gt = bool(gt_cache) and not gt_only and os.path.exists(gt_cache)

    # Row extraction MUST go through one jitted gather with the indices as
    # an ARGUMENT: `block_fn(bi)[int(r)]` bakes each row id into a new
    # executable, and 32 query rows = 32 multi-minute remote compiles on
    # this relay.  One fixed-shape take() compiles once and serves every
    # block.
    take32 = jax.jit(lambda blk, ii: jnp.take(blk, ii, axis=0))

    def fetch_rows(row_ids):
        """[len(row_ids), D] bf16 rows regenerated on device, downloaded
        in one small transfer per distinct block."""
        out = np.empty((len(row_ids), D), dtype=ml_dtypes.bfloat16)
        by_block: dict[int, list[tuple[int, int]]] = {}
        for j, rr in enumerate(row_ids):
            by_block.setdefault(int(rr // BLOCK_ROWS), []).append(
                (j, int(rr % BLOCK_ROWS)))
        for bi, pairs in by_block.items():
            ii = np.full((32,), pairs[0][1], np.int32)
            for t, (_j, rofs) in enumerate(pairs):
                ii[t] = rofs
            got = np.asarray(take32(block_fn(bi), jnp.asarray(ii)))
            for t, (j, _rofs) in enumerate(pairs):
                out[j] = got[t]
        return out

    def open_store():
        """Open + verify the host full-precision tier (filled by
        fill_host_store.py).  Called AFTER the index build so a
        concurrently-running fill has the build's ~1h to finish — the
        store is only consumed by the rerank sweep."""
        if no_rerank or not os.path.exists(store_path):
            return None
        if "--wait-store" in args:
            # a concurrent fill_host_store.py may still be streaming the
            # tail blocks; the sweep is worthless without the tier, so
            # wait (bounded) for the fill to catch up
            deadline = time.time() + 2 * 3600
            while time.time() < deadline:
                try:
                    store = HostVectorStore(D, path=store_path, capacity=N,
                                            dtype=ml_dtypes.bfloat16)
                    n_now = len(store)
                    del store
                except Exception:  # torn meta.json mid-write
                    n_now = -1
                if n_now >= N:
                    break
                print(f"waiting for host store fill: {n_now}/{N} rows",
                      flush=True)
                time.sleep(120)
        store = HostVectorStore(D, path=store_path, capacity=N,
                                dtype=ml_dtypes.bfloat16)
        if len(store) != N:
            # must match EXACTLY: the block generator is parameterized by
            # the block count (n_clusters = N/64), so a store filled for a
            # different N holds different rows, not a prefix
            print(f"host store has {len(store)} rows, run needs {N} — "
                  f"run fill_host_store.py for this size; continuing "
                  f"ADC-only", flush=True)
            return None
        if have_gt:
            # identity was attested when the GT cache was built (same
            # store file, same generator seed); regenerating blocks here
            # would OOM against the resident codes + block centroids
            print("host tier identity attested at GT-cache build",
                  flush=True)
            return store
        # verify alignment + bit-identity on a scattered row sample
        probe = np.array([0, 1, N // 3, N // 2, N - 1])
        dev_rows = fetch_rows(probe)
        host_rows = store._buf[probe]
        assert np.array_equal(dev_rows.view(np.uint16),
                              np.asarray(host_rows).view(np.uint16)), \
            "host store rows != device corpus rows (stale fill?)"
        print("host tier verified bit-identical on sample rows", flush=True)
        return store

    # --- build (two-pass stream; only codes stay resident), or reload a
    # prior run's index (--index PATH: ~10 GB of codes round-trips disk
    # far faster than the ~14-min rebuild when iterating on the sweep)
    index_path = None
    if "--index" in args:
        index_path = args[args.index("--index") + 1]
    nlist = int(args[args.index("--nlist") + 1]) if "--nlist" in args \
        else 16384
    blk = int(args[args.index("--block") + 1]) if "--block" in args \
        else 512
    # r4: probe-spill (boundary rows duplicated into their 2nd-nearest
    # cell at build time) + OPQ rotation on the stage-1/refine codecs
    spill = float(args[args.index("--spill") + 1]) if "--spill" in args \
        else 0.0
    opq = int(args[args.index("--opq") + 1]) if "--opq" in args else 0
    t0 = time.time()
    if gt_only:
        # GT-builder mode: no index at all — full HBM headroom for the
        # block generator and the f32 GT scan
        idx = None
        build_s, code_gb = 0.0, 0.0
    elif index_path and (os.path.exists(index_path)
                         or os.path.exists(index_path + ".npz")):
        idx = IVFPQIndex.load(index_path,
                              drop_refine="--drop-refine" in args)
        print(f"loaded index from {index_path}", flush=True)
    else:
        # nlist ~ 1.3 * sqrt(N) blocks of 512 measured best on the r3
        # sweeps (finer cells = smaller residuals + finer block ranking);
        # train on 2 blocks so 16k cells see ~128 samples each
        idx = IVFPQIndex.build_streaming(
            block_fn, N_BLOCKS, BLOCK_ROWS,
            nlist=nlist, block=blk, m=96, ksub=16, refine_m=96,
            train_blocks=2, train_sample=1 << 21, coarse_iters=8,
            pq_iters=10, seed=0, spill_frac=spill, opq_iters=opq)
    t_bc = time.time()
    if idx is not None and "--sub" in args:
        # sub-block ranking granularity (MAX over `sub` finer means per
        # block; see IVFPQIndex.ensure_block_centroids)
        idx.block_rank_sub = int(args[args.index("--sub") + 1])
    if idx is not None and "--drop-refine" in args:
        # With refine_overfetch=1 + exact host rerank, the refine stage
        # cannot change the candidate SET (top-C reorder of the same C
        # rows the host rescores exactly anyway) — free its ~5.3 GB of
        # codes so sub=16 block centroids + search workspace fit in HBM
        idx.refine_codec = None
        idx.refine_codes = None
    if idx is not None:
        bc_dtype = jnp.bfloat16
        if "--bc-dtype" in args \
                and args[args.index("--bc-dtype") + 1] == "f32":
            # f32 mini-centroids: at this corpus's ~0.002 score gaps, bf16
            # input rounding (~0.3% relative) is itself ranking noise
            bc_dtype = jnp.float32
        idx.ensure_block_centroids(dtype=bc_dtype)
        jax.block_until_ready(idx.block_centroids)
        print(f"block centroids: {time.time()-t_bc:.0f}s "
              f"(n_blocks={idx.code_blocks.shape[0]}, "
              f"max_bpc={idx.cell_blocks.shape[1]})", flush=True)
        if index_path and not (os.path.exists(index_path)
                               or os.path.exists(index_path + ".npz")):
            # save AFTER the block centroids: bc rides into the npz, and
            # the sweep-critical decode ran at maximal HBM headroom first.
            # Serialization must never cost a finished 40-min build its
            # sweep: d2h has failed before under post-build HBM/relay
            # pressure — warn and sweep anyway
            try:
                idx.save(index_path)
                print(f"saved index to {index_path}", flush=True)
            except Exception as e:
                print(f"index save FAILED ({type(e).__name__}: "
                      f"{str(e)[:160]}) — continuing to sweep without "
                      f"an on-disk index", flush=True)
        jax.block_until_ready(idx.code_blocks)
        build_s = time.time() - t0
        code_gb = (idx.code_blocks.size
                   + (idx.refine_codes.size
                      if idx.refine_codes is not None else 0)) / 1e9
        print(f"built {N} rows in {build_s:.0f}s; codes {code_gb:.1f} GB "
              f"(corpus would be {N * D * 2 / 1e9:.0f} GB)", flush=True)

    store = open_store()

    if have_gt:
        gtc = np.load(gt_cache)
        q, q_src, exact = gtc["q"], gtc["q_src"], gtc["exact"]
        assert q.shape == (B, D) and exact.shape == (B, K), \
            "GT cache shape mismatch — rebuild with --gt-only"
        qd = jnp.asarray(q)
        exact_s = 0.0
        print(f"loaded queries + exact GT from {gt_cache}", flush=True)
    else:
        # --- queries: noisy copies of known rows
        rng = np.random.default_rng(1)
        q_src = np.sort(rng.choice(N, B, replace=False))
        q = fetch_rows(q_src).astype(np.float32)
        q = q + 0.03 * rng.standard_normal(q.shape).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qd = jnp.asarray(q)

    # --- exact ground truth: streaming fused scan over regenerated blocks.
    # Default scores in f32 (blocks upcast; the kernel then keeps the query
    # f32 too) so GT semantics EXACTLY match the host rerank tier's
    # f32-over-stored-bf16 scoring.  The r5 miss diagnostic
    # (benchmark_results/r5/cfg4_12_miss_diag.json) showed the old bf16
    # GT scan disagreed with the exact rerank on ~1e-5-margin boundary
    # rows — every residual 12.58M "miss" was scorer disagreement (0
    # geometry misses), so a bf16 GT floors strict@10 below what the
    # index actually retrieves.  --gt-bf16 restores the old scan.
    from archi_tpu.engine.topk import topk_scores

    gt_bf16 = "--gt-bf16" in args
    if not have_gt:
        t0 = time.time()
        parts_v, parts_r = [], []
        zero_bias = jnp.zeros((BLOCK_ROWS,), jnp.float32)
        for i in range(N_BLOCKS):
            blk_i = block_fn(i)
            if not gt_bf16:
                blk_i = blk_i.astype(jnp.float32)
            v, r = topk_scores(qd, blk_i, zero_bias, BLOCK_ROWS, k=K,
                               impl="pallas")
            parts_v.append(v)
            parts_r.append(r + i * BLOCK_ROWS)
        av = jnp.concatenate(parts_v, axis=1)
        ar = jnp.concatenate(parts_r, axis=1)
        mv, mp = jax.lax.top_k(av, K)
        exact = np.asarray(jnp.take_along_axis(ar, mp, axis=1))
        exact_s = time.time() - t0
        print(f"exact GT scan: {exact_s:.0f}s", flush=True)

    if gt_only:
        assert gt_cache, "--gt-only needs --gt-cache PATH"
        np.savez(gt_cache, q=q, q_src=q_src, exact=exact)
        print(f"GT cache saved to {gt_cache} "
              f"(store verified: {store is not None})", flush=True)
        return

    # --- runtime RTT (--rtt MS reuses a previously measured value: the
    # probe is a burst of tiny RPCs, the relay's most wedge-prone shape)
    if "--rtt" in args:
        r = float(args[args.index("--rtt") + 1]) / 1e3
    else:
        from archi_tpu.benchmarking.timing import measure_relay_rtt

        r = measure_relay_rtt()

    def strict_of(rows_h):
        return float(np.mean([
            len(set(rows_h[b]) & set(exact[b])) / K for b in range(B)]))

    # --- score-based recall@10: set-based strict@10 saturates on this
    # corpus because k-boundary score gaps (p10 ~6e-5, see
    # cfg4_12_miss_diag.json) sit BELOW f32 dot-product reproducibility —
    # two exact scorers legitimately disagree on the boundary row.  A
    # returned row therefore counts if ONE scorer (the host store's f32
    # BLAS, same path the exact rerank uses) scores it >= the 10th-best
    # ground-truth score under that same scorer.  This is the standard
    # tie-aware recall of ANN benchmarking; both metrics are published.
    # Scoring for the threshold test is f64 (error ~1e-13, far below the
    # ~1e-5 boundary gaps) with a 1e-9 tie slack: the GT row that ATTAINS
    # tau is scored twice in two separate BLAS calls, and without the
    # slack a 1-ULP jitter fails its own `>= tau` test, deflating the
    # metric below strict (observed: 0.978 vs strict 0.994).
    gt_tau = None
    if store is not None:
        gt_tau = np.empty(B, np.float64)
        q64 = q.astype(np.float64)
        for b in range(B):
            g = np.asarray(store.get(exact[b]), np.float64)
            gt_tau[b] = float(np.min(g @ q64[b]))

    def score_recall_of(rows_h):
        if gt_tau is None:
            return None
        hits = 0
        for b in range(B):
            rb = np.unique(np.asarray(rows_h[b], np.int64))
            g = np.asarray(store.get(rb), np.float64)
            hits += min(K, int(np.sum(g @ q64[b] >= gt_tau[b] - 1e-9)))
        return hits / (B * K)

    # --- ADC-only nprobe sweep (quantization-bound recall)
    sweep = []
    for nprobe in () if "--no-adc" in args else (4, 8, 16, 32):
        vals, rows_d = idx.search_dispatch(qd, k=K, nprobe=nprobe,
                                           refine_overfetch=16)
        rows_h = np.asarray(rows_d)
        strict = strict_of(rows_h)
        top1 = float(np.mean(rows_h[:, 0] == q_src))
        _, r100d = idx.search_dispatch(qd, k=100, nprobe=nprobe,
                                       refine_overfetch=16)
        in100 = float(np.mean([
            len(set(np.asarray(r100d)[b]) & set(exact[b])) / K
            for b in range(B)]))

        def dev_search(qv, nprobe=nprobe):
            v, _ = idx.search_dispatch(qv, k=K, nprobe=nprobe,
                                       refine_overfetch=16)
            return v

        best = _measure_qps(dev_search, q, rng, rtt_s=r,
                            sync=lambda v: float(jnp.sum(v)))
        sweep.append({
            "nprobe": nprobe,
            "recall_strict_at_10": round(strict, 3),
            "recall_at_10_in_100": round(in100, 3),
            "self_top1": round(top1, 3),
            "ms_per_batch32": round(best * 1e3, 1),
            "query_qps": round(B / best, 1),
        })
        print(json.dumps(sweep[-1]), flush=True)

    # --- device-only candidate sweep: nprobe x C x refine_overfetch.
    # Strict recall AFTER an exact rerank equals candidate recall (the
    # exact rescore returns the best true-scored 10 of the candidate
    # set), so this measures the rerank path's recall and device cost
    # without the host tier being present; rerank_cost_ms is measured
    # separately when the store exists.
    dev_sweep = []
    if "--dev-sweep" in args:
        for trip in args[args.index("--dev-sweep") + 1].split(","):
            v = [int(x) for x in trip.split(":")]
            nprobe, c, rfo = v[0], v[1], (v[2] if len(v) > 2 else 8)
            _, rows_d = idx.search_dispatch(qd, k=c, nprobe=nprobe,
                                            refine_overfetch=rfo)
            rows_h = np.asarray(rows_d)
            cand = float(np.mean([
                len(set(rows_h[b]) & set(exact[b])) / K for b in range(B)]))
            top1 = float(np.mean(rows_h[:, 0] == q_src))

            def dev_only(qv, nprobe=nprobe, c=c, rfo=rfo):
                v, _ = idx.search_dispatch(qv, k=c, nprobe=nprobe,
                                           refine_overfetch=rfo)
                return v

            best = _measure_qps(dev_only, q, rng, rtt_s=r,
                                sync=lambda v: float(jnp.sum(v)))
            dev_sweep.append({
                "nprobe": nprobe, "rerank_c": c, "refine_overfetch": rfo,
                "recall_strict_at_10_after_exact_rerank": round(cand, 3),
                "self_top1_stage": round(top1, 3),
                "dev_ms_per_batch32": round(best * 1e3, 1),
                "dev_qps": round(B / best, 1),
            })
            print(json.dumps(dev_sweep[-1]), flush=True)

    # --- host-rerank sweep: nprobe x rerank-C (candidate-bound recall)
    rerank_sweep = []
    if store is not None:
        # warm the page cache: one sequential pass over the memmap (the
        # store fits in this host's RAM; cold 4K-page faults would
        # otherwise dominate the first gathers)
        t0 = time.time()
        buf = store._buf
        s = 0
        for ofs in range(0, buf.shape[0], 1 << 21):
            s += int(np.asarray(
                buf[ofs:ofs + (1 << 21), 0].view(np.uint16)).sum())
        print(f"page-cache warm pass: {time.time() - t0:.0f}s", flush=True)

        # spec entries: "npb:C[:rfo[:gate]]" = block-budget probing (the
        # r3 default — per-block mini-centroid ranking, exact work, rfo=1
        # because the host rerank makes the refine rescore a pure
        # reorder; gate = cell_gate, 0 = ungated), or "cell:nprobe:C[:rfo]"
        # for the legacy cell sweep.
        rerank_cfgs = [("npb", 128, 160, 1, 0), ("npb", 128, 320, 1, 0),
                       ("npb", 256, 320, 1, 0), ("npb", 384, 320, 1, 0),
                       ("npb", 512, 320, 1, 0), ("npb", 512, 640, 1, 0)]
        if "--rerank-sweep" in args:
            rerank_cfgs = []
            for pair in args[args.index("--rerank-sweep") + 1].split(","):
                v = pair.split(":")
                if v[0] == "cell":
                    rerank_cfgs.append(("cell", int(v[1]), int(v[2]),
                                        int(v[3]) if len(v) > 3 else 8, 0))
                else:
                    rerank_cfgs.append(("npb", int(v[0]), int(v[1]),
                                        int(v[2]) if len(v) > 2 else 1,
                                        int(v[3]) if len(v) > 3 else 0))
        extract = "exact" if "--exact-extract" in args else "auto"
        hier_t = 64
        if "--extract" in args:
            extract = args[args.index("--extract") + 1]
        if "--hier-t" in args:
            hier_t = int(args[args.index("--hier-t") + 1])
        for mode, probe, c, rfo, gate in rerank_cfgs:
            overfetch = max(1, c // K)
            skw = ({"nprobe_blocks": probe} if mode == "npb"
                   else {"nprobe": probe})
            if gate:
                skw["cell_gate"] = gate
            ids, vals, rows_h = idx.search(
                qd, k=K, rerank_store=store,
                rerank_overfetch=overfetch, refine_overfetch=rfo,
                extract=extract, hier_t=hier_t, **skw)
            strict = strict_of(rows_h)
            top1 = float(np.mean(rows_h[:, 0] == q_src))

            def rr_search(qv, overfetch=overfetch, rfo=rfo, skw=skw):
                _, v, _ = idx.search(qv, k=K, rerank_store=store,
                                     rerank_overfetch=overfetch,
                                     refine_overfetch=rfo, extract=extract,
                                     hier_t=hier_t, **skw)
                return v

            # search() already syncs (numpy outputs) — no extra sync
            best = _measure_qps(rr_search, q, rng, rtt_s=r)

            def dev_only(qv, overfetch=overfetch, rfo=rfo, skw=skw):
                v, _ = idx.search_dispatch(
                    qv, k=K * overfetch,
                    refine_overfetch=rfo, extract=extract, hier_t=hier_t, **skw)
                return v

            dev_best = _measure_qps(dev_only, q, rng, rtt_s=r,
                                    sync=lambda v: float(jnp.sum(v)))
            rerank_sweep.append({
                "probe_mode": mode,
                ("nprobe_blocks" if mode == "npb" else "nprobe"): probe,
                "rerank_c": int(c),
                "refine_overfetch": int(rfo),
                **({"cell_gate": int(gate)} if gate else {}),
                "recall_strict_at_10": round(strict, 3),
                "recall_score_at_10": round(score_recall_of(rows_h), 4),
                "self_top1": round(top1, 3),
                "ms_per_batch32": round(best * 1e3, 1),
                "query_qps": round(B / best, 1),
                "rerank_cost_ms": round((best - dev_best) * 1e3, 1),
            })
            print(json.dumps(rerank_sweep[-1]), flush=True)

    # headline: the fastest rerank config with tie-aware score-recall
    # >= 0.99 (the metric that ignores sub-f32-reproducibility k-boundary
    # ties); fall back to strict >= 0.95, then ADC-only
    good = [s for s in rerank_sweep
            if (s.get("recall_score_at_10") or 0) >= 0.99]
    if not good:
        good = [s for s in rerank_sweep if s["recall_strict_at_10"] >= 0.95]
    if good:
        best_cfg = max(good, key=lambda s: s["query_qps"])
        headline = {"query_qps": best_cfg["query_qps"],
                    "recall_strict_at_10": best_cfg["recall_strict_at_10"],
                    **({"recall_score_at_10": best_cfg["recall_score_at_10"]}
                       if best_cfg.get("recall_score_at_10") is not None
                       else {}),
                    "probe": best_cfg.get("nprobe_blocks",
                                          best_cfg.get("nprobe")),
                    "probe_mode": best_cfg.get("probe_mode", "cell"),
                    "rerank_c": best_cfg["rerank_c"]}
    elif sweep:
        gg = [s for s in sweep if s["self_top1"] >= 0.7]
        bc = (max(gg, key=lambda s: s["query_qps"]) if gg
              else max(sweep, key=lambda s: s["self_top1"]))
        headline = {"query_qps": bc["query_qps"],
                    "self_top1": bc["self_top1"], "nprobe": bc["nprobe"]}
    elif rerank_sweep:
        bc = max(rerank_sweep, key=lambda s: s["recall_strict_at_10"])
        headline = {"query_qps": bc["query_qps"],
                    "recall_strict_at_10": bc["recall_strict_at_10"],
                    "nprobe": bc["nprobe"], "rerank_c": bc["rerank_c"]}
    else:
        headline = {}
    payload = {
        "config": "BASELINE config 4 on ONE v5e chip: 100M-chunk IVF-PQ "
                  "with refinement (4-bit LUT16, m=96+96 packed = "
                  f"96 B/row, nlist={nlist}, block={blk}, block-budget "
                  "probing by per-block mini-centroids) + host bf16 "
                  "exact-rerank tier (77 GB memmap) — codes 9.8 GB on "
                  "device",
        "rows": int(N), "dim": D,
        "build": {"nlist": nlist, "block": blk, "spill_frac": spill,
                  "opq_iters": opq},
        "corpus_equiv_gb": round(N * D * 2 / 1e9, 1),
        "codes_gb": round(code_gb, 2),
        "build_s": round(build_s, 1),
        "gt_scoring": "bf16-dot (legacy)" if gt_bf16 else
                      "f32 over stored-bf16 values (matches the exact "
                      "host rerank's scorer; see cfg4_12_miss_diag.json)",
        "exact_gt_scan_s": round(exact_s, 1),
        "relay_rtt_ms": round(r * 1e3, 1),
        "nprobe_sweep": sweep,
        "dev_sweep": dev_sweep,
        "rerank_sweep": rerank_sweep,
        "host_store": None if store is None else {
            "path": store_path, "rows": len(store), "dtype": "bfloat16",
            "gb": round(len(store) * D * 2 / 1e9, 1),
            "verified": "bit-identical sample rows vs device corpus"},
        "metric_notes": "strict@10 at this cluster density (64 near-"
                        "duplicates/cluster, ~0.002 score gaps) is bounded "
                        "by 96 B/row ADC resolution on the device-only "
                        "path; the rerank_sweep closes it with exact "
                        "host re-scoring of the top-C (rerank_cost_ms = "
                        "host gather+rescore, measured).",
        "headline": headline,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
