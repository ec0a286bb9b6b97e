"""Streaming ingest under query load (BASELINE config 5).

Two phases, one JSON line each:

A. VECTOR PLANE @ 8M rows: pre-populate a FlatIndex to 8M x 384 bf16 on
   device, then run continuous queries while an ingest thread appends
   1024-row device batches at >= the config-5 rate (10k chunks/min).
   Reports p50/p99 query latency (relay RTT subtracted) and achieved
   ingest rate — the scale cliff fixed in r2 was growth/rebuild stalls.

B. HYBRID PLANE @ 1M rows with live BM25: same shape but through
   TpuVectorStore.hybrid-style scoring — vector append + BM25 delta flush
   per batch (text analysis on host), verifying the incremental-BM25 path
   keeps p99 bounded and performs ZERO full rebuilds during streaming.

Usage: python scripts/bench_streaming_ingest.py [--seconds 45]
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def measure_rtt(jnp) -> float:
    from archi_tpu.benchmarking.timing import measure_relay_rtt

    return measure_relay_rtt()


def prepopulate(idx, n, d, chunk=1 << 19):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    done = 0
    while done < n:
        m = min(chunk, n - done)
        vecs = jax.random.normal(jax.random.fold_in(key, done), (m, d),
                                 jnp.float32)
        idx.add(vecs, list(range(done, done + m)))
        done += m
    return done


def phase_vector(seconds: int, hot_tail: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from archi_tpu.engine.flat_index import FlatIndex
    from archi_tpu.engine.topk import _on_tpu

    # 8M-row capacity with streaming headroom: filling the capacity exactly
    # would make the first streamed add double the buffer to 16M rows
    # (12 GB) alongside the live 6 GB one — more than one chip's HBM.
    CAP, D, B, K = 8 * (1 << 20), 384, 32, 10
    N = CAP - (1 << 17)
    rtt = measure_rtt(jnp)
    if hot_tail:
        from archi_tpu.engine.segmented_index import SegmentedFlatIndex

        idx = SegmentedFlatIndex(D, dtype=jnp.bfloat16, tile_n=4096,
                                 merge_rows=1 << 16)
    else:
        idx = FlatIndex(D, dtype=jnp.bfloat16, tile_n=4096)
    t0 = time.time()
    # pre-grow to the final capacity while empty: growing at 4M rows peaks
    # at old(3GB)+new(6GB)+append-copy(6GB) and can OOM alongside transient
    # generation buffers; growing from empty allocates just the 6GB once
    main = idx.main if hot_tail else idx
    main._grow_to(CAP)
    # hot-tail: bulk prepopulation goes straight into the cold main segment
    # (global rows == main rows while the tail is empty); the tail is for
    # the streaming phase's small appends
    prepopulate(main, N, D)
    assert main.capacity == CAP, main.capacity
    prep_s = time.time() - t0

    key = jax.random.PRNGKey(7)
    stop = threading.Event()
    ingested = {"rows": 0}

    def ingest_loop():
        i = 0
        while not stop.is_set():
            vecs = jax.random.normal(jax.random.fold_in(key, 10_000 + i),
                                     (1024, D), jnp.float32)
            base = N + ingested["rows"]
            idx.add(vecs, list(range(base, base + 1024)))
            ingested["rows"] += 1024
            i += 1
            time.sleep(2.0)  # 1024 rows / 2s ≈ 30k chunks/min (3x config 5)

    impl = "pallas" if _on_tpu() else "xla"
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, D), jnp.float32)
    _ids, vals, _rows = idx.search(np.asarray(q), k=K, impl=impl)  # compile

    th = threading.Thread(target=ingest_loop, daemon=True)
    th.start()
    lat = []
    end = time.time() + seconds
    qi = 0
    while time.time() < end:
        qv = jax.random.normal(jax.random.fold_in(key, 100_000 + qi),
                               (B, D), jnp.float32)
        t0 = time.time()
        _ids, vals, _rows = idx.search(np.asarray(qv), k=K, impl=impl)
        lat.append(max(time.time() - t0 - rtt, 1e-9))
        qi += 1
    stop.set()
    th.join(timeout=10)
    lat_ms = np.asarray(lat) * 1e3
    return {
        "phase": "vector_8M_streaming" + ("_hot_tail" if hot_tail else ""),
        "corpus_rows": int(len(idx)),
        "prepopulate_s": round(prep_s, 1),
        "ingest_rows_per_min": round(ingested["rows"] / seconds * 60, 0),
        "queries": len(lat),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "max_ms": round(float(lat_ms.max()), 2),
        "relay_rtt_ms": round(rtt * 1e3, 1),
    }


def phase_hybrid(seconds: int) -> dict:
    import jax
    import jax.numpy as jnp

    from archi_tpu.engine.bm25 import BM25Index
    from archi_tpu.engine.flat_index import FlatIndex
    from archi_tpu.engine.topk import _on_tpu, alive_to_bias, topk_scores

    N, D, B, K = 1 << 20, 384, 32, 10
    rtt = measure_rtt(jnp)
    idx = FlatIndex(D, dtype=jnp.bfloat16, tile_n=4096)
    prepopulate(idx, N, D)
    bm25 = BM25Index()
    # seed lexical corpus: synthetic short docs over a 5k-term vocabulary
    rng = np.random.default_rng(0)
    vocab = [f"term{i}" for i in range(5000)]
    t0 = time.time()
    batch = 50_000
    for s in range(0, 200_000, batch):  # 200k lexical docs (host analysis)
        texts = [" ".join(rng.choice(vocab, size=8)) for _ in range(batch)]
        bm25.add(list(range(s, s + batch)), texts)
    _ = bm25.scores("term1 term2", idx.capacity)  # initial build
    seed_s = time.time() - t0
    builds_after_seed = bm25.full_builds

    key = jax.random.PRNGKey(3)
    stop = threading.Event()
    ingested = {"rows": 0}

    def ingest_loop():
        i = 0
        while not stop.is_set():
            vecs = jax.random.normal(jax.random.fold_in(key, 50_000 + i),
                                     (512, D), jnp.float32)
            base = N + ingested["rows"]
            rows = idx.add(vecs, list(range(base, base + 512)))
            texts = [" ".join(rng.choice(vocab, size=8)) for _ in range(512)]
            bm25.add(rows, texts)
            ingested["rows"] += 512
            i += 1
            time.sleep(2.0)

    impl = "pallas" if _on_tpu() else "xla"

    def hybrid_query(qv, qtext):
        with idx._buf_lock:
            emb, alive, cap, n_rows = (idx.emb, idx.alive, idx.capacity,
                                       idx.n_rows)
        bias = alive_to_bias(alive) + 0.6 * bm25.scores(qtext, cap)
        vals, rows = topk_scores(0.4 * qv, emb, bias, n_rows, k=K, impl=impl)
        return float(jnp.sum(vals))

    q0 = jax.random.normal(jax.random.fold_in(key, 1), (B, D), jnp.float32)
    hybrid_query(q0, "term1 term2 term3")  # compile

    th = threading.Thread(target=ingest_loop, daemon=True)
    th.start()
    lat = []
    end = time.time() + seconds
    qi = 0
    while time.time() < end:
        qv = jax.random.normal(jax.random.fold_in(key, 200_000 + qi),
                               (B, D), jnp.float32)
        qtext = " ".join(rng.choice(vocab, size=3))
        t0 = time.time()
        hybrid_query(qv, qtext)
        lat.append(max(time.time() - t0 - rtt, 1e-9))
        qi += 1
    stop.set()
    th.join(timeout=10)
    lat_ms = np.asarray(lat) * 1e3
    return {
        "phase": "hybrid_1M_streaming_live_bm25",
        "corpus_rows": int(len(idx)),
        "bm25_docs": bm25.n_docs,
        "bm25_seed_s": round(seed_s, 1),
        "ingest_rows_per_min": round(ingested["rows"] / seconds * 60, 0),
        "queries": len(lat),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "max_ms": round(float(lat_ms.max()), 2),
        "bm25_full_builds_during_stream":
            bm25.full_builds - builds_after_seed,
        "bm25_delta_flushes": bm25.delta_flushes,
        "relay_rtt_ms": round(rtt * 1e3, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=45)
    ap.add_argument("--phase", choices=["vector", "hybrid", "both"],
                    default="both")
    ap.add_argument("--hot-tail", action="store_true",
                    help="use the SegmentedFlatIndex hot-tail append path")
    args = ap.parse_args()
    if args.phase in ("vector", "both"):
        print(json.dumps(phase_vector(args.seconds, hot_tail=args.hot_tail)))
    if args.phase in ("hybrid", "both"):
        print(json.dumps(phase_hybrid(args.seconds)))


if __name__ == "__main__":
    main()
