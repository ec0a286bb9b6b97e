"""Co-located end-to-end HTTP serving benchmark (VERDICT r4 item 6).

The docs/serving.md decomposition pinned kernel (78-89k QPS), scheduler
(40.2k), and HTTP-over-the-relay (~1.6k) — but every end-to-end row so
far was tunnel-bound, so the "co-located ceiling" was extrapolation.
This benchmark produces the missing bridge number: the REAL data-manager
HTTP service (``web/data_app.py`` — the same ``create_data_app`` factory
production uses, stdlib ``ThreadingHTTPServer``) serving
``/api/query/hybrid`` against a CPU-backend engine IN THE SAME PROCESS,
over real loopback sockets, with T client threads.  No relay anywhere:
request → WSGI route → embed → fused scan → BM25 → fuse → JSON, all
local.  Alongside it, a no-op POST route on the same app measures the
HTTP stack's intrinsic ceiling (parse + dispatch + JSON) so the gap
between the two is the engine cost, and the gap between no-op HTTP and
the MicroBatcher scheduler-only row (40.2k, docs/serving.md) is the
HTTP stack itself.

Both rows are honest single-host numbers on THIS rig (1 CPU core —
server threads, client threads, and the CPU engine share it; on a
deployment host with >1 core the HTTP row scales with cores until it
meets the scheduler row).

Usage: JAX_PLATFORMS=cpu python scripts/bench_serving_http.py \
          [--clients 256] [--per-client 20] [--chunks 10000] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# the env var alone is not enough on rigs whose sitecustomize force-
# registers the TPU backend and pre-sets JAX_PLATFORMS (so setdefault
# is a no-op there) — this benchmark is CPU-co-located by definition
jax.config.update("jax_platforms", "cpu")

import numpy as np


def _pctl(samples, p):
    return round(float(np.percentile(np.asarray(samples), p)) * 1e3, 2)


WORDS = ("quota scheduler dataset replica tensor queue lease shard batch "
         "token bucket cache index vector mesh kernel tile fuse probe "
         "segment postings ledger broker stream snapshot compaction "
         "grader rubric ticket triage oncall failover").split()


def synth_chunks(n: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        w = rng.choice(WORDS, size=60)
        out.append(f"chunk {i}: " + " ".join(w))
    return out


def main() -> None:
    args = sys.argv[1:]
    out_path = next((a for a in args if not a.startswith("-")),
                    "/tmp/serving_http.json")
    clients = int(args[args.index("--clients") + 1]) \
        if "--clients" in args else 256
    per_client = int(args[args.index("--per-client") + 1]) \
        if "--per-client" in args else 20
    n_chunks = int(args[args.index("--chunks") + 1]) \
        if "--chunks" in args else 10_000

    import http.client

    from archi_tpu.data.catalog import CatalogService
    from archi_tpu.data.data_manager import DataManager
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from archi_tpu.models.hashed_embedder import HashedNgramEmbedder
    from archi_tpu.web.data_app import create_data_app

    store = TpuVectorStore(HashedNgramEmbedder())
    texts = synth_chunks(n_chunks)
    t0 = time.time()
    bs = 2048
    for lo in range(0, n_chunks, bs):
        batch = texts[lo:lo + bs]
        store.add_texts(batch, [{"source": f"doc{lo + j}"}
                                for j in range(len(batch))],
                        ids=[f"c{lo + j}" for j in range(len(batch))])
    print(f"ingested {n_chunks} chunks in {time.time() - t0:.0f}s",
          flush=True)

    dm = DataManager(data_path="/tmp/bench_http_data",
                     catalog=CatalogService(":memory:"), vectorstore=store)
    app = create_data_app(data_manager=dm)

    @app.post("/api/bench/noop")
    def noop(req):  # HTTP-stack-only ceiling: parse request, emit JSON
        return {"ok": True, "n": len(req.json().get("query", ""))}

    port = app.serve("127.0.0.1", 0, background=True)
    print(f"data app serving on :{port}", flush=True)

    queries = [f"problem with {WORDS[i % len(WORDS)]} and "
               f"{WORDS[(i * 7 + 3) % len(WORDS)]} setup"
               for i in range(clients * per_client)]

    def run_wave(path, body_of):
        lat = []
        lock = threading.Lock()
        idx = iter(range(len(queries)))

        def worker(base):
            conn = http.client.HTTPConnection("127.0.0.1", port)
            mine = []
            for j in range(per_client):
                q = queries[base * per_client + j]
                t0 = time.time()
                conn.request("POST", path, json.dumps(body_of(q)),
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                payload = r.read()
                assert r.status == 200, (r.status, payload[:200])
                mine.append(time.time() - t0)
            conn.close()
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        n = clients * per_client
        return {"requests": n, "wall_s": round(wall, 2),
                "qps": round(n / wall, 1),
                "p50_ms": _pctl(lat, 50), "p99_ms": _pctl(lat, 99)}

    # warmup (compile the scan shape, prime caches)
    run_wave("/api/query/hybrid",
             lambda q: {"query": q, "k": 5})
    result = {
        "setup": f"real data-manager HTTP app (create_data_app + "
                 f"ThreadingHTTPServer) co-located with a CPU-backend "
                 f"engine, ONE process, loopback sockets, no relay; "
                 f"{n_chunks} chunks, hash embedder, {clients} client "
                 f"threads x {per_client} requests; 1-core host (server "
                 f"+ clients + engine share it)",
        "noop_http": run_wave("/api/bench/noop",
                              lambda q: {"query": q}),
        "hybrid_end_to_end": run_wave("/api/query/hybrid",
                                      lambda q: {"query": q, "k": 5}),
    }
    # production co-located config: concurrent requests coalesce into one
    # fused engine pass via the MicroBatcher
    # (data_manager.serving.micro_batch) — same route, same store
    store.enable_micro_batching(max_batch=64, max_wait_ms=4.0, workers=2)
    result["hybrid_micro_batched"] = run_wave(
        "/api/query/hybrid", lambda q: {"query": q, "k": 5})
    app.shutdown()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2), flush=True)


if __name__ == "__main__":
    main()
