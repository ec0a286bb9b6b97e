"""Benchmark service entrypoint (reference ``src/bin/service_benchmark.py:626``).

Usage: python -m archi_tpu.bin.service_benchmark config.yaml queries.json
queries.json: [{"question": ..., "reference_answer": ...,
                "reference_sources": [{"display_name": "guide.md"}]}]
"""

from __future__ import annotations

import json
import sys

from archi_tpu.benchmarking.harness import Benchmarker, wait_for_ingestion
from archi_tpu.bin.bootstrap import build_context
from archi_tpu.orchestrator.archi import Archi


def main() -> None:
    config_paths = [a for a in sys.argv[1:] if a.endswith((".yaml", ".yml"))]
    query_files = [a for a in sys.argv[1:] if a.endswith(".json")]
    if not query_files:
        print("usage: service_benchmark [config.yaml] queries.json")
        sys.exit(2)
    with open(query_files[0]) as f:
        queries = json.load(f)

    ctx = build_context(config_paths)
    ctx.data_manager.run_ingestion()
    wait_for_ingestion(lambda: ctx.data_manager.status)

    bench_cfg = ctx.config.get("services", {}).get("benchmarking", {})
    modes = tuple(bench_cfg.get("modes", ["SOURCES", "RETRIEVAL"]))
    archi = Archi(ctx.config.get("active_pipeline", "QAPipeline"),
                  config=ctx.config, vectorstore=ctx.vectorstore)
    bench = Benchmarker(
        archi, queries, modes=modes,
        out_dir=bench_cfg.get("out_dir", "./benchmark_results"),
        vectorstore=ctx.vectorstore,
    )
    report = bench.run()
    print(json.dumps(report["totals"], indent=2))


if __name__ == "__main__":
    main()
