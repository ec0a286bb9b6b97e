"""BASELINE config 1: a REAL documentation corpus end to end.

Config 1 is "archi docs + SubMIT corpus (~10k chunks), exact cosine top-10"
— this run ingests the reference framework's own documentation (markdown,
used purely as corpus DATA) through the production path: local_files
collector → catalog → diff-sync → chunk (1000/0) → embed → TPU flat index
→ hybrid retrieval → QAPipeline, then scores SOURCES accuracy on
hand-written questions grounded in those docs plus recall@10/QPS.

The embedder is the deterministic hashed-ngram featurizer (no pretrained
weights exist in this image; `JaxEmbedder` swaps in via config when a
model_dir exists).

Usage: python scripts/run_config1.py [corpus_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

QUERIES = [
    {"question": "how do I configure a deployment with a YAML file?",
     "reference_sources": [{"display_name": "configuration.md"}]},
    {"question": "which services can I enable at deploy time?",
     "reference_sources": [{"display_name": "services.md"}]},
    {"question": "walk me through deploying my first instance",
     "reference_sources": [{"display_name": "quickstart.md"}]},
    {"question": "how do I ingest content from a web link list?",
     "reference_sources": [{"display_name": "data_sources.md"}]},
    {"question": "what are the evaluation modes of the benchmarking "
                 "command?",
     "reference_sources": [{"display_name": "benchmarking.md"}]},
    {"question": "how are agent specs defined and where do they live?",
     "reference_sources": [{"display_name": "agents_tools.md"}]},
    {"question": "what should I do about port conflicts?",
     "reference_sources": [{"display_name": "troubleshooting.md"}]},
    {"question": "which LLM provider types are supported?",
     "reference_sources": [{"display_name": "models_providers.md"}]},
    {"question": "how do I verify the CLI installation?",
     "reference_sources": [{"display_name": "cli_reference.md"}]},
    {"question": "what are the system requirements to install?",
     "reference_sources": [{"display_name": "install.md"}]},
    {"question": "list the REST API endpoints of the chat application",
     "reference_sources": [{"display_name": "api_reference.md"}]},
    {"question": "how do I enable lingering for podman containers?",
     "reference_sources": [{"display_name": "advanced_setup_deploy.md"}]},
    {"question": "give me an architecture overview for contributors",
     "reference_sources": [{"display_name": "developer_guide.md"}]},
    {"question": "what are the core parts of the retrieval assistant "
                 "framework?",
     "reference_sources": [{"display_name": "user_guide.md"}]},
]


def main() -> None:
    import os

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/docs/docs"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CONFIG1_r02.json"
    if not os.path.isdir(corpus_dir):
        # the classic footgun: passing only the OUTPUT path makes the
        # collector ingest that file as a one-document corpus
        raise SystemExit(
            f"corpus_dir {corpus_dir!r} is not a directory "
            "(usage: run_config1.py [corpus_dir] [out.json])")
    import tempfile

    from archi_tpu.benchmarking.harness import Benchmarker
    from archi_tpu.bin.bootstrap import build_context
    from archi_tpu.orchestrator.archi import Archi

    root = tempfile.mkdtemp(prefix="config1_")
    t0 = time.time()
    ctx = build_context(overrides={
        "data_manager": {
            "data_path": root + "/data",
            "db_path": root + "/catalog.db",
            "embedding_name": "hashed_ngram",
            "sources": {"local_files": {"paths": [corpus_dir]}},
            "index": {"dtype": "float32", "tile_n": 256},
        },
    })
    ingest = ctx.data_manager.run_ingestion()
    ingest_s = time.time() - t0

    archi = Archi("QAPipeline", config=ctx.config,
                  vectorstore=ctx.vectorstore)
    bench = Benchmarker(archi, QUERIES, modes=("SOURCES", "RETRIEVAL"),
                        out_dir=root + "/results",
                        vectorstore=ctx.vectorstore, retrieval_k=10)
    report = bench.run()
    t = report["totals"]
    missed = [q["question"] for name, q in
              zip(report["questions"], QUERIES)
              if not all(m["matched"] for m in
                         report["questions"][name].get(
                             "reference_sources_metadata", [{"matched": 1}]))]
    payload = {
        "config": "BASELINE config 1 — real docs corpus through the full "
                  "ingest+retrieval pipeline",
        "corpus": corpus_dir,
        "documents": ingest["collected"]["local_files"],
        "chunks": ingest["total_chunks"],
        "ingest_s": round(ingest_s, 1),
        "source_accuracy": t.get("source_accuracy"),
        "relative_source_accuracy": t.get("relative_source_accuracy"),
        "recall_at_10": t.get("recall_at_k"),
        "query_qps": t.get("query_qps"),
        "n_questions": t["n_questions"],
        "missed": missed,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
    ctx.scheduler.stop()


if __name__ == "__main__":
    main()
