"""BASELINE config 1 smoke: real docs corpus through the full pipeline
(gated on the reference checkout being present)."""

import os

import pytest

DOCS = "/root/reference/docs/docs"

pytestmark = pytest.mark.skipif(not os.path.isdir(DOCS),
                                reason="reference docs corpus not present")


def test_config1_end_to_end(tmp_path):
    from archi_tpu.benchmarking.harness import Benchmarker
    from archi_tpu.bin.bootstrap import build_context
    from archi_tpu.orchestrator.archi import Archi
    from scripts.run_config1 import QUERIES

    ctx = build_context(overrides={
        "data_manager": {
            "data_path": str(tmp_path / "data"),
            "db_path": str(tmp_path / "catalog.db"),
            "embedding_name": "hashed_ngram",
            "sources": {"local_files": {"paths": [DOCS]}},
            "index": {"dtype": "float32", "tile_n": 256},
        },
    })
    try:
        ingest = ctx.data_manager.run_ingestion()
        assert ingest["collected"]["local_files"] >= 14
        assert ingest["total_chunks"] > 50
        archi = Archi("QAPipeline", config=ctx.config,
                      vectorstore=ctx.vectorstore)
        bench = Benchmarker(archi, QUERIES[:8],
                            modes=("SOURCES", "RETRIEVAL"),
                            out_dir=str(tmp_path / "res"),
                            vectorstore=ctx.vectorstore)
        t = bench.run()["totals"]
        assert t["relative_source_accuracy"] >= 0.8
        assert t["recall_at_k"] >= 0.99
    finally:
        ctx.scheduler.stop()
