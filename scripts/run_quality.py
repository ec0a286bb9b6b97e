"""Retrieval-quality run → QUALITY_r02.json (VERDICT r1 next #2).

End-to-end over the REAL pipeline: fixture corpus → chunk (reference
defaults: 1000/0) → embed (deterministic hashed-ngram featurizer — no
pretrained weights exist in this image; see
``archi_tpu/models/hashed_embedder.py``) → TPU vector+BM25 index → hybrid
retrieval (k=5, bm25 0.6 / semantic 0.4 — reference
``base-config.yaml:165-168``) → QAPipeline → SOURCES accuracy
(``service_benchmark.py:344-426`` analog) + recall@10 vs NumPy brute force
+ QPS.

Usage: python scripts/run_quality.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

from archi_tpu.benchmarking.fixture import fixture_corpus, fixture_hard_queries
from archi_tpu.benchmarking.harness import Benchmarker
from archi_tpu.data.chunking import character_split
from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.models.hashed_embedder import HashedNgramEmbedder
from archi_tpu.orchestrator.archi import Archi


def build_store() -> tuple[TpuVectorStore, int]:
    docs, _ = fixture_corpus()
    store = TpuVectorStore(HashedNgramEmbedder())
    texts, metas, ids = [], [], []
    for name, text, meta in docs:
        for i, chunk in enumerate(character_split(text, chunk_size=1000,
                                                  chunk_overlap=0)):
            texts.append(chunk)
            metas.append(dict(meta))
            ids.append(f"{name}:{i}")
    store.add_texts(texts, metas, ids=ids)
    return store, len(texts)


def retriever_ablation(store, queries, k: int = 5) -> dict:
    """Hit@k of the expected source under each retrieval mode."""
    modes = {
        "hybrid": dict(semantic_weight=0.4, bm25_weight=0.6),
        "semantic_only": dict(semantic_weight=1.0, bm25_weight=0.0),
        "bm25_only": dict(semantic_weight=0.0, bm25_weight=1.0),
    }
    out = {}
    for name, w in modes.items():
        hits = 0
        for q in queries:
            expected = {next(iter(s.values())) for s in q["reference_sources"]}
            res = store.hybrid_search(q["question"], k=k, **w)
            got = {d.metadata.get("source") for d, _s in res}
            hits += bool(expected & got)
        out[f"{name}_hit@{k}"] = round(hits / len(queries), 4)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "QUALITY_r02.json"
    t0 = time.time()
    store, n_chunks = build_store()
    docs, queries = fixture_corpus()
    archi = Archi("QAPipeline", vectorstore=store)
    bench = Benchmarker(
        archi, queries, modes=("SOURCES", "RETRIEVAL"),
        out_dir="./benchmark_results", vectorstore=store, retrieval_k=10,
    )
    report = bench.run()
    totals = report["totals"]
    payload = {
        "fixture": {
            "corpus": "deterministic 40-topic support corpus "
                      "(archi_tpu/benchmarking/fixture.py, seed 7)",
            "documents": len(docs),
            "chunks": n_chunks,
            "embedder": "hashed-ngram featurizer (no pretrained weights in "
                        "image; JaxEmbedder swaps in when model_dir exists)",
            "retriever": "hybrid k=5, bm25 0.6 / semantic 0.4",
        },
        "source_accuracy": totals.get("source_accuracy"),
        "relative_source_accuracy": totals.get("relative_source_accuracy"),
        "recall_at_10": totals.get("recall_at_k"),
        "query_qps": totals.get("query_qps"),
        "retriever_ablation": retriever_ablation(store, queries),
        "hard_query_ablation": retriever_ablation(
            store, fixture_hard_queries()),
        "n_questions": totals["n_questions"],
        "avg_time_per_question_s": totals["avg_time_elapsed"],
        "wall_s": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
