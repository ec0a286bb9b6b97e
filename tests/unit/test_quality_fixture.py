"""Retrieval-quality fixture regression (VERDICT r1 next #2): the
deterministic corpus + hashed-ngram featurizer must keep the end-to-end
pipeline above the quality bar (full run: scripts/run_quality.py →
QUALITY_r02.json)."""

import numpy as np

from archi_tpu.benchmarking.fixture import (
    fixture_corpus, fixture_hard_queries,
)
from archi_tpu.benchmarking.harness import Benchmarker
from archi_tpu.data.chunking import character_split
from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.models.hashed_embedder import HashedNgramEmbedder
from archi_tpu.orchestrator.archi import Archi


def _build_store(n_distractors=40):
    docs, queries = fixture_corpus(n_distractors=n_distractors)
    store = TpuVectorStore(HashedNgramEmbedder(), dtype=np.float32)
    texts, metas, ids = [], [], []
    for name, text, meta in docs:
        for i, chunk in enumerate(character_split(text)):
            texts.append(chunk)
            metas.append(dict(meta))
            ids.append(f"{name}:{i}")
    store.add_texts(texts, metas, ids=ids)
    return store, queries


def test_fixture_is_deterministic():
    d1, q1 = fixture_corpus()
    d2, q2 = fixture_corpus()
    assert d1 == d2 and q1 == q2
    assert fixture_hard_queries() == fixture_hard_queries()


def test_embedder_is_deterministic_and_normalized():
    e = HashedNgramEmbedder()
    v1 = np.asarray(e.embed_query("slurm array job limits"))
    v2 = np.asarray(e.embed_query("slurm array job limits"))
    np.testing.assert_array_equal(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    # related texts are closer than unrelated ones
    near = np.asarray(e.embed_query("slurm array task scheduling"))
    far = np.asarray(e.embed_query("grafana dashboard panel variables"))
    assert v1 @ near > v1 @ far


def test_sources_accuracy_on_fixture_subset():
    store, queries = _build_store()
    archi = Archi("QAPipeline", vectorstore=store)
    bench = Benchmarker(archi, queries[:24], modes=("SOURCES", "RETRIEVAL"),
                        out_dir="/tmp/archi_bench_test", vectorstore=store)
    report = bench.run()
    t = report["totals"]
    assert t["relative_source_accuracy"] >= 0.95
    assert t["source_accuracy"] >= 0.9
    assert t["recall_at_k"] >= 0.99


def test_hybrid_beats_semantic_on_hard_queries():
    store, _ = _build_store()
    hard = fixture_hard_queries()
    hits = {"hybrid": 0, "semantic": 0}
    for q in hard:
        expected = {next(iter(s.values())) for s in q["reference_sources"]}
        for mode, w in (("hybrid", (0.4, 0.6)), ("semantic", (1.0, 0.0))):
            res = store.hybrid_search(q["question"], k=5,
                                      semantic_weight=w[0], bm25_weight=w[1])
            if expected & {d.metadata.get("source") for d, _s in res}:
                hits[mode] += 1
    assert hits["hybrid"] >= hits["semantic"]
    assert hits["hybrid"] / len(hard) >= 0.9
