"""BEIR-format loader + metrics (BASELINE config 2 tooling), exercised end
to end on a synthetic graded-relevance fixture."""

import math

from archi_tpu.benchmarking.beir import (
    evaluate_beir, load_beir, mrr_at_k, ndcg_at_k, recall_at_k,
    write_fixture_beir,
)


def test_metric_functions():
    rels = {"a": 2, "b": 1}
    assert ndcg_at_k(["a", "b", "x"], rels, 10) == 1.0  # ideal order
    sub = ndcg_at_k(["b", "a", "x"], rels, 10)
    assert 0 < sub < 1.0
    assert recall_at_k(["a", "x"], rels, 2) == 0.5
    assert mrr_at_k(["x", "a"], rels, 10) == 0.5
    assert mrr_at_k(["x", "y"], rels, 10) == 0.0
    # graded gain: rel-2 docs weigh more than rel-1
    assert math.isclose(ndcg_at_k(["a"], {"a": 2}, 10), 1.0)


def test_fixture_roundtrip_and_loader(tmp_path):
    d = str(tmp_path / "beir")
    write_fixture_beir(d)
    corpus, queries, qrels = load_beir(d)
    assert len(corpus) == 72 and len(queries) == 12
    assert all(q in qrels for q in queries)
    some_q = next(iter(qrels.values()))
    assert set(some_q.values()) <= {1, 2}


def test_evaluate_beir_end_to_end(tmp_path):
    d = str(tmp_path / "beir")
    write_fixture_beir(d)
    out = evaluate_beir(d, mode="hybrid")
    assert out["documents"] == 72 and out["queries"] == 12
    # topical docs must be retrieved (recall) and the exact-facet doc must
    # rank above same-topic siblings often enough (ndcg)
    assert out["recall@100"] >= 0.95
    assert out["recall@10"] >= 0.8
    assert out["ndcg@10"] >= 0.6
    # semantic-only and bm25-only also produce sane numbers
    sem = evaluate_beir(d, mode="semantic")
    assert sem["recall@100"] >= 0.9
