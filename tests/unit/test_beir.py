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


def test_load_beir_from_official_zip(tmp_path):
    """An official BEIR download (one top-level dir inside a zip) loads
    without pre-extraction — drop-in for the day a dataset lands."""
    import shutil
    import zipfile

    d = tmp_path / "nfcorpus"
    write_fixture_beir(str(d))
    zpath = tmp_path / "nfcorpus.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in d.rglob("*"):
            if p.is_file():
                z.write(p, arcname=f"nfcorpus/{p.relative_to(d)}")
    shutil.rmtree(d)
    corpus, queries, qrels = load_beir(str(zpath))
    assert len(corpus) == 72 and len(queries) == 12
    # idempotent: second load reuses the extraction
    corpus2, _, _ = load_beir(str(zpath))
    assert corpus2 == corpus
    out = evaluate_beir(str(zpath), mode="hybrid")
    assert out["dataset"] == "nfcorpus" and out["queries"] == 12


def test_cli_evaluate_beir(tmp_path):
    """`archi-tpu evaluate --beir PATH` runs config 2 end to end and
    prints the metrics JSON (VERDICT r3 item 8)."""
    import json

    from click.testing import CliRunner

    from archi_tpu.cli.cli_main import cli

    d = str(tmp_path / "scifact")
    write_fixture_beir(d)
    r = CliRunner().invoke(cli, ["evaluate", "--beir", d,
                                 "--retriever-mode", "hybrid"])
    assert r.exit_code == 0, r.output
    out = json.loads(r.output[r.output.index("{"):])
    assert out["dataset"] == "scifact"
    assert out["recall@100"] >= 0.95 and out["ndcg@10"] >= 0.6
