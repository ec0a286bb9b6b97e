"""Retrieval-quality fixture regression (VERDICT r1 next #2): the
deterministic corpus + hashed-ngram featurizer must keep the end-to-end
pipeline above the quality bar (full run: scripts/run_quality.py →
QUALITY_r02.json)."""

import numpy as np

from archi_tpu.benchmarking.fixture import (
    fixture_alias_split, fixture_corpus, fixture_hard_queries,
    fixture_synonym_queries,
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


def test_synonym_family_protocol_invariants():
    """The true-synonymy eval (VERDICT r4 item 2b) is only valid if the
    alias vocabulary is genuinely absent from the target docs and the
    held-out half never reaches mined training supervision."""
    docs, _ = fixture_corpus()
    trainable, held_out = fixture_alias_split()
    # split is disjoint, covers all 40 topics, aliases unique
    assert not set(trainable) & set(held_out)
    assert len(trainable) == len(held_out) == 20
    assert len({*trainable, *held_out}) == 40
    by_name = {name: text for name, text, _m in docs}
    for alias, slug in {**trainable, **held_out}.items():
        for w in alias.split():
            # alias words live ONLY in the topic's overview doc
            for name, text in by_name.items():
                has = w in text.lower()
                assert has == (name == f"{slug}-overview.md"), \
                    f"alias word {w!r} leaks into {name}"
    # synonym queries: held-out topics only, target doc shares no alias
    # vocabulary with the query
    syn = fixture_synonym_queries()
    assert len(syn) == 20
    for q in syn:
        target = next(iter(q["reference_sources"][0].values()))
        text = by_name[target].lower()
        alias_words = q["question"].split()[2:-3]  # between 'with'..'and'
        assert any(w not in text for w in alias_words)
    # miner exclusion: no mined query view contains a held-out alias word
    from archi_tpu.models.train_encoder import mine_pairs

    held_words = {w for a in held_out for w in a.split()}
    texts = [t for _n, t, _m in docs]
    mined = mine_pairs(texts, exclude_terms=held_words)
    assert mined, "miner found nothing"
    for q, _d in mined:
        assert not ({w for w in q.lower().split()} & held_words), \
            f"held-out alias leaked into mined query {q!r}"
    # ...but the TRAINABLE aliases do get mined (the aka-pattern works)
    mined_all = mine_pairs(texts)
    train_words = {w for a in trainable for w in a.split()}
    assert any({w for w in q.lower().split()} & train_words
               for q, _d in mined_all)


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
