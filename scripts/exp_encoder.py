"""Fast encoder-recipe experiment loop (r5, VERDICT item 2a).

Trains one encoder variant on the fixture corpus (strict query-side
holdout of the eval alias half — the exact QUALITY_r05 protocol) and
scores the three semantic-only ablation families the verdict graded
(main / hard / synonym) plus hybrid, WITHOUT the QAPipeline harness, so
a recipe iteration costs ~2-5 min instead of a full quality run.  The
winning recipe's flags are then passed verbatim to run_quality.py for
the committed artifact.

Usage: python scripts/exp_encoder.py TAG [--steps N] [--hidden N]
           [--layers N] [train-knobs as in run_quality.py] [--hash-only]
Prints one JSON line per run; appends to /tmp/enc_experiments.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

from archi_tpu.benchmarking.fixture import (fixture_alias_split,
                                            fixture_corpus,
                                            fixture_hard_queries,
                                            fixture_synonym_queries)
from archi_tpu.data.chunking import character_split
from archi_tpu.engine.vectorstore import TpuVectorStore


def fixture_chunks():
    docs, _ = fixture_corpus()
    texts, metas, ids = [], [], []
    for name, text, meta in docs:
        for i, chunk in enumerate(character_split(text, chunk_size=1000,
                                                  chunk_overlap=0)):
            texts.append(chunk)
            metas.append(dict(meta))
            ids.append(f"{name}:{i}")
    return texts, metas, ids


def ablate(store, queries, k=5, modes=("hybrid", "semantic_only")):
    weights = {"hybrid": dict(semantic_weight=0.4, bm25_weight=0.6),
               "semantic_only": dict(semantic_weight=1.0, bm25_weight=0.0),
               "bm25_only": dict(semantic_weight=0.0, bm25_weight=1.0)}
    out = {}
    for name in modes:
        hits = 0
        for q in queries:
            expected = {next(iter(s.values()))
                        for s in q["reference_sources"]}
            res = store.hybrid_search(q["question"], k=k, **weights[name])
            if expected & {d.metadata.get("source") for d, _s in res}:
                hits += 1
        out[name] = round(hits / len(queries), 4)
    return out


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/archi_tpu_jax_cache")
    args = sys.argv[1:]
    tag = args[0] if args and not args[0].startswith("-") else "exp"

    texts, metas, ids = fixture_chunks()
    docs, main_q = fixture_corpus()
    hard_q = fixture_hard_queries()
    syn_q = fixture_synonym_queries()
    _trainable, held_out = fixture_alias_split()
    held_words = {w for alias in held_out for w in alias.split()}

    def run_store(embedder):
        store = TpuVectorStore(embedder)
        store.add_texts(texts, metas, ids=ids)
        return {"main": ablate(store, main_q),
                "hard": ablate(store, hard_q),
                "synonym": ablate(store, syn_q)}

    if "--hash-only" in args:
        from archi_tpu.models.hashed_embedder import HashedNgramEmbedder

        res = {"tag": "hash", **run_store(HashedNgramEmbedder())}
        print(json.dumps(res), flush=True)
        with open("/tmp/enc_experiments.jsonl", "a") as f:
            f.write(json.dumps(res) + "\n")
        return

    train_kw = {"batch": 128, "seq_len": 96, "seed": 0, "steps": 1500}
    for flag, key, cast in (("--steps", "steps", int),
                            ("--batch", "batch", int),
                            ("--pooling", "pooling", str),
                            ("--hard-neg", "hard_neg_frac", float),
                            ("--splice-mined", "splice_mined", float),
                            ("--mid-views", "mid_views", int),
                            ("--n-views", "n_views", int),
                            ("--seq-len", "seq_len", int),
                            ("--lr", "lr", float),
                            ("--tau", "tau", float),
                            ("--hidden", "hidden", int),
                            ("--layers", "layers", int),
                            ("--seed", "seed", int)):
        if flag in args:
            train_kw[key] = cast(args[args.index(flag) + 1])

    from archi_tpu.models.embedder import JaxEmbedder
    from archi_tpu.models.train_encoder import save_model_dir, train

    t0 = time.time()
    cfg, params, tok = train(texts, exclude_query_terms=held_words,
                             log=lambda s: print(s, flush=True), **train_kw)
    train_s = time.time() - t0
    model_dir = f"/tmp/enc_exp_{tag}"
    save_model_dir(model_dir, cfg, params, tok)
    emb = JaxEmbedder(model_dir=model_dir, max_length=128)
    res = {"tag": tag, "train_kw": train_kw,
           "train_s": round(train_s, 1), **run_store(emb)}
    print(json.dumps(res), flush=True)
    with open("/tmp/enc_experiments.jsonl", "a") as f:
        f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
