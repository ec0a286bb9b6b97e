"""End-to-end ingest throughput: text → tokenize → embed (TPU) → BM25 →
device index, through the production ``TpuVectorStore.add_texts`` path.

The reference's core job is this pipeline (``manager.py:373`` embed call
inside ``_add_to_postgres``); the components were benchmarked separately
(encoder ~21k chunks/s, tokenizer ~35k/s, BM25 delta adds) — this measures
the composed pipeline including every host-side cost.

Usage: python scripts/bench_ingest.py [n_chunks] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def synth_texts(n: int, seed: int = 0) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"term{i}" for i in range(20_000)])
    lens = rng.integers(60, 120, n)  # words per chunk (~600-1000 chars)
    return [" ".join(rng.choice(vocab, size=int(m))) for m in lens]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/archi_tpu_jax_cache")
    import jax.numpy as jnp

    from archi_tpu.engine.flat_index import FlatIndex
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from archi_tpu.models.embedder import JaxEmbedder

    t0 = time.time()
    texts = synth_texts(n)
    gen_s = time.time() - t0

    embedder = JaxEmbedder(max_length=256)
    store = TpuVectorStore(
        embedder, index=FlatIndex(embedder.dim, dtype=jnp.bfloat16))
    # bulk loads know the corpus size: pre-grow so capacity-doubling
    # recompiles (5 jit shapes per growth, seconds each through the
    # remote-compile tunnel on first run) don't pollute the steady state
    store.index._grow_to(n)
    # warm compile at the bucketed shapes
    store.add_texts(texts[:batch], ids=[f"w{i}" for i in range(batch)])

    t0 = time.time()
    for s in range(batch, n, batch):
        chunk = texts[s: s + batch]
        store.add_texts(chunk, ids=[f"c{i}" for i in range(s, s + len(chunk))])
    elapsed = time.time() - t0
    done = n - batch
    # ensure BM25 device flush is included
    _ = store.hybrid_search("term1 term2", k=5)
    total = time.time() - t0

    print(f"corpus gen: {gen_s:.1f}s for {n} chunks")
    print(f"ingest: {done} chunks in {elapsed:.1f}s = "
          f"{done / elapsed:.0f} chunks/s end-to-end "
          f"(tokenize+embed+bm25+index)")
    print(f"incl. first-query bm25 flush: {done / total:.0f} chunks/s")
    print(f"index rows: {store.count()}  bm25 docs: {store.bm25.n_docs}")


if __name__ == "__main__":
    main()
