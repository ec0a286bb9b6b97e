"""Late-interaction (MaxSim) reranker on TPU.

A capability beyond the reference stack: rerank the retriever's top
candidates with ColBERT-style token-level MaxSim —
``score(q, d) = Σ_i max_j  q_i · d_j`` over normalized token embeddings —
using the same encoder's per-token output (``models/bert.encode_tokens``).
One batched einsum over [C, Sd, H] candidates: MXU-shaped, a few ms for
k≤64 candidates, and substantially sharper than pooled-cosine ordering on
multi-aspect queries.

Usage: wrap any retriever with ``RerankingRetriever`` (over-fetches, then
reorders).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.utils.documents import Document


@functools.partial(jax.jit, static_argnames=())
def maxsim_scores(q_tok, q_mask, d_tok, d_mask):
    """q_tok [Sq, H], q_mask [Sq]; d_tok [C, Sd, H], d_mask [C, Sd]
    → [C] MaxSim scores (normalized tokens)."""
    def norm(x):
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    q = norm(q_tok)
    d = norm(d_tok)
    sim = jnp.einsum("qh,csh->cqs", q, d,
                     preferred_element_type=jnp.float32)
    sim = jnp.where(d_mask[:, None, :] > 0.5, sim, -1e9)
    best = jnp.max(sim, axis=-1)                      # [C, Sq]
    best = jnp.where(q_mask[None, :] > 0.5, best, 0.0)
    return jnp.sum(best, axis=-1) / jnp.maximum(jnp.sum(q_mask), 1.0)


class MaxSimReranker:
    def __init__(self, embedder, *, max_query_tokens: int = 32,
                 max_doc_tokens: int = 128):
        """embedder: a JaxEmbedder (provides tokenizer + params/config)."""
        self.embedder = embedder
        max_pos = embedder.config.max_position_embeddings
        self.max_q = min(max_query_tokens, max_pos)
        self.max_d = min(max_doc_tokens, max_pos)
        self._fwd = None

    def _token_embed(self, texts: Sequence[str], max_len: int):
        from archi_tpu.models.bert import encode_tokens

        if self._fwd is None:
            self._fwd = jax.jit(
                functools.partial(
                    encode_tokens, config=self.embedder.config,
                    compute_dtype=self.embedder.compute_dtype,
                ),
            )
        tok = self.embedder.tokenizer
        ids = np.zeros((len(texts), max_len), np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for r, t in enumerate(texts):
            enc = tok.encode(t, max_len)
            ids[r, : len(enc)] = enc
            mask[r, : len(enc)] = 1
        out = self._fwd(self.embedder.params, jnp.asarray(ids),
                        jnp.asarray(mask))
        return out, jnp.asarray(mask, jnp.float32)

    def rerank(self, query: str,
               results: Sequence[tuple[Document, float]],
               *, top_k: Optional[int] = None):
        """(Document, score) list → re-ordered by MaxSim (new scores)."""
        if not results:
            return []
        docs = [d for d, _s in results]
        q_tok, q_mask = self._token_embed([query], self.max_q)
        d_tok, d_mask = self._token_embed(
            [d.page_content[: self.max_d * 8] for d in docs], self.max_d)
        scores = np.asarray(maxsim_scores(q_tok[0], q_mask[0], d_tok, d_mask))
        order = np.argsort(-scores)
        out = [(docs[i], float(scores[i])) for i in order]
        return out[: top_k or len(out)]


class RerankingRetriever:
    """Wrap a retriever: over-fetch then MaxSim-reorder.

    ``RerankingRetriever(HybridRetriever(store, k=50), reranker, k=5)``
    """

    def __init__(self, base, reranker: MaxSimReranker, *, k: int = 5):
        self.base = base
        self.reranker = reranker
        self.k = k

    def invoke(self, query: str):
        candidates = self.base.invoke(query)
        return self.reranker.rerank(query, candidates, top_k=self.k)

    def __call__(self, query: str):
        return self.invoke(query)
