"""Device-resident BM25 index: impact-ordered postings + scatter-add scoring.

Replaces the lexical half of the reference's hybrid search — pg_textsearch's
C BM25 operator ``chunk_text <@> to_bm25query(...)`` (reference
``src/data_manager/vectorstore/postgres_vectorstore.py:399-461``,
``src/cli/templates/init.sql:294-308``).

TPU-native design (SURVEY.md §7 stage 5):
- At build time every posting entry's full BM25 contribution ("impact") is
  precomputed:  ``impact = idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``.
  Query scoring is then a pure gather+scatter-add of the query terms'
  posting ranges — no per-entry float math on the query path.
- Postings live in flat device arrays (rows [NNZ], impacts [NNZ]) grouped by
  term.  The host (which knows the query's few terms) emits a bounded list
  of fixed-size chunk descriptors; the device runs one fori_loop of
  dynamic-slice + masked ``scatter-add(mode=drop)`` into a dense [N_pad]
  score vector.
- The dense vector feeds the fused hybrid kernel as the per-row additive
  bias (``archi_tpu.ops.pallas_topk``), or ``lax.top_k`` for BM25-only.

Scoring: Okapi BM25 with the Lucene-style non-negative idf
``ln(1 + (N - df + 0.5)/(df + 0.5))``, k1=1.2, b=0.75 (pg_textsearch
defaults).  Incremental adds mark the device arrays dirty; ``build()`` (or
first query) re-materializes them — avgdl/idf therefore stay exact, like a
Postgres index, at a cost linear in corpus size (cheap next to embedding).
Deleted rows are excluded at query time by the caller's alive mask.
"""

from __future__ import annotations

import functools
import json
import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.models.tokenizer import basic_tokenize
from archi_tpu.utils.stemmer import stem as porter_stem

CHUNK = 2048  # postings processed per fori step
_WORK_BUCKETS = (8, 32, 128, 512, 2048, 8192)

# Minimal English stopword list (pg_textsearch's 'english' config drops
# stopwords before BM25; this mirrors the usual set's high-frequency core).
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def _bucket_up(x, buckets):
    for b in buckets:
        if x <= b:
            return b
    return int(2 ** math.ceil(math.log2(max(x, 2))))


def analyze(text: str, *, stemming: bool = False,
            stopwords: frozenset = STOPWORDS) -> list[str]:
    """Text → lexical terms (lowercase, stopword-filtered, optional Porter).

    ASCII texts run through the C++ analyzer
    (``archi_tpu/native/text_analyzer.cc``) when it's available — same
    output, ~an order of magnitude faster on the ingest hot loop."""
    if stopwords is STOPWORDS:
        from archi_tpu.native import native_analyze

        native = native_analyze(text, stemming=stemming)
        if native is not None:
            return native
    toks = [t for t in basic_tokenize(text)
            if len(t) > 1 and not t.isdigit() and t not in stopwords
            and t.isalnum()]
    if stemming:
        toks = [porter_stem(t) for t in toks]
    return toks


@functools.partial(jax.jit, static_argnames=("n_pad", "chunk"))
def _scatter_scores(rows_buf, impacts_buf, work_starts, work_lens, *,
                    n_pad: int, chunk: int):
    """Sum impacts of the work-list chunks into a dense [n_pad] vector."""
    w = work_starts.shape[0]
    pos = jnp.arange(chunk)

    def body(i, scores):
        s = work_starts[i]
        l = work_lens[i]
        rows = jax.lax.dynamic_slice(rows_buf, (s,), (chunk,))
        imps = jax.lax.dynamic_slice(impacts_buf, (s,), (chunk,))
        mask = pos < l
        imps = jnp.where(mask, imps, 0.0)
        rows = jnp.where(mask, rows, n_pad)  # out-of-bounds → dropped
        return scores.at[rows].add(imps, mode="drop")

    return jax.lax.fori_loop(0, w, body, jnp.zeros((n_pad,), jnp.float32))


class BM25Index:
    """Incremental BM25 index keyed by physical row ids (shared with the
    vector index so hybrid fusion is a per-row add)."""

    def __init__(self, *, k1: float = 1.2, b: float = 0.75,
                 stemming: bool = False):
        self.k1 = k1
        self.b = b
        self.stemming = stemming
        self._term_ids: dict[str, int] = {}
        self._postings: list[dict[int, int]] = []  # term_id -> {row: tf}
        self._doc_len: dict[int, int] = {}          # row -> length
        self._dirty = True
        # device/built state
        self._rows_buf = None
        self._impacts_buf = None
        self._term_ranges: dict[int, tuple[int, int]] = {}
        self._n_pad = 0

    # ------------------------------------------------------------------ build
    def add(self, rows: Sequence[int], texts: Sequence[str]) -> None:
        assert len(rows) == len(texts)
        for row, text in zip(rows, texts):
            terms = analyze(text, stemming=self.stemming)
            self._doc_len[row] = len(terms)
            tf: dict[int, int] = {}
            for t in terms:
                tid = self._term_ids.setdefault(t, len(self._term_ids))
                if tid == len(self._postings):
                    self._postings.append({})
                tf[tid] = tf.get(tid, 0) + 1
            for tid, f in tf.items():
                self._postings[tid][row] = f
        if rows:
            self._dirty = True

    def remove(self, rows: Sequence[int]) -> None:
        """Hard-remove rows (callers usually just mask; used by compaction)."""
        rowset = set(rows)
        for plist in self._postings:
            for r in rowset & plist.keys():
                del plist[r]
        for r in rowset:
            self._doc_len.pop(r, None)
        if rowset:
            self._dirty = True

    @property
    def n_docs(self) -> int:
        return len(self._doc_len)

    @property
    def n_terms(self) -> int:
        return len(self._term_ids)

    def build(self, n_pad: int) -> None:
        """Materialize flat postings + precomputed impacts on device."""
        n = max(self.n_docs, 1)
        avgdl = (sum(self._doc_len.values()) / n) if self._doc_len else 1.0
        rows_parts, imp_parts = [], []
        ranges = {}
        off = 0
        for tid, plist in enumerate(self._postings):
            df = len(plist)
            if df == 0:
                ranges[tid] = (off, 0)
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            rr = np.fromiter(plist.keys(), np.int32, df)
            tf = np.fromiter(plist.values(), np.float32, df)
            dl = np.array([self._doc_len.get(int(r), 0) for r in rr], np.float32)
            denom = tf + self.k1 * (1.0 - self.b + self.b * dl / max(avgdl, 1e-9))
            imp = (idf * tf * (self.k1 + 1.0) / np.maximum(denom, 1e-9)).astype(
                np.float32
            )
            rows_parts.append(rr)
            imp_parts.append(imp)
            ranges[tid] = (off, df)
            off += df
        nnz = off
        pad = CHUNK  # slack so dynamic_slice never clamps into real data
        rows_flat = np.full(nnz + pad, n_pad, np.int32)
        imps_flat = np.zeros(nnz + pad, np.float32)
        if nnz:
            rows_flat[:nnz] = np.concatenate(rows_parts)
            imps_flat[:nnz] = np.concatenate(imp_parts)
        self._rows_buf = jnp.asarray(rows_flat)
        self._impacts_buf = jnp.asarray(imps_flat)
        self._term_ranges = ranges
        self._n_pad = int(n_pad)
        self._dirty = False

    # ------------------------------------------------------------------ query
    def query_terms(self, query: str) -> list[str]:
        return analyze(query, stemming=self.stemming)

    def scores(self, query: str, n_pad: int) -> jax.Array:
        """Dense [n_pad] BM25 scores for the query (0 where no term hits)."""
        if self._dirty or self._n_pad != n_pad:
            self.build(n_pad)
        terms = set(self.query_terms(query))
        work: list[tuple[int, int]] = []
        for t in terms:
            tid = self._term_ids.get(t)
            if tid is None:
                continue
            start, length = self._term_ranges.get(tid, (0, 0))
            while length > 0:
                step = min(length, CHUNK)
                work.append((start, step))
                start += step
                length -= step
        if not work:
            return jnp.zeros((n_pad,), jnp.float32)
        wlen = _bucket_up(len(work), _WORK_BUCKETS)
        starts = np.zeros(wlen, np.int32)
        lens = np.zeros(wlen, np.int32)
        for i, (s, l) in enumerate(work):
            starts[i], lens[i] = s, l
        return _scatter_scores(
            self._rows_buf, self._impacts_buf,
            jnp.asarray(starts), jnp.asarray(lens),
            n_pad=n_pad, chunk=CHUNK,
        )

    def topk(self, query: str, n_pad: int, k: int = 10, *, alive_bias=None):
        """BM25-only ranking (vals, rows); rows with no hits score 0."""
        s = self.scores(query, n_pad)
        if alive_bias is not None:
            s = s + alive_bias
        k = min(k, n_pad)
        vals, rows = jax.lax.top_k(s, k)
        return vals, rows.astype(jnp.int32)

    # -------------------------------------------------------------- serialize
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        state = {
            "k1": self.k1, "b": self.b, "stemming": self.stemming,
            "terms": self._term_ids,
            "postings": [
                {str(r): f for r, f in p.items()} for p in self._postings
            ],
            "doc_len": {str(r): l for r, l in self._doc_len.items()},
        }
        with open(path, "w") as f:
            json.dump(state, f)

    @classmethod
    def load(cls, path: str) -> "BM25Index":
        with open(path) as f:
            state = json.load(f)
        idx = cls(k1=state["k1"], b=state["b"], stemming=state["stemming"])
        idx._term_ids = {t: int(i) for t, i in state["terms"].items()}
        idx._postings = [
            {int(r): int(f) for r, f in p.items()} for p in state["postings"]
        ]
        idx._doc_len = {int(r): int(l) for r, l in state["doc_len"].items()}
        return idx
