"""In-image contrastive training of the JAX BERT encoder (VERDICT r2 #2).

Zero egress means no pretrained sentence-transformers weights — but the
full tokenizer → encoder → index → retriever path must still be proven
with LEARNED representations, not the hashed-ngram featurizer (which
never exercises ``models/bert.py`` in a quality run).  This module
trains a small WordPiece+BERT bi-encoder on the TPU from a corpus alone:

- vocab: ``WordPieceTokenizer.build_vocab`` over the corpus;
- pairs: inverse-cloze-style views of each chunk (a sampled keyword
  "query" view vs the full chunk) — the classic self-supervised recipe
  for retrieval pretraining (ICT, Lee et al. 2019) — plus phrased-
  question templates when the caller supplies them;
- loss: symmetric in-batch InfoNCE over L2-normalized mean-pooled
  embeddings (the sentence-transformers MultipleNegativesRankingLoss
  shape), temperature-scaled;
- optimizer: AdamW + cosine decay (optax), jitted train step, bf16
  compute / f32 params.

The result saves as a standard HF snapshot directory (config.json +
model.safetensors in ``BertModel`` naming + vocab.txt) so
``JaxEmbedder(model_dir=...)`` — and any HF consumer — loads it as a
drop-in; a real MiniLM/bge checkpoint remains a pure config change.
Reference analog: ``manager.py:66-73`` resolving the embedding model.
"""

from __future__ import annotations

import functools
import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from archi_tpu.models.bert import BertConfig, encode, init_params
from archi_tpu.models.tokenizer import WordPieceTokenizer


def small_config(vocab_size: int, pooling: str = "mean",
                 hidden: int = 256, layers: int = 4) -> BertConfig:
    """Default 4-layer, 256-wide encoder — trains to convergence in
    minutes on one chip; ``hidden``/``layers`` scale it up (r5: the
    6x384 variant is what first beat the hashed featurizer)."""
    return BertConfig(vocab_size=vocab_size, hidden_size=hidden,
                      num_layers=layers, num_heads=max(4, hidden // 64),
                      intermediate_size=4 * hidden,
                      max_position_embeddings=256, pooling=pooling)


_WORD_RE = re.compile(r"[a-z0-9]+")

# acronym ↔ expansion: "long form (ACRO)" or "ACRO (long form)" —
# Schwartz-Hearst-style, initials must match the expansion's word heads
_ACRO_RE = re.compile(
    r"\b((?:[A-Za-z][a-z0-9]+[ -]){1,5}[A-Za-z][a-z0-9]+)\s*"
    r"\(\s*([A-Z][A-Za-z0-9]{1,9})\s*\)"
)
_ACRO_REV_RE = re.compile(
    r"\b([A-Z][A-Za-z0-9]{1,9})\s*\(\s*((?:[A-Za-z][a-z0-9]+[ -]){1,5}"
    r"[A-Za-z][a-z0-9]+)\s*\)"
)
# definition / alias sentences: "X is a/the ...", "X, also known as Y"
_DEF_RE = re.compile(
    r"\b([A-Za-z][\w-]*(?: [A-Za-z][\w-]*){0,3}) is (?:a|an|the) "
    r"([a-z][\w-]*(?: [a-z][\w-]*){1,6})")
_AKA_RE = re.compile(
    r"\b([A-Za-z][\w-]*(?: [A-Za-z][\w-]*){0,3}),? (?:also known as|aka|"
    r"a\.k\.a\.) ([A-Za-z][\w-]*(?: [A-Za-z][\w-]*){0,3})")


def _trim_expansion(expansion: str, acro: str) -> str | None:
    """Longest suffix of ``expansion`` whose word initials spell ``acro``
    (the regex match is leftmost-greedy and can swallow leading words:
    'The Compact Muon Solenoid (CMS)' → drop 'The')."""
    words = [w for w in re.split(r"[ -]", expansion) if w]
    for start in range(len(words)):
        cand = words[start:]
        if "".join(w[0].lower() for w in cand) == acro.lower():
            return " ".join(cand)
    return None


def mine_pairs(texts: list[str], *, salient_views: int = 2,
               mid_views: int = 2,
               exclude_terms: set[str] | None = None
               ) -> list[tuple[str, str]]:
    """Paraphrase supervision mined from the CORPUS ALONE (VERDICT r3
    item 3): no query templates, no eval leakage.

    - **acronym ↔ expansion** (``long form (ACRO)`` / ``ACRO (long
      form)``, initials checked): the acronym alone, the expansion
      alone, and each-as-query-for-the-other's chunk;
    - **definition / alias sentences** (``X is a <category> ...``,
      ``X also known as Y``): the defined term and its category/alias
      phrase both retrieve the defining chunk;
    - **salient-term views**: document-frequency-weighted keyword
      queries — the chunk's LOWEST-DF (most identifying) terms, which
      teaches the encoder an IDF prior that plain uniform ICT sampling
      does not (generic words stop hijacking the mean pooling).

    ``exclude_terms``: lowercased words that must never appear in a mined
    QUERY view (the held-out-alias eval protocol,
    ``benchmarking/fixture.py fixture_alias_split``): any pair whose
    query side contains one is dropped, so the alias↔term mapping is
    never supervised — it can only be absorbed distributionally from the
    defining document's text.
    """
    excl = {w.lower() for w in (exclude_terms or ())}

    def _blocked(q: str) -> bool:
        return bool(excl) and any(w in excl for w in _WORD_RE.findall(
            q.lower()))

    pairs_raw: list[tuple[str, str]] = []
    pairs = pairs_raw
    # --- document frequency over word types
    df: dict[str, int] = {}
    tokenized = []
    for t in texts:
        words = _WORD_RE.findall(t.lower())
        tokenized.append(words)
        for w in set(words):
            df[w] = df.get(w, 0) + 1

    for t in texts:
        for exp, acro in _ACRO_RE.findall(t):
            exp = _trim_expansion(exp, acro)
            if exp:
                pairs += [(acro, t), (exp, t), (acro, exp), (exp, acro)]
        for acro, exp in _ACRO_REV_RE.findall(t):
            exp = _trim_expansion(exp, acro)
            if exp:
                pairs += [(acro, t), (exp, t), (acro, exp), (exp, acro)]
        for term, definition in _DEF_RE.findall(t):
            if df.get(term.lower().split()[0], 0) <= len(texts) // 4:
                pairs += [(term, t), (f"{term} {definition}", t)]
        for term, alias in _AKA_RE.findall(t):
            pairs += [(alias, t), (term, t), (alias, term)]

    # --- salient-term views: lowest-DF terms identify the chunk
    rng = np.random.default_rng(11)
    n_docs = len(texts)
    for words, t in zip(tokenized, texts):
        uniq = sorted(set(words), key=lambda w: (df.get(w, 0), w))
        salient = [w for w in uniq if df.get(w, 0) < max(2, n_docs // 8)][:12]
        if len(salient) < 2:
            continue
        for _ in range(salient_views):
            k = int(rng.integers(2, min(5, len(salient) + 1)))
            sel = rng.choice(len(salient), size=k, replace=False)
            pairs.append((" ".join(salient[i] for i in sorted(sel)), t))
        # mid-DF term-PAIR views: terms that are not individually
        # distinctive (shared with sibling chunks) but jointly identify
        # this one — real queries name 2-3 topic words without the
        # chunk's rarest identifiers, and resolving the COMBINATION is
        # a different skill than resolving a rare term
        mid = [w for w in uniq
               if max(2, n_docs // 8) <= df.get(w, 0) < max(3, n_docs // 2)]
        if len(mid) >= 2:
            for _ in range(mid_views):
                sel = rng.choice(len(mid), size=2, replace=False)
                pairs.append(
                    (" ".join(mid[i] for i in sorted(sel)), t))
    if excl:
        return [(q, d) for q, d in pairs_raw if not _blocked(q)]
    return pairs_raw


def _splice(q: str, noise: list[str], rng: np.random.Generator,
            lo: int = 1, hi: int = 5) -> str:
    """Insert ``lo..hi-1`` noise tokens into a query string at random word
    positions — the query-shape augmentation for SHORT mined views (real
    keyword queries wrap 2-3 signal terms in generic/unseen words the
    corpus never defines; without seeing that shape in training, mean
    pooling lets the wrapper words dominate exactly when the signal is
    shortest)."""
    qw = q.split()
    for _ in range(int(rng.integers(lo, hi))):
        qw.insert(int(rng.integers(0, len(qw) + 1)),
                  noise[int(rng.integers(0, len(noise)))])
    return " ".join(qw)


def noise_vocab(texts: list[str], *, top_frac: float = 0.02,
                n_pseudo: int = 64,
                seed: int = 13) -> list[str]:
    """Noise tokens for query augmentation: the corpus's HIGHEST-DF words
    (its own 'generic' register) plus random pseudo-words (stand-ins for
    query-side words the corpus has never seen — their subword embeddings
    must learn to not hijack the mean pooling)."""
    df: dict[str, int] = {}
    for t in texts:
        for w in set(_WORD_RE.findall(t.lower())):
            df[w] = df.get(w, 0) + 1
    common = sorted(df, key=df.get, reverse=True)
    common = common[: max(8, int(len(common) * top_frac))]
    rng = np.random.default_rng(seed)
    letters = "abcdefghijklmnopqrstuvwxyz"
    pseudo = ["".join(rng.choice(list(letters),
                                 size=int(rng.integers(4, 9))))
              for _ in range(n_pseudo)]
    return common + pseudo


def make_pairs(texts: list[str], rng: np.random.Generator,
               n_views: int = 4,
               noise: list[str] | None = None,
               splice_prob: float = 0.4) -> list[tuple[str, str]]:
    """Self-supervised (query, positive) pairs from raw chunks.

    Views per chunk: keyword subsamples (drop ~60% of words, keep order)
    and contiguous spans — both answerable only by mapping query terms to
    the chunk's vocabulary, which is exactly the retrieval skill.

    ``noise``: optional token pool (``noise_vocab``) — ~40% of query
    views get 1-3 noise tokens spliced in, so the encoder learns that
    off-topic/generic/unseen query words must not drag the embedding
    (real queries say "problem with X" where "problem" appears nowhere
    in the corpus; without this augmentation such words hijack the mean
    pooling — measured hard-query semantic-only 0.0 in QUALITY_r03).
    """
    pairs = []
    for t in texts:
        words = _WORD_RE.findall(t.lower())
        if len(words) < 6:
            continue
        for _ in range(n_views):
            if rng.random() < 0.5:
                keep = rng.random(len(words)) < 0.4
                if keep.sum() < 3:
                    keep[rng.choice(len(words), 3, replace=False)] = True
                qw = [w for w, k in zip(words, keep) if k]
            else:
                span = rng.integers(3, max(4, len(words) // 2))
                start = rng.integers(0, max(1, len(words) - span))
                qw = words[start:start + span]
            if noise and rng.random() < splice_prob:
                for _j in range(int(rng.integers(1, 4))):
                    qw.insert(int(rng.integers(0, len(qw) + 1)),
                              noise[int(rng.integers(0, len(noise)))])
            pairs.append((" ".join(qw), t))
    rng.shuffle(pairs)
    return pairs


def _pad(ids_list: list[list[int]], seq: int) -> tuple[np.ndarray, np.ndarray]:
    ids = np.zeros((len(ids_list), seq), np.int32)
    mask = np.zeros((len(ids_list), seq), np.int32)
    for r, lst in enumerate(ids_list):
        lst = lst[:seq]
        ids[r, : len(lst)] = lst
        mask[r, : len(lst)] = 1
    return ids, mask


def train(texts: list[str], *, queries: list[tuple[str, str]] | None = None,
          vocab_size: int = 8192, steps: int = 600, batch: int = 64,
          lr: float = 3e-4, tau: float = 0.05, seq_len: int = 96,
          seed: int = 0, config: BertConfig | None = None,
          mine: bool = True, noise_augment: bool = True,
          splice_prob: float = 0.4, hard_neg_frac: float = 0.0,
          splice_mined: float = 0.0, mid_views: int = 2,
          pooling: str = "mean",
          exclude_query_terms: set[str] | None = None,
          n_views: int = 4, hidden: int = 256, layers: int = 4,
          log_every: int = 100, log=print):
    """→ (config, params, tokenizer).  ``queries``: optional extra
    (query, positive_text) supervision mixed into the pair pool.
    ``mine``: add corpus-mined paraphrase pairs (``mine_pairs``);
    ``noise_augment``: splice generic/pseudo noise tokens into query
    views (``noise_vocab``) so off-corpus query words don't hijack the
    embedding.  Both derive from the corpus alone — never from eval
    queries.

    Batches hold AT MOST ONE pair per positive chunk: with thousands of
    views over a few hundred chunks, uniform pair sampling puts ~B²/2N
    duplicate positives in every batch, and each duplicate is a FALSE
    NEGATIVE in the in-batch InfoNCE label matrix (the loss pushes two
    views of the same chunk apart).  ``hard_neg_frac``: fraction of
    steps whose batch is a tf-idf NEIGHBORHOOD of a seed chunk instead
    of a uniform draw — the in-batch negatives then share surface terms
    with the positive (sibling topics, term-colliding distractors), the
    discrimination real keyword queries need."""
    import optax

    rng = np.random.default_rng(seed)
    tokenizer = WordPieceTokenizer.build_vocab(texts, size=vocab_size)
    config = config or small_config(tokenizer.vocab_size, pooling=pooling,
                                    hidden=hidden, layers=layers)
    params = init_params(config, seed=seed)

    noise = noise_vocab(texts) if noise_augment else None
    pairs = make_pairs(texts, rng, n_views=n_views,
                       splice_prob=splice_prob, noise=noise)
    if mine:
        mined = mine_pairs(texts, mid_views=mid_views,
                           exclude_terms=exclude_query_terms)
        if noise and splice_mined > 0.0:
            # mined views are SHORT (an acronym, a 2-term combination) —
            # precisely where wrapper-word hijack bites; splice them too
            mined = [(_splice(q, noise, rng)
                      if rng.random() < splice_mined else q, d)
                     for q, d in mined]
        pairs.extend(mined)
    if queries:
        pairs.extend(queries)
    if exclude_query_terms:
        # strict query-side holdout: the held-out alias words never
        # appear on the QUERY side of any training pair (mined or ICT
        # view) — they reach the model only as document text, the same
        # distributional-only exposure a pretrained checkpoint gets
        excl = {w.lower() for w in exclude_query_terms}
        pairs = [(q, d) for q, d in pairs
                 if not any(w in excl for w in _WORD_RE.findall(q.lower()))]
    rng.shuffle(pairs)
    if not pairs:
        raise ValueError("no trainable pairs from corpus")
    q_tok = [tokenizer.encode(q, max_length=seq_len) for q, _ in pairs]
    d_tok = [tokenizer.encode(d, max_length=seq_len) for _, d in pairs]

    # --- group pair indices by positive chunk (one per batch) ---------
    pos_ids: dict[str, int] = {}
    by_pos: list[list[int]] = []
    for i, (_q, d) in enumerate(pairs):
        pid = pos_ids.setdefault(d, len(pos_ids))
        if pid == len(by_pos):
            by_pos.append([])
        by_pos[pid].append(i)
    n_pos = len(by_pos)

    neighbors = None
    if hard_neg_frac > 0.0 and n_pos > batch:
        # tf-idf cosine neighborhoods over the positive chunks
        uniq = [None] * n_pos
        for d, pid in pos_ids.items():
            uniq[pid] = d
        vocab: dict[str, int] = {}
        rows, cols, vals = [], [], []
        dfc: dict[str, int] = {}
        toks = [set(_WORD_RE.findall(d.lower())) for d in uniq]
        for ws in toks:
            for w in ws:
                dfc[w] = dfc.get(w, 0) + 1
        for r, ws in enumerate(toks):
            for w in ws:
                if dfc[w] >= n_pos // 2:      # drop corpus-generic terms
                    continue
                c = vocab.setdefault(w, len(vocab))
                rows.append(r)
                cols.append(c)
                vals.append(np.log(n_pos / dfc[w]))
        m = np.zeros((n_pos, len(vocab)), np.float32)
        m[rows, cols] = vals
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-9)
        sim = m @ m.T
        np.fill_diagonal(sim, -1.0)
        neighbors = np.argsort(-sim, axis=1)[:, : batch * 2]

    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, q_ids, q_mask, d_ids, d_mask):
        def loss_fn(p):
            zq = encode(p, q_ids, q_mask, config,
                        compute_dtype=jnp.bfloat16)
            zd = encode(p, d_ids, d_mask, config,
                        compute_dtype=jnp.bfloat16)
            logits = zq @ zd.T / tau                      # [B, B]
            labels = jnp.arange(logits.shape[0])
            l_qd = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            l_dq = optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels).mean()
            return 0.5 * (l_qd + l_dq)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for s in range(steps):
        b = min(batch, n_pos)
        if neighbors is not None and rng.random() < hard_neg_frac:
            seed_pid = int(rng.integers(0, n_pos))
            # the pool spans ALL columns when n_pos <= 2*batch, so the
            # seed itself (diag sim = -1, sorted last) can be inside it —
            # drop it or the batch holds the seed's positive twice (the
            # duplicate-positive false negative this sampler exists to
            # prevent)
            pool = neighbors[seed_pid]
            pool = pool[pool != seed_pid]
            sel_pos = np.concatenate([[seed_pid],
                                      rng.permutation(pool)[: b - 1]])
        else:
            sel_pos = rng.choice(n_pos, size=b, replace=False)
        idx = [by_pos[p][int(rng.integers(0, len(by_pos[p])))]
               for p in sel_pos]
        q_ids, q_mask = _pad([q_tok[i] for i in idx], seq_len)
        d_ids, d_mask = _pad([d_tok[i] for i in idx], seq_len)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(q_ids), jnp.asarray(q_mask),
            jnp.asarray(d_ids), jnp.asarray(d_mask))
        if log_every and (s % log_every == 0 or s == steps - 1):
            log(f"step {s}: loss {float(loss):.4f}")
    return config, params, tokenizer


# ------------------------------------------------------------- HF export
def state_dict_from_params(params: dict, config: BertConfig) -> dict:
    """archi_tpu param pytree → HF ``BertModel`` state-dict naming (the
    exact inverse of ``hf_loader.params_from_state_dict``; linear weights
    transpose back to torch's [out, in])."""
    emb = params["embeddings"]
    sd = {
        "embeddings.word_embeddings.weight": emb["word"],
        "embeddings.position_embeddings.weight": emb["position"],
        "embeddings.token_type_embeddings.weight": emb["token_type"],
        "embeddings.LayerNorm.weight": emb["ln_scale"],
        "embeddings.LayerNorm.bias": emb["ln_bias"],
    }
    lay = params["layers"]
    for i in range(config.num_layers):
        for short, hf in (("q", "attention.self.query"),
                          ("k", "attention.self.key"),
                          ("v", "attention.self.value"),
                          ("o", "attention.output.dense")):
            sd[f"encoder.layer.{i}.{hf}.weight"] = lay[f"{short}_w"][i].T
            sd[f"encoder.layer.{i}.{hf}.bias"] = lay[f"{short}_b"][i]
        sd[f"encoder.layer.{i}.attention.output.LayerNorm.weight"] = \
            lay["attn_ln_scale"][i]
        sd[f"encoder.layer.{i}.attention.output.LayerNorm.bias"] = \
            lay["attn_ln_bias"][i]
        sd[f"encoder.layer.{i}.intermediate.dense.weight"] = \
            lay["ffn_i_w"][i].T
        sd[f"encoder.layer.{i}.intermediate.dense.bias"] = lay["ffn_i_b"][i]
        sd[f"encoder.layer.{i}.output.dense.weight"] = lay["ffn_o_w"][i].T
        sd[f"encoder.layer.{i}.output.dense.bias"] = lay["ffn_o_b"][i]
        sd[f"encoder.layer.{i}.output.LayerNorm.weight"] = \
            lay["ffn_ln_scale"][i]
        sd[f"encoder.layer.{i}.output.LayerNorm.bias"] = lay["ffn_ln_bias"][i]
    if "pool_attn" in params:
        # extra tensor beyond BertModel's schema; HF consumers ignore it
        # (from_pretrained treats it as an unexpected key), our loader
        # reads it back when config.json says archi_pooling == "attn"
        sd["pooler_attn.weight"] = params["pool_attn"]["w"]
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def save_model_dir(model_dir: str, config: BertConfig, params: dict,
                   tokenizer: WordPieceTokenizer) -> None:
    """Write an HF-loadable snapshot (config.json + model.safetensors +
    vocab.txt) — ``JaxEmbedder(model_dir=...)`` round-trips it."""
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["BertModel"],
            "model_type": "bert",
            **({"archi_pooling": config.pooling}
               if config.pooling != "mean" else {}),
            "vocab_size": config.vocab_size,
            "hidden_size": config.hidden_size,
            "num_hidden_layers": config.num_layers,
            "num_attention_heads": config.num_heads,
            "intermediate_size": config.intermediate_size,
            "max_position_embeddings": config.max_position_embeddings,
            "type_vocab_size": config.type_vocab_size,
            "layer_norm_eps": config.layer_norm_eps,
        }, f, indent=2)
    from safetensors.numpy import save_file

    save_file(state_dict_from_params(params, config),
              os.path.join(model_dir, "model.safetensors"))
    tokenizer.save_vocab(os.path.join(model_dir, "vocab.txt"))
