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


def small_config(vocab_size: int) -> BertConfig:
    """4-layer, 256-wide encoder — trains to convergence in minutes on
    one chip, big enough to learn real lexical+topical structure."""
    return BertConfig(vocab_size=vocab_size, hidden_size=256, num_layers=4,
                      num_heads=4, intermediate_size=1024,
                      max_position_embeddings=256, pooling="mean")


_WORD_RE = re.compile(r"[a-z0-9]+")


def make_pairs(texts: list[str], rng: np.random.Generator,
               n_views: int = 4) -> list[tuple[str, str]]:
    """Self-supervised (query, positive) pairs from raw chunks.

    Views per chunk: keyword subsamples (drop ~60% of words, keep order)
    and contiguous spans — both answerable only by mapping query terms to
    the chunk's vocabulary, which is exactly the retrieval skill.
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
                q = " ".join(w for w, k in zip(words, keep) if k)
            else:
                span = rng.integers(3, max(4, len(words) // 2))
                start = rng.integers(0, max(1, len(words) - span))
                q = " ".join(words[start:start + span])
            pairs.append((q, t))
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
          log_every: int = 100, log=print):
    """→ (config, params, tokenizer).  ``queries``: optional extra
    (query, positive_text) supervision mixed into the pair pool."""
    import optax

    rng = np.random.default_rng(seed)
    tokenizer = WordPieceTokenizer.build_vocab(texts, size=vocab_size)
    config = config or small_config(tokenizer.vocab_size)
    params = init_params(config, seed=seed)

    pairs = make_pairs(texts, rng)
    if queries:
        pairs.extend(queries)
        rng.shuffle(pairs)
    if not pairs:
        raise ValueError("no trainable pairs from corpus")
    q_tok = [tokenizer.encode(q, max_length=seq_len) for q, _ in pairs]
    d_tok = [tokenizer.encode(d, max_length=seq_len) for _, d in pairs]

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

    n = len(pairs)
    for s in range(steps):
        idx = rng.choice(n, size=min(batch, n), replace=False)
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
