"""BERT-class text encoder as a pure-JAX forward pass.

TPU-native replacement for the reference's embedding inference, which runs
PyTorch sentence-transformers on CPU/GPU (reference
``src/data_manager/vectorstore/manager.py:66-73,373`` with
``all-MiniLM-L6-v2`` as the default model,
``src/cli/templates/base-config.yaml:137-152``).  Covers the MiniLM /
bge-small / bge-base families (standard post-LN BERT encoders + mean pooling
+ L2 normalization).

Design:
- Parameters are a plain pytree (dict) — easy to shard, donate, and load
  from HF checkpoints (see ``archi_tpu.models.hf_loader``).
- The L encoder layers are stacked along a leading axis and consumed with
  ``jax.lax.scan`` — one compiled layer body regardless of depth.
- Compute dtype is configurable (bf16 on TPU for MXU throughput); layernorm
  statistics and the attention softmax accumulate in f32.
- Everything is shape-static: callers pad to fixed (batch, seq) buckets
  (see ``archi_tpu.models.embedder``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    # pooling: "mean" (sentence-transformers MiniLM/bge default), "cls",
    # or "attn" (learned token-relevance softmax — a linear score per
    # token gates the pooling, so generic/unseen query words can be
    # DOWN-weighted instead of diluting the mean; trained in-image,
    # round-trips through the HF snapshot as an extra `pooler_attn`
    # tensor + `archi_pooling` config key)
    pooling: str = "mean"
    normalize: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def minilm_l6(cls) -> "BertConfig":
        return cls()

    @classmethod
    def bge_small(cls) -> "BertConfig":
        return cls(hidden_size=384, num_layers=12, num_heads=12,
                   intermediate_size=1536, pooling="cls")

    @classmethod
    def bge_base(cls) -> "BertConfig":
        return cls(hidden_size=768, num_layers=12, num_heads=12,
                   intermediate_size=3072, pooling="cls")


def init_params(config: BertConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Deterministic random init (used when no checkpoint is available)."""
    rng = np.random.default_rng(seed)
    h, f, L = config.hidden_size, config.intermediate_size, config.num_layers

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.normal(0.0, scale, shape), dtype)

    def zeros(*shape):
        return jnp.zeros(shape, dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    params = {
        "embeddings": {
            "word": w(config.vocab_size, h),
            "position": w(config.max_position_embeddings, h),
            "token_type": w(config.type_vocab_size, h),
            "ln_scale": ones(h),
            "ln_bias": zeros(h),
        },
        "layers": {
            "q_w": w(L, h, h), "q_b": zeros(L, h),
            "k_w": w(L, h, h), "k_b": zeros(L, h),
            "v_w": w(L, h, h), "v_b": zeros(L, h),
            "o_w": w(L, h, h), "o_b": zeros(L, h),
            "attn_ln_scale": ones(L, h), "attn_ln_bias": zeros(L, h),
            "ffn_i_w": w(L, h, f), "ffn_i_b": zeros(L, f),
            "ffn_o_w": w(L, f, h), "ffn_o_b": zeros(L, h),
            "ffn_ln_scale": ones(L, h), "ffn_ln_bias": zeros(L, h),
        },
    }
    if config.pooling == "attn":
        # zero-init → uniform softmax → exactly mean pooling at step 0,
        # so the gate only departs from the mean where training pushes it
        params["pool_attn"] = {"w": zeros(h)}
    return params


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _encoder_layer(x, key_bias, lp, config: BertConfig,
                   attention_impl: str = "xla",
                   attention_interpret: bool = False):
    """One post-LN BERT layer.

    x: [B, S, H]; key_bias: [B, S] f32 additive bias on key positions
    (0 real, -1e9 padding).

    The q/k/v projections emit a heads-first ``[B, nh, S, hd]`` layout
    directly from the einsum (the transpose fuses into the matmul's output
    write) so each (batch, head) slice is one contiguous block — what both
    the fused Pallas attention kernel and the XLA batched-dot path want.
    """
    b, s, h = x.shape
    nh, hd = config.num_heads, config.head_dim
    dt = x.dtype

    if attention_impl == "pallas":
        # Fused kernel: the [S, S] softmax never touches HBM
        # (archi_tpu.ops.pallas_attention).  The kernel wants the transposed
        # [B, nh, hd, S] layout (sequence on lanes — hd is too small for the
        # lane axis); the projections emit it directly so the transposes
        # fuse into the matmul epilogues.
        from archi_tpu.ops.pallas_attention import encoder_attention

        def proj_t(w_, b_):
            return (
                jnp.einsum("bsh,hnd->bnds", x,
                           w_.astype(dt).reshape(h, nh, hd))
                + b_.astype(dt).reshape(nh, hd)[None, :, :, None]
            )

        ctx_t = encoder_attention(
            proj_t(lp["q_w"], lp["q_b"]),
            proj_t(lp["k_w"], lp["k_b"]),
            proj_t(lp["v_w"], lp["v_b"]),
            key_bias,
            sm_scale=float(1.0 / np.sqrt(hd)),
            interpret=attention_interpret,
        )
        attn_out = jnp.einsum("bnds,ndh->bsh", ctx_t,
                              lp["o_w"].astype(dt).reshape(nh, hd, h))
    else:
        def proj(w_, b_):
            return (
                jnp.einsum("bsh,hnd->bnsd", x,
                           w_.astype(dt).reshape(h, nh, hd))
                + b_.astype(dt).reshape(nh, hd)[None, :, None, :]
            )

        q = proj(lp["q_w"], lp["q_b"])
        k = proj(lp["k_w"], lp["k_b"])
        v = proj(lp["v_w"], lp["v_b"])
        # [B, nh, S, S] logits in f32 for a stable softmax.
        logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(hd) + key_bias[:, None, None, :]
        probs = jax.nn.softmax(logits, axis=-1).astype(dt)
        ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
        attn_out = jnp.einsum("bnsd,ndh->bsh", ctx,
                              lp["o_w"].astype(dt).reshape(nh, hd, h))
    attn_out = attn_out + lp["o_b"].astype(dt)
    x = _layer_norm(x + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"],
                    config.layer_norm_eps)

    inter = jnp.einsum("bsh,hf->bsf", x, lp["ffn_i_w"].astype(dt)) + lp["ffn_i_b"].astype(dt)
    inter = jax.nn.gelu(inter.astype(jnp.float32), approximate=False).astype(dt)
    out = jnp.einsum("bsf,fh->bsh", inter, lp["ffn_o_w"].astype(dt)) + lp["ffn_o_b"].astype(dt)
    return _layer_norm(x + out, lp["ffn_ln_scale"], lp["ffn_ln_bias"],
                       config.layer_norm_eps)


def encode(params: dict, input_ids, attention_mask, config: BertConfig,
           *, compute_dtype=jnp.float32, token_type_ids=None,
           attention_impl: str = "xla", attention_interpret: bool = False):
    """Forward pass → pooled, (optionally) L2-normalized embeddings.

    Args:
      input_ids: [B, S] int32.
      attention_mask: [B, S] {0,1}.
      attention_impl: "xla" (portable) or "pallas" (fused TPU kernel).
    Returns:
      [B, H] f32 embeddings.
    """
    b, s = input_ids.shape
    emb = params["embeddings"]
    x = jnp.take(emb["word"], input_ids, axis=0)
    x = x + emb["position"][:s][None, :, :]
    if token_type_ids is None:
        x = x + emb["token_type"][0][None, None, :]
    else:
        x = x + jnp.take(emb["token_type"], token_type_ids, axis=0)
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    x = x.astype(compute_dtype)

    key_bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9

    def body(carry, lp):
        return _encoder_layer(carry, key_bias, lp, config,
                              attention_impl, attention_interpret), None

    x, _ = jax.lax.scan(body, x, params["layers"])

    x = x.astype(jnp.float32)
    m = attention_mask.astype(jnp.float32)[:, :, None]
    if config.pooling == "cls":
        pooled = x[:, 0, :]
    elif config.pooling == "attn":
        # learned token-relevance gate: softmax(w·h_t) over valid tokens.
        # Mean pooling weights every token 1/n, so short queries wrapped
        # in generic/unseen words are hijacked by the wrapper; the gate
        # learns (from noise-spliced training views) to suppress them.
        scores = jnp.einsum("bsh,h->bs", x,
                            params["pool_attn"]["w"].astype(jnp.float32))
        scores = scores + (1.0 - m[:, :, 0]) * -1e9
        alpha = jax.nn.softmax(scores, axis=-1)
        pooled = jnp.einsum("bs,bsh->bh", alpha, x)
    else:  # mean pooling over non-pad tokens
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    if config.normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
    return pooled


def encode_tokens(params, input_ids, attention_mask, config: BertConfig,
                  *, compute_dtype=jnp.float32, token_type_ids=None,
                  attention_impl: str = "xla",
                  attention_interpret: bool = False):
    """Forward pass → per-token hidden states [B, S, H] f32 (no pooling).

    Used by rerankers / late-interaction retrieval.
    """
    b, s = input_ids.shape
    emb = params["embeddings"]
    x = jnp.take(emb["word"], input_ids, axis=0)
    x = x + emb["position"][:s][None, :, :]
    if token_type_ids is None:
        x = x + emb["token_type"][0][None, None, :]
    else:
        x = x + jnp.take(emb["token_type"], token_type_ids, axis=0)
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    x = x.astype(compute_dtype)
    key_bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9

    def body(carry, lp):
        return _encoder_layer(carry, key_bias, lp, config,
                              attention_impl, attention_interpret), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x.astype(jnp.float32)
