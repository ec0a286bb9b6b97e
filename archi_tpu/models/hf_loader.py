"""Load HuggingFace BERT-family checkpoints into archi_tpu param pytrees.

The reference resolves embedding models by name through its
``embedding_class_map`` (``src/utils/config_service.py:470-496``) and lets
sentence-transformers download them.  This environment is zero-egress, so we
load from a *local snapshot directory* (``config.json`` + ``vocab.txt`` +
``model.safetensors`` or ``pytorch_model.bin``) when one exists, and fall
back to deterministic random init otherwise (numerics are still exercised
end-to-end; quality needs real weights).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from archi_tpu.models.bert import BertConfig, init_params


def config_from_hf(cfg: dict, *, pooling: str = "mean") -> BertConfig:
    # in-image-trained snapshots record their pooling mode (e.g. the
    # learned "attn" gate) in a custom key; plain HF checkpoints fall
    # back to the caller's choice
    pooling = cfg.get("archi_pooling", pooling)
    return BertConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        max_position_embeddings=cfg["max_position_embeddings"],
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        pooling=pooling,
    )


def _read_state_dict(model_dir: str) -> dict:
    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        try:
            from safetensors.numpy import load_file

            return load_file(st_path)
        except ImportError:
            from safetensors.torch import load_file as load_t

            return {k: v.numpy() for k, v in load_t(st_path).items()}
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights in {model_dir}")


def params_from_state_dict(sd: dict, config: BertConfig, dtype=jnp.float32) -> dict:
    """Map a HF ``BertModel`` state dict to the archi_tpu param pytree.

    Torch ``nn.Linear.weight`` is [out, in]; our einsums use [in, out], so
    linear weights are transposed here.
    """
    # Tolerate both bare ("embeddings...") and prefixed ("bert.embeddings...")
    def g(key):
        for prefix in ("", "bert.", "model."):
            k = prefix + key
            if k in sd:
                return np.asarray(sd[k])
        raise KeyError(key)

    L = config.num_layers
    emb = {
        "word": g("embeddings.word_embeddings.weight"),
        "position": g("embeddings.position_embeddings.weight"),
        "token_type": g("embeddings.token_type_embeddings.weight"),
        "ln_scale": g("embeddings.LayerNorm.weight"),
        "ln_bias": g("embeddings.LayerNorm.bias"),
    }

    def lin(i, name):
        w = g(f"encoder.layer.{i}.{name}.weight").T
        b = g(f"encoder.layer.{i}.{name}.bias")
        return w, b

    stacks: dict[str, list] = {k: [] for k in (
        "q_w", "q_b", "k_w", "k_b", "v_w", "v_b", "o_w", "o_b",
        "attn_ln_scale", "attn_ln_bias", "ffn_i_w", "ffn_i_b",
        "ffn_o_w", "ffn_o_b", "ffn_ln_scale", "ffn_ln_bias",
    )}
    for i in range(L):
        for short, hf in (("q", "attention.self.query"),
                          ("k", "attention.self.key"),
                          ("v", "attention.self.value"),
                          ("o", "attention.output.dense")):
            w, b = lin(i, hf)
            stacks[f"{short}_w"].append(w)
            stacks[f"{short}_b"].append(b)
        stacks["attn_ln_scale"].append(g(f"encoder.layer.{i}.attention.output.LayerNorm.weight"))
        stacks["attn_ln_bias"].append(g(f"encoder.layer.{i}.attention.output.LayerNorm.bias"))
        w, b = lin(i, "intermediate.dense")
        stacks["ffn_i_w"].append(w)
        stacks["ffn_i_b"].append(b)
        w, b = lin(i, "output.dense")
        stacks["ffn_o_w"].append(w)
        stacks["ffn_o_b"].append(b)
        stacks["ffn_ln_scale"].append(g(f"encoder.layer.{i}.output.LayerNorm.weight"))
        stacks["ffn_ln_bias"].append(g(f"encoder.layer.{i}.output.LayerNorm.bias"))

    to = lambda a: jnp.asarray(np.stack(a), dtype)  # noqa: E731
    params = {
        "embeddings": {k: jnp.asarray(v, dtype) for k, v in emb.items()},
        "layers": {k: to(v) for k, v in stacks.items()},
    }
    if config.pooling == "attn":
        params["pool_attn"] = {"w": jnp.asarray(g("pooler_attn.weight"),
                                                dtype)}
    return params


def load_model_dir(model_dir: str, *, pooling: str = "mean", dtype=jnp.float32):
    """Load (config, params, vocab_path) from a local HF snapshot dir."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    config = config_from_hf(hf_cfg, pooling=pooling)
    sd = _read_state_dict(model_dir)
    params = params_from_state_dict(sd, config, dtype=dtype)
    vocab = os.path.join(model_dir, "vocab.txt")
    return config, params, (vocab if os.path.exists(vocab) else None)


def load_or_init(model_dir: str | None, config: BertConfig | None = None,
                 *, pooling: str = "mean", dtype=jnp.float32, seed: int = 0):
    """Checkpoint if available, else deterministic random init."""
    if model_dir and os.path.isdir(model_dir):
        return load_model_dir(model_dir, pooling=pooling, dtype=dtype)
    config = config or BertConfig.minilm_l6()
    return config, init_params(config, seed=seed, dtype=dtype), None
