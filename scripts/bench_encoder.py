"""Encoder throughput benchmark on the real TPU chip.

Measures the MiniLM-class forward (the reference's embed hot loop,
``src/data_manager/vectorstore/manager.py:373``) with the XLA attention path
vs the fused Pallas attention kernel, and prints a roofline decomposition.

Honest-measurement rules (the relay memoizes identical calls and
block_until_ready is lazy): inputs generated on device, each step's input
derived from the previous step's output, sync via a scalar pull only.

Usage: python scripts/bench_encoder.py [batch] [seq] [steps]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from archi_tpu.models.bert import BertConfig, encode, init_params

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SEQ = int(sys.argv[2]) if len(sys.argv) > 2 else 256
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
MODEL = sys.argv[4] if len(sys.argv) > 4 else "minilm"


def model_flops(cfg: BertConfig, b: int, s: int) -> float:
    """Matmul FLOPs of one forward (2 FLOPs per MAC)."""
    h, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    tokens = b * s
    linear = 2 * tokens * (4 * h * h + 2 * h * f)     # qkvo + ffn
    attn = 2 * tokens * 2 * s * h                      # qk^T + pv
    return L * (linear + attn)


def bench(impl: str, cfg: BertConfig, params, steps: int = STEPS) -> float:
    fwd = jax.jit(functools.partial(
        encode, config=cfg, compute_dtype=jnp.bfloat16,
        attention_impl=impl))

    key = jax.random.PRNGKey(0)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)

    @jax.jit
    def ids_from(seed_vec):
        # derive fresh int ids on device from the previous output
        k2 = jax.random.fold_in(key, jnp.int32(0))
        noise = jax.random.randint(k2, (BATCH, SEQ), 0, cfg.vocab_size)
        offset = (jnp.abs(seed_vec[0, 0]) * 1000).astype(jnp.int32)
        return (noise + offset) % cfg.vocab_size

    out = jnp.ones((BATCH, cfg.hidden_size), jnp.float32)
    # warm-up at the exact timed shape (compile excluded)
    out = fwd(params, ids_from(out), mask)
    float(jnp.sum(out))

    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params, ids_from(out), mask)
    _ = float(jnp.sum(out))  # scalar sync: 4 bytes over the relay
    dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    print(f"devices: {jax.devices()}")
    cfg = (BertConfig.bge_base() if MODEL == "bge-base"
           else BertConfig.bge_small() if MODEL == "bge-small"
           else BertConfig.minilm_l6())
    print(f"model={MODEL} H={cfg.hidden_size} L={cfg.num_layers} "
          f"hd={cfg.head_dim}")
    params = init_params(cfg, seed=0)
    params = jax.device_put(params)
    flops = model_flops(cfg, BATCH, SEQ)
    toks = BATCH * SEQ

    for impl in ("xla", "pallas"):
        dt = bench(impl, cfg, params)
        tflops = flops / dt / 1e12
        print(f"{impl:8s} b={BATCH} s={SEQ}: {dt*1e3:8.2f} ms/batch  "
              f"{toks/dt/1e6:6.2f} Mtok/s  {BATCH/dt:8.0f} seq/s  "
              f"{tflops:6.1f} TFLOP/s (matmul)")


if __name__ == "__main__":
    main()
