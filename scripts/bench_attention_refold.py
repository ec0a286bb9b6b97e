"""Attention-floor re-attack (VERDICT r3 item 6): can the hd=32 dots be
made faster than the measured ~7.8 TFLOP/s serial-MXU tile rate?

Two candidates the r1-r3 rounds did NOT measure:

1. **Fold the attention dots into the adjacent linears.**  Per head,
   ``logits_n = (X Wq_n)(X Wk_n)^T = X A_n X^T`` with the STATIC
   ``A_n = Wq_n Wk_n^T  [H, H]`` precomposed at weight-load time, and
   ``ctx = sum_n P_n (X W'_n)`` with ``W'_n = Wv_n Wo_n  [H, H]`` — every
   runtime contraction becomes K=384 (MXU-efficient, measured 132 TFLOP/s
   for these shapes) instead of K=32.  The catch this script quantifies:
   the folded forms do nh*x more FLOPs (the rank-32 structure of A_n is
   abandoned), so the win condition is rate_gain > FLOP_inflation, i.e.
   132/7.8 = 16.9x > nh = 12 — arithmetically positive for the dots alone,
   but the folded projections (24 H^2/token vs qkvo's 8 H^2) eat the
   margin.  Both effects measured here, separately and end-to-end.

2. **int8 attention dots.**  int8 MXU peak is 2x bf16; if the small-dot
   floor were throughput-bound, int8 would halve it.  If it is
   weight-load/pipeline-bound (the r3 hypothesis), int8 changes nothing.

Methodology per the repo's honest-measurement rules: on-device inputs,
each step's input chained on the previous output, ONE scalar sync at the
end, relay RTT measured and subtracted, best of 3 trials.

Result goes to docs/roofline.md as a dated experiment entry (win or
refutation).  Reference analog: none — this probes the v5e MXU's
behavior for the reference's torch/sdpa embed path re-architected
TPU-first (reference src/data_manager/vectorstore/manager.py:373).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/archi_tpu_jax_cache")
    import jax.numpy as jnp

    B, S, H, NH = 256, 256, 384, 12
    HD = H // NH
    STEPS, TRIALS = 16, 3

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, S, H), jnp.bfloat16)
    wq = jax.random.normal(ks[1], (H, H), jnp.bfloat16) * 0.05
    wk = jax.random.normal(ks[2], (H, H), jnp.bfloat16) * 0.05
    wv = jax.random.normal(ks[3], (H, H), jnp.bfloat16) * 0.05
    wo = jax.random.normal(ks[4], (H, H), jnp.bfloat16) * 0.05
    jax.block_until_ready(x)

    from archi_tpu.benchmarking.timing import measure_relay_rtt

    _rtt = measure_relay_rtt()

    def timeit(fn, x0):
        out = fn(x0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.time()
            o = x0
            for _ in range(STEPS):
                o = fn(o)
            float(jnp.sum(o[0, 0] if o.ndim > 2 else o))
            best = min(best, max(time.time() - t0 - _rtt, 1e-9))
        return best / STEPS

    def heads(t):
        return t.reshape(B, S, NH, HD).transpose(0, 2, 1, 3)  # [B,NH,S,HD]

    results = {"shape": f"B{B} S{S} H{H} nh{NH} hd{HD}", "variants": {}}

    # ---- baseline: qkvo projections + small-K attention dots (XLA) -------
    @jax.jit
    def baseline(xin):
        q, k, v = heads(xin @ wq), heads(xin @ wk), heads(xin @ wv)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits / np.sqrt(HD), axis=-1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhst,bhtd->bhsd", p, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
        return (ctx @ wo).astype(jnp.bfloat16)

    # ---- folded: A_n = Wq_n Wk_n^T and W'_n = Wv_n Wo_n precomposed ------
    wq_h = wq.reshape(H, NH, HD).transpose(1, 0, 2)       # [NH, H, HD]
    wk_h = wk.reshape(H, NH, HD).transpose(1, 0, 2)
    wv_h = wv.reshape(H, NH, HD).transpose(1, 0, 2)
    wo_h = wo.reshape(NH, HD, H)                          # [NH, HD, H]
    a_fold = jnp.einsum("hij,hkj->hik", wq_h, wk_h)       # [NH, H, H] static
    w_fold = jnp.einsum("hij,hjk->hik", wv_h, wo_h)       # [NH, H, H] static
    jax.block_until_ready((a_fold, w_fold))

    @jax.jit
    def folded(xin):
        # all runtime contractions are K=H=384:
        y = jnp.einsum("bse,hef->bhsf", xin, a_fold)      # nh big dots
        logits = jnp.einsum("bhsf,btf->bhst", y, xin,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits / np.sqrt(HD), axis=-1).astype(jnp.bfloat16)
        vp = jnp.einsum("bse,hef->bhsf", xin, w_fold)     # [B,NH,S,H]
        return jnp.einsum("bhst,bhtf->bsf", p, vp).astype(jnp.bfloat16)

    # ---- int8 attention dots (projections stay bf16) ----------------------
    @jax.jit
    def int8_attn(xin):
        q, k, v = heads(xin @ wq), heads(xin @ wk), heads(xin @ wv)

        def q8(t):
            s = jnp.max(jnp.abs(t), axis=(-2, -1), keepdims=True) / 127.0
            return jnp.clip(jnp.round(t / s), -127, 127).astype(jnp.int8), s

        qi, qs = q8(q.astype(jnp.float32))
        ki, ks_ = q8(k.astype(jnp.float32))
        logits = jax.lax.dot_general(
            qi, ki, ((((3,), (3,)), ((0, 1), (0, 1)))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        logits = logits * (qs * ks_)
        p = jax.nn.softmax(logits / np.sqrt(HD), axis=-1)
        pi, ps = q8(p)
        vi, vs = q8(v.astype(jnp.float32))
        ctx = jax.lax.dot_general(
            pi, vi, ((((3,), (2,)), ((0, 1), (0, 1)))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        ctx = (ctx * (ps * vs)).astype(jnp.bfloat16)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
        return (ctx @ wo).astype(jnp.bfloat16)

    for name, fn, x0 in [("baseline_xla", baseline, x),
                         ("folded_bigK", folded, x),
                         ("int8_dots", int8_attn, x)]:
        dt = timeit(fn, x0)
        results["variants"][name] = {"ms_per_layer_attention": round(
            dt * 1e3, 2)}
        print(name, results["variants"][name], flush=True)

    # ---- dots only (no projections), small-K vs folded big-K -------------
    # per-step cost (~1-2 ms) is far below the relay RTT, so these run as
    # a lax.scan of K serially-dependent dots inside ONE device call: the
    # input is scaled by a carry derived from the previous output (a
    # scalar multiply XLA folds into the dot — no extra traffic, no
    # hoisting, no server-side memoization of identical calls).
    K_SCAN = 64

    def timed_scan(run):
        o = run()
        jax.block_until_ready(o)
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.time()
            float(run())
            best = min(best, max(time.time() - t0 - _rtt, 1e-9))
        return best / K_SCAN

    k0 = heads(x @ wk)
    q0 = heads(x @ wq)
    y0 = jnp.einsum("bse,hef->bhsf", x, a_fold)
    jax.block_until_ready((k0, q0, y0))

    # NOTES on defeating the compiler here (each mode below was MEASURED
    # collapsing before the fix):
    # (a) the operand arrays MUST be jit *arguments*, not closures — a
    #     closed-over device array is baked into the HLO as a constant,
    #     and y0 (600 MB bf16) overflows the remote-compile request;
    # (b) a SCALAR carry multiplied into an einsum operand is useless —
    #     einsum is linear, so XLA rewrites einsum(q*c,k) = c*einsum(q,k)
    #     and hoists the loop-invariant dot out of the scan (~0 ms);
    # (c) a LINEAR reduction of the logits is equally useless —
    #     mean_t(q @ k^T) = q @ mean_t(k), so the [S,T] logits are never
    #     formed (measured: both scans timed only their carry traffic).
    #     tanh must hit the logits ELEMENTWISE before the reduction.
    # The carry is the SMALL operand (k / x, ~50 MB) in both scans so the
    # per-step carry traffic is identical and the small-vs-big delta
    # isolates the dot + its fused tanh/reduce epilogue.
    @jax.jit
    def scan_small(q_in, k_in):
        def body(k_c, _):
            lg = jnp.einsum("bhsd,bhtd->bhst", q_in, k_c,
                            preferred_element_type=jnp.float32)
            d = jnp.mean(jnp.tanh(lg), axis=2)[..., None] * 1e-6
            return k_c + d.astype(k_c.dtype), ()
        k_f, _ = jax.lax.scan(body, k_in, None, length=K_SCAN)
        return jnp.sum(k_f[0, 0, 0])

    @jax.jit
    def scan_big(y_in, x_in):
        def body(x_c, _):
            lg = jnp.einsum("bhsf,btf->bhst", y_in, x_c,
                            preferred_element_type=jnp.float32)
            d = jnp.mean(jnp.tanh(lg), axis=(1, 2))[..., None] * 1e-6
            return x_c + d.astype(x_c.dtype), ()
        x_f, _ = jax.lax.scan(body, x_in, None, length=K_SCAN)
        return jnp.sum(x_f[0, 0])

    useful = 2 * B * NH * S * S * HD
    dt_small = timed_scan(lambda: scan_small(q0, k0))
    results["variants"]["qk_dots_smallK"] = {
        "ms": round(dt_small * 1e3, 3),
        "useful_tflops_lower_bound": round(useful / dt_small / 1e12, 1)}
    dt_big = timed_scan(lambda: scan_big(y0, x))
    results["variants"]["qk_dots_foldedK384"] = {
        "ms": round(dt_big * 1e3, 3),
        "useful_tflops_lower_bound": round(useful / dt_big / 1e12, 1),
        "note": f"same useful logits, K={H} contraction, "
                f"{H // HD}x raw FLOPs; both scans also pay an identical "
                f"~0.8 GB/step logits-consumption read (the serial-carry "
                f"device, softmax's analog) — the small-vs-big DELTA "
                f"isolates the dot cost"}
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
