"""Shared relay-aware timing helpers for the benchmark scripts.

Every benchmark on this rig must subtract the HTTP-relay round-trip from
per-dispatch timings (the chip is behind a ~30-40 ms tunnel; see
``docs/serving.md``).  One probe, one methodology — the per-script copies
had already begun to drift (5- vs 7-sample medians).
"""

from __future__ import annotations

import time

import numpy as np


def measure_relay_rtt(samples: int = 7) -> float:
    """Median scalar round-trip through the device relay (device sync +
    4-byte download).  Warms the tiny add kernel first so compile time
    never lands in a sample; each probe adds a fresh scalar so a
    server-side memoization of repeated identical calls can't shortcut
    the round-trip."""
    import jax.numpy as jnp

    x = jnp.zeros((), jnp.float32) + 1.0
    float(x)  # warm the kernel + transfer path
    out = []
    for i in range(samples):
        t0 = time.time()
        float(jnp.asarray(i, jnp.float32) + x)
        out.append(time.time() - t0)
    return float(np.median(out))
