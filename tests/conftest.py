"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's pure-mock unit-test strategy (SURVEY.md §4): kernels
and sharding are validated against NumPy brute force on CPU; real-TPU runs
happen via bench.py / the driver.

Note: the machine's sitecustomize registers a TPU ('axon') backend and forces
``jax_platforms="axon,cpu"`` regardless of env vars, so we must override the
config *after* importing jax, before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
