"""Multi-host / pod-slice helpers.

The reference has no distributed compute backend — its "distributed system"
is Docker services around Postgres (SURVEY.md §2.9, §5.8).  archi-tpu's
scaling story is single-controller JAX: this module wraps
``jax.distributed`` initialization for multi-host pod slices and builds the
meshes the engine components consume.

Topology recipe (the corpus is the big axis):
- 1 host, n chips  → ``Mesh((n,), ("data",))`` — corpus rows sharded,
  per-shard fused top-k, ICI all_gather merge (``ShardedFlatIndex``).
- multi-host slice → same mesh over all processes' devices; the chunk axis
  spans hosts, the (k, k) merge collective crosses DCN only at slice
  boundaries (bytes, not MBs).
- big encoder (bge-large etc.) → 2D ``Mesh((dp, tp), ("data", "model"))``;
  batch on "data", FFN/head weights on "model" (see ``__graft_entry__``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host pod slice.

    No-ops on a single host.  Arguments default from the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) and from cloud TPU
    metadata when jax can discover it.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def data_mesh(axis: str = "data", devices=None):
    """1D corpus-sharding mesh over all (global) devices."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def dp_tp_mesh(tp: int = 1, *, devices=None,
               axes: tuple[str, str] = ("data", "model")):
    """2D (data, model) mesh for encoder serving; tp must divide n."""
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % tp == 0, (n, tp)
    return Mesh(np.asarray(devices).reshape(n // tp, tp), axes)
