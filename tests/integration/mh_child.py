"""Child process for the 2-process multi-host integration test.

Run as: python mh_child.py <process_id> <coordinator_port>

Each process owns 4 virtual CPU devices; ``initialize_distributed`` joins
them into one 8-device global mesh (the DCN-between-hosts story of
SURVEY.md §5.8, with Gloo standing in for DCN).  The corpus is built with
``jax.make_array_from_callback`` — each process materializes only its
addressable shards, exactly how a real multi-host ingest would feed the
sharded index — then ONE sharded search step runs through the engine's
``_sharded_search`` (fused per-shard top-k + all_gather merge) and is
checked against local brute force.
"""

import os
import sys

# Script-mode sys.path[0] is tests/integration; make archi_tpu importable
# regardless of the parent's PYTHONPATH.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    from archi_tpu.engine.distributed import data_mesh, \
        initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8, "global device view missing"

    mesh = data_mesh()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from archi_tpu.engine.sharded_index import _sharded_search

    N, D, B, K = 4096, 64, 4, 10
    rng = np.random.default_rng(0)
    full = rng.standard_normal((N, D)).astype(np.float32)
    full /= np.linalg.norm(full, axis=1, keepdims=True)

    emb = jax.make_array_from_callback(
        (N, D), NamedSharding(mesh, P("data", None)),
        lambda idx: full[idx])
    bias = jax.make_array_from_callback(
        (N,), NamedSharding(mesh, P("data")), lambda idx: np.zeros(
            (N,), np.float32)[idx])

    q_rows = np.array([7, 1234, 2048, 4000])
    q = full[q_rows] + 0.01 * rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    vals, rows = _sharded_search(
        jnp.asarray(q), emb, bias, jnp.asarray(N, jnp.int32),
        mesh=mesh, axis="data", k=K, tile_n=512, impl="xla")
    rows = np.asarray(rows)
    vals = np.asarray(vals)

    exact = np.argsort(-(q @ full.T), axis=1)[:, :K]
    assert np.array_equal(np.sort(rows, 1), np.sort(exact, 1)), \
        (rows, exact)
    assert np.array_equal(rows[:, 0], q_rows), rows[:, 0]
    assert np.all(np.diff(vals, axis=1) <= 1e-6), "vals not sorted"
    print(f"MH_OK pid={pid} top1={rows[:, 0].tolist()}", flush=True)


if __name__ == "__main__":
    main()
