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

    # ---- insert-after-init: shard growth (VERDICT r3 item 9).  Multi-host
    # growth re-materializes each host's addressable shards at the larger
    # capacity (exactly what ShardedFlatIndex._grow_to does single-host
    # under GSPMD); fresh rows must then win their own searches.
    N2 = 6144
    grown = np.zeros((N2, D), np.float32)
    grown[:N] = full
    fresh = rng.standard_normal((1024, D)).astype(np.float32)
    fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
    grown[N:N + 1024] = fresh
    n_live = N + 1024
    emb2 = jax.make_array_from_callback(
        (N2, D), NamedSharding(mesh, P("data", None)),
        lambda idx: grown[idx])

    # ---- tombstone + hybrid bias merged cross-process.  The bias must be
    # IDENTICAL in both processes (each one materializes only its own
    # addressable shards of the global bias array), so pick fixed rows on
    # opposite hosts: boost on host 1's first shard, tombstone on host
    # 0's — every query's merge then crosses the DCN boundary both ways.
    boosted = 4 * (N2 // 8) + 5         # owned by process 1
    dead = int(exact[0][0])             # row 7 — owned by process 0
    bias_h = np.zeros((N2,), np.float32)
    bias_h[boosted] = 10.0
    bias_h[dead] = np.float32(-1e30)
    bias2 = jax.make_array_from_callback(
        (N2,), NamedSharding(mesh, P("data")), lambda idx: bias_h[idx])
    v2, r2 = _sharded_search(
        jnp.asarray(q), emb2, bias2, jnp.asarray(n_live, jnp.int32),
        mesh=mesh, axis="data", k=K, tile_n=512, impl="xla")
    r2 = np.asarray(r2)
    assert np.all(r2[:, 0] == boosted), r2[:, 0]
    assert dead not in set(r2.reshape(-1).tolist()), "tombstone leaked"
    # fresh (post-init) rows win their own searches
    fq = fresh[37:38] + 0.01 * rng.standard_normal((1, D)).astype(np.float32)
    zb = jax.make_array_from_callback(
        (N2,), NamedSharding(mesh, P("data")),
        lambda idx: np.zeros((N2,), np.float32)[idx])
    _, fr = _sharded_search(
        jnp.asarray(fq / np.linalg.norm(fq)), emb2, zb,
        jnp.asarray(n_live, jnp.int32),
        mesh=mesh, axis="data", k=1, tile_n=512, impl="xla")
    assert int(np.asarray(fr)[0, 0]) == N + 37, np.asarray(fr)

    # ---- k > per-shard live rows: 24 live rows over 8 shards (3 each),
    # k=20 — the merge must fill from every shard and the NEG_INF padding
    # of short shards must lose
    Ns, live = 128, 24
    small = np.zeros((Ns, D), np.float32)
    small[:live] = full[:live]
    embs = jax.make_array_from_callback(
        (Ns, D), NamedSharding(mesh, P("data", None)),
        lambda idx: small[idx])
    zbs = jax.make_array_from_callback(
        (Ns,), NamedSharding(mesh, P("data")),
        lambda idx: np.zeros((Ns,), np.float32)[idx])
    ks = 20
    vs, rs = _sharded_search(
        jnp.asarray(q[:1]), embs, zbs, jnp.asarray(live, jnp.int32),
        mesh=mesh, axis="data", k=ks, tile_n=16, impl="xla")
    vs, rs = np.asarray(vs), np.asarray(rs)
    live_hits = rs[0][vs[0] > -1e29]
    exact_small = np.argsort(-(q[:1] @ small[:live].T), axis=1)[0][:ks]
    assert len(live_hits) == ks
    assert set(live_hits.tolist()) == set(exact_small.tolist()), \
        (sorted(live_hits.tolist()), sorted(exact_small.tolist()))

    print(f"MH_OK pid={pid} top1={rows[:, 0].tolist()} growth=ok "
          f"tombstone_hybrid=ok short_shards_k{ks}=ok", flush=True)


if __name__ == "__main__":
    main()
