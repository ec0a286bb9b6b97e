"""Sharded index behind the REAL service stack on the 8-device CPU mesh:
`index.type: sharded` → data-manager ingests into a mesh-sharded corpus and
serves hybrid queries over HTTP (the multi-chip serving path end to end)."""

import base64

import jax
import pytest
import requests

from archi_tpu.bin.service_data_manager import build_app as build_data
from archi_tpu.engine.sharded_index import ShardedFlatIndex


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    assert len(jax.devices()) == 8
    root = tmp_path_factory.mktemp("sharded_dm")
    overrides = {
        "data_manager": {
            "data_path": str(root / "data"),
            "db_path": str(root / "catalog.db"),
            "embedding_name": "hash",
            "embedding_kwargs": {"dim": 64},
            "embedding_dimensions": 64,
            "index": {"type": "sharded", "dtype": "float32", "tile_n": 256},
        },
        "services": {"data_manager": {"enabled": True, "host": "127.0.0.1",
                                      "port": 0}},
    }
    app, ctx = build_data(overrides=overrides, initial_ingestion=False)
    port = app.serve("127.0.0.1", 0, background=True)
    yield f"http://127.0.0.1:{port}", ctx
    app.shutdown()
    ctx.scheduler.stop()


def test_index_is_mesh_sharded(stack):
    _url, ctx = stack
    assert isinstance(ctx.vectorstore.index, ShardedFlatIndex)
    assert ctx.vectorstore.index.n_shards == 8


def test_ingest_and_query_over_http(stack):
    url, ctx = stack
    for name, text in (
        ("quota.md", "gpu quota allocation requests are reviewed weekly by "
                     "the resource board and granted per project"),
        ("slurm.md", "slurm array jobs are submitted with sbatch and "
                     "bounded by the task limit configuration"),
        ("storage.md", "eos storage namespaces enforce per user quotas on "
                       "the fuse mount"),
    ):
        r = requests.post(url + "/api/upload", json={
            "filename": name,
            "content_b64": base64.b64encode(text.encode()).decode(),
            "sync": False,
        })
        assert r.status_code == 200
    sync = ctx.data_manager.index_manager.update_vectorstore()
    assert sync["added"] == 3
    # sharding visible at the engine: rows live on the 8-device mesh
    emb = ctx.vectorstore.index.emb
    assert len(emb.sharding.device_set) == 8

    r = requests.post(url + "/api/query/hybrid", json={
        "query": "how do I submit slurm array jobs", "k": 2})
    assert r.status_code == 200
    results = r.json()
    assert results and "sbatch" in results[0]["page_content"]

    r2 = requests.post(url + "/api/query/semantic", json={
        "query": "gpu quota", "k": 1})
    assert "quota" in r2.json()[0]["page_content"]

    # delete + resync drops the doc from the sharded corpus
    h = [d for d in ctx.catalog.list_documents()
         if d["display_name"] == "slurm.md"][0]["resource_hash"]
    requests.delete(url + f"/api/documents/{h}")
    ctx.data_manager.index_manager.update_vectorstore()
    r3 = requests.post(url + "/api/query/hybrid", json={
        "query": "sbatch slurm array", "k": 3})
    assert all("sbatch" not in d["page_content"] for d in r3.json())


# ---------------------------------------------------------------- XL tier
@pytest.fixture(scope="module")
def xl_stack(tmp_path_factory):
    """index.type: ivfpq_xl_sharded → the beyond-HBM pod-slice tier
    (per-shard host plane + PQ snapshot + exact tail) behind the real
    data-manager HTTP service (VERDICT r3 item 2)."""
    assert len(jax.devices()) == 8
    root = tmp_path_factory.mktemp("xl_dm")
    overrides = {
        "data_manager": {
            "data_path": str(root / "data"),
            "db_path": str(root / "catalog.db"),
            "embedding_name": "hash",
            "embedding_kwargs": {"dim": 64},
            "embedding_dimensions": 64,
            "index": {"type": "ivfpq_xl_sharded", "dtype": "float32",
                      "tile_n": 64, "nlist": 8, "block": 32,
                      "pq_m": 8, "pq_refine_m": 8,
                      "nprobe_blocks": 1000000, "block_rank_sub": 1,
                      "min_snapshot_rows": 4, "build_block_rows": 4,
                      "store_dir": str(root / "planes")},
        },
        "services": {"data_manager": {"enabled": True, "host": "127.0.0.1",
                                      "port": 0}},
    }
    app, ctx = build_data(overrides=overrides, initial_ingestion=False)
    port = app.serve("127.0.0.1", 0, background=True)
    yield f"http://127.0.0.1:{port}", ctx
    app.shutdown()
    ctx.scheduler.stop()


@pytest.mark.heavy  # 8-shard snapshot builds over HTTP — kernel/mesh tier
def test_xl_sharded_ingest_query_delete_over_http(xl_stack):
    from archi_tpu.engine.sharded_xl import ShardedXlPQIndex

    url, ctx = xl_stack
    assert isinstance(ctx.vectorstore.index, ShardedXlPQIndex)
    assert ctx.vectorstore.index.n_shards == 8
    for name, text in (
        ("quota.md", "gpu quota allocation requests are reviewed weekly"),
        ("slurm.md", "slurm array jobs are submitted with sbatch"),
        ("storage.md", "eos storage namespaces enforce per user quotas"),
        ("mail.md", "the mailing list archive is searchable by thread"),
    ):
        r = requests.post(url + "/api/upload", json={
            "filename": name,
            "content_b64": base64.b64encode(text.encode()).decode(),
            "sync": False,
        })
        assert r.status_code == 200
    sync = ctx.data_manager.index_manager.update_vectorstore()
    assert sync["added"] == 4
    # per-shard host planes are real memmaps on disk
    import os
    planes = os.listdir(ctx.vectorstore.index.store_dir)
    assert any(p.endswith(".bf16") for p in planes)

    r = requests.post(url + "/api/query/hybrid", json={
        "query": "how do I submit slurm array jobs", "k": 2})
    assert r.status_code == 200
    assert "sbatch" in r.json()[0]["page_content"]
    r2 = requests.post(url + "/api/query/semantic", json={
        "query": "gpu quota", "k": 1})
    assert "quota" in r2.json()[0]["page_content"]

    # delete + resync tombstones across every XL tier
    h = [d for d in ctx.catalog.list_documents()
         if d["display_name"] == "slurm.md"][0]["resource_hash"]
    requests.delete(url + f"/api/documents/{h}")
    ctx.data_manager.index_manager.update_vectorstore()
    r3 = requests.post(url + "/api/query/hybrid", json={
        "query": "sbatch slurm array", "k": 4})
    assert all("sbatch" not in d["page_content"] for d in r3.json())
