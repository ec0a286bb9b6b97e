"""Data-app source-management routes added in r2: git remove/refresh,
jira add, sources listing (reference uploader_app/app.py:96-108,
chat_app/app.py:2248-2250)."""

import json
from unittest.mock import patch

import pytest

from archi_tpu.bin.service_data_manager import build_app as build_data
from archi_tpu.web.framework import Request


def _request(method, path, headers=None, body=b""):
    return Request(method, path, {}, headers or {}, body)


@pytest.fixture
def app_ctx(tmp_path):
    overrides = {
        "data_manager": {
            "data_path": str(tmp_path / "data"),
            "db_path": str(tmp_path / "catalog.db"),
            "embedding_name": "hash",
            "embedding_kwargs": {"dim": 32},
            "index": {"dtype": "float32", "tile_n": 256},
        },
    }
    app, ctx = build_data(overrides=overrides, initial_ingestion=False)
    yield app, ctx
    ctx.scheduler.stop()


def _seed_git_docs(ctx, repo="https://git.x/lab/docs"):
    from archi_tpu.data.resource import Resource, ResourceMetadata

    hashes = []
    for i in range(3):
        meta = ResourceMetadata(
            display_name=f"doc{i}.md", source_type="git",
            url=f"{repo}/blob/main/doc{i}.md", extension=".md")
        # content unique per (repo, doc): identical content would
        # content-hash-dedupe across repos
        hashes.append(ctx.data_manager.persistence.persist_resource(
            Resource(f"{repo} git doc number {i} about quota", meta)))
    return hashes


def test_remove_git_repo(app_ctx):
    app, ctx = app_ctx
    _seed_git_docs(ctx)
    _seed_git_docs(ctx, repo="https://git.x/other/repo")
    r = app.router.dispatch(_request(
        "DELETE", "/api/git",
        body=json.dumps({"url": "https://git.x/lab/docs"}).encode()))
    assert r.status == 200 and json.loads(r.body)["removed"] == 3
    left = [d for d in ctx.catalog.list_documents()
            if d.get("source_type") == "git"]
    assert len(left) == 3  # the other repo untouched
    assert all(d["url"].startswith("https://git.x/other") for d in left)


def test_refresh_git_calls_collector(app_ctx):
    app, ctx = app_ctx
    with patch.object(ctx.data_manager.git, "collect",
                      return_value=["h1", "h2"]) as collect:
        r = app.router.dispatch(_request(
            "POST", "/api/git/refresh",
            body=b'{"url": "https://git.x/lab/docs", "branch": "main"}'))
    assert r.status == 200 and json.loads(r.body)["collected"] == 2
    collect.assert_called_once_with("https://git.x/lab/docs", branch="main")


def test_add_jira_project(app_ctx):
    app, ctx = app_ctx
    with patch.object(ctx.data_manager.tickets, "collect_jira",
                      return_value=["j1"]) as collect:
        r = app.router.dispatch(_request(
            "POST", "/api/jira",
            body=json.dumps({"url": "https://jira.x", "project": "OPS",
                             "sync": False}).encode()))
    assert r.status == 200 and json.loads(r.body)["collected"] == 1
    client = collect.call_args.args[0]
    assert client.base_url == "https://jira.x"
    assert collect.call_args.args[1] == "OPS"


def test_sources_listing(app_ctx):
    app, ctx = app_ctx
    _seed_git_docs(ctx)
    r = app.router.dispatch(_request("GET", "/api/sources"))
    data = json.loads(r.body)
    assert data["collected_counts"].get("git") == 3
    assert data["git_repos"] == ["https://git.x/lab/docs"]
    assert "configured" in data
