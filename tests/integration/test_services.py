"""Integration: chat + data-manager services over real sockets.

The analog of the reference's smoke tests (tests/smoke/test_integration.py
+ preflight/tools_smoke/react_smoke, SURVEY.md §4): a full stack built from
config (hash embeddings + echo model — the zero-egress 'tiny Ollama'), real
HTTP round-trips, SSE streaming, RBAC, BYOK, config, traces.
"""

import base64
import json

import pytest
import requests

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.bin.service_chat import build_app as build_chat
from archi_tpu.bin.service_data_manager import build_app as build_data


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("svc")
    corpus = tmp / "corpus"
    corpus.mkdir()
    (corpus / "guide.md").write_text(
        "Submit jobs with the batch scheduler. The long queue allows jobs "
        "up to 48 hours." * 3)
    (corpus / "storage.md").write_text(
        "Storage quotas are 100GB per user on the shared filesystem." * 3)
    overrides = {
        "data_manager": {
            "embedding_name": "hash",
            "data_path": str(tmp / "data"),
            "db_path": str(tmp / "catalog.db"),
            "sources": {"local_files": {"paths": [str(corpus)]}},
        },
    }
    ctx = build_context(overrides=overrides)
    ctx.data_manager.run_ingestion()

    chat_app, _ = build_chat(ctx=ctx)
    data_app, _ = build_data(ctx=ctx, initial_ingestion=False)
    chat_port = chat_app.serve("127.0.0.1", 0, background=True)
    data_port = data_app.serve("127.0.0.1", 0, background=True)
    yield {
        "ctx": ctx,
        "chat": f"http://127.0.0.1:{chat_port}",
        "data": f"http://127.0.0.1:{data_port}",
    }
    chat_app.shutdown()
    data_app.shutdown()


def test_health(stack):
    assert requests.get(stack["chat"] + "/healthz").json()["status"] == "ok"
    assert requests.get(stack["data"] + "/healthz").json()["status"] == "ok"


def test_chat_roundtrip_and_history(stack):
    r = requests.post(stack["chat"] + "/api/get_chat_response",
                      json={"message": "how do I submit jobs?"},
                      headers={"X-User-Email": "alice@test"})
    r.raise_for_status()
    data = r.json()
    assert data["answer"].startswith("ECHO:")
    assert any("guide.md" == s["display_name"] for s in data["sources"])
    assert data["timing"]["msg_duration"] > 0
    cid = data["conversation_id"]

    # follow-up in the same conversation; history persisted
    r2 = requests.post(stack["chat"] + "/api/get_chat_response",
                       json={"message": "and storage quotas?",
                             "conversation_id": cid},
                       headers={"X-User-Email": "alice@test"})
    assert r2.json()["conversation_id"] == cid
    msgs = requests.get(stack["chat"] + f"/api/conversations/{cid}",
                        headers={"X-User-Email": "alice@test"}).json()
    assert len(msgs) == 4

    # ownership: another user cannot read it
    r3 = requests.get(stack["chat"] + f"/api/conversations/{cid}",
                      headers={"X-User-Email": "mallory@test"})
    assert r3.status_code == 403


def test_chat_stream_sse(stack):
    r = requests.post(stack["chat"] + "/api/get_chat_response_stream",
                      json={"message": "what is the long queue limit?"},
                      headers={"X-User-Email": "bob@test"}, stream=True)
    events = []
    for line in r.iter_lines():
        if line.startswith(b"data: "):
            data = line[6:]
            if data == b"[DONE]":
                break
            events.append(json.loads(data))
    kinds = [e.get("type") for e in events]
    assert kinds[0] == "trace_start"
    assert "final" in kinds
    final = events[-1]
    assert final["answer"].startswith("ECHO:")
    # trace stored and readable
    tid = events[0]["trace_id"]
    tr = requests.get(stack["chat"] + f"/api/trace/{tid}").json()
    assert tr["status"] == "completed"


def test_feedback_and_analytics(stack):
    r = requests.post(stack["chat"] + "/api/get_chat_response",
                      json={"message": "q"},
                      headers={"X-User-Email": "carol@test"}).json()
    fb = requests.post(stack["chat"] + "/api/feedback",
                       json={"message_id": r["message_id"],
                             "rating": "like"})
    assert fb.json()["feedback_id"]
    # analytics require operator/admin role
    resp = requests.get(stack["chat"] + "/api/v2/analytics/models",
                        headers={"X-User-Email": "carol@test"})
    assert resp.status_code == 403
    stack["ctx"].users.create_user("carol@test")
    stack["ctx"].users.set_roles("carol@test", ["user", "admin"])
    resp = requests.get(stack["chat"] + "/api/v2/analytics/models",
                        headers={"X-User-Email": "carol@test"})
    assert resp.status_code == 200
    assert any(m["model_used"] == "echo" for m in resp.json())


def test_byok_endpoints(stack):
    h = {"X-User-Email": "dave@test"}
    r = requests.post(stack["chat"] + "/api/user/api_key",
                      json={"provider": "openai", "api_key": "sk-dave"},
                      headers=h)
    assert r.json()["ok"]
    assert requests.get(stack["chat"] + "/api/user/api_keys",
                        headers=h).json() == ["openai"]
    assert requests.delete(stack["chat"] + "/api/user/api_key/openai",
                           headers=h).json()["deleted"]


def test_config_endpoints(stack):
    stack["ctx"].users.create_user("admin@test", roles=["admin"])
    h = {"X-User-Email": "admin@test"}
    cfg = requests.get(stack["chat"] + "/api/v2/config", headers=h).json()
    assert cfg["data_manager"]["embedding_name"] == "hash"
    r = requests.put(stack["chat"] + "/api/v2/config",
                     json={"chat.temperature": 0.3}, headers=h)
    assert r.status_code == 200
    audit = requests.get(stack["chat"] + "/api/v2/config/audit",
                         headers=h).json()
    assert audit[0]["changes"]["chat.temperature"]["new"] == 0.3
    # static path rejected as a clean 400
    r2 = requests.put(stack["chat"] + "/api/v2/config",
                      json={"data_manager.embedding_dimensions": 99},
                      headers=h)
    assert r2.status_code == 400


def test_data_api_status_upload_catalog(stack):
    s = requests.get(stack["data"] + "/api/ingestion/status").json()
    assert s["by_status"].get("embedded", 0) >= 2
    up = requests.post(stack["data"] + "/api/upload", json={
        "filename": "notes.txt",
        "content_b64": base64.b64encode(
            b"The GPU partition requires special approval." * 5).decode(),
        "sync": False,
    }).json()
    assert up["resource_hash"]
    r = requests.post(stack["data"] + "/api/ingestion/trigger", json={})
    assert r.json()["added"] == 1
    hits = requests.get(stack["data"] + "/api/catalog/search",
                        params={"q": "notes"}).json()
    assert hits and hits[0]["display_name"] == "notes.txt"
    doc = requests.get(
        stack["data"] + f"/api/catalog/document/{up['resource_hash']}").json()
    assert "GPU partition" in doc["content"]
    grep = requests.get(stack["data"] + "/api/catalog/grep",
                        params={"pattern": "GPU part.tion"}).json()
    assert grep
    stats = requests.get(stack["data"] + "/api/stats").json()
    assert stats["chunks"] > 0


def test_data_api_delete_resyncs(stack):
    up = requests.post(stack["data"] + "/api/upload", json={
        "filename": "temp.txt",
        "content_b64": base64.b64encode(b"temporary doc " * 10).decode(),
        "sync": False,
    }).json()
    requests.post(stack["data"] + "/api/ingestion/trigger", json={})
    r = requests.delete(
        stack["data"] + f"/api/documents/{up['resource_hash']}")
    assert r.json()["deleted"]


def test_error_paths(stack):
    # missing message
    r = requests.post(stack["chat"] + "/api/get_chat_response", json={})
    assert r.status_code == 400
    # unknown route
    assert requests.get(stack["chat"] + "/api/nope").status_code == 404
    # wrong method
    assert requests.get(
        stack["chat"] + "/api/get_chat_response").status_code == 405
    # invalid JWT
    r = requests.post(stack["chat"] + "/api/get_chat_response",
                      json={"message": "x"},
                      headers={"X-Auth-Token": "garbage.token.here"})
    assert r.status_code == 401


def test_stream_cancellation(stack):
    ts = stack["ctx"].traces
    tid = ts.create_trace()
    r = requests.post(stack["chat"] + "/api/cancel_stream",
                      json={"trace_id": tid})
    assert r.json()["cancelled"]
    assert ts.get_trace(tid)["status"] == "cancelled"


def test_per_conversation_document_selection(stack):
    """3-tier doc selection: disabling a document excludes it from that
    conversation's retrieval only."""
    h = {"X-User-Email": "sel@test"}
    r = requests.post(stack["chat"] + "/api/get_chat_response",
                      json={"message": "how do I submit jobs?"}, headers=h).json()
    cid = r["conversation_id"]
    assert any(s["display_name"] == "guide.md" for s in r["sources"])

    docs = requests.get(stack["chat"] + f"/api/conversations/{cid}/documents",
                        headers=h).json()
    guide = next(d for d in docs if d["display_name"] == "guide.md")
    assert guide["enabled"]
    requests.put(stack["chat"] + f"/api/conversations/{cid}/documents",
                 json={guide["resource_hash"]: False}, headers=h)
    docs2 = requests.get(stack["chat"] + f"/api/conversations/{cid}/documents",
                         headers=h).json()
    assert not next(d for d in docs2
                    if d["display_name"] == "guide.md")["enabled"]

    r2 = requests.post(stack["chat"] + "/api/get_chat_response",
                       json={"message": "how do I submit jobs?",
                             "conversation_id": cid}, headers=h).json()
    assert all(s["display_name"] != "guide.md" for s in r2["sources"])
    # other conversations unaffected
    r3 = requests.post(stack["chat"] + "/api/get_chat_response",
                       json={"message": "how do I submit jobs?"},
                       headers=h).json()
    assert any(s["display_name"] == "guide.md" for s in r3["sources"])


def test_admin_db_console(stack):
    stack["ctx"].users.create_user("dba@test", roles=["admin"])
    h = {"X-User-Email": "dba@test"}
    r = requests.post(stack["chat"] + "/api/admin/db",
                      json={"sql": "SELECT COUNT(*) AS n FROM messages"},
                      headers=h)
    assert r.status_code == 200 and r.json()[0]["n"] >= 0
    # write statements rejected
    r2 = requests.post(stack["chat"] + "/api/admin/db",
                       json={"sql": "DELETE FROM messages"}, headers=h)
    assert r2.status_code == 400
    # non-admin rejected
    r3 = requests.post(stack["chat"] + "/api/admin/db",
                       json={"sql": "SELECT 1"},
                       headers={"X-User-Email": "pleb@test"})
    assert r3.status_code == 403


def test_status_hold_gates_readiness(stack):
    """Cold-start fix: while a hold is active, terminal statuses report
    the hold label (clients gate on status == 'done'); transitional
    statuses pass through unchanged."""
    dm = stack["ctx"].data_manager
    assert dm.status["status"] == "done"
    dm.hold_status("warming")
    try:
        assert dm.status["status"] == "warming"
        dm._status = "embedding"          # transitional: not masked
        assert dm.status["status"] == "embedding"
        dm._status = "done"
    finally:
        dm.release_status()
    assert dm.status["status"] == "done"


def test_out_of_process_ann_build_and_adopt(tmp_path):
    """VERDICT r2 weak #8: the serving process exports its corpus, a
    SEPARATE process builds the IVF snapshot (scripts/ann_builder.py,
    CPU backend here standing in for 'another chip'), and the server
    adopts it without ever blocking its own device on the build."""
    import os
    import subprocess
    import sys

    import numpy as np

    from archi_tpu.engine.ann_index import AnnFlatIndex

    idx = AnnFlatIndex(32, nlist=8, nprobe=8, min_snapshot_rows=16,
                       async_refresh=False, dtype=np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx.add(x, ids=list(range(500)))
    assert idx._ivf is None

    corpus = str(tmp_path / "corpus.npz")
    idx.export_corpus(corpus)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "ann_builder.py"),
         "--corpus", corpus, "--nlist", "8", "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert os.path.exists(corpus + ".ann.npz")

    assert idx.adopt_snapshot(corpus)
    assert idx._ivf is not None and idx._n_snap == 500
    # adopted snapshot serves: ANN results match the exact scan
    q = x[:4] + 0.01 * rng.standard_normal((4, 32)).astype(np.float32)
    _ids, vals, rows = idx.search(q, k=5)
    exact = np.argsort(-(q @ x.T), axis=1)[:, :5]
    assert np.array_equal(np.asarray(rows)[:, 0], exact[:, 0])

    # staleness: compaction renumbers rows -> adopt refuses the export
    idx.delete([0, 1])
    idx.compact()
    assert not idx.adopt_snapshot(corpus)
