"""Regression tests for the round-2 advisor findings (ADVICE.md r1):

- Postgres adapters roll back failed statements and never idle-in-transaction
- admin DB console rejects multi-statement strings and catches any DB error
- trace / tool-call / cancel / feedback / A/B routes enforce ownership
- the data app's shared-secret middleware gates non-loopback deployments
"""

import json
import sqlite3

import numpy as np
import pytest

from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.utils.app_db import AppDatabase
from archi_tpu.utils.conversation_service import ConversationService
from archi_tpu.utils.trace_service import TraceService
from archi_tpu.utils.user_service import UserService
from archi_tpu.web.chat_app import create_chat_app
from archi_tpu.web.chat_wrapper import ChatWrapper
from archi_tpu.web.data_app import create_data_app
from archi_tpu.web.framework import Request
from tests.unit.test_vectorstore import FakeEmbeddings


def _request(method, path, headers=None, body=b""):
    return Request(method, path, {}, headers or {}, body)


def _stack():
    db = AppDatabase(":memory:")
    users = UserService(db)
    convs = ConversationService(db)
    traces = TraceService(db)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["the quick brown fox"], [{"source": "a"}])
    archi = Archi("QAPipeline", vectorstore=store)
    wrapper = ChatWrapper(archi, convs, traces)
    app = create_chat_app(
        chat_wrapper=wrapper, conversations=convs, traces=traces,
        user_service=users, app_db=db,
    )
    return app, db, users, convs, traces


# ------------------------------------------------------- admin DB console
def test_admin_db_rejects_multi_statement():
    app, db, users, _c, _t = _stack()
    users.create_user("admin@x", roles=["admin"])
    req = _request(
        "POST", "/api/admin/db", headers={"x-user-email": "admin@x"},
        body=json.dumps(
            {"sql": "select 1; update users set roles='[\"admin\"]'"}
        ).encode(),
    )
    resp = app.router.dispatch(req)
    assert resp.status == 400
    # trailing semicolon on a single statement is fine
    req = _request("POST", "/api/admin/db",
                   headers={"x-user-email": "admin@x"},
                   body=b'{"sql": "SELECT COUNT(*) AS n FROM users;"}')
    assert app.router.dispatch(req).status == 200


def test_admin_db_catches_any_db_error():
    app, _db, users, _c, _t = _stack()
    users.create_user("admin@x", roles=["admin"])
    req = _request("POST", "/api/admin/db",
                   headers={"x-user-email": "admin@x"},
                   body=b'{"sql": "SELECT * FROM no_such_table"}')
    resp = app.router.dispatch(req)
    assert resp.status == 400  # not a 500


# -------------------------------------------------- per-message ownership
def _two_users(app, users, convs, traces):
    alice = users.create_user("alice@x")
    users.create_user("bob@x")
    cid = convs.create_conversation(alice, title="private")
    mid = convs.add_message(cid, "User", "secret question")
    tid = traces.create_trace(cid)
    traces.append_event(tid, {"type": "tool_result", "content": "secret"})
    return cid, mid, tid


def test_trace_routes_enforce_ownership():
    app, _db, users, convs, traces = _stack()
    cid, mid, tid = _two_users(app, users, convs, traces)
    bob = {"x-user-email": "bob@x"}
    alice = {"x-user-email": "alice@x"}

    assert app.router.dispatch(
        _request("GET", f"/api/trace/{tid}", headers=bob)).status == 403
    assert app.router.dispatch(
        _request("GET", f"/api/trace/{tid}", headers=alice)).status == 200

    assert app.router.dispatch(
        _request("GET", f"/api/tool_calls/{mid}", headers=bob)).status == 403
    assert app.router.dispatch(
        _request("GET", f"/api/tool_calls/{mid}", headers=alice)).status == 200

    cancel = json.dumps({"trace_id": tid}).encode()
    assert app.router.dispatch(
        _request("POST", "/api/cancel_stream", headers=bob,
                 body=cancel)).status == 403
    assert app.router.dispatch(
        _request("POST", "/api/cancel_stream", headers=alice,
                 body=cancel)).status == 200


def test_feedback_and_ab_preference_enforce_ownership():
    app, _db, users, convs, traces = _stack()
    cid, mid, _tid = _two_users(app, users, convs, traces)
    comp = convs.create_ab_comparison(cid, "q", "a", "b", "m1", "m2")
    bob = {"x-user-email": "bob@x"}
    alice = {"x-user-email": "alice@x"}

    fb = json.dumps({"message_id": mid, "rating": "like"}).encode()
    assert app.router.dispatch(
        _request("POST", "/api/feedback", headers=bob, body=fb)).status == 403
    assert app.router.dispatch(
        _request("POST", "/api/feedback", headers=alice,
                 body=fb)).status == 200

    pref = json.dumps({"comparison_id": comp, "preference": "a"}).encode()
    assert app.router.dispatch(
        _request("POST", "/api/ab_preference", headers=bob,
                 body=pref)).status == 403
    assert app.router.dispatch(
        _request("POST", "/api/ab_preference", headers=alice,
                 body=pref)).status == 200
    assert convs.get_ab_comparison(comp)["preference"] == "a"


# ------------------------------------------------------ data app token gate
class _DmStub:
    status = {"state": "idle"}
    catalog = None
    persistence = None
    vectorstore = None


def test_data_app_token_middleware():
    app = create_data_app(data_manager=_DmStub(), auth_token="tok123")
    no_token = app.router.dispatch(_request("GET", "/api/ingestion/status"))
    assert no_token.status == 401
    bad = app.router.dispatch(
        _request("GET", "/api/ingestion/status",
                 headers={"x-data-token": "wrong"}))
    assert bad.status == 401
    ok = app.router.dispatch(
        _request("GET", "/api/ingestion/status",
                 headers={"x-data-token": "tok123"}))
    assert ok.status == 200
    # health stays open for liveness probes
    assert app.router.dispatch(_request("GET", "/healthz")).status == 200


def test_data_app_open_without_token():
    app = create_data_app(data_manager=_DmStub())
    ok = app.router.dispatch(_request("GET", "/api/ingestion/status"))
    assert ok.status == 200


# ------------------------------------------- postgres transaction hygiene
class _BackTranslatingCursor:
    """Accepts the adapters' %s paramstyle on a sqlite cursor."""

    def __init__(self, cur):
        self._cur = cur

    def execute(self, sql, params=()):
        self._cur.execute(sql.replace("%s", "?"), params)
        return self

    def __getattr__(self, name):
        return getattr(self._cur, name)


class _FailingOnceConn:
    """sqlite connection shim that surfaces the rollback calls."""

    def __init__(self):
        self._conn = sqlite3.connect(":memory:")
        self._conn.row_factory = sqlite3.Row
        self.rollbacks = 0

    def cursor(self):
        return _BackTranslatingCursor(self._conn.cursor())

    def commit(self):
        self._conn.commit()

    def rollback(self):
        self.rollbacks += 1
        self._conn.rollback()

    def close(self):
        self._conn.close()


def test_pg_adapter_rolls_back_failed_statements():
    from archi_tpu.data.catalog_postgres import _ParamStyleConnection

    raw = _FailingOnceConn()
    conn = _ParamStyleConnection(raw)
    conn.executescript("CREATE TABLE t (x INTEGER)")
    with pytest.raises(Exception):
        conn.execute("SELECT * FROM missing_table")
    assert raw.rollbacks == 1
    # connection still usable after the failure
    conn.execute("INSERT INTO t (x) VALUES (?)", (1,))
    rows = conn.execute("SELECT x FROM t").fetchall()
    assert rows[0]["x"] == 1


def test_pg_app_db_rolls_back_and_query_commits():
    from archi_tpu.utils.app_db_postgres import PostgresAppDatabase

    raw = _FailingOnceConn()
    db = PostgresAppDatabase(connection=raw)
    with pytest.raises(Exception):
        db.query("SELECT * FROM missing_table")
    assert raw.rollbacks == 1
    db.execute("INSERT INTO users (email) VALUES (?)", ("a@x",))
    assert db.query("SELECT email FROM users")[0]["email"] == "a@x"
