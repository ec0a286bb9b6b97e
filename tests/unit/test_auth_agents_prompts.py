"""Auth session flow + agents CRUD + prompt registry routes
(VERDICT r1 next #6; reference chat_app/app.py:2293-2459,2840-3111,
api.py:815,835 + prompt management)."""

import json

import numpy as np

from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.pipelines.agents.agent_spec import AgentStore
from archi_tpu.utils.app_db import AppDatabase
from archi_tpu.utils.conversation_service import ConversationService
from archi_tpu.utils.prompt_service import PromptService
from archi_tpu.utils.sessions import SessionService
from archi_tpu.utils.trace_service import TraceService
from archi_tpu.utils.user_service import UserService
from archi_tpu.web.chat_app import create_chat_app
from archi_tpu.web.chat_wrapper import ChatWrapper
from archi_tpu.web.framework import Request
from tests.unit.test_vectorstore import FakeEmbeddings


def _request(method, path, headers=None, body=b""):
    return Request(method, path, {}, headers or {}, body)


def _stack(tmp_path, require_auth=False, oauth_exchange=None):
    db = AppDatabase(":memory:")
    users = UserService(db)
    convs = ConversationService(db)
    traces = TraceService(db)
    prompts = PromptService(db)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["the quick brown fox"], [{"source": "a"}])
    archi = Archi("QAPipeline", vectorstore=store)
    wrapper = ChatWrapper(archi, convs, traces)
    agents = AgentStore(str(tmp_path / "agents"))

    from archi_tpu.config.service import ConfigService

    cfg = ConfigService(db)
    cfg.seed({"active_pipeline": "QAPipeline"})
    app = create_chat_app(
        chat_wrapper=wrapper, conversations=convs, traces=traces,
        user_service=users, app_db=db, agent_store=agents,
        prompt_service=prompts, config_service=cfg,
        session_service=SessionService("test-secret"),
        oauth_exchange=oauth_exchange, require_auth=require_auth,
    )
    return app, users, agents, prompts


# ------------------------------------------------------------------- auth
def test_login_issues_session_cookie_and_identity(tmp_path):
    app, users, _a, _p = _stack(tmp_path, require_auth=True)
    users.set_password("alice@x", "hunter22")

    bad = app.router.dispatch(_request(
        "POST", "/api/auth/login",
        body=b'{"email": "alice@x", "password": "wrong"}'))
    assert bad.status == 401

    ok = app.router.dispatch(_request(
        "POST", "/api/auth/login",
        body=b'{"email": "alice@x", "password": "hunter22"}'))
    assert ok.status == 200
    cookie = ok.headers["Set-Cookie"]
    assert "archi_session=" in cookie and "HttpOnly" in cookie

    # cookie authenticates API calls under require_auth
    token = cookie.split(";")[0]
    sess = app.router.dispatch(_request(
        "GET", "/api/auth/session", headers={"cookie": token}))
    assert sess.status == 200 and b"alice@x" in sess.body

    # without the cookie the API is closed
    closed = app.router.dispatch(_request("GET", "/api/conversations"))
    assert closed.status == 401


def test_logout_clears_cookie(tmp_path):
    app, users, _a, _p = _stack(tmp_path)
    resp = app.router.dispatch(_request("POST", "/api/auth/logout"))
    assert resp.status == 200 and "Max-Age=0" in resp.headers["Set-Cookie"]


def test_oauth_callback_establishes_session(tmp_path):
    app, _u, _a, _p = _stack(
        tmp_path, require_auth=True,
        oauth_exchange=lambda code: (
            {"email": "sso@x", "name": "SSO"} if code == "good" else None))
    bad = app.router.dispatch(Request(
        "GET", "/api/auth/callback", {"code": ["bad"]}, {}, b""))
    assert bad.status == 401
    ok = app.router.dispatch(Request(
        "GET", "/api/auth/callback", {"code": ["good"]}, {}, b""))
    assert ok.status == 302 and "archi_session=" in ok.headers["Set-Cookie"]


def test_tampered_session_rejected(tmp_path):
    app, users, _a, _p = _stack(tmp_path, require_auth=True)
    users.set_password("alice@x", "pw")
    ok = app.router.dispatch(_request(
        "POST", "/api/auth/login",
        body=b'{"email": "alice@x", "password": "pw"}'))
    token = ok.headers["Set-Cookie"].split(";")[0]
    forged = token.replace("alice", "admin")
    resp = app.router.dispatch(_request(
        "GET", "/api/conversations", headers={"cookie": forged}))
    assert resp.status == 401


# ------------------------------------------------------------------ agents
def test_agents_crud_and_template(tmp_path):
    app, users, agents, _p = _stack(tmp_path)
    users.create_user("op@x", roles=["admin"])
    hdr = {"x-user-email": "op@x"}

    tpl = app.router.dispatch(_request(
        "GET", "/api/v2/agent/template", headers=hdr))
    assert tpl.status == 200 and b"name:" in tpl.body

    body = json.dumps({"name": "ops-helper", "description": "helps ops",
                       "tools": ["retriever"],
                       "prompt": "You are the ops helper."}).encode()
    assert app.router.dispatch(_request(
        "POST", "/api/agents", headers=hdr, body=body)).status == 200

    lst = app.router.dispatch(_request("GET", "/api/agents", headers=hdr))
    assert b"ops-helper" in lst.body

    got = app.router.dispatch(_request(
        "GET", "/api/agents/ops-helper", headers=hdr))
    data = json.loads(got.body)
    assert data["prompt"] == "You are the ops helper."
    assert data["tools"] == ["retriever"]

    # raw-markdown save (api.py:835 analog)
    md = agents.template().replace("my-agent", "md-agent")
    saved = app.router.dispatch(_request(
        "POST", "/api/v2/agent/save", headers=hdr,
        body=json.dumps({"markdown": md}).encode()))
    assert saved.status == 200 and b"md-agent" in saved.body

    # activate + delete
    act = app.router.dispatch(_request(
        "PUT", "/api/agents/active", headers=hdr,
        body=b'{"name": "ops-helper"}'))
    assert act.status == 200
    assert app.router.dispatch(_request(
        "DELETE", "/api/agents/ops-helper", headers=hdr)).status == 200
    assert app.router.dispatch(_request(
        "GET", "/api/agents/ops-helper", headers=hdr)).status == 404


def test_agents_write_requires_manage_permission(tmp_path):
    app, users, _a, _p = _stack(tmp_path)
    users.create_user("user@x")  # plain user: AGENTS_USE but not MANAGE
    hdr = {"x-user-email": "user@x"}
    assert app.router.dispatch(_request(
        "GET", "/api/agents", headers=hdr)).status == 200
    resp = app.router.dispatch(_request(
        "POST", "/api/agents", headers=hdr,
        body=b'{"name": "x", "prompt": "p"}'))
    assert resp.status == 403


def test_agent_name_traversal_rejected(tmp_path):
    app, users, _a, _p = _stack(tmp_path)
    users.create_user("op@x", roles=["admin"])
    hdr = {"x-user-email": "op@x"}
    resp = app.router.dispatch(_request(
        "POST", "/api/agents", headers=hdr,
        body=json.dumps({"name": "..%2fescape", "prompt": "p"}).encode()))
    assert resp.status == 400


# ----------------------------------------------------------------- prompts
def test_prompt_registry_routes(tmp_path):
    app, users, _a, prompts = _stack(tmp_path)
    users.create_user("op@x", roles=["operator"])   # CONFIG_READ only
    users.create_user("adm@x", roles=["admin"])
    op = {"x-user-email": "op@x"}
    adm = {"x-user-email": "adm@x"}

    put = app.router.dispatch(_request(
        "PUT", "/api/v2/prompts/condense_prompt", headers=adm,
        body=b'{"content": "Condense: {history}"}'))
    assert put.status == 200
    # operator can read but not write
    assert app.router.dispatch(_request(
        "GET", "/api/v2/prompts", headers=op)).status == 200
    assert app.router.dispatch(_request(
        "GET", "/api/v2/prompts/condense_prompt", headers=op)).status == 200
    assert app.router.dispatch(_request(
        "PUT", "/api/v2/prompts/condense_prompt", headers=op,
        body=b'{"content": "nope"}')).status == 403
    assert prompts.get_prompt("condense_prompt") == "Condense: {history}"
