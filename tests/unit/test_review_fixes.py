"""Regression tests for the round-1 code-review findings."""

import time

import numpy as np
import pytest

from archi_tpu.data.scheduler import CronExpr, CronScheduler
from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.providers.chat_model import EchoChatModel
from archi_tpu.utils.app_db import AppDatabase
from archi_tpu.utils.conversation_service import ConversationService
from archi_tpu.utils.trace_service import TraceService
from archi_tpu.utils.user_service import UserService
from archi_tpu.web.chat_app import create_chat_app
from archi_tpu.web.chat_wrapper import ChatWrapper
from archi_tpu.web.framework import Request
from tests.unit.test_vectorstore import FakeEmbeddings


def _request(method, path, headers=None, body=b""):
    return Request(method, path, {}, headers or {}, body)


def _stack(jwt_secret=None, require_auth=False):
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
        user_service=users, jwt_secret=jwt_secret, require_auth=require_auth,
    )
    return app, users, convs, wrapper


# ---------------------------------------------------------------- finding 1
def test_header_identity_rejected_when_auth_configured():
    app, users, _c, _w = _stack(jwt_secret="s3cret")
    users.create_user("admin@x", roles=["admin"])
    req = _request("POST", "/api/admin/db",
                   headers={"x-user-email": "admin@x"},
                   body=b'{"sql": "SELECT 1"}')
    resp = app.router.dispatch(req)
    assert resp.status == 403  # header identity NOT trusted → anonymous


def test_header_identity_rejected_when_require_auth():
    app, _u, _c, _w = _stack(require_auth=True)
    req = _request("POST", "/api/get_chat_response",
                   headers={"x-user-email": "x@y"},
                   body=b'{"message": "hi"}')
    resp = app.router.dispatch(req)
    assert resp.status == 401


def test_header_identity_still_works_in_dev_mode():
    app, _u, _c, _w = _stack()
    req = _request("GET", "/api/v2/users/me",
                   headers={"x-user-email": "dev@x"})
    resp = app.router.dispatch(req)
    assert resp.status == 200 and b"dev@x" in resp.body


# ---------------------------------------------------------------- finding 8
def test_conversation_delete_rename_ownership():
    app, users, convs, _w = _stack()
    alice = users.create_user("alice@x")
    cid = convs.create_conversation(alice, title="private")
    users.create_user("bob@x")
    for method in ("DELETE", "PUT"):
        req = _request(method, f"/api/conversations/{cid}",
                       headers={"x-user-email": "bob@x"},
                       body=b'{"title": "hacked"}')
        resp = app.router.dispatch(req)
        assert resp.status == 403, method
    assert convs.get_conversation(cid)["title"] == "private"


# ---------------------------------------------------------------- finding 2
def test_model_override_does_not_leak():
    _app, _u, _c, wrapper = _stack()
    original = wrapper.archi.pipeline.llms["chat_model"]
    wrapper("hello", model_override="local/echo")
    assert wrapper.archi.pipeline.llms["chat_model"] is original
    # streaming path too
    list(wrapper.stream("hello again", model_override="local/echo"))
    assert wrapper.archi.pipeline.llms["chat_model"] is original
    # ab_compare too
    wrapper.ab_compare("q", "local/echo", "local/echo")
    assert wrapper.archi.pipeline.llms["chat_model"] is original


# ---------------------------------------------------------------- finding 3
def test_small_weights_do_not_leak_masked_rows():
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["secret fox document", "public fox document"],
                    [{"source": "secret"}, {"source": "public"}],
                    ids=["sec", "pub"])
    res = store.hybrid_search("fox document", k=5,
                              semantic_weight=0.05, bm25_weight=0.05,
                              enabled_ids={"pub"})
    assert res, "enabled doc must be returned"
    assert all(d.metadata["source"] == "public" for d, _s in res)
    # pure-lexical path with tiny weight
    res2 = store.hybrid_search("fox document", k=5, semantic_weight=0.0,
                               bm25_weight=0.01, enabled_ids={"pub"})
    assert all(d.metadata["source"] == "public" for d, _s in res2)


# ---------------------------------------------------------------- finding 4
def test_cron_dow_sunday_is_zero():
    e = CronExpr.parse("0 2 * * 0")
    sunday = time.struct_time((2026, 8, 16, 2, 0, 0, 6, 228, 0))  # tm_wday=6
    monday = time.struct_time((2026, 8, 17, 2, 0, 0, 0, 229, 0))
    assert e.matches(sunday)
    assert not e.matches(monday)
    # 7 also means Sunday
    assert CronExpr.parse("0 2 * * 7").matches(sunday)


# ---------------------------------------------------------------- finding 7
def test_scheduler_typeerror_in_job_body_runs_once():
    sched = CronScheduler()
    calls = []

    def bad_job(**kw):
        calls.append(1)
        raise TypeError("boom inside job")

    sched.add_job("bad", "* * * * *", bad_job)
    sched._tick()
    assert len(calls) == 1  # not re-invoked


# --------------------------------------------------------------- finding 10
def test_id_counter_restored_after_load(tmp_path):
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["one fox", "two fox"])  # auto ids default:0, default:1
    p = str(tmp_path / "ckpt")
    store.save(p)
    loaded = TpuVectorStore.load(p, FakeEmbeddings())
    new_ids = loaded.add_texts(["three fox"])
    assert new_ids[0] not in ("default:0", "default:1")
    assert loaded.count() == 3  # nothing overwritten
