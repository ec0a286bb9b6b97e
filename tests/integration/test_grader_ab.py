"""Grader service over HTTP + A/B comparison route."""

import numpy as np
import pytest
import requests

from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.utils.app_db import AppDatabase
from archi_tpu.utils.conversation_service import ConversationService
from archi_tpu.utils.trace_service import TraceService
from archi_tpu.web.chat_app import create_chat_app
from archi_tpu.web.chat_wrapper import ChatWrapper
from archi_tpu.web.grader_app import create_grader_app
from tests.unit.test_vectorstore import FakeEmbeddings


@pytest.fixture(scope="module")
def grader_url():
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["rubric reference content for grading"])
    grading = Archi("GradingPipeline", vectorstore=store)
    app = create_grader_app(grading_archi=grading)
    port = app.serve("127.0.0.1", 0, background=True)
    yield f"http://127.0.0.1:{port}"
    app.shutdown()


def test_grade_and_approval_flow(grader_url):
    r = requests.post(grader_url + "/api/grade", json={
        "submission": "F = ma, therefore acceleration is force over mass",
        "rubric": "correct physics", "max_points": 10,
    })
    assert r.status_code == 200
    sid = r.json()["submission_id"]
    assert r.json()["status"] == "pending"
    subs = requests.get(grader_url + "/api/submissions").json()
    assert any(s["id"] == sid for s in subs)
    ap = requests.post(grader_url + f"/api/submissions/{sid}/approve",
                       json={"final_grade": "9/10"})
    assert ap.json()["status"] == "approved"
    assert ap.json()["grade"] == "9/10"


def test_grade_empty_submission(grader_url):
    r = requests.post(grader_url + "/api/grade", json={})
    assert r.status_code == 400


def test_approve_unknown(grader_url):
    r = requests.post(grader_url + "/api/submissions/9999/approve", json={})
    assert r.status_code == 404


@pytest.fixture(scope="module")
def chat_url():
    db = AppDatabase(":memory:")
    convs = ConversationService(db)
    traces = TraceService(db)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["the quick brown fox"])
    archi = Archi("QAPipeline", vectorstore=store)
    wrapper = ChatWrapper(archi, convs, traces)
    app = create_chat_app(chat_wrapper=wrapper, conversations=convs,
                          traces=traces)
    port = app.serve("127.0.0.1", 0, background=True)
    yield f"http://127.0.0.1:{port}", convs
    app.shutdown()


def test_ab_compare_http(chat_url):
    url, convs = chat_url
    r = requests.post(url + "/api/ab_compare", json={
        "message": "what about foxes?",
        "model_a": "local/echo", "model_b": "local/echo",
    })
    assert r.status_code == 200
    data = r.json()
    assert data["answer_a"] and data["answer_b"]
    pref = requests.post(url + "/api/ab_preference", json={
        "comparison_id": data["comparison_id"], "preference": "a",
    })
    assert pref.json()["ok"]
    assert convs.ab_stats()["local/echo vs local/echo"]["a"] == 1
