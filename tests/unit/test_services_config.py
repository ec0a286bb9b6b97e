"""Shared services (users/conversations/traces/prompts/RBAC/timing) and the
config system — the analog of reference tests/unit/test_postgres_services.py
+ test_config_management.py."""

import time

import pytest

from archi_tpu.config.manager import (
    ConfigurationManager, ConfigValidationError, deep_merge,
)
from archi_tpu.config.service import ConfigService, StaticConfigError
from archi_tpu.utils.app_db import AppDatabase
from archi_tpu.utils.conversation_service import ConversationService
from archi_tpu.utils.prompt_service import PromptService
from archi_tpu.utils.rbac.audit import RBACAudit
from archi_tpu.utils.rbac.jwt_parser import (
    decode_jwt, encode_jwt, extract_identity,
)
from archi_tpu.utils.rbac.permissions import (
    Permission, has_permission, permissions_for_roles,
)
from archi_tpu.utils.timing import TimingRecorder
from archi_tpu.utils.trace_service import TraceService
from archi_tpu.utils.user_service import UserService


@pytest.fixture
def db():
    return AppDatabase(":memory:")


# -------------------------------------------------------------------- users
def test_user_crud_and_preferences(db):
    us = UserService(db)
    uid = us.create_user("a@b.c", name="Alice", roles=["user", "operator"])
    u = us.get_user("a@b.c")
    assert u["id"] == uid and u["roles"] == ["user", "operator"]
    us.set_preference("a@b.c", "chat.temperature", 0.2)
    assert us.get_preferences("a@b.c") == {"chat.temperature": 0.2}
    # idempotent create keeps id
    assert us.create_user("a@b.c", name="Alice2") == uid
    assert us.get_user("a@b.c")["name"] == "Alice2"
    assert us.delete_user("a@b.c")


# ------------------------------------------------------------ conversations
def test_conversation_flow(db):
    cs = ConversationService(db)
    us = UserService(db)
    uid = us.create_user("u@x.y")
    cid = cs.create_conversation(uid, title="test")
    m1 = cs.add_message(cid, "User", "hello", model_used=None)
    m2 = cs.add_message(cid, "archi", "hi there", model_used="local/echo")
    assert cs.get_history(cid) == [("User", "hello"), ("archi", "hi there")]
    assert cs.user_owns(cid, uid)
    assert not cs.user_owns(cid, uid + 1)
    cs.add_feedback(m2, "like", "good")
    assert cs.feedback_stats() == {"like": 1}
    assert cs.model_usage_stats()[0]["model_used"] == "local/echo"
    cs.delete_conversation(cid)
    assert cs.get_history(cid) == []


def test_timing_and_ab(db):
    cs = ConversationService(db)
    cid = cs.create_conversation()
    mid = cs.add_message(cid, "User", "q")
    rec = TimingRecorder(client_sent=100.0)
    rec.stamp("server_received", 100.1)
    rec.stamp("chain_finished", 101.0)
    rec.stamp("inserts_finished", 101.2)
    cs.record_timing(mid, rec)
    t = cs.get_timing(mid)
    assert abs(t["msg_duration"] - 1.2) < 1e-6
    assert "client_sent_to_server_received" in rec.durations()

    ab = cs.create_ab_comparison(cid, "q", "ans a", "ans b", "m1", "m2")
    cs.record_ab_preference(ab, "a")
    assert cs.ab_stats()["m1 vs m2"]["a"] == 1


# ------------------------------------------------------------------- traces
def test_trace_lifecycle_and_cancellation(db):
    ts = TraceService(db)
    tid = ts.create_trace(conversation_id=1)
    ts.append_event(tid, {"type": "agent_step", "step": 0})
    ts.append_event(tid, {"type": "tool_start", "name": "search"})
    assert not ts.is_cancelled(tid)
    assert ts.cancel(tid)
    assert ts.is_cancelled(tid)
    tr = ts.get_trace(tid)
    assert tr["status"] == "cancelled"
    assert len(tr["events"]) == 2
    # cancelling a finished trace is a no-op
    assert not ts.cancel(tid)


def test_trace_tool_calls(db):
    ts = TraceService(db)
    ts.insert_tool_calls(7, [{"name": "search", "args": {"q": "x"},
                              "result": "found"}])
    calls = ts.get_tool_calls(7)
    assert calls[0]["tool_name"] == "search"
    assert calls[0]["tool_input"] == {"q": "x"}


# ------------------------------------------------------------------ prompts
def test_prompt_service_seed(db, tmp_path):
    (tmp_path / "condense.prompt").write_text("Condense: {history}")
    (tmp_path / "notes.md").write_text("# notes")
    ps = PromptService(db)
    assert ps.seed_from_directory(str(tmp_path)) == 2
    assert ps.get_prompt("condense") == "Condense: {history}"
    ps.set_prompt("condense", "new")
    assert ps.seed_from_directory(str(tmp_path)) == 0  # no overwrite
    assert ps.get_prompt("condense") == "new"


# --------------------------------------------------------------------- rbac
def test_permissions_registry():
    perms = permissions_for_roles(["user"])
    assert Permission.CHAT_USE in perms
    assert Permission.ADMIN_DB not in perms
    assert has_permission(["admin"], Permission.ADMIN_DB)
    assert not has_permission([], Permission.CHAT_USE)


def test_jwt_roundtrip_and_identity():
    token = encode_jwt(
        {"email": "op@cern.ch", "name": "Op",
         "realm_access": {"roles": ["operator"]},
         "groups": ["/cms-users"], "exp": time.time() + 60},
        "secret",
    )
    ident = extract_identity(token, "secret")
    assert ident["email"] == "op@cern.ch"
    assert "operator" in ident["roles"] and "cms-users" in ident["roles"]
    with pytest.raises(ValueError):
        decode_jwt(token, "wrong-secret")
    expired = encode_jwt({"email": "x", "exp": time.time() - 10}, "s")
    with pytest.raises(ValueError):
        decode_jwt(expired, "s")


def test_rbac_audit(db):
    audit = RBACAudit(db)
    audit.record("a@b.c", "read", "/api/config", True)
    audit.record("a@b.c", "write", "/api/config", False)
    assert len(audit.recent()) == 2
    assert audit.denials()[0]["action"] == "write"


# ------------------------------------------------------------------- config
def test_config_merge_and_validation(tmp_path):
    user_yaml = tmp_path / "c.yaml"
    user_yaml.write_text(
        "name: mydeploy\nservices:\n  chat:\n    port: 9000\n")
    cm = ConfigurationManager([str(user_yaml)])
    assert cm.config["name"] == "mydeploy"
    assert cm.config["services"]["chat"]["port"] == 9000
    assert cm.config["data_manager"]["chunk_size"] == 1000  # default kept
    cm.validate()


def test_config_validation_errors(tmp_path):
    cm = ConfigurationManager()
    cm.config["services"]["data_manager"]["port"] = \
        cm.config["services"]["chat"]["port"]
    with pytest.raises(ConfigValidationError, match="already used"):
        cm.validate()
    cm2 = ConfigurationManager()
    cm2.config["data_manager"]["embedding_dimensions"] = -1
    with pytest.raises(ConfigValidationError, match="embedding_dimensions"):
        cm2.validate()


def test_config_service_seed_and_dynamic(db):
    svc = ConfigService(db)
    svc.seed({"name": "deploy1", "chat": {"temperature": 0.5}})
    full = svc.get_full_config()
    assert full["name"] == "deploy1"
    assert full["chat"]["temperature"] == 0.5
    # dynamic update works + audited
    svc.update_dynamic({"chat.temperature": 0.1}, changed_by="admin")
    assert svc.get("chat.temperature") == 0.1
    log = svc.audit_log()
    assert log[0]["changed_by"] == "admin"
    assert log[0]["changes"]["chat.temperature"]["new"] == 0.1
    # static path rejected
    with pytest.raises(StaticConfigError):
        svc.update_dynamic({"data_manager.embedding_dimensions": 512})
    # re-seed without force is a no-op
    svc.seed({"name": "other"})
    assert svc.get("name") == "deploy1"


def test_effective_config_user_layer(db):
    svc = ConfigService(db)
    svc.seed({})
    eff = svc.effective_config({"chat.temperature": 0.9,
                                "data_manager.chunk_size": 1})
    assert eff["chat"]["temperature"] == 0.9
    assert eff["data_manager"]["chunk_size"] == 1000  # static protected
