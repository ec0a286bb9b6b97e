"""Active-agent selection end to end (reference set_active_agent,
app.py:2218): create a spec over HTTP, activate it, and the next chat
message runs through the spec-configured ReAct agent."""

import json

import numpy as np

from archi_tpu.bin.service_chat import make_agent_resolver
from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.pipelines.agents.agent_spec import AgentStore
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


def test_activated_agent_drives_chat(tmp_path):
    from archi_tpu.config.service import ConfigService

    db = AppDatabase(":memory:")
    users = UserService(db)
    convs = ConversationService(db)
    traces = TraceService(db)
    cfg_service = ConfigService(db)
    config = {"active_pipeline": "QAPipeline",
              "providers": {"local": {"enabled": True, "mode": "echo"}}}
    cfg_service.seed(config)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["the quick brown fox"], [{"source": "a"}])
    agents = AgentStore(str(tmp_path / "agents"))
    archi = Archi("QAPipeline", config=config, vectorstore=store)
    wrapper = ChatWrapper(
        archi, convs, traces,
        agent_resolver=make_agent_resolver(agents, cfg_service, config,
                                           store),
    )
    app = create_chat_app(
        chat_wrapper=wrapper, conversations=convs, traces=traces,
        user_service=users, agent_store=agents, config_service=cfg_service,
    )
    users.create_user("op@x", roles=["admin"])
    hdr = {"x-user-email": "op@x"}

    # default: QAPipeline
    r = app.router.dispatch(_request(
        "POST", "/api/get_chat_response", headers=hdr,
        body=b'{"message": "what about the fox?"}'))
    assert r.status == 200
    assert json.loads(r.body)["metadata"]["pipeline_used"] == "QAPipeline"

    # create + activate an agent over HTTP
    spec = json.dumps({
        "name": "fox-agent", "description": "fox specialist",
        "tools": ["retriever"],
        "prompt": "You are the fox specialist agent.",
    }).encode()
    assert app.router.dispatch(_request(
        "POST", "/api/agents", headers=hdr, body=spec)).status == 200
    assert app.router.dispatch(_request(
        "PUT", "/api/agents/active", headers=hdr,
        body=b'{"name": "fox-agent"}')).status == 200

    r2 = app.router.dispatch(_request(
        "POST", "/api/get_chat_response", headers=hdr,
        body=b'{"message": "and now?"}'))
    data = json.loads(r2.body)
    assert data["metadata"]["pipeline_used"] == "BaseReActAgent"
    # the agent's system prompt is the spec body (echo model reflects it)
    info = app.router.dispatch(_request(
        "GET", "/api/agent/info", headers=hdr))
    assert b"fox-agent" in info.body

    # deactivate → back to the default pipeline
    assert app.router.dispatch(_request(
        "PUT", "/api/agents/active", headers=hdr,
        body=b'{"name": null}')).status == 200
    r3 = app.router.dispatch(_request(
        "POST", "/api/get_chat_response", headers=hdr,
        body=b'{"message": "back to normal?"}'))
    assert json.loads(r3.body)["metadata"]["pipeline_used"] == "QAPipeline"


def test_agent_from_spec_tools_and_model(tmp_path):
    from archi_tpu.pipelines.agents.agent_spec import AgentSpec
    from archi_tpu.pipelines.agents.toolbox import agent_from_spec

    spec = AgentSpec(name="t", prompt="Do things.",
                     tools=["retriever", "file_search", "unknown_tool"],
                     model="local/echo")
    # no catalog client → file_search skipped with a warning, not an error
    agent = agent_from_spec(spec, {"providers": {
        "local": {"enabled": True, "mode": "echo"}}})
    assert agent.system_prompt == "Do things."
    assert agent.llms["agent_model"].model_name.endswith("echo")

    class FakeCatalogClient:
        def grep(self, pattern, limit=20):
            return []

        def search(self, q, limit=20):
            return []

        def schema(self):
            return {}

        def fetch(self, h):
            return None

    agent2 = agent_from_spec(spec, {}, catalog_client=FakeCatalogClient())
    names = {t.name for t in agent2.tools}
    assert any("search" in n or "grep" in n for n in names), names


def test_active_agent_streams_tool_events_over_socket(tmp_path):
    """Activated agent drives the SSE stream end to end: agent steps and
    retriever tool events arrive over a real socket."""
    import requests

    from archi_tpu.config.service import ConfigService

    db = AppDatabase(":memory:")
    users = UserService(db)
    convs = ConversationService(db)
    traces = TraceService(db)
    cfg_service = ConfigService(db)
    config = {"active_pipeline": "QAPipeline",
              "providers": {"local": {"enabled": True, "mode": "echo"}}}
    cfg_service.seed(config)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["the quick brown fox jumps over the lazy dog"],
                    [{"source": "a", "display_name": "fox.md"}])
    agents = AgentStore(str(tmp_path / "agents"))
    archi = Archi("QAPipeline", config=config, vectorstore=store)
    wrapper = ChatWrapper(
        archi, convs, traces,
        agent_resolver=make_agent_resolver(agents, cfg_service, config,
                                           store))
    app = create_chat_app(
        chat_wrapper=wrapper, conversations=convs, traces=traces,
        user_service=users, agent_store=agents, config_service=cfg_service)
    port = app.serve("127.0.0.1", 0, background=True)
    url = f"http://127.0.0.1:{port}"
    hdr = {"x-user-email": "op@x"}
    try:
        users.create_user("op@x", roles=["admin"])
        r = requests.post(url + "/api/agents", headers=hdr, json={
            "name": "stream-agent", "tools": ["retriever"],
            "prompt": "Use the retriever tool, then answer."})
        assert r.status_code == 200
        assert requests.put(url + "/api/agents/active", headers=hdr,
                            json={"name": "stream-agent"}).status_code == 200

        # script the agent model so the loop actually exercises the tool
        # (the echo model never emits tool calls)
        from archi_tpu.utils.messages import Message, ToolCall
        from tests.unit.test_orchestrator import ScriptedChatModel

        agent_archi = wrapper.archi  # resolver materializes the agent
        agent_archi.pipeline.llms["agent_model"] = ScriptedChatModel([
            Message("assistant", "",
                    tool_calls=[ToolCall("search_vectorstore_hybrid",
                                         {"query": "what jumps"}, "c1")]),
            Message("assistant", "The fox jumps."),
        ])

        resp = requests.post(url + "/api/get_chat_response_stream",
                             headers=hdr, json={"message": "what jumps?"},
                             stream=True, timeout=60)
        events = []
        for line in resp.iter_lines():
            line = line.decode()
            if line.startswith("data: ") and line != "data: [DONE]":
                events.append(json.loads(line[6:]))
        types = [e.get("type") for e in events]
        assert "final" in types
        final = next(e for e in events if e.get("type") == "final")
        assert final["metadata"]["pipeline_used"] == "BaseReActAgent"
        # trace persisted the agent's steps
        tr = requests.get(url + f"/api/trace/{final['trace_id']}",
                          headers=hdr).json()
        assert tr["status"] == "completed"
        assert any(ev.get("type") in ("agent_step", "tool_start",
                                      "tool_result")
                   for ev in tr["events"]), tr["events"][:3]
    finally:
        app.shutdown()
