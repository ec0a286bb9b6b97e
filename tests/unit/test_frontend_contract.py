"""Browser-free UI test tier (VERDICT r1 next #7 / missing #6).

No browser exists in this image (the reference uses 17 Playwright specs),
so the SPA is verified structurally against the live backend instead:

1. **API contract**: every ``/api/...`` path the SPA's JS references must
   resolve to a real route on a fully-wired chat app (dynamic-path prefixes
   included).  A renamed route or a frontend typo fails this suite.
2. **DOM contract**: every element id the JS queries must exist in the
   served HTML.
3. **SSE protocol**: the streaming frames the JS parses (``data:`` frames,
   ``token``/``final``/``trace_start`` types, ``[DONE]`` terminator) match
   what the server actually emits, driven end to end over a socket.
"""

import json
import re

import numpy as np
import requests

from archi_tpu.web.frontend import FRONTEND_HTML


def _wired_app():
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from archi_tpu.orchestrator.archi import Archi
    from archi_tpu.pipelines.agents.agent_spec import AgentStore
    from archi_tpu.utils.app_db import AppDatabase
    from archi_tpu.utils.conversation_service import ConversationService
    from archi_tpu.utils.prompt_service import PromptService
    from archi_tpu.utils.trace_service import TraceService
    from archi_tpu.utils.user_service import UserService
    from archi_tpu.web.chat_app import create_chat_app
    from archi_tpu.web.chat_wrapper import ChatWrapper
    from tests.unit.test_vectorstore import FakeEmbeddings
    import tempfile

    db = AppDatabase(":memory:")
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["the quick brown fox jumps"], [{"source": "a"}])
    convs = ConversationService(db)
    traces = TraceService(db)
    archi = Archi("QAPipeline", vectorstore=store)
    wrapper = ChatWrapper(archi, convs, traces)

    from archi_tpu.config.service import ConfigService

    cfg = ConfigService(db)
    cfg.seed({"active_pipeline": "QAPipeline"})
    return create_chat_app(
        chat_wrapper=wrapper, conversations=convs, traces=traces,
        user_service=UserService(db), app_db=db,
        agent_store=AgentStore(tempfile.mkdtemp()),
        prompt_service=PromptService(db), config_service=cfg,
        data_manager_url="http://127.0.0.1:1",  # routes exist; proxy target n/a
    )


def _route_patterns(app):
    return [regex.pattern for _m, regex, _fn in app.router._routes]


def test_every_spa_api_path_has_a_route():
    app = _wired_app()
    patterns = _route_patterns(app)
    paths = set(re.findall(r"'(/api/[^']*)'", FRONTEND_HTML))
    assert len(paths) >= 15, "SPA should reference a real API surface"
    missing = []
    for p in paths:
        if p.endswith("/"):  # dynamic: '/api/conversations/'+id
            prefix = "^" + re.escape(p)
            ok = any(pat.replace("\\", "").startswith("^" + p.rstrip("/"))
                     or re.sub(r"\(\?P<[a-zA-Z_]+>\[\^/\]\+\)", "X",
                               pat).startswith(prefix.replace("\\", ""))
                     for pat in patterns)
        else:
            ok = any(re.fullmatch(pat,
                                  re.sub(r"<[a-zA-Z_]+>", "x", p) or p)
                     or re.fullmatch(pat, p) for pat in patterns)
        if not ok:
            missing.append(p)
    assert not missing, f"SPA references unrouted paths: {missing}"


def test_every_queried_dom_id_exists():
    queried = set(re.findall(r"\$\('#([a-zA-Z0-9_]+)'\)", FRONTEND_HTML))
    declared = set(re.findall(r"id=\"([a-zA-Z0-9_]+)\"", FRONTEND_HTML))
    # ids created dynamically by the JS itself
    dynamic = set(re.findall(r"id=\\?\"([a-zA-Z0-9_]+)\\?\"", FRONTEND_HTML))
    dynamic |= set(re.findall(r"id='([a-zA-Z0-9_]+)'", FRONTEND_HTML))
    dynamic |= {m for m in re.findall(r'id="([a-zA-Z0-9_]+)"', FRONTEND_HTML)}
    missing = queried - declared - dynamic - {"logout"}  # logout is injected
    assert not missing, f"JS queries ids not in the DOM: {missing}"


def test_sse_protocol_matches_spa_parser():
    app = _wired_app()
    port = app.serve("127.0.0.1", 0, background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        r = requests.post(
            url + "/api/get_chat_response_stream",
            json={"message": "what jumps?"}, stream=True, timeout=30)
        assert r.status_code == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        frames = []
        for line in r.iter_lines():
            line = line.decode()
            if line.startswith("data: "):
                frames.append(line[6:])
        # terminator the JS loop relies on
        assert frames[-1] == "[DONE]"
        events = [json.loads(f) for f in frames[:-1]]
        types = {e.get("type") for e in events}
        # the types the SPA switches on must be present
        assert "final" in types
        assert "trace_start" in types
        final = next(e for e in events if e.get("type") == "final")
        # fields the SPA reads off the final frame
        for field in ("answer", "conversation_id", "message_id", "sources"):
            assert field in final, field
    finally:
        app.shutdown()


def test_index_serves_spa_with_tabs():
    app = _wired_app()
    # index route falls back to placeholder unless html passed; check the
    # shipped HTML itself for the three tabs + panels the workflows need
    for marker in ('data-tab="chat"', 'data-tab="data"', 'data-tab="admin"',
                   'id="abBar"', 'id="sqlBox"', 'id="schedList"',
                   'id="gitUrl"', 'id="linkUrl"', 'id="loginBtn"'):
        assert marker in FRONTEND_HTML, marker
