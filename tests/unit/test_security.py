"""Security test tier — the browser-free analog of the reference's
Playwright specs (``tests/ui/security/xss-prevention.spec.ts``,
``api-security.spec.ts``).

1. XSS prevention: every dynamic ``innerHTML`` sink in the SPA must route
   user-controllable text through ``esc()`` (a static audit of the JS —
   catches an unescaped interpolation before it ships), and answers
   containing script tags survive the round trip as DATA, not markup.
2. API security: protected route families reject anonymous and
   under-privileged access; SQL injection attempts on the admin console
   and path traversal on agent names are rejected.
"""

import json
import re

import numpy as np

from archi_tpu.web.frontend import FRONTEND_HTML


# ------------------------------------------------------------------- XSS
def test_every_dynamic_innerhtml_is_escaped():
    """Static audit: innerHTML assignments may only use (a) string
    literals, (b) esc()-wrapped values, (c) the sqlResult table built from
    esc()'d cells."""
    def split_concat(expr: str) -> list[str]:
        """Split a JS expression on top-level '+' (paren/bracket/quote
        aware)."""
        pieces, depth, quote, cur = [], 0, None, []
        for ch in expr:
            if quote:
                cur.append(ch)
                if ch == quote:
                    quote = None
                continue
            if ch in "'\"":
                quote = ch
                cur.append(ch)
            elif ch in "([{":
                depth += 1
                cur.append(ch)
            elif ch in ")]}":
                depth -= 1
                cur.append(ch)
            elif ch == "+" and depth == 0:
                pieces.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        pieces.append("".join(cur).strip())
        return [p for p in pieces if p]

    sinks = re.findall(r"\.innerHTML\s*[+]?=\s*([^;\n]+)", FRONTEND_HTML)
    assert sinks, "expected innerHTML sinks in the SPA"
    for expr in sinks:
        expr = expr.strip()
        if re.fullmatch(r"''|\"\"|'[^']*'", expr):
            continue  # constant literal
        # any interpolated piece must come from esc(...) or be a literal
        for p in split_concat(expr):
            ok = (p.startswith("esc(") or p.startswith("'")
                  or p.startswith('"') or p in ("txt", "html"))
            assert ok, f"unescaped innerHTML piece: {p!r} in {expr!r}"
    # the two aggregate variables are themselves built from esc()'d parts
    assert "txt='<b>'+esc(" in FRONTEND_HTML.replace(" ", "")
    assert re.search(r"html\+='<tr>'\+cols\.map\(c=>'<td>'\+esc",
                     FRONTEND_HTML.replace("\n", ""))


def _stack():
    from archi_tpu.engine.vectorstore import TpuVectorStore
    from archi_tpu.orchestrator.archi import Archi
    from archi_tpu.pipelines.agents.agent_spec import AgentStore
    from archi_tpu.utils.app_db import AppDatabase
    from archi_tpu.utils.conversation_service import ConversationService
    from archi_tpu.utils.trace_service import TraceService
    from archi_tpu.utils.user_service import UserService
    from archi_tpu.web.chat_app import create_chat_app
    from archi_tpu.web.chat_wrapper import ChatWrapper
    from tests.unit.test_vectorstore import FakeEmbeddings
    import tempfile

    db = AppDatabase(":memory:")
    users = UserService(db)
    convs = ConversationService(db)
    traces = TraceService(db)
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["<script>alert(1)</script> fox content"],
                    [{"source": "a"}])
    archi = Archi("QAPipeline", vectorstore=store)
    wrapper = ChatWrapper(archi, convs, traces)
    app = create_chat_app(
        chat_wrapper=wrapper, conversations=convs, traces=traces,
        user_service=users, app_db=db,
        agent_store=AgentStore(tempfile.mkdtemp()),
    )
    return app, users, convs


def _req(method, path, headers=None, body=b""):
    from archi_tpu.web.framework import Request

    return Request(method, path, {}, headers or {}, body)


def test_script_content_survives_as_data_not_markup():
    """Stored content with script tags comes back as JSON data; the SPA's
    esc() renders it inert (audited above) — verify the API layer doesn't
    pre-render or strip it into ambiguity."""
    app, users, convs = _stack()
    r = app.router.dispatch(_req(
        "POST", "/api/get_chat_response",
        headers={"x-user-email": "u@x"},
        body=json.dumps({"message": "<img src=x onerror=alert(1)>"}).encode(),
    ))
    assert r.status == 200
    data = json.loads(r.body)  # valid JSON; payload is plain string data
    cid = data["conversation_id"]
    msgs = json.loads(app.router.dispatch(_req(
        "GET", f"/api/conversations/{cid}",
        headers={"x-user-email": "u@x"})).body)
    assert any("<img src=x onerror=alert(1)>" in m["content"] for m in msgs)


# ----------------------------------------------------------- API security
def test_protected_families_reject_underprivileged():
    app, users, _convs = _stack()
    users.create_user("pleb@x")  # role: user
    hdr = {"x-user-email": "pleb@x"}
    cases = [
        ("POST", "/api/admin/db", b'{"sql": "SELECT 1"}'),
        ("GET", "/api/admin/db/tables", b""),
        ("PUT", "/api/v2/config", b'{"verbosity": 0}'),
        ("POST", "/api/agents", b'{"name": "x", "prompt": "p"}'),
        ("DELETE", "/api/agents/x", b""),
        ("PUT", "/api/agents/active", b'{"name": "x"}'),
        ("PUT", "/api/v2/prompts/p", b'{"content": "c"}'),
        ("GET", "/api/v2/analytics/models", b""),
    ]
    for method, path, body in cases:
        resp = app.router.dispatch(_req(method, path, headers=hdr,
                                        body=body))
        assert resp.status == 403, (method, path, resp.status)


def test_sql_injection_attempts_rejected():
    app, users, _convs = _stack()
    users.create_user("adm@x", roles=["admin"])
    hdr = {"x-user-email": "adm@x"}
    for sql in (
        "select 1; DROP TABLE users",
        "DELETE FROM users",
        "select 1 UNION select password_hash from users; --",  # has ';'
        "PRAGMA writable_schema=1",
    ):
        resp = app.router.dispatch(_req(
            "POST", "/api/admin/db", headers=hdr,
            body=json.dumps({"sql": sql}).encode()))
        assert resp.status == 400, sql
    # users table is intact
    ok = app.router.dispatch(_req(
        "POST", "/api/admin/db", headers=hdr,
        body=b'{"sql": "SELECT COUNT(*) AS n FROM users"}'))
    assert ok.status == 200


def test_agent_name_path_traversal_rejected():
    app, users, _convs = _stack()
    users.create_user("adm@x", roles=["admin"])
    hdr = {"x-user-email": "adm@x"}
    for name in ("../../etc/passwd", "..", "a/b", "-", ""):
        resp = app.router.dispatch(_req(
            "POST", "/api/agents", headers=hdr,
            body=json.dumps({"name": name, "prompt": "p"}).encode()))
        assert resp.status == 400, name
