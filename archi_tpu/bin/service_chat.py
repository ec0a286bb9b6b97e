"""Chat service entrypoint (reference ``src/bin/service_chat.py:14``).

Usage: python -m archi_tpu.bin.service_chat [config.yaml ...]
"""

from __future__ import annotations

import os
import sys

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.web.chat_app import create_chat_app
from archi_tpu.web.chat_wrapper import ChatWrapper
from archi_tpu.web.frontend import FRONTEND_HTML


def build_app(config_paths=(), overrides=None, ctx=None):
    ctx = ctx or build_context(config_paths, overrides)
    pipeline = ctx.config.get("active_pipeline", "QAPipeline")
    archi = Archi(pipeline, config=ctx.config, vectorstore=ctx.vectorstore)
    wrapper = ChatWrapper(
        archi, ctx.conversations, ctx.traces,
        source_score_threshold=ctx.config.get("chat", {}).get(
            "source_score_threshold", 0.0),
        byok_resolver=ctx.byok_resolver,
    )
    app = create_chat_app(
        chat_wrapper=wrapper,
        conversations=ctx.conversations,
        traces=ctx.traces,
        config_service=ctx.config_service,
        user_service=ctx.users,
        byok_store=ctx.byok_store,
        jwt_secret=os.environ.get("JWT_SECRET"),
        require_auth=bool(os.environ.get("REQUIRE_AUTH")),
        frontend_html=FRONTEND_HTML,
    )
    return app, ctx


def main() -> None:
    import threading

    app, ctx = build_app(sys.argv[1:])
    svc = ctx.config["services"]["chat"]
    # pre-compile the query path off the request path (first jit through a
    # remote-compile tunnel can take minutes and would hold the chat lock)
    threading.Thread(target=ctx.vectorstore.warmup, daemon=True,
                     name="engine-warmup").start()
    print(f"chat service on {svc['host']}:{svc['port']}")
    app.serve(svc["host"], svc["port"])


if __name__ == "__main__":
    main()
