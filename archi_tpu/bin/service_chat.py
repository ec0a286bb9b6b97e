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


def resolve_engine_url(config: dict) -> str | None:
    """Standalone chat processes query the data-manager's TPU index over
    HTTP (the engine's serving surface) instead of holding their own copy.
    Explicit ``services.chat.engine_url`` wins; else derive it from the
    enabled data_manager service."""
    chat_cfg = config.get("services", {}).get("chat", {})
    if chat_cfg.get("engine_url"):
        return chat_cfg["engine_url"]
    dm = config.get("services", {}).get("data_manager", {})
    if dm.get("enabled") and dm.get("port"):
        host = dm.get("host", "127.0.0.1")
        if host in ("0.0.0.0", ""):
            host = "127.0.0.1"
        return f"http://{host}:{dm['port']}"
    return None


def make_agent_resolver(agent_store, config_service, config, vectorstore):
    """() → Optional[Archi] for the dynamic-config ``active_agent``.

    Caches the built agent per (name, spec mtime) so selecting an agent
    over HTTP (PUT /api/agents/active) takes effect on the next message
    without paying a rebuild per request."""
    cache: dict = {}

    def resolver():
        name = None
        if config_service is not None:
            name = config_service.get("active_agent")
        if not name:
            return None
        spec = agent_store.get(name)
        if spec is None:
            return None
        mtime = os.path.getmtime(spec.source_path) if spec.source_path else 0
        key = (name, mtime)
        if cache.get("key") != key:
            from archi_tpu.pipelines.agents.toolbox import agent_from_spec

            agent = agent_from_spec(spec, config)
            archi = Archi("BaseReActAgent", config=config,
                          vectorstore=vectorstore)
            archi.pipeline = agent  # the spec-configured instance
            cache["key"] = key
            cache["archi"] = archi
        return cache["archi"]

    return resolver


def build_app(config_paths=(), overrides=None, ctx=None, *,
              remote_engine: bool = False):
    if ctx is None and remote_engine:
        from archi_tpu.config.manager import ConfigurationManager
        from archi_tpu.engine.remote_vectorstore import RemoteVectorStore

        cm = ConfigurationManager(config_paths, overrides)
        url = resolve_engine_url(cm.config)
        vs = RemoteVectorStore(
            url, auth_token=os.environ.get("DATA_MANAGER_TOKEN")
        ) if url else None
        ctx = build_context(config_paths, overrides, vectorstore=vs)
    ctx = ctx or build_context(config_paths, overrides)
    pipeline = ctx.config.get("active_pipeline", "QAPipeline")
    archi = Archi(pipeline, config=ctx.config, vectorstore=ctx.vectorstore)

    from archi_tpu.pipelines.agents.agent_spec import AgentStore

    agents_dir = os.path.join(
        ctx.config["data_manager"]["data_path"], "agents")
    agent_store = AgentStore(agents_dir)
    wrapper = ChatWrapper(
        archi, ctx.conversations, ctx.traces,
        source_score_threshold=ctx.config.get("chat", {}).get(
            "source_score_threshold", 0.0),
        byok_resolver=ctx.byok_resolver,
        catalog=ctx.catalog,
        agent_resolver=make_agent_resolver(
            agent_store, ctx.config_service, ctx.config, ctx.vectorstore),
    )
    app = create_chat_app(
        chat_wrapper=wrapper,
        conversations=ctx.conversations,
        traces=ctx.traces,
        config_service=ctx.config_service,
        user_service=ctx.users,
        byok_store=ctx.byok_store,
        catalog=ctx.catalog,
        app_db=ctx.app_db,
        agent_store=agent_store,
        prompt_service=ctx.prompts,
        data_manager_url=resolve_engine_url(ctx.config),
        data_manager_token=os.environ.get("DATA_MANAGER_TOKEN"),
        jwt_secret=os.environ.get("JWT_SECRET"),
        require_auth=bool(os.environ.get("REQUIRE_AUTH")),
        frontend_html=FRONTEND_HTML,
    )
    return app, ctx


def main() -> None:
    import threading

    app, ctx = build_app(sys.argv[1:], remote_engine=True)
    svc = ctx.config["services"]["chat"]
    # pre-compile the query path off the request path (first jit through a
    # remote-compile tunnel can take minutes and would hold the chat lock)
    threading.Thread(target=ctx.vectorstore.warmup, daemon=True,
                     name="engine-warmup").start()
    print(f"chat service on {svc['host']}:{svc['port']}")
    app.serve(svc["host"], svc["port"])


if __name__ == "__main__":
    main()
