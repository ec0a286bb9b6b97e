"""Data-manager service entrypoint (reference
``src/bin/service_data_manager.py:23``): start the scheduler, kick an
initial async ingestion, serve the uploader/catalog API.
"""

from __future__ import annotations

import sys
import threading

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.pipelines.agents.tools.catalog_tools import CatalogClient
from archi_tpu.web.data_app import create_data_app


def build_app(config_paths=(), overrides=None, ctx=None,
              *, initial_ingestion: bool = True):
    import os

    ctx = ctx or build_context(config_paths, overrides)
    dm = ctx.data_manager
    client = CatalogClient(ctx.catalog, dm.persistence)
    app = create_data_app(
        data_manager=dm,
        scheduler=ctx.scheduler,
        catalog_client=client,
        config_service=ctx.config_service,
        auth_token=os.environ.get("DATA_MANAGER_TOKEN"),
    )
    ctx.scheduler.start()
    if initial_ingestion:
        import os

        checkpoint_dir = os.path.join(
            ctx.config["data_manager"]["data_path"], "engine_checkpoint"
        )

        def ingest_then_warm():
            # hold the reported status at "warming" until the query path is
            # compiled: clients (the chat proxy, benchmarks, smoke) gate on
            # status == "done", and a first query stacked behind minutes of
            # remote-tunnel compiles otherwise times out at the remote-store
            # client (observed: smoke chat turn 500s on a cold deployment)
            dm.hold_status("warming")
            try:
                result = dm.run_ingestion()
                if result.get("added") or result.get("removed") or \
                        not os.path.isdir(checkpoint_dir):
                    # checkpoint so a restart resumes without re-embedding
                    try:
                        ctx.vectorstore.save(checkpoint_dir)
                    except Exception:
                        pass
                # pre-compile the query path (first jit through a
                # remote-compile tunnel can take minutes; don't make the
                # first user pay it)
                ctx.vectorstore.warmup(
                    k=ctx.config.get("data_manager", {}).get(
                        "retrievers", {}).get("hybrid_retriever", {}).get(
                        "num_documents_to_retrieve", 5))
            finally:
                dm.release_status()

        threading.Thread(target=ingest_then_warm, daemon=True,
                         name="initial-ingestion").start()
    return app, ctx


def main() -> None:
    app, ctx = build_app(sys.argv[1:])
    svc = ctx.config["services"]["data_manager"]
    print(f"data-manager service on {svc['host']}:{svc['port']}")
    app.serve(svc["host"], svc["port"])


if __name__ == "__main__":
    main()
