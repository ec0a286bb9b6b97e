"""Grader service entrypoint (reference ``src/bin/service_grader.py``)."""

from __future__ import annotations

import sys

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.web.grader_app import create_grader_app


def build_app(config_paths=(), overrides=None, ctx=None):
    ctx = ctx or build_context(config_paths, overrides)
    grading = Archi("GradingPipeline", config=ctx.config,
                    vectorstore=ctx.vectorstore)
    image = Archi("ImageProcessingPipeline", config=ctx.config,
                  vectorstore=ctx.vectorstore)
    return create_grader_app(grading_archi=grading, image_archi=image,
                             app_db=ctx.app_db), ctx


def main() -> None:
    app, ctx = build_app(sys.argv[1:])
    svc = ctx.config["services"]["grader"]
    print(f"grader service on {svc.get('host', '0.0.0.0')}:{svc['port']}")
    app.serve(svc.get("host", "0.0.0.0"), svc["port"])


if __name__ == "__main__":
    main()
