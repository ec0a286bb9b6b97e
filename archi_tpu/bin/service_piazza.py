"""Piazza bot entrypoint (reference ``src/bin/service_piazza.py``)."""

from __future__ import annotations

import os
import sys

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.web.bots import PiazzaBot


def main() -> None:
    ctx = build_context(sys.argv[1:])
    archi = Archi(ctx.config.get("active_pipeline", "QAPipeline"),
                  config=ctx.config, vectorstore=ctx.vectorstore)
    bot = PiazzaBot(
        archi,
        network_id=os.environ.get("PIAZZA_NETWORK_ID", ""),
        slack_webhook=os.environ.get("SLACK_WEBHOOK"),
        poll_seconds=float(os.environ.get("POLL_SECONDS", "60")),
    )
    print("piazza bot polling")
    bot.run_forever()


if __name__ == "__main__":
    main()
