"""Mattermost bot entrypoint (reference ``src/bin/service_mattermost.py``)."""

from __future__ import annotations

import os
import sys

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.web.bots import MattermostBot


def main() -> None:
    ctx = build_context(sys.argv[1:])
    archi = Archi(ctx.config.get("active_pipeline", "QAPipeline"),
                  config=ctx.config, vectorstore=ctx.vectorstore)
    bot = MattermostBot(
        archi,
        base_url=os.environ.get("MATTERMOST_URL", ""),
        token=os.environ.get("MATTERMOST_TOKEN", ""),
        channel_id=os.environ.get("MATTERMOST_CHANNEL", ""),
        poll_seconds=float(os.environ.get("POLL_SECONDS", "60")),
    )
    print("mattermost bot polling")
    bot.run_forever()


if __name__ == "__main__":
    main()
