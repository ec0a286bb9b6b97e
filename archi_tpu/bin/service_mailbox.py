"""Redmine mailer entrypoint (reference ``src/bin/service_mailbox.py`` +
``service_redmine.py``)."""

from __future__ import annotations

import os
import sys
import time

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.web.redmine_mailer import (
    Mailbox, MailSender, RedmineMailer, RedmineWriteClient,
)


def main() -> None:
    ctx = build_context(sys.argv[1:])
    agent = Archi("CMSCompOpsAgent", config=ctx.config,
                  vectorstore=ctx.vectorstore)
    mailer = RedmineMailer(
        mailbox=Mailbox(os.environ.get("IMAP_HOST", ""),
                        os.environ.get("IMAP_USER", ""),
                        os.environ.get("IMAP_PW", "")),
        sender=MailSender(os.environ.get("SMTP_HOST", ""),
                          user=os.environ.get("SMTP_USER", ""),
                          password=os.environ.get("SMTP_PW", "")),
        redmine_client=RedmineWriteClient(
            os.environ.get("REDMINE_URL", ""),
            api_key=os.environ.get("REDMINE_API_KEY", "")),
        agent_archi=agent,
        project_id=os.environ.get("REDMINE_PROJECT", "support"),
    )
    poll = float(os.environ.get("POLL_SECONDS", "120"))
    print("redmine mailer polling")
    while True:
        mailer.step()
        time.sleep(poll)


if __name__ == "__main__":
    main()
