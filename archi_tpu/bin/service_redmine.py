"""Redmine-side ticket-processing entrypoint (reference
``src/bin/service_redmine.py``): poll the tracker, draft agent replies on
new issues, notify reporters on resolved issues.  The IMAP-side companion is
``service_mailbox``.

Env: REDMINE_URL, REDMINE_API_KEY, REDMINE_PROJECT, SMTP_* (optional),
POLL_SECONDS.
"""

from __future__ import annotations

import os
import sys
import time

from archi_tpu.bin.bootstrap import build_context
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.web.redmine_mailer import (
    MailSender, RedmineIssueProcessor, RedmineWriteClient,
)


def make_list_issues(base_url: str, api_key: str, project_id: str):
    def list_issues(status: str) -> list[dict]:
        import requests

        status_id = {"open": "open", "resolved": "3"}.get(status, status)
        r = requests.get(
            f"{base_url.rstrip('/')}/issues.json",
            headers={"X-Redmine-API-Key": api_key},
            params={"project_id": project_id, "status_id": status_id,
                    "include": "journals", "limit": 50},
            timeout=30,
        )
        r.raise_for_status()
        return r.json().get("issues", [])

    return list_issues


def main() -> None:
    ctx = build_context(sys.argv[1:])
    base_url = os.environ.get("REDMINE_URL", "")
    api_key = os.environ.get("REDMINE_API_KEY", "")
    project = os.environ.get("REDMINE_PROJECT", "support")
    agent = Archi("CMSCompOpsAgent", config=ctx.config,
                  vectorstore=ctx.vectorstore)
    sender = None
    if os.environ.get("SMTP_HOST"):
        sender = MailSender(os.environ["SMTP_HOST"],
                            user=os.environ.get("SMTP_USER", ""),
                            password=os.environ.get("SMTP_PW", ""))
    proc = RedmineIssueProcessor(
        list_issues=make_list_issues(base_url, api_key, project),
        redmine_client=RedmineWriteClient(base_url, api_key=api_key),
        agent_archi=agent,
        sender=sender,
        project_id=project,
    )
    poll = float(os.environ.get("POLL_SECONDS", "120"))
    print("redmine issue processor polling")
    while True:
        proc.step()
        time.sleep(poll)


if __name__ == "__main__":
    main()
