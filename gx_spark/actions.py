"""Checkpoint validation actions (ref: GE checkpoint/actions.py —
StoreValidationResultAction / SlackNotificationAction / EmailAction etc.).

An action is any callable taking one JSON-able payload dict.  The runner
fires every action after each validated partition
(`event="partition_validated"`) and once at run end (`event="run_end"`);
a raising action is logged and never fails the validation run — the
results/violations/manifest writes already happened.

The genuinely external transports (Slack/email/OpsGenie) are represented
by WebhookAction: it performs a real HTTP POST via stdlib urllib when a
network exists and degrades to a logged warning when it doesn't (this
sandbox), so the interface, payload shape, and wiring are all real and
testable while the socket is the only stubbed part.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable

log = logging.getLogger("gx_spark.actions")

ValidationAction = Callable[[dict], None]


class NoOpAction:
    """Placeholder action — useful to keep a checkpoint config's action
    list shape while disabling a transport."""

    def __call__(self, payload: dict) -> None:
        return None


class LogAction:
    """Log each payload at INFO (the default visibility action)."""

    def __init__(self, level: int = logging.INFO) -> None:
        self.level = level

    def __call__(self, payload: dict) -> None:
        log.log(self.level, "gx_spark validation event: %s",
                json.dumps(payload, sort_keys=True, default=str))


class FileAction:
    """Append each payload as one JSONL line — the durable local form of a
    notification channel (tail it, ship it, or diff it in tests)."""

    def __init__(self, path: str) -> None:
        self.path = path
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)

    def __call__(self, payload: dict) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(payload, sort_keys=True, default=str) + "\n")


class WebhookAction:
    """POST each payload as JSON to a webhook URL (the Slack/OpsGenie
    transport shape).  Network failures are logged, never raised —
    notification must not fail the run."""

    def __init__(self, url: str, timeout_s: float = 5.0) -> None:
        self.url = url
        self.timeout_s = timeout_s

    def format_body(self, payload: dict) -> bytes:
        return json.dumps(payload, sort_keys=True, default=str).encode()

    def __call__(self, payload: dict) -> None:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.url, data=self.format_body(payload),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s):
                pass
        except (urllib.error.URLError, OSError, ValueError) as e:
            log.warning("webhook action to %s failed: %s", self.url, e)


class SlackNotificationAction(WebhookAction):
    """GE-style Slack notification: same webhook transport, Slack
    `text` + blocks body, optional notify_on filter ('all'/'failure'/
    'success')."""

    def __init__(self, url: str, notify_on: str = "all",
                 timeout_s: float = 5.0) -> None:
        super().__init__(url, timeout_s)
        if notify_on not in ("all", "failure", "success"):
            raise ValueError(f"bad notify_on {notify_on!r}")
        self.notify_on = notify_on

    def format_body(self, payload: dict) -> bytes:
        ok = bool(payload.get("success"))
        icon = ":white_check_mark:" if ok else ":x:"
        text = (f"{icon} gx_spark {payload.get('event')} — suite "
                f"{payload.get('suite_name')!r} "
                f"{'passed' if ok else 'FAILED'} "
                f"(run {payload.get('run_id')}, snapshot "
                f"{payload.get('snapshot_id')}, partition "
                f"{payload.get('partition_id', 'all')})")
        return json.dumps({"text": text, "payload": payload},
                          sort_keys=True, default=str).encode()

    def __call__(self, payload: dict) -> None:
        ok = bool(payload.get("success"))
        if self.notify_on == "failure" and ok:
            return
        if self.notify_on == "success" and not ok:
            return
        super().__call__(payload)


def parse_actions(spec: str | None) -> list[ValidationAction]:
    """CLI form: 'log,file:/x/notify.jsonl,webhook:https://...,noop'."""
    out: list[ValidationAction] = []
    for raw in (spec or "").split(","):
        s = raw.strip()
        if not s:
            continue
        if s == "log":
            out.append(LogAction())
        elif s == "noop":
            out.append(NoOpAction())
        elif s.startswith("file:"):
            out.append(FileAction(s[5:]))
        elif s.startswith("webhook:"):
            out.append(WebhookAction(s[8:]))
        elif s.startswith("slack:"):
            out.append(SlackNotificationAction(s[6:]))
        else:
            raise ValueError(f"unknown action spec {s!r}")
    return out


def fire_actions(actions, payload: dict) -> None:
    """Run every action; log-and-continue on failure (an unreachable
    webhook must never fail or re-run a validated partition)."""
    for a in actions or ():
        try:
            a(payload)
        except Exception as e:  # noqa: BLE001 — isolation is the contract
            log.warning("validation action %r failed: %s", a, e)
