"""Suite JSON (de)serialization — same JSON shape as the reference's
ExpectationSuite files (ref: core/expectation_suite.py)."""

from __future__ import annotations

import json

from .model import ExpectationSuite


def save_suite(suite: ExpectationSuite, path: str) -> None:
    with open(path, "w") as f:
        json.dump(suite.to_dict(), f, indent=1)


def load_suite(path: str) -> ExpectationSuite:
    with open(path) as f:
        return ExpectationSuite.from_dict(json.load(f))
