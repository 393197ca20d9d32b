"""PII expectation (north-rule extension; no single upstream analog —
GE ships regex expectations, and public curation pipelines (BigScience
ROOTS, Presidio-style scrubbers) run exactly this check before release:
no document may carry more than a bounded number of PII-shaped spans.

Per-row map condition over ops.PII_PATTERNS — a pure JVM-side
regexp_count sum, so it fuses into the stage-1 aggregate like any other
map expectation and adds nothing to the shuffle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..ops import pii_count_expr
from ..registry import register_expectation
from .base import ColumnMapExpectation


@register_expectation("expect_column_pii_count_to_be_below")
class PiiCountBelow(ColumnMapExpectation):
    """Unexpected when a row's text holds >= max_count PII-shaped spans
    (default 1 — any detected PII flags the row).  `classes` restricts
    detection to a subset of ops.PII_PATTERNS (email/phone/ipv4/ccard)."""

    metric_name = "column_values.pii_count"

    examples = [{
        "data": {"t": [
            "plain text, nothing to see",
            "reach me at jane.doe+spam@example.org today",
            "card 4111 1111 1111 1111 exp 11/29",
            "from 10.0.0.1 call 415-555-0123",
        ]},
        "schema": "t string",
        "tests": [
            {"title": "any PII flags the row",
             "in": {"column": "t"},
             "out": {"success": False, "unexpected_count": 3}},
            {"title": "threshold 2 tolerates single-span rows",
             "in": {"column": "t", "max_count": 2},
             "out": {"success": False, "unexpected_count": 1}},
            {"title": "email class only",
             "in": {"column": "t", "classes": ["email"]},
             "out": {"success": False, "unexpected_count": 1}},
        ],
    }]

    def unexpected_condition(self, cfg, ctx) -> Column:
        k = cfg.kwargs
        thr = int(k.get("max_count", 1))
        # pii_count_expr validates `classes` (unknown names and an empty
        # list raise), so the same config errors surface identically here
        # and in ops.pii_stats/redact_pii
        return pii_count_expr(F.col(k["column"]), k.get("classes")) >= F.lit(thr)

    def observed_expr(self, cfg) -> Column:
        return pii_count_expr(
            F.col(cfg.kwargs["column"]), cfg.kwargs.get("classes"))
