"""PII detection / redaction: planted-fixture counts recomputed with
Python re, full-redaction and idempotence properties, the map-only plan
pin, and the expectation's EVR semantics."""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark.ops import (  # noqa: E402
    PII_PATTERNS,
    pii_stats,
    redact_pii,
)

ROWS = [
    (0, "no pii here, just words and numbers like 12 or 999"),
    (1, "mail me: a.b-c_d+e%f@sub.example.co and x@y.io thanks"),
    (2, "call 415-555-0123 or 212.555.9876 x99"),
    (3, "server at 10.0.0.1 and backup at 192.168.100.200"),
    (4, "card 4111 1111 1111 1111 and 1234-5678-9012-345"),
    (5, "combo: bob@corp.net from 8.8.8.8 dialed 650 555 0000"),
    (6, ""),
    (7, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _py_counts(text):
    if text is None:
        return None
    return {name: len(re.findall(pat, text))
            for name, pat in PII_PATTERNS.items()}


def test_pii_stats_matches_python_re(docs):
    out = pii_stats(docs, "doc_id", "text")
    got = {r.doc_id: r.asDict() for r in out.collect()}
    assert len(got) == len(ROWS)
    for doc_id, text in ROWS:
        want = _py_counts(text)
        row = got[doc_id]
        if want is None:
            assert row["n_pii"] is None and row["has_pii"] is None
            continue
        for name, n in want.items():
            assert row[f"n_{name}"] == n, (doc_id, name)
        assert row["n_pii"] == sum(want.values())
        assert row["has_pii"] == (sum(want.values()) > 0)
    # the planted fixtures exercise every class at least once
    totals = {name: sum((_py_counts(t) or {}).get(name, 0)
                        for _, t in ROWS) for name in PII_PATTERNS}
    assert all(v > 0 for v in totals.values()), totals


def test_pii_stats_is_map_only(docs):
    plan = (pii_stats(docs, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_redact_removes_all_and_is_idempotent(docs, spark):
    red = redact_pii(docs, "text", out_col="clean")
    rows = {r.doc_id: r for r in
            pii_stats(red, "doc_id", "clean").collect()}
    for doc_id, text in ROWS:
        if text is None:
            continue
        assert rows[doc_id]["n_pii"] == 0, (doc_id, text)
    # idempotent: redacting the redaction changes nothing
    twice = redact_pii(red, "clean", out_col="clean2")
    for r in twice.collect():
        assert r.clean2 == r.clean
    # non-PII text passes through verbatim
    got0 = {r.doc_id: r.clean for r in red.collect()}
    assert got0[0] == ROWS[0][1]
    assert "[PII]" in got0[1] and "@" not in got0[1]


def test_pii_expectation_evr(docs, spark):
    suite = (
        ExpectationSuite("pii")
        .add("expect_column_pii_count_to_be_below", column="text")
        .add("expect_column_pii_count_to_be_below", column="text",
             max_count=10)
        .add("expect_column_pii_count_to_be_below", column="text",
             classes=["email"], mostly=0.7)
    )
    bundle = validate(spark, docs, suite,
                      EngineOptions(collect_violations=True))
    r0, r1, r2 = bundle.suite_result.results
    n_pii_docs = sum(1 for _, t in ROWS
                     if t and sum(_py_counts(t).values()) >= 1)
    assert not r0.success and r0.result["unexpected_count"] == n_pii_docs
    assert r1.success and r1.result["unexpected_count"] == 0
    # 2 of 7 non-null docs carry email (<= 30% unexpected) -> mostly 0.7 ok
    assert r2.success and r2.result["unexpected_count"] == 2
    # unknown class -> planning error captured as an exception EVR
    # (catch_exceptions contract), not a silent pass
    bad = validate(spark, docs,
                   ExpectationSuite("bad").add(
                       "expect_column_pii_count_to_be_below",
                       column="text", classes=["ssn"]),
                   EngineOptions())
    evr = bad.suite_result.results[0]
    assert not evr.success
    assert "unknown PII classes" in evr.exception_info["exception_message"]


def test_suggest_suite_emits_pii_screen(docs, spark):
    """Profiler PII rule: long-text columns get the screen; a batch with
    planted PII gets a backed-off `mostly` and the emitted suite still
    passes on its own profiling batch; a clean long-text batch gets the
    strict form; short-string columns are never screened."""
    from gx_spark.profile import suggest_suite

    pad = "x" * 90  # force the long-text threshold
    filler = spark.createDataFrame(
        [(100 + i, f"clean filler prose number {i} {pad}")
         for i in range(13)], "doc_id long, text string")
    # 5 PII docs of 20 rows -> flagged fraction 0.25 (< the 0.5 cutoff)
    dirty = docs.filter("text is not null").selectExpr(
        "doc_id", f"concat(text, ' {pad}') as text").union(filler)
    suite = suggest_suite(dirty)
    pii_cfgs = [e for e in suite.expectations
                if e.expectation_type == "expect_column_pii_count_to_be_below"]
    assert len(pii_cfgs) == 1 and pii_cfgs[0].kwargs["column"] == "text"
    assert 0 < pii_cfgs[0].kwargs["mostly"] < 1
    bundle = validate(spark, dirty, suite, EngineOptions())
    assert all(r.success for r in bundle.suite_result.results), [
        (r.expectation_config.expectation_type, r.result)
        for r in bundle.suite_result.results if not r.success]

    clean = spark.createDataFrame(
        [(i, f"just ordinary prose with no sensitive spans at all {pad}")
         for i in range(4)], "doc_id long, text string")
    suite2 = suggest_suite(clean)
    cfg = next(e for e in suite2.expectations
               if e.expectation_type == "expect_column_pii_count_to_be_below")
    assert "mostly" not in cfg.kwargs
    short = spark.createDataFrame([(1, "a@b.io")], "doc_id long, s string")
    suite3 = suggest_suite(short)
    assert not [e for e in suite3.expectations
                if e.expectation_type == "expect_column_pii_count_to_be_below"]


def test_pii_classes_validated_consistently(docs):
    """classes=[] and unknown names raise in every PII API — an empty
    class set must never silently no-op a redaction (review r5)."""
    import pytest

    from gx_spark.ops import pii_count_expr

    for bad in ([], ["e-mail"]):
        with pytest.raises(ValueError):
            pii_count_expr("text", bad)
        with pytest.raises(ValueError):
            redact_pii(docs, "text", classes=bad)
    # subset still works end to end
    red = redact_pii(docs, "text", out_col="clean", classes=["email"])
    assert red.filter("clean rlike '@'").count() == 0


def test_pii_stats_counts_each_pattern_once(docs):
    """n_pii is the sum of the per-class COLUMNS, not a second scan: the
    analyzed plan must contain each pattern's regexp_count exactly once."""
    plan = pii_stats(docs, "doc_id", "text")._jdf.queryExecution() \
        .analyzed().toString()
    from gx_spark.ops import PII_PATTERNS
    for name in PII_PATTERNS:
        assert plan.count(f"n_{name}") >= 1
    assert plan.count("regexp_count") == len(PII_PATTERNS)
