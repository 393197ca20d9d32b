"""Substring-level exact dedup (ops.dedup_spans — Lee et al. 2022
ExactSubstr as positional k-gram span marking): winner-keeps-first
semantics, overlap merging, pure-copy nulling, short-doc passthrough,
parallelism independence, and the bounded plan shape."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.ops import dedup_spans  # noqa: E402

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog again and again ok"),
    (2, "intro text the quick brown fox jumps over the lazy dog closing"
        " words here"),
    (3, "the quick brown fox jumps over the lazy dog again and again ok"),
    (4, "short doc"),
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
]


def _run(spark, rows=ROWS, k=8, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if parts:
        df = df.repartition(parts)
    return {r["doc_id"]: r for r in
            dedup_spans(df, "doc_id", "text", k=k).collect()}


def test_winner_keeps_losers_cut(spark):
    out = _run(spark)
    # doc 1 is the global first occurrence of every duplicated gram
    assert out[1]["n_removed"] == 0 and out[1]["n_dup_occurrences"] == 0
    assert out[1]["text_deduped"] == ROWS[0][1]
    # doc 2 embeds the 9-word span -> two overlapping 8-grams flagged,
    # their union (9 words) removed; surrounding unique words survive
    assert out[2]["n_dup_occurrences"] == 2
    assert out[2]["n_removed"] == 9
    assert out[2]["text_deduped"] == "intro text closing words here"
    # doc 3 is a pure copy -> every word covered, text is NULL
    assert out[3]["n_removed"] == out[3]["n_words"] == 13
    assert out[3]["text_deduped"] is None
    # docs shorter than k / unique docs pass through unchanged
    assert out[4]["text_deduped"] == "short doc" and out[4]["n_removed"] == 0
    assert out[5]["n_removed"] == 0


def test_within_doc_repetition_cut(spark):
    words = "one two three four five six seven eight"
    doc = f"{words} filler {words}"
    out = _run(spark, rows=[(1, doc)], k=8)
    # the second occurrence of the 8-gram inside the SAME doc is the loser
    assert out[1]["n_dup_occurrences"] == 1
    assert out[1]["n_removed"] == 8
    assert out[1]["text_deduped"] == f"{words} filler"


def test_parallelism_independent(spark):
    a = _run(spark, parts=1)
    b = _run(spark, parts=7)
    assert a == b


def test_k_guard(spark):
    with pytest.raises(ValueError, match="k must be"):
        dedup_spans(spark.createDataFrame(ROWS, "doc_id long, text string"),
                    "doc_id", "text", k=1)


def test_whitespace_normalized(spark):
    out = _run(spark, rows=[(1, "  a   b\tc  ")], k=2)
    assert out[1]["n_words"] == 3
    assert out[1]["text_deduped"] == "a b c"


def test_plan_shape(spark):
    """The heavy text column crosses the wire only as (doc_id, pos)
    pairs + 32-char md5 keys: no CartesianProduct, no global sort, and
    no Exchange carrying the raw text column."""
    from gx_spark.plancheck import formatted_plan

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = formatted_plan(dedup_spans(df, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    # every Exchange key set is doc_id or the md5 gram key — never text
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, plan
