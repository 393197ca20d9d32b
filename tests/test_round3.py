"""Round-3 regressions: bounded exact value_counts, de-windowed LSH bucket
cap, chi-square out-of-set mass as failing evidence."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, ops, validate  # noqa: E402
from gx_spark.plancheck import count_nodes, formatted_plan  # noqa: E402


def test_exact_kl_bounded_on_high_cardinality(spark):
    """Exact-mode categorical KL collects |partition values|+1 counters,
    never every distinct value: a 100k-cardinality column completes with a
    fixed-size driver transfer and the exact divergence."""
    n = 100_000
    df = spark.range(n).select(
        F.when(F.col("id") % 4 == 0, F.lit("a"))
        .when(F.col("id") % 4 == 1, F.lit("b"))
        .otherwise(F.concat(F.lit("rare_"), F.col("id").cast("string")))
        .alias("v")
    )
    po = {"values": ["a", "b"], "weights": [0.5, 0.5]}
    suite = ExpectationSuite("kl").add(
        "expect_column_kl_divergence_to_be_less_than",
        column="v", partition_object=po, threshold=10.0,
        tail_weight_holdout=0.5,
    )
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    r = b.suite_result.results[0]
    # ground truth: p = [0.25, 0.25, 0.5 unlisted], q = [0.25, 0.25, 0.5]
    assert r.result["observed_value"] == pytest.approx(0.0, abs=1e-12)
    assert r.success
    det = r.result["details"]["observed_partition"]
    assert det["unlisted_weight"] == pytest.approx(0.5)


def test_minhash_jaccard_bucket_cap_single_signature_pass(spark):
    """The bucket cap must not re-execute the minhash-signature subplan.
    Round 3 first tried a sig-free census + broadcast anti-join — zero
    Window nodes, but the census re-ran the whole signature computation
    (uncached lineage) and measured 13 -> 21 s on the sf0.1 bench.  The
    window count computes signatures ONCE and its partitionBy(band,
    bucket) exchange is the partitioning the bucket self-join needs
    anyway, so the invariant to pin is: exactly ONE xxhash64 signature
    subplan per join side, no extra aggregate-based census."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    plan = formatted_plan(ops.minhash_jaccard(docs, "doc_id", "text", threshold=0.2))
    # the census design's fingerprint: a (band,bucket)-count aggregate fed
    # into a broadcast LEFT ANTI join — must be absent
    assert "LeftAnti" not in plan, plan
    # cap rides the join's own exchange: at most one Window per join side
    assert 0 < count_nodes(plan, "Window") <= 2, plan


def test_lsh_bucket_cap_still_bounds_boilerplate(spark):
    """>cap identical docs share every band bucket -> those buckets are
    dropped (no quadratic pair blow-up), while genuine near-dups elsewhere
    still pair up."""
    boiler = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(1100)]
    pairs_docs = [
        (2000, "unique tokens one two three four five six"),
        (2001, "unique tokens one two three four five seven"),
    ]
    df = spark.createDataFrame(boiler + pairs_docs, "doc_id long, text string")
    got = ops.minhash_jaccard(df, "doc_id", "text", shingle_k=1, threshold=0.5).collect()
    ids = {(r["id_a"], r["id_b"]) for r in got}
    assert (2000, 2001) in ids
    assert all(a >= 2000 for a, _ in ids), "boilerplate bucket not capped"


def test_chisquare_out_of_set_mass_fails_without_holdout(spark):
    """A column dominated by unknown categories must fail even when the
    in-set proportions match the weights exactly (ADVICE r2)."""
    rows = (
        [("a",)] * 50 + [("b",)] * 50          # in-set: exactly the weights
        + [(f"junk_{i}",) for i in range(900)]  # 90% out-of-set
    )
    df = spark.createDataFrame(rows, "v string")
    po = {"values": ["a", "b"], "weights": [0.5, 0.5]}
    suite = ExpectationSuite("chi").add(
        "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="v", partition_object=po, p=0.05,
    )
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    r = b.suite_result.results[0]
    assert not r.success
    assert r.result["observed_value"] == 0.0
    assert r.result["details"]["observed_out_of_set"] == 900
    assert math.isinf(r.result["details"]["chi_squared"])
    # with a holdout the same data is judged against the configured tail
    suite2 = ExpectationSuite("chi2").add(
        "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="v", partition_object=po, p=0.05, tail_weight_holdout=0.9,
    )
    b2 = validate(spark, df, suite2, EngineOptions(collect_violations=False))
    assert b2.suite_result.results[0].success


def test_unexpected_index_query_complete(spark):
    """COMPLETE-tier map results carry GE's `unexpected_index_query` key
    (SURVEY Appendix A): a `df.filter(F.expr(<sql>))` string whose condition
    re-derives the unexpected rows; lower tiers omit it; zero-violation
    expectations still report their query."""
    import ast
    import re

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz"), (4, None)], "id int, v string"
    )
    suite = ExpectationSuite("uiq").add(
        "expect_column_values_to_be_in_set", column="v",
        value_set=["a", "b"], result_format="COMPLETE",
    ).add(
        "expect_column_values_to_not_be_null", column="id",
        result_format="COMPLETE",
    ).add(
        "expect_column_value_lengths_to_be_between", column="v",
        min_value=1, max_value=5, result_format="BASIC",
    )
    b = validate(
        spark, df, suite,
        EngineOptions(unexpected_index_column_names=("id",)),
    )
    in_set, not_null, basic = b.suite_result.results
    q = in_set.result["unexpected_index_query"]
    m = re.fullmatch(r"df\.filter\(F\.expr\((.*)\)\)", q, re.S)
    assert m, q
    cond_sql = ast.literal_eval(m.group(1))
    assert df.filter(F.expr(cond_sql)).count() == 1  # the 'zz' row
    # zero-violation expectation still reports its query
    assert not_null.success
    assert "unexpected_index_query" in not_null.result
    # BASIC tier omits the key
    assert "unexpected_index_query" not in basic.result
    b.unpersist()
