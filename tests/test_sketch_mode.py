"""Sketch-mode tolerance tests (SURVEY.md §7 'Exact-vs-approx parity'):
exact mode pins fixtures; sketch mode must land within published sketch
error bounds (HLL lgK=12 → ~2-3% rel. error; percentile_approx accuracy
10000 → rank error 1e-4)."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402


@pytest.fixture(scope="module")
def big_df(spark):
    # 50k rows, ~20k distinct groups, known quantiles
    return spark.range(50_000).selectExpr(
        "id", "id % 20000 as grp", "cast(id as double) as v"
    )


def _observed(spark, df, etype, mode, **kwargs):
    b = validate(
        spark, df, ExpectationSuite("s").add(etype, **kwargs),
        EngineOptions(mode=mode, collect_violations=False),
    )
    r = b.suite_result.results[0]
    assert not r.exception_info["raised_exception"], r.exception_info
    return r.result["observed_value"]


def test_hll_distinct_count_within_bounds(spark, big_df):
    exact = _observed(spark, big_df, "expect_column_unique_value_count_to_be_between",
                      "exact", column="grp", min_value=0)
    sketch = _observed(spark, big_df, "expect_column_unique_value_count_to_be_between",
                       "sketch", column="grp", min_value=0)
    assert exact == 20000
    assert abs(sketch - exact) / exact < 0.03, (sketch, exact)


def test_sketch_quantiles_within_rank_error(spark, big_df):
    obs = _observed(
        spark, big_df, "expect_column_quantile_values_to_be_between", "sketch",
        column="v",
        quantile_ranges={"quantiles": [0.25, 0.5, 0.75]},
    )
    for q, v in zip(obs["quantiles"], obs["values"]):
        true = q * 49_999
        assert abs(v - true) <= 50_000 * 0.001 + 1, (q, v, true)


def test_sketch_median_and_proportion(spark, big_df):
    med = _observed(spark, big_df, "expect_column_median_to_be_between",
                    "sketch", column="v", min_value=0)
    assert abs(med - 25_000) < 200
    prop = _observed(
        spark, big_df, "expect_column_proportion_of_unique_values_to_be_between",
        "sketch", column="grp", min_value=0,
    )
    assert abs(prop - 0.4) < 0.02


def test_cms_most_common_value(spark):
    # skewed: 'hot' is 40% of rows; CMS + freqItems must find it
    df = spark.range(20_000).selectExpr(
        "CASE WHEN id % 5 < 2 THEN 'hot' ELSE concat('cold_', id % 500) END AS v"
    )
    exact = _observed(spark, df, "expect_column_most_common_value_to_be_in_set",
                      "exact", column="v", value_set=["hot"])
    sketch = _observed(spark, df, "expect_column_most_common_value_to_be_in_set",
                       "sketch", column="v", value_set=["hot"])
    assert exact == ["hot"]
    assert sketch == ["hot"]


def test_cms_categorical_kl_close_to_exact(spark):
    df = spark.range(30_000).selectExpr(
        "CASE WHEN id % 10 < 5 THEN 'a' WHEN id % 10 < 8 THEN 'b' ELSE 'c' END AS v"
    )
    po = {"values": ["a", "b", "c"], "weights": [0.5, 0.3, 0.2]}
    exact = _observed(spark, df, "expect_column_kl_divergence_to_be_less_than",
                      "exact", column="v", partition_object=po, threshold=0.1)
    sketch = _observed(spark, df, "expect_column_kl_divergence_to_be_less_than",
                       "sketch", column="v", partition_object=po, threshold=0.1)
    assert abs(exact) < 1e-9  # distribution matches the partition exactly
    assert abs(sketch - exact) < 0.01, (sketch, exact)


def test_sketch_distinct_set_exact_verdicts_bounded_state(spark):
    # high-cardinality column: sketch mode must not collect_set 50k values
    df = spark.range(50_000).selectExpr(
        "CASE WHEN id < 49998 THEN concat('v', id) ELSE 'known' END AS v"
    )
    small = spark.createDataFrame([("a",), ("b",), ("a",)], "v string")
    for mode in ("exact", "sketch"):
        b = validate(
            spark, small,
            ExpectationSuite("s")
            .add("expect_column_distinct_values_to_be_in_set", column="v",
                 value_set=["a", "b", "c"])
            .add("expect_column_distinct_values_to_contain_set", column="v",
                 value_set=["a", "b"])
            .add("expect_column_distinct_values_to_equal_set", column="v",
                 value_set=["a", "b"]),
            EngineOptions(mode=mode, collect_violations=False),
        )
        assert [r.success for r in b.suite_result.results] == [True, True, True], mode
    # subset violation detected in sketch mode on the big column
    b = validate(
        spark, df,
        ExpectationSuite("s").add("expect_column_distinct_values_to_be_in_set",
                                  column="v", value_set=["known"]),
        EngineOptions(mode="sketch", collect_violations=False),
    )
    r = b.suite_result.results[0]
    assert not r.success
    assert r.result["observed_value"]["out_of_set_count"] == 49_998


def test_exact_and_sketch_modes_agree_on_suite_verdicts(spark, big_df):
    suite = (
        ExpectationSuite("dual")
        .add("expect_column_unique_value_count_to_be_between", column="grp",
             min_value=19000, max_value=21000)
        .add("expect_column_median_to_be_between", column="v",
             min_value=24000, max_value=26000)
        .add("expect_column_mean_to_be_between", column="v",
             min_value=24999, max_value=25000)
    )
    for mode in ("exact", "sketch"):
        b = validate(spark, big_df, suite,
                     EngineOptions(mode=mode, collect_violations=False))
        assert b.success, (mode, [r.to_dict() for r in b.suite_result.results])
