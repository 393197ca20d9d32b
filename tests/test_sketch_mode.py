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
