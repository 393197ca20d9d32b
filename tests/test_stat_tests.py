"""Native (scipy-free) KS / chi-square goodness-of-fit expectations.

Special-function reference values below are standard published table values
(chi-square critical points, Kolmogorov distribution, incomplete beta/gamma
identities) — the same numbers scipy reproduces.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark import stats  # noqa: E402


# ---------------------------------------------------------------------------
# driver-side special-function math
# ---------------------------------------------------------------------------

def test_special_functions_published_values():
    # chi-square critical points: P(X > x) = 0.05
    assert stats.chi2_sf(3.841459, 1) == pytest.approx(0.05, abs=1e-5)
    assert stats.chi2_sf(5.991465, 2) == pytest.approx(0.05, abs=1e-5)
    assert stats.chi2_sf(18.30704, 10) == pytest.approx(0.05, abs=1e-5)
    # incomplete gamma / beta closed forms
    assert stats.gammainc_p(1.0, 1.0) == pytest.approx(1 - math.exp(-1), rel=1e-10)
    assert stats.betainc(2, 2, 0.5) == pytest.approx(0.5, rel=1e-10)
    assert stats.betainc(2, 3, 0.25) == pytest.approx(0.26171875, rel=1e-8)
    # Kolmogorov distribution critical points
    assert stats.kolmogorov_sf(1.3581) == pytest.approx(0.05, abs=2e-4)
    assert stats.kolmogorov_sf(1.6276) == pytest.approx(0.01, abs=2e-4)
    # named-distribution CDFs
    assert stats.norm_cdf(1.959964) == pytest.approx(0.975, abs=1e-6)
    assert stats.beta_cdf(0.5, 2, 5) == pytest.approx(0.890625, rel=1e-8)
    assert stats.gamma_cdf(2.0, 2.0) == pytest.approx(1 - 3 * math.exp(-2), rel=1e-8)


def test_partition_cdf_piecewise_linear():
    cdf = stats.partition_cdf({"bins": [0.0, 1.0, 3.0], "weights": [0.5, 0.5]})
    assert cdf(-1) == 0.0
    assert cdf(0.5) == pytest.approx(0.25)
    assert cdf(1.0) == pytest.approx(0.5)
    assert cdf(2.0) == pytest.approx(0.75)
    assert cdf(3.0) == 1.0


# ---------------------------------------------------------------------------
# expectations over Spark
# ---------------------------------------------------------------------------

def _run_one(spark, df, etype, **kwargs):
    b = validate(
        spark, df, ExpectationSuite("s").add(etype, **kwargs),
        EngineOptions(collect_violations=False),
    )
    r = b.suite_result.results[0]
    assert not r.exception_info["raised_exception"], r.exception_info
    return r


def test_chisquare_uniform_categorical_passes(spark):
    # 4 categories x 2500 rows each — exactly uniform, p-value == 1
    df = spark.range(10_000).selectExpr("concat('c', id % 4) as cat")
    r = _run_one(
        spark, df, "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="cat",
        partition_object={"values": ["c0", "c1", "c2", "c3"],
                          "weights": [0.25, 0.25, 0.25, 0.25]},
        p=0.05,
    )
    assert r.success
    assert r.result["observed_value"] == pytest.approx(1.0)
    assert r.result["details"]["chi_squared"] == pytest.approx(0.0)
    assert r.result["details"]["dof"] == 3


def test_chisquare_skewed_fails(spark):
    # heavily skewed observed vs claimed-uniform expected
    df = spark.range(10_000).selectExpr(
        "case when id % 10 < 7 then 'a' when id % 10 < 9 then 'b' else 'c' end as cat"
    )
    r = _run_one(
        spark, df, "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="cat",
        partition_object={"values": ["a", "b", "c"],
                          "weights": [1 / 3, 1 / 3, 1 / 3]},
        p=0.05,
    )
    assert not r.success
    assert r.result["observed_value"] < 1e-6
    # chi2 = sum over {7000,2000,1000} vs uniform 10000/3
    exp = 10_000 / 3
    want = sum((o - exp) ** 2 / exp for o in (7000, 2000, 1000))
    assert r.result["details"]["chi_squared"] == pytest.approx(want, rel=1e-9)


def test_chisquare_tail_holdout_other_bucket(spark):
    # 10% of rows fall outside the partition values; holdout expects that
    df = spark.range(10_000).selectExpr(
        "case when id % 10 = 9 then 'zz' else concat('c', id % 3) end as cat"
    )
    r = _run_one(
        spark, df, "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="cat", p=0.05,
        partition_object={"values": ["c0", "c1", "c2"],
                          "weights": [1 / 3, 1 / 3, 1 / 3]},
        tail_weight_holdout=0.1,
    )
    assert r.result["details"]["observed_out_of_set"] == 1000
    assert r.result["details"]["dof"] == 3  # 3 values + other - 1
    assert r.success  # observed matches the holdout model well


def test_parameterized_ks_uniform_passes_and_norm_fails(spark):
    df = spark.range(20_000).selectExpr("(id + 0.5) / 20000 as u")
    r = _run_one(
        spark, df,
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
        column="u", distribution="uniform", params={"min": 0.0, "max": 1.0},
        p_value=0.05,
    )
    assert r.success, r.result
    assert r.result["details"]["ks_statistic"] < 0.01
    r2 = _run_one(
        spark, df,
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
        column="u", distribution="norm", params={"mean": 0.5, "std_dev": 1.0},
        p_value=0.05,
    )
    assert not r2.success
    # uniform[0,1] vs N(0.5, 1): max CDF gap is at the edges, ~0.31
    assert r2.result["details"]["ks_statistic"] > 0.25


def test_bootstrapped_ks_matching_partition_passes(spark):
    df = spark.range(20_000).selectExpr("(id % 1000) / 1000.0 + 0.0005 as v")
    po = {"bins": [0.0, 0.25, 0.5, 0.75, 1.0],
          "weights": [0.25, 0.25, 0.25, 0.25]}
    r = _run_one(
        spark, df,
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        column="v", partition_object=po, p=0.05,
        bootstrap_samples=200,
    )
    assert r.success, r.result
    assert r.result["observed_value"] > 0.3


def test_bootstrapped_ks_wrong_partition_fails(spark):
    # data concentrated in [0, 0.25] but partition claims uniform [0,1]
    df = spark.range(20_000).selectExpr("(id % 1000) / 4000.0 as v")
    po = {"bins": [0.0, 0.25, 0.5, 0.75, 1.0],
          "weights": [0.25, 0.25, 0.25, 0.25]}
    r = _run_one(
        spark, df,
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        column="v", partition_object=po, p=0.05,
        bootstrap_samples=100,
    )
    assert not r.success
    assert r.result["observed_value"] < 0.01


def test_stat_tests_fused_no_extra_jobs(spark):
    """chi-square + parameterized KS both fold into the single fused agg:
    validating them together with other aggregates runs ONE stage-1 job."""
    df = spark.range(10_000).selectExpr(
        "concat('c', id % 4) as cat", "(id + 0.5) / 10000 as u"
    )
    suite = (
        ExpectationSuite("fused")
        .add("expect_column_chisquare_test_p_value_to_be_greater_than",
             column="cat", p=0.05,
             partition_object={"values": ["c0", "c1", "c2", "c3"],
                               "weights": [0.25] * 4})
        .add("expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
             column="u", distribution="uniform",
             params={"min": 0.0, "max": 1.0}, p_value=0.05)
        .add("expect_column_mean_to_be_between", column="u",
             min_value=0.4, max_value=0.6)
    )
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    assert all(r.success for r in b.suite_result.results)


# ---------------------------------------------------------------------------
# Cramér's phi (expect_column_pair_cramers_phi_value_to_be_less_than)
# ---------------------------------------------------------------------------

def _phi(spark, df, **kw):
    suite = ExpectationSuite("phi").add(
        "expect_column_pair_cramers_phi_value_to_be_less_than", **kw)
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    return b.suite_result.results[0]


def test_cramers_phi_perfect_association(spark):
    df = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, "a string, b string")
    r = _phi(spark, df, column_A="a", column_B="b", threshold=0.5)
    assert not r.success
    assert r.result["observed_value"] == pytest.approx(1.0)


def test_cramers_phi_independent_pair_is_zero(spark):
    df = spark.createDataFrame(
        [(a, b) for a in ("x", "y", "z") for b in ("u", "v") for _ in range(4)],
        "a string, b string")
    r = _phi(spark, df, column_A="a", column_B="b", threshold=0.1)
    assert r.success
    assert r.result["observed_value"] == pytest.approx(0.0)
    assert r.result["details"]["r"] == 3 and r.result["details"]["c"] == 2


def test_cramers_phi_constant_column_is_zero(spark):
    df = spark.createDataFrame(
        [("x", "u"), ("x", "v"), ("x", "u")], "a string, b string")
    r = _phi(spark, df, column_A="a", column_B="b", threshold=0.1)
    assert r.success
    assert r.result["observed_value"] == 0.0


def test_cramers_phi_bins_and_nulls(spark):
    # binned numeric side: values outside the edges and null rows fall
    # out of the table (upstream crosstab semantics); the remaining pairs
    # are perfectly associated through the bin labels
    rows = [("x", 0.5), ("x", 1.5), ("y", 2.5), ("y", 3.5),
            ("x", 99.0), (None, 1.0), ("y", None)]
    df = spark.createDataFrame(rows, "a string, v double")
    r = _phi(spark, df, column_A="a", column_B="v",
             bins_B=[0.0, 2.0, 4.0], threshold=0.5)
    assert not r.success
    assert r.result["observed_value"] == pytest.approx(1.0)
    assert r.result["details"]["n"] == 4


def test_cramers_phi_max_cells_guard(spark):
    # metric errors surface as a failed EVR with exception_info (the
    # engine's catch_exceptions discipline), never a passing result
    df = spark.range(200).selectExpr(
        "cast(id as string) as a", "cast(id % 50 as string) as b")
    r = _phi(spark, df, column_A="a", column_B="b", threshold=0.5,
             max_cells=100)
    assert not r.success
    assert "max_cells" in r.exception_info["exception_message"]
