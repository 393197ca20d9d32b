"""Chi-square / KS goodness-of-fit expectations, scipy-free.

Upstream these three are pandas-engine-only (scipy-based):
  - expectations/core/expect_column_chisquare_test_p_value_to_be_greater_than.py
  - expectations/core/expect_column_bootstrapped_ks_test_p_value_to_be_greater_than.py
  - expectations/core/expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than.py
(SURVEY.md §2.9 listed them as a documented gap; closed here natively.)

Spark-first shapes:
  * chi-square (categorical partition): the partition's value list is a KNOWN
    candidate set, so per-value observed counts are conditional sums folded
    into the suite's single fused stage-1 aggregation — zero extra jobs, zero
    shuffle (same trick as the histogram bins).  p-value via the regularized
    incomplete gamma (gx_spark.stats), driver-side on a k-length vector.
  * parameterized KS: the KS statistic is estimated from an m-point quantile
    grid (percentile_approx folded into the fused agg): for grid quantile x_i
    at probability i/m, D ≈ max_i |i/m − F(x_i)|, with error ≤ 1/m + sketch
    accuracy.  One pass, mergeable sketch, scales to 10^12 rows — an exact D
    would need a global sort of the column.
  * bootstrapped KS: a bounded uniform row sample (driver-side cap) feeds a
    numpy bootstrap loop, matching the reference's resample-and-average-p
    semantics with a fixed seed.  The sample size is independent of table
    size, so the driver memory is bounded at any scale.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import functions as F

from .. import stats
from ..model import ExpectationConfiguration, ExpectationValidationResult
from ..planner import MetricContext
from ..registry import register_expectation
from .base import Finalizer, require_columns, result_format_of


def _result(cfg, rf, success, observed, details):
    result: dict[str, Any] = {}
    if rf != "BOOLEAN_ONLY":
        result = {"observed_value": observed, "details": details}
    return ExpectationValidationResult(
        success=bool(success), expectation_config=cfg, result=result
    )


@register_expectation("expect_column_chisquare_test_p_value_to_be_greater_than")
class ChiSquareTest:
    """Pearson chi-square of observed value counts vs a categorical
    partition_object {values, weights}; success iff p-value > p.

    With tail_weight_holdout > 0, values outside the partition get an "other"
    bucket whose expected mass is the holdout (reference semantics).  Without
    a holdout, ANY out-of-set observation is failing evidence: its expected
    count is 0, so the statistic is infinite and p = 0 (a column that is 90%
    unknown categories must not pass because its in-set proportions happen
    to match the weights); the out-of-set count is surfaced in
    details.observed_out_of_set."""

    def plan(self, ctx: MetricContext, cfg: ExpectationConfiguration, index: int) -> Finalizer:
        column = cfg.kwargs["column"]
        require_columns(ctx, column)
        po = cfg.kwargs["partition_object"]
        values = list(po["values"])
        weights = [float(w) for w in po["weights"]]
        wsum = sum(weights)
        if wsum <= 0 or len(values) != len(weights):
            raise ValueError("invalid categorical partition_object")
        p_threshold = float(cfg.kwargs.get("p", 0.05))
        tail = float(cfg.kwargs.get("tail_weight_holdout", 0.0))
        dk, dom = ctx.domain(cfg.kwargs.get("row_condition"))
        rf = result_format_of(cfg, ctx.options)
        c = F.col(column)
        nn_ref = ctx.nonnull_count(column, dk, dom)

        def count_ref(i: int):
            cond = ctx.guard(dom, c.isNotNull() & (c == F.lit(values[i])))
            return ctx.agg(
                "column.partition_value.count", dk, [column, i, values[i]],
                lambda cond=cond: F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)),
            )

        refs = [count_ref(i) for i in range(len(values))]

        def finalize(bag):
            obs = [int(bag[r]) for r in refs]
            n_in = sum(obs)
            n_total = int(bag[nn_ref])
            n_other = n_total - n_in
            if tail > 0.0:
                expected = [w / wsum * (1.0 - tail) * n_total for w in weights]
                expected.append(tail * n_total)
                observed = obs + [n_other]
            else:
                expected = [w / wsum * n_in for w in weights]
                observed = obs
            if n_total == 0 or any(e <= 0 for e in expected):
                return _result(cfg, rf, False, None,
                               {"error": "empty domain or zero expected bucket"})
            if tail == 0.0 and n_other > 0:
                # out-of-set mass with expected count 0: infinite statistic
                details = {
                    "chi_squared": math.inf,
                    "dof": len(expected) - 1,
                    "observed_counts": observed,
                    "expected_counts": expected,
                    "observed_out_of_set": n_other,
                }
                return _result(cfg, rf, False, 0.0, details)
            stat = sum((o - e) ** 2 / e for o, e in zip(observed, expected))
            pv = stats.chi2_sf(stat, len(expected) - 1)
            details = {
                "chi_squared": stat,
                "dof": len(expected) - 1,
                "observed_counts": observed,
                "expected_counts": expected,
                "observed_out_of_set": n_other,
            }
            return _result(cfg, rf, pv > p_threshold, pv, details)

        return finalize


@register_expectation(
    "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than"
)
class ParameterizedKSTest:
    """One-sample KS test of a numeric column against a named distribution
    (norm/uniform/expon/gamma/beta/chi2, scipy loc/scale param conventions);
    success iff the asymptotic p-value > p_value."""

    def plan(self, ctx: MetricContext, cfg: ExpectationConfiguration, index: int) -> Finalizer:
        column = cfg.kwargs["column"]
        require_columns(ctx, column)
        distribution = cfg.kwargs["distribution"]
        params = cfg.kwargs.get("params") or {}
        p_threshold = float(cfg.kwargs.get("p_value", 0.05))
        cdf = stats.distribution_cdf(distribution, params)  # validates eagerly
        m = int(cfg.kwargs.get("ks_resolution", ctx.options.ks_resolution))
        dk, dom = ctx.domain(cfg.kwargs.get("row_condition"))
        rf = result_format_of(cfg, ctx.options)
        c = F.col(column)
        nn_ref = ctx.nonnull_count(column, dk, dom)
        probs = [i / m for i in range(1, m)]
        acc = ctx.options.quantile_accuracy
        guarded = c if dom is None else F.when(dom, c)
        q_ref = ctx.agg(
            "column.ks_quantile_grid", dk, [column, m, acc],
            lambda: F.percentile_approx(guarded, probs, acc),
        )

        def finalize(bag):
            n = int(bag[nn_ref])
            grid = bag[q_ref]
            if n == 0 or grid is None:
                return _result(cfg, rf, False, None, {"error": "empty domain"})
            d_stat = 0.0
            for i, x in enumerate(grid, start=1):
                if x is None:
                    continue
                d_stat = max(d_stat, abs(i / m - cdf(float(x))))
            pv = stats.ks_p_value(d_stat, n)
            details = {
                "ks_statistic": d_stat,
                "n": n,
                "resolution": m,
                "distribution": distribution,
                "params": dict(params),
            }
            return _result(cfg, rf, pv > p_threshold, pv, details)

        return finalize


@register_expectation(
    "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than"
)
class BootstrappedKSTest:
    """KS test of a numeric column against a continuous partition_object
    {bins, weights} via bootstrap resampling: draw `bootstrap_samples`
    resamples of `bootstrap_sample_size` (reference default: 20 x number of
    bins) from a bounded column sample, KS-test each against the partition's
    piecewise-linear CDF, and compare the MEAN p-value to p."""

    # bounded driver-side pool the bootstrap resamples from
    POOL_CAP = 100_000

    def plan(self, ctx: MetricContext, cfg: ExpectationConfiguration, index: int) -> Finalizer:
        column = cfg.kwargs["column"]
        require_columns(ctx, column)
        po = cfg.kwargs["partition_object"]
        cdf = stats.partition_cdf(po)  # validates eagerly
        p_threshold = float(cfg.kwargs.get("p", 0.05))
        n_boot = int(cfg.kwargs.get("bootstrap_samples") or 1000)
        sample_size = int(
            cfg.kwargs.get("bootstrap_sample_size") or 20 * len(po["weights"])
        )
        seed = int(cfg.kwargs.get("seed", ctx.options.bootstrap_seed))
        dk, dom = ctx.domain(cfg.kwargs.get("row_condition"))
        rf = result_format_of(cfg, ctx.options)
        cap = self.POOL_CAP

        def pool_metric(df):
            d = df
            if dom is not None:
                d = d.filter(dom)
            d = d.select(column).filter(F.col(column).isNotNull())
            n = d.count()
            if n == 0:
                return np.array([])
            if n > cap:
                # oversample slightly, trim deterministically
                frac = min(1.0, cap * 1.2 / n)
                d = d.sample(withReplacement=False, fraction=frac, seed=seed)
                d = d.limit(cap)
            return np.array([r[0] for r in d.collect()], dtype=np.float64)

        pool_ref = ctx.data(
            "column.bootstrap_pool", dk, [column, cap, seed], pool_metric
        )

        def finalize(bag):
            pool = bag[pool_ref]
            if pool.size == 0:
                return _result(cfg, rf, False, None, {"error": "empty domain"})
            rng = np.random.default_rng(seed)
            k = min(sample_size, pool.size)
            grid = np.arange(1, k + 1) / k
            pvals = np.empty(n_boot)
            for b in range(n_boot):
                sample = np.sort(rng.choice(pool, size=k, replace=True))
                cdf_vals = np.array([cdf(float(x)) for x in sample])
                d_stat = float(
                    np.maximum(grid - cdf_vals, cdf_vals - (grid - 1 / k)).max()
                )
                pvals[b] = stats.ks_p_value(d_stat, k)
            mean_p = float(pvals.mean())
            details = {
                "bootstrap_samples": n_boot,
                "bootstrap_sample_size": k,
                "observed_pool_size": int(pool.size),
            }
            return _result(cfg, rf, mean_p > p_threshold, mean_p, details)

        return finalize


@register_expectation("expect_column_pair_cramers_phi_value_to_be_less_than")
class CramersPhi:
    """Cramér's phi (phi_c, a.k.a. Cramér's V) of the two columns'
    contingency table must be LESS THAN `threshold` — the column-pair
    association gate (upstream pandas-only
    expectations/core/expect_column_pair_cramers_phi_value_to_be_less_than.py;
    default threshold 0.1 as there).

    phi_c = sqrt(chi2 / (n * min(r-1, c-1))) with the plain Pearson
    statistic (expected = row_total*col_total/n; NO Yates continuity
    correction — upstream's scipy default applies it for 2x2 tables, but
    uncorrected Pearson is the standard Cramér's V definition and keeps
    the result one formula at every table size; documented deviation).
    A pair where either column is constant has min(r-1, c-1) = 0: no
    association is measurable, phi is defined as 0.0.

    Optional `bins_A` / `bins_B` (sorted edge lists) bucket continuous
    columns first, using this engine's histogram convention: left-closed
    [e_i, e_{i+1}) with the LAST bin right-closed; out-of-range values
    fall out of the table (upstream bins via pd.cut).  Rows where either
    side is null (or out of its bins) are excluded, matching the
    upstream crosstab.

    Spark shape: ONE groupBy over the pruned two-column projection
    (partial-aggregated map-side) — the driver sees only the distinct
    cell counts, never rows.  `max_cells` (default 100_000) fails fast
    on an accidental high-cardinality pair instead of collecting it."""

    examples = [{
        "data": {"a": ["x", "x", "y", "y"], "b": ["u", "u", "v", "v"]},
        "schema": "a string, b string",
        "tests": [
            {"title": "perfect association fails",
             "in": {"column_A": "a", "column_B": "b", "threshold": 0.5},
             "out": {"success": False, "observed_value": 1.0}},
        ],
    }, {
        "data": {"a": ["x", "x", "y", "y"], "b": ["u", "v", "u", "v"]},
        "schema": "a string, b string",
        "tests": [
            {"title": "independent pair has phi 0",
             "in": {"column_A": "a", "column_B": "b", "threshold": 0.1},
             "out": {"success": True, "observed_value": 0.0}},
        ],
    }]

    def plan(self, ctx: MetricContext, cfg: ExpectationConfiguration, index: int) -> Finalizer:
        col_a = cfg.kwargs["column_A"]
        col_b = cfg.kwargs["column_B"]
        require_columns(ctx, col_a, col_b)
        threshold = float(cfg.kwargs.get("threshold", 0.1))
        bins_a = cfg.kwargs.get("bins_A")
        bins_b = cfg.kwargs.get("bins_B")
        max_cells = int(cfg.kwargs.get("max_cells", 100_000))
        dk, dom = ctx.domain(cfg.kwargs.get("row_condition"))
        rf = result_format_of(cfg, ctx.options)

        def binned(col: str, edges):
            c = F.col(col)
            if not edges:
                return c
            edges = [float(e) for e in edges]
            expr = F.lit(None).cast("int")
            for i in range(len(edges) - 1):
                last = i == len(edges) - 2
                hi_ok = (c <= F.lit(edges[i + 1])) if last \
                    else (c < F.lit(edges[i + 1]))
                expr = F.when((c >= F.lit(edges[i])) & hi_ok,
                              F.lit(i)).otherwise(expr)
            return expr

        def metric(df):
            d = df
            if dom is not None:
                d = d.filter(dom)
            d = d.select(binned(col_a, bins_a).alias("_a"),
                         binned(col_b, bins_b).alias("_b"))
            d = d.filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
            cells = (d.groupBy("_a", "_b")
                     .agg(F.count(F.lit(1)).alias("_n"))
                     .limit(max_cells + 1)
                     .collect())
            if len(cells) > max_cells:
                raise ValueError(
                    f"contingency table of ({col_a}, {col_b}) exceeds "
                    f"max_cells={max_cells}; bin the columns (bins_A/"
                    f"bins_B) or raise max_cells")
            return [(r["_a"], r["_b"], int(r["_n"])) for r in cells]

        # max_cells is part of the key: two configs on the same pair with
        # different guards must not share one (limit-baked-in) metric
        ref = ctx.data(
            "column_pair.contingency", dk,
            [col_a, col_b, bins_a, bins_b, max_cells], metric)

        def finalize(bag):
            cells = bag[ref]
            if not cells:
                return _result(cfg, rf, False, None, {"error": "empty domain"})
            a_vals = sorted({a for a, _, _ in cells}, key=str)
            b_vals = sorted({b for _, b, _ in cells}, key=str)
            r, c = len(a_vals), len(b_vals)
            n = sum(k for _, _, k in cells)
            if min(r, c) < 2:
                details = {"chi_squared": 0.0, "n": n, "r": r, "c": c}
                return _result(cfg, rf, 0.0 < threshold, 0.0, details)
            ai = {v: i for i, v in enumerate(a_vals)}
            bi = {v: i for i, v in enumerate(b_vals)}
            O = np.zeros((r, c), dtype=np.float64)
            for a, b, k in cells:
                O[ai[a], bi[b]] = k
            E = O.sum(axis=1, keepdims=True) @ O.sum(axis=0, keepdims=True) / n
            chi2 = float(((O - E) ** 2 / E).sum())
            phi = math.sqrt(chi2 / (n * (min(r, c) - 1)))
            details = {"chi_squared": chi2, "n": n, "r": r, "c": c}
            return _result(cfg, rf, phi < threshold, phi, details)

        return finalize
