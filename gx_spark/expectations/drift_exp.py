"""KL-divergence / PSI drift expectations.

The observed histogram is NOT its own Spark job: the per-bin counts are
conditional sums folded into the suite's single fused `df.agg(...)` pass
(SURVEY.md §2.4 column.histogram — bucket-assignment is a `when` chain, the
tiny count vector then goes driver-side to numpy).  Categorical partitions
use the shared value_counts data metric (a groupBy — the one genuinely
shuffle-needing shape).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import functions as F

from ..drift import categorical_divergence, continuous_divergence
from ..model import ExpectationConfiguration, ExpectationValidationResult
from ..planner import MetricContext
from ..registry import register_expectation
from .base import Finalizer, domain_col, require_columns, result_format_of


class _DivergenceBase:
    kind = "kl"
    threshold_kwarg = "threshold"

    def plan(self, ctx: MetricContext, cfg: ExpectationConfiguration, index: int) -> Finalizer:
        column = cfg.kwargs["column"]
        require_columns(ctx, column)
        po = cfg.kwargs["partition_object"]
        threshold = cfg.kwargs.get(self.threshold_kwarg)
        tail = float(cfg.kwargs.get("tail_weight_holdout", 0.0))
        internal = float(cfg.kwargs.get("internal_weight_holdout", 0.0))
        dk, dom = ctx.domain(cfg.kwargs.get("row_condition"))
        rf = result_format_of(cfg, ctx.options)
        kind = self.kind

        if "bins" in po:
            bins = [float(b) for b in po["bins"]]
            c = F.col(column)
            nn_ref = ctx.nonnull_count(column, dk, dom)

            def bin_ref(i: int):
                lo, hi = bins[i], bins[i + 1]
                # [lo, hi) for all but the last bin, which is [lo, hi] —
                # matches the reference's histogram edge semantics
                in_bin = (c >= lo) & ((c <= hi) if i == len(bins) - 2 else (c < hi))
                cond = ctx.guard(dom, c.isNotNull() & in_bin)
                return ctx.agg(
                    "column.histogram.bin", dk, [column, bins, i],
                    lambda cond=cond: F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)),
                )

            bin_refs = [bin_ref(i) for i in range(len(bins) - 1)]
            below_cond = ctx.guard(dom, c.isNotNull() & (c < bins[0]))
            above_cond = ctx.guard(dom, c.isNotNull() & (c > bins[-1]))
            below_ref = ctx.agg(
                "column.histogram.below", dk, [column, bins],
                lambda: F.coalesce(F.sum(F.when(below_cond, 1).otherwise(0)), F.lit(0)),
            )
            above_ref = ctx.agg(
                "column.histogram.above", dk, [column, bins],
                lambda: F.coalesce(F.sum(F.when(above_cond, 1).otherwise(0)), F.lit(0)),
            )

            def finalize(bag):
                counts = [int(bag[r]) for r in bin_refs]
                div, details = continuous_divergence(
                    counts, int(bag[below_ref]), int(bag[above_ref]), int(bag[nn_ref]),
                    po, tail, internal, kind,
                )
                success = (not math.isnan(div)) and (
                    threshold is None or div < float(threshold)
                ) and not math.isinf(div)
                result: dict[str, Any] = {}
                if rf != "BOOLEAN_ONLY":
                    result = {"observed_value": None if math.isnan(div) else div,
                              "details": details}
                return ExpectationValidationResult(success=bool(success), expectation_config=cfg, result=result)

            return finalize

        # categorical partition {values, weights}.  Both modes are bounded:
        # the divergence needs only the LISTED values' counts plus the total
        # (everything else enters as aggregate unlisted mass), so the exact
        # path is one conditional aggregation of |values|+1 counters — never
        # a groupBy that collects every distinct value to the driver
        # (unbounded on a high-cardinality column).  Sketch mode probes the
        # same candidates through a CMS (SURVEY.md §2.4 value_counts).
        opts = ctx.options

        def vc_metric(df):
            d = df
            if dom is not None:
                d = d.filter(dom)
            d = d.filter(F.col(column).isNotNull())
            if opts.mode == "sketch":
                from ..sketches import cms_value_counts

                counts, total = cms_value_counts(
                    d, column, candidates=list(po["values"]),
                    eps=opts.cms_eps, confidence=opts.cms_confidence,
                    seed=opts.cms_seed,
                )
                return {"counts": counts, "total": total}
            vals = list(po["values"])
            row = d.agg(
                F.count(F.lit(1)).alias("__total"),
                *[
                    F.coalesce(
                        F.sum(F.when(F.col(column) == F.lit(v), 1).otherwise(0)),
                        F.lit(0),
                    ).alias(f"__v{i}")
                    for i, v in enumerate(vals)
                ],
            ).collect()[0]
            vc = {v: int(row[f"__v{i}"]) for i, v in enumerate(vals)}
            return {"counts": vc, "total": int(row["__total"])}

        vc_ref = ctx.data("column.value_counts", dk, [column, opts.mode], vc_metric)

        def finalize(bag):
            m = bag[vc_ref]
            vc, total = m["counts"], m["total"]
            div, details = categorical_divergence(vc, total, po, tail, kind)
            success = (not math.isnan(div)) and (
                threshold is None or div < float(threshold)
            ) and not math.isinf(div)
            result = {}
            if rf != "BOOLEAN_ONLY":
                result = {"observed_value": None if math.isnan(div) else div,
                          "details": details}
            return ExpectationValidationResult(success=bool(success), expectation_config=cfg, result=result)

        return finalize


@register_expectation("expect_column_kl_divergence_to_be_less_than")
class KLDivergence(_DivergenceBase):
    """KL(observed || expected) over the partition_object histogram
    (continuous bins or categorical values) vs `threshold`; histogram
    counts come from the fused stage-1 aggregate (SURVEY.md 2.9)."""

    kind = "kl"


@register_expectation("expect_column_psi_to_be_less_than")
class PSI(_DivergenceBase):
    """Population Stability Index on the same histogram machinery as KL
    (sibling drift metric, SURVEY.md 2.9) vs `threshold`."""

    kind = "psi"
