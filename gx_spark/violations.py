"""Fused violations pass: one map-only job emits violation rows for ALL map
expectations of a suite.

The reference fetches unexpected rows with one filter job per expectation
(ref: expectations/metrics/map_metric_provider.py#_spark_map_condition_rows);
we instead build, per row, an array of per-expectation violation structs,
drop the nulls, and `explode` — a single narrow (shuffle-free) pass that
Catalyst runs inside one WholeStageCodegen span.  At 10^12-row scale this
DataFrame is written to a `_violations` table rather than collected
(SURVEY.md §2.6, BASELINE.json north rule).

Row schema: (index_json, expectation_index, expectation_type, column,
observed_json).  Values are JSON-encoded via `to_json(struct(v))` so that a
single string column can carry any source type losslessly; `{}` means the
observed value was NULL (to_json omits null fields).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .planner import MetricBag, ViolationSpec

VIOLATION_COLS = [
    "index_json",
    "expectation_index",
    "expectation_type",
    "column",
    "observed_json",
]


def json_value(col: Column) -> Column:
    """JSON-encode an arbitrary-typed value into one string column."""
    return F.to_json(F.struct(col.alias("v")))


def decode_json_value(s: str | None) -> Any:
    if s is None:
        return None
    return json.loads(s).get("v")


def build_violations_df(
    df: DataFrame,
    specs: list[ViolationSpec],
    bag: MetricBag,
    index_cols: tuple[str, ...],
) -> DataFrame | None:
    """One pass: array of conditional structs → filter non-null → explode."""
    if not specs:
        return None
    structs = [
        F.when(
            spec.condition(bag),
            F.struct(
                F.lit(spec.exp_index).alias("expectation_index"),
                F.lit(spec.exp_type).alias("expectation_type"),
                F.lit(spec.column).alias("column"),
                json_value(spec.observed(bag)).alias("observed_json"),
            ),
        )
        for spec in specs
    ]
    arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
    idx = (
        F.to_json(F.struct(*[F.col(c) for c in index_cols]))
        if index_cols
        else F.lit(None).cast("string")
    )
    out = (
        df.select(idx.alias("index_json"), F.explode(arr).alias("v"))
        .select("index_json", "v.*")
    )
    return out


def empty_violations_df(spark) -> DataFrame:
    schema = (
        "index_json string, expectation_index int, expectation_type string, "
        "column string, observed_json string"
    )
    return spark.createDataFrame([], schema)


def derive_unexpected_lists(
    viol_df: DataFrame,
    result_format: str,
    partial_limit: int,
) -> dict[int, dict[str, Any]]:
    """ONE job over the violations DataFrame produces the per-expectation
    partial/complete unexpected value+index lists (instead of the reference's
    per-expectation filter jobs)."""
    if result_format == "BOOLEAN_ONLY":
        return {}
    complete = result_format == "COMPLETE"
    n = -1 if complete else partial_limit  # slice length; -1 = take all
    obs_list = F.collect_list("observed_json")
    idx_list = F.collect_list("index_json")
    if not complete:
        obs_list = F.slice(obs_list, 1, partial_limit)
        idx_list = F.slice(idx_list, 1, partial_limit)
    rows = (
        viol_df.groupBy("expectation_index")
        .agg(obs_list.alias("obs"), idx_list.alias("idx"),
             F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    out: dict[int, dict[str, Any]] = {}
    for r in rows:
        values = [decode_json_value(s) for s in r["obs"]]
        indexes = [decode_json_value_index(s) for s in r["idx"]]
        entry: dict[str, Any] = {
            # exact per-expectation violation-row count: lets expensive map
            # conditions (audio decode) skip the stage-1 conditional sum and
            # be evaluated ONCE, in this pass (see base.count_via_violations)
            "unexpected_count": int(r["cnt"]),
            "partial_unexpected_list": values[:partial_limit],
            "partial_unexpected_index_list": [i for i in indexes[:partial_limit] if i is not None],
        }
        if complete:
            entry["unexpected_list"] = values
            entry["unexpected_index_list"] = [i for i in indexes if i is not None]
        if result_format in ("SUMMARY", "COMPLETE"):
            counts: dict[Any, int] = {}
            for v in values:
                k = json.dumps(v, sort_keys=True, default=str)
                counts[k] = counts.get(k, 0) + 1
            entry["partial_unexpected_counts"] = [
                {"value": json.loads(k), "count": c}
                for k, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            ][:partial_limit]
        out[r["expectation_index"]] = entry
    return out


def decode_json_value_index(s: str | None) -> Any:
    """Index json is a struct of the index columns: single col → scalar,
    multiple → dict."""
    if s is None:
        return None
    d = json.loads(s)
    if len(d) == 1:
        return next(iter(d.values()))
    return d or None
