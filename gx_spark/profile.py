"""Profiling: `column.partition` auto-binning + a persistent metric store.

Re-creates the reference's partition-object builders (ref:
expectations/metrics/column_aggregate_metrics/column_partition.py — bucketize
modes uniform / quantile / auto) and the metric store + evaluation-parameter
URN indirection (ref: data_context/store/metric_store.py#MetricStore,
core/evaluation_parameters.py) in Spark-native, 10^12-row-safe form:

- partition builders run as ONE small agg over the batch (min/max or
  approx-quantiles) plus ONE fused conditional-sum histogram agg — never a
  groupBy over raw values;
- the store is an append-only parquet table (run_id, ts, table, column,
  metric, value_json) — the same pattern as the `_validation_results` sink —
  so a profiling run on yesterday's batch becomes the drift baseline for
  today's via `{"$PARAMETER": "urn:gx:metric:<table>:<column>:<metric>"}`.
"""

from __future__ import annotations

import json
import math
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _mostly_backoff(frac: float) -> float:
    """`mostly` for a suggested expectation, given the observed violation
    fraction of the profiling batch: 1.2x headroom below the clean
    fraction, with BOTH terms floored to 3 decimals (rounding up would
    fail the suite on its own batch for fractions under ~4e-4), clamped
    into (0, 1] — mostly=0.0 is outside the documented domain.  The one
    rule every suggester shares, so the emitted suite always passes the
    batch it was profiled from."""
    backoff = math.floor((1 - 1.2 * frac) * 1000) / 1000
    observed = math.floor((1 - frac) * 1000) / 1000
    return max(0.001, min(backoff, observed))


# ---------------------------------------------------------------------------
# partition-object builders (column.partition)
# ---------------------------------------------------------------------------


def _uniform_edges(mn: float, mx: float, n_bins: int) -> list[float]:
    # edge formula written to be reproducible in ANSI SQL oracles:
    # mn + (mx - mn) * i / n  (same IEEE double ops, same results)
    return [mn + (mx - mn) * i / n_bins for i in range(n_bins + 1)]


def histogram_counts(
    df: DataFrame, column: str, edges: list[float]
) -> tuple[list[int], int, int, int]:
    """(per-bin counts, below, above, total nonnull) in ONE fused agg.
    Bins are [lo, hi) except the last, which is [lo, hi] — the reference's
    histogram edge semantics."""
    c = F.col(column)
    n = len(edges) - 1

    def in_bin(i: int):
        lo, hi = edges[i], edges[i + 1]
        cond = (c >= lo) & ((c <= hi) if i == n - 1 else (c < hi))
        return F.coalesce(F.sum(F.when(c.isNotNull() & cond, 1).otherwise(0)), F.lit(0))

    row = df.agg(
        *[in_bin(i).alias(f"b{i}") for i in range(n)],
        F.coalesce(F.sum(F.when(c.isNotNull() & (c < edges[0]), 1).otherwise(0)), F.lit(0)).alias("below"),
        F.coalesce(F.sum(F.when(c.isNotNull() & (c > edges[-1]), 1).otherwise(0)), F.lit(0)).alias("above"),
        F.count(c).alias("total"),
    ).collect()[0]
    return (
        [int(row[f"b{i}"]) for i in range(n)],
        int(row["below"]), int(row["above"]), int(row["total"]),
    )


def build_continuous_partition_object(
    df: DataFrame,
    column: str,
    bins: str = "uniform",  # "uniform" | "quantile" | "auto"
    n_bins: int | None = None,
    mode: str = "exact",  # quantile edges: "exact" | "sketch" (approx_percentile)
) -> dict[str, Any]:
    """{bins, weights} partition object from the batch — the baseline-
    construction path for the KL/PSI drift expectations.

    uniform: equal-width bins over [min, max] (one tiny agg for min/max).
    quantile: equal-mass bins from percentiles (exact or KLL-sketch).
    auto: uniform with Sturges' bin count ceil(log2(n))+1.
    Two Spark jobs total; only O(n_bins) values reach the driver."""
    c = F.col(column).cast("double")
    if bins == "auto" or n_bins is None:
        cnt = df.where(c.isNotNull()).count()
        sturges = max(1, int(math.ceil(math.log2(max(cnt, 2)))) + 1)
        n_bins = n_bins or (sturges if bins == "auto" else 10)
    if bins in ("uniform", "auto"):
        row = df.agg(F.min(c).alias("mn"), F.max(c).alias("mx")).collect()[0]
        mn, mx = float(row["mn"]), float(row["mx"])
        if mn == mx:
            edges = [mn, mx]
        else:
            edges = _uniform_edges(mn, mx, n_bins)
    elif bins == "quantile":
        probs = [i / n_bins for i in range(n_bins + 1)]
        if mode == "sketch":
            edges_raw = df.agg(
                F.percentile_approx(c, probs, 10000).alias("q")
            ).collect()[0]["q"]
        else:
            edges_raw = df.agg(F.percentile(c, F.array(*[F.lit(p) for p in probs])).alias("q")
                               ).collect()[0]["q"]
        edges = sorted(set(float(e) for e in edges_raw))
        if len(edges) < 2:
            edges = [edges[0], edges[0]] if edges else [0.0, 0.0]
    else:
        raise ValueError(f"unknown bins mode: {bins!r}")
    counts, below, above, total = histogram_counts(df, column, edges)
    weights = [cc / total if total else 0.0 for cc in counts]
    return {"bins": edges, "weights": weights}


def build_categorical_partition_object(
    df: DataFrame, column: str, max_values: int = 1000
) -> dict[str, Any]:
    """{values, weights} from a value_counts groupBy (map-side partial agg),
    top-`max_values` by frequency — bounded driver transfer."""
    rows = (
        df.where(F.col(column).isNotNull())
        .groupBy(column).agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc(column))
        .limit(max_values)
        .collect()
    )
    total = df.where(F.col(column).isNotNull()).count()
    return {
        "values": [r[column] for r in rows],
        "weights": [r["c"] / total if total else 0.0 for r in rows],
    }


# ---------------------------------------------------------------------------
# persistent metric store
# ---------------------------------------------------------------------------

_STORE_SCHEMA = (
    "run_id string, run_ts long, table_name string, column string, "
    "metric_name string, value_json string"
)


class MetricStore:
    """Append-only parquet metric store (the URN store's role at scale).

    URN format: urn:gx:metric:<table>:<column>:<metric_name>[:<run_id>]
    Without a run_id the LATEST value (by run_ts) wins."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def write(self, table_name: str, metrics: dict[tuple[str, str], Any],
              run_id: str | None = None) -> str:
        run_id = run_id or uuid.uuid4().hex[:12]
        ts = int(time.time() * 1000)
        rows = [
            (run_id, ts, table_name, col, name, json.dumps(value, default=str))
            for (col, name), value in metrics.items()
        ]
        self.spark.createDataFrame(rows, _STORE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)
        return run_id

    def _df(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def get(self, table_name: str, column: str, metric_name: str,
            run_id: str | None = None) -> Any:
        d = self._df().where(
            (F.col("table_name") == table_name)
            & (F.col("column") == column)
            & (F.col("metric_name") == metric_name)
        )
        if run_id is not None:
            d = d.where(F.col("run_id") == run_id)
        row = d.orderBy(F.desc("run_ts")).limit(1).collect()
        if not row:
            raise KeyError(
                f"no stored metric {metric_name!r} for {table_name}.{column}"
                + (f" run {run_id}" if run_id else "")
            )
        return json.loads(row[0]["value_json"])

    def resolve_urn(self, urn: str) -> Any:
        parts = urn.split(":")
        if len(parts) not in (6, 7) or parts[:3] != ["urn", "gx", "metric"]:
            raise ValueError(
                f"bad metric URN {urn!r} "
                "(want urn:gx:metric:<table>:<column>:<metric>[:<run_id>])"
            )
        return self.get(parts[3], parts[4], parts[5],
                        parts[6] if len(parts) == 7 else None)


# ---------------------------------------------------------------------------
# profiler
# ---------------------------------------------------------------------------

_NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "float", "double",
                  "decimal", "long", "short")


class Profiler:
    """One profiling run = ONE fused scalar agg over the batch (count / mean /
    stddev / min / max / approx distinct per column) + one histogram agg per
    partitioned column; writes everything to the MetricStore so later runs
    can drift-check against it (ref: profile/basic_dataset_profiler.py, scaled
    to a fused plan instead of per-metric jobs)."""

    def __init__(self, spark: SparkSession, store: MetricStore) -> None:
        self.spark = spark
        self.store = store

    def profile(
        self,
        df: DataFrame,
        table_name: str,
        columns: list[str] | None = None,
        partition_columns: list[str] | None = None,
        bins: str = "uniform",
        n_bins: int = 10,
        run_id: str | None = None,
    ) -> str:
        cols = columns or [
            f.name for f in df.schema.fields
            if any(t in f.dataType.simpleString() for t in _NUMERIC_TYPES)
        ]
        exprs = [F.count(F.lit(1)).alias("__row_count")]
        for col in cols:
            c = F.col(col).cast("double")
            exprs += [
                F.count(F.col(col)).alias(f"{col}__nonnull"),
                F.avg(c).alias(f"{col}__mean"),
                F.stddev_samp(c).alias(f"{col}__stddev"),
                F.min(c).alias(f"{col}__min"),
                F.max(c).alias(f"{col}__max"),
                F.approx_count_distinct(F.col(col)).alias(f"{col}__distinct"),
            ]
        row = df.agg(*exprs).collect()[0]
        metrics: dict[tuple[str, str], Any] = {
            ("", "table.row_count"): int(row["__row_count"])
        }
        for col in cols:
            for m, key in (
                ("column_values.nonnull.count", f"{col}__nonnull"),
                ("column.mean", f"{col}__mean"),
                ("column.standard_deviation", f"{col}__stddev"),
                ("column.min", f"{col}__min"),
                ("column.max", f"{col}__max"),
                ("column.distinct_values.count", f"{col}__distinct"),
            ):
                v = row[key]
                metrics[(col, m)] = (
                    int(v) if m.endswith("count") and v is not None
                    else (float(v) if v is not None else None)
                )
        for col in partition_columns or []:
            metrics[(col, "column.partition")] = build_continuous_partition_object(
                df, col, bins=bins, n_bins=n_bins
            )
        return self.store.write(table_name, metrics, run_id)


# ---------------------------------------------------------------------------
# suite suggestion (onboarding profiler)
# ---------------------------------------------------------------------------

_SUGGEST_LOW_CARDINALITY = 20


def suggest_suite(
    df: DataFrame,
    suite_name: str = "suggested",
    row_count_tolerance: float = 0.1,
    low_cardinality_max: int = _SUGGEST_LOW_CARDINALITY,
) -> "ExpectationSuite":
    """Profile a batch and emit an ExpectationSuite that the batch itself
    satisfies (ref: profile/user_configurable_profiler.py — the reference's
    onboarding flow: profile once, review, then validate future batches).

    One fused agg computes every per-column statistic (null counts, approx
    distinct, numeric min/max, string length min/max); only columns that the
    cardinality check proves small get a second bounded distinct-collect for
    `in_set`.  Rules, mirroring the reference's profiler semantics:

    - table: row_count within ±tolerance, columns match the ordered list
    - every column: `not_be_null` (with `mostly` backed off to the observed
      null fraction when nulls exist)
    - numeric: `between` observed [min, max]
    - string: `value_lengths between` observed bounds
    - approx-unique columns (distinct ≈ nonnull): `be_unique`
    - low-cardinality columns: `be_in_set` of the observed values
    - multimodal column groups (binary payload + its typed metadata
      columns, audio or image): the payload expectations, with `mostly`
      backed off to the violation fraction observed in one decode pass
      (_suggest_multimodal).  Binary columns are otherwise exempt from the
      distinct/unique/in_set rules — payload bytes must never be shuffled
      or collected by a profiler.
    - long-text columns (observed max length >= 80): a PII screen
      (`expect_column_pii_count_to_be_below`), with `mostly` backed off
      to the observed flagged fraction when the batch already carries
      PII-shaped spans (r5; one extra map-side regexp probe, no shuffle).
    """
    from .model import ExpectationSuite

    fields = df.schema.fields
    numeric = {f.name for f in fields
               if any(t in f.dataType.simpleString() for t in _NUMERIC_TYPES)}
    stringy = {f.name for f in fields if f.dataType.simpleString() == "string"}
    binary = {f.name for f in fields if f.dataType.simpleString() == "binary"}

    exprs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = f.name
        exprs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        if c in binary:
            # null-count only: no distinct sketch over payload bytes
            continue
        exprs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__dist"))
        if c in numeric:
            exprs.append(F.min(F.col(c).cast("double")).alias(f"{c}__mn"))
            exprs.append(F.max(F.col(c).cast("double")).alias(f"{c}__mx"))
        elif c in stringy:
            exprs.append(F.min(F.length(c)).alias(f"{c}__lmn"))
            exprs.append(F.max(F.length(c)).alias(f"{c}__lmx"))
    row = df.agg(*exprs).collect()[0]
    n = int(row["__n"])

    suite = ExpectationSuite(suite_name)
    suite.add(
        "expect_table_row_count_to_be_between",
        min_value=int(n * (1 - row_count_tolerance)),
        max_value=int(n * (1 + row_count_tolerance)) + 1,
    )
    suite.add("expect_table_columns_to_match_ordered_list",
              column_list=[f.name for f in fields])
    for f in fields:
        c = f.name
        nn = int(row[f"{c}__nn"])
        dist = 0 if c in binary else int(row[f"{c}__dist"])
        if nn == n:
            suite.add("expect_column_values_to_not_be_null", column=c)
        elif n > 0 and nn > 0:
            suite.add("expect_column_values_to_not_be_null", column=c,
                      mostly=_mostly_backoff(1 - nn / n))
        if c in numeric and nn > 0:
            suite.add("expect_column_values_to_be_between", column=c,
                      min_value=float(row[f"{c}__mn"]),
                      max_value=float(row[f"{c}__mx"]))
        elif c in stringy and nn > 0:
            suite.add("expect_column_value_lengths_to_be_between", column=c,
                      min_value=int(row[f"{c}__lmn"]),
                      max_value=int(row[f"{c}__lmx"]))
        # approx_count_distinct rel. error ~2%: candidates pass a cheap
        # sketch screen first, then ONE exact duplicate probe (limit-1
        # groupBy) so the emitted suite is guaranteed to pass on its own
        # profiling batch
        if nn > 0 and dist >= nn * 0.98 and nn == n:
            has_dup = (
                df.groupBy(c).count().where(F.col("count") > 1).limit(1).count() > 0
            )
            if not has_dup:
                suite.add("expect_column_values_to_be_unique", column=c)
        elif 0 < dist <= low_cardinality_max and nn > 0 and dist < nn:
            vals = [r[0] for r in
                    df.select(c).where(F.col(c).isNotNull()).distinct()
                    .limit(low_cardinality_max * 2).collect()]
            if len(vals) <= low_cardinality_max:
                suite.add("expect_column_values_to_be_in_set", column=c,
                          value_set=sorted(vals))
    _suggest_pii(df, suite, row, stringy)
    _suggest_multimodal(df, suite, {f.name for f in fields}, binary)
    return suite


def _suggest_pii(df: DataFrame, suite, row, stringy: set) -> None:
    """PII screen for free-text columns (observed max length >= 80 —
    shorter columns are codes/names where the phone/card classes only
    false-positive).  One map-side probe counts rows with any PII-shaped
    span per candidate; zero -> the strict expectation, some -> `mostly`
    backed off below the observed clean fraction (same floor rule as
    not_be_null) so the emitted suite passes its own batch; majority
    flagged -> not emitted (no passing form exists)."""
    from .ops import pii_count_expr

    cands = [c for c in stringy
             if int(row[f"{c}__nn"]) > 0 and int(row[f"{c}__lmx"] or 0) >= 80]
    if not cands:
        return
    probe = df.agg(*[
        F.sum((pii_count_expr(F.col(c)) >= 1).cast("int")).alias(c)
        for c in cands
    ]).collect()[0]
    for c in cands:
        viol = int(probe[c] or 0)
        nn = int(row[f"{c}__nn"])
        if viol == 0:
            suite.add("expect_column_pii_count_to_be_below", column=c)
            continue
        frac = viol / nn
        if frac >= 0.5:
            continue
        suite.add("expect_column_pii_count_to_be_below", column=c,
                  mostly=_mostly_backoff(frac))


_AUDIO_META = frozenset({"sr_hz", "dur_ms", "codec", "transcript"})
_IMAGE_META = frozenset({"width", "height", "channels", "format"})
_VIDEO_META = frozenset({"n_frames", "fps", "width", "height", "format"})


def _suggest_multimodal(df: DataFrame, suite, cols: set, binary: set) -> None:
    """Emit payload expectations for recognized (binary `bytes` + typed
    metadata) column groups — the north-rule audio table and the image
    table.  One decode pass (a probe validation) measures each candidate's
    violation fraction so the emitted suite still passes its own profiling
    batch: zero violations -> no mostly; some -> floored backoff (same rule
    as not_be_null); (nearly) all violating -> not emitted, since no
    passing form of the expectation exists."""
    if "bytes" not in binary:
        return
    if _AUDIO_META <= cols and "clip_id" in cols:
        candidates = [
            ("expect_audio_metadata_to_be_consistent", {}),
            ("expect_audio_snr_to_be_at_least", {"min_snr_db": 30.0}),
            ("expect_transcript_to_match_reference", {}),
            # quality classes share the probe's single decode (the flags
            # column upgrades to the quality schema when these are present)
            ("expect_audio_clipping_ratio_to_be_below", {"max_ratio": 0.01}),
            ("expect_audio_silence_ratio_to_be_below", {"max_ratio": 0.5}),
        ]
    elif _VIDEO_META <= cols:
        # video outranks image when both match: _VIDEO_META is the
        # stricter superset signature (n_frames/fps present)
        candidates = [("expect_video_metadata_to_be_consistent", {})]
    elif _IMAGE_META <= cols:
        candidates = [
            ("expect_image_metadata_to_be_consistent", {}),
            ("expect_image_mean_intensity_to_be_between",
             {"min_value": 0.0, "max_value": 255.0}),
        ]
    else:
        return
    from .executor import validate as _validate
    from .model import EngineOptions
    from .model import ExpectationSuite as _Suite

    probe = _Suite("__multimodal_probe")
    for t, kw in candidates:
        probe.add(t, **kw)
    bundle = _validate(df.sparkSession, df, probe,
                       EngineOptions(result_format="BASIC"))
    for (t, kw), evr in zip(candidates, bundle.suite_result.results):
        res = evr.result
        ec = int(res.get("element_count") or 0)
        mc = int(res.get("missing_count") or 0)
        uc = int(res.get("unexpected_count") or 0)
        denom = max(ec - mc, 0)
        if denom == 0:
            continue
        frac = uc / denom
        if uc == 0:
            suite.add(t, **kw)
        elif frac < 0.999:
            suite.add(t, mostly=_mostly_backoff(frac), **kw)
    bundle.unpersist()
