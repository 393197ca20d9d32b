"""Count-min-sketch frequency estimation (sketch-mode value_counts /
most_common_value, SURVEY.md §2.4).

At 10^12 rows an exact value_counts groupBy shuffles every distinct value;
the CMS path is ONE fused aggregation (Catalyst partial+final merge — the
treeAggregate physics) producing a fixed-size sketch, probed driver-side for
the candidate values only.  Candidates come from the caller (a partition
object's value list) or from `DataFrame.stat.freqItems` (a single-pass
misra-gries style heavy-hitter scan).  CMS counts are one-sided
overestimates bounded by eps * n with the configured confidence."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_aggregate(df: DataFrame, column: str, eps: float, confidence: float,
                  seed: int) -> tuple[bytes, int]:
    """(serialized CMS, nonnull count) in ONE aggregation pass."""
    row = df.agg(
        F.count_min_sketch(column, F.lit(eps), F.lit(confidence), F.lit(seed)).alias("s"),
        F.count(F.col(column)).alias("n"),
    ).collect()[0]
    return bytes(row["s"]), int(row["n"])


def cms_probe(spark, sketch_bytes: bytes, values: list[Any]) -> dict[Any, int]:
    """Point-query the sketch for each candidate value (driver-side, via the
    public org.apache.spark.util.sketch.CountMinSketch API — strings hash as
    UTF-8 bytes and numbers as longs on both the agg and query side)."""
    jsk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        sketch_bytes
    )
    return {v: int(jsk.estimateCount(v)) for v in values}


def cms_value_counts(
    df: DataFrame,
    column: str,
    candidates: list[Any] | None = None,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    freq_support: float = 0.001,
) -> tuple[dict[Any, int], int]:
    """Approximate value_counts for the candidate set.

    Returns ({value: estimated_count}, total_nonnull).  When `candidates` is
    None they are discovered with freqItems(support=freq_support) — any value
    with frequency >= support is guaranteed present (plus possible false
    positives, which the CMS probe then scores honestly)."""
    d = df.where(F.col(column).isNotNull())
    if candidates is None:
        candidates = d.stat.freqItems([column], freq_support).collect()[0][0] or []
    sketch, n = cms_aggregate(d, column, eps, confidence, seed)
    if not candidates:
        return {}, n
    return cms_probe(df.sparkSession, sketch, list(candidates)), n
