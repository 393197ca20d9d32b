"""Structured Streaming adapter (optional extension — the reference has no
streaming support whatsoever, SURVEY.md §2.10; this wraps per-batch
validation in foreachBatch, the one idiomatic bridge).

Each micro-batch is validated as a normal batch; results and violations
append to the same `_validation_results` / `_violations` parquet tables as
the checkpoint runner, keyed by (run_id, batch_id).  Use watermarking /
windowing upstream of the validated stream as usual — the engine only sees
the materialized micro-batch DataFrame.

Semantics caveat (inherent to per-batch validation, not this adapter):
GLOBAL expectations — uniqueness, compound uniqueness, row_count vs other
table — are evaluated within each micro-batch.  A duplicate key pair split
across two micro-batches is invisible; route the stream through a
key-partitioned source (or repartition upstream by the key) when cross-batch
uniqueness matters, or run a periodic batch validation over the landed
table.  Per-row (map) and per-batch aggregate expectations are unaffected.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .executor import ValidationRun
from .model import EngineOptions, ExpectationSuite


def validate_stream(
    stream_df: DataFrame,
    suite: ExpectationSuite,
    results_dir: str,
    options: EngineOptions | None = None,
    checkpoint_location: str | None = None,
    trigger_available_now: bool = True,
):
    """Attach suite validation to a streaming DataFrame via foreachBatch.

    Returns the StreamingQuery.  With trigger_available_now=True the query
    drains what is available and stops — the batch-incremental mode that
    matches the engine's per-partition checkpoint semantics."""
    os.makedirs(results_dir, exist_ok=True)
    run_id = uuid.uuid4().hex[:12]
    spark = stream_df.sparkSession
    opts = options or EngineOptions()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bundle = ValidationRun(spark, suite, opts).validate(
            batch_df, run_id=f"{run_id}-b{batch_id}", partition_id=int(batch_id)
        )
        bundle.results_df(spark).write.mode("append").parquet(
            os.path.join(results_dir, "_validation_results")
        )
        vt = bundle.violations_table()
        if vt is not None:
            vt.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
                "append"
            ).parquet(os.path.join(results_dir, "_violations"))

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_iceberg(
    stream_df: DataFrame,
    table_location: str,
    suite: ExpectationSuite | None = None,
    options: EngineOptions | None = None,
    results_dir: str | None = None,
    quarantine: bool = False,
    checkpoint_location: str | None = None,
    trigger_available_now: bool = True,
):
    """Validated streaming ingestion into an Iceberg-lite table: each
    micro-batch is (optionally) validated, then appended as ONE Iceberg
    snapshot — so downstream readers get snapshot-isolation per batch,
    incremental reads (`added_after_snapshot_id`) consume exactly the new
    micro-batches, and a checkpointed validation run can trail the stream.

    quarantine=True (requires a suite and unexpected_index_column_names):
    rows named by any map-expectation violation are split out of the
    append and written to `<results_dir>/_quarantine` instead — the
    landed table then satisfies the per-row expectations by construction.
    Aggregate violations never quarantine rows.  The table is created
    from the first batch's schema if absent."""
    from functools import reduce

    from .iceberg import IcebergLiteTable

    if quarantine and suite is None:
        raise ValueError("quarantine requires a suite")
    spark = stream_df.sparkSession
    opts = options or EngineOptions()
    if quarantine and not opts.unexpected_index_column_names:
        raise ValueError("quarantine requires unexpected_index_column_names")
    run_id = uuid.uuid4().hex[:12]
    if results_dir:
        os.makedirs(results_dir, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if IcebergLiteTable.exists(table_location):
            t = IcebergLiteTable(table_location).refresh()
        else:
            t = IcebergLiteTable.create(table_location, batch_df.schema)
        good = batch_df
        if suite is not None:
            bundle = ValidationRun(spark, suite, opts).validate(
                batch_df, run_id=f"{run_id}-b{batch_id}",
                partition_id=int(batch_id))
            if results_dir:
                bundle.results_df(spark).write.mode("append").parquet(
                    os.path.join(results_dir, "_validation_results"))
            vt = bundle.violations_table()
            if results_dir and vt is not None:
                vt.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
                    "append").parquet(os.path.join(results_dir, "_violations"))
            if quarantine and vt is not None:
                keys = list(opts.unexpected_index_column_names)
                bad = vt.select(
                    *[F.col(c).alias(f"_bad_{c}") for c in keys]).distinct()
                cond = reduce(
                    lambda a, b: a & b,
                    [batch_df[c].cast("string") == F.col(f"_bad_{c}")
                     for c in keys])
                quar = batch_df.join(F.broadcast(bad), cond, "left_semi")
                quar.write.mode("append").parquet(
                    os.path.join(results_dir or table_location, "_quarantine"))
                good = batch_df.join(F.broadcast(bad), cond, "left_anti")
            bundle.unpersist()
        if not good.isEmpty():
            t.append(good)

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
