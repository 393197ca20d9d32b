"""Stateful streaming: cross-batch duplicate detection via keyed
applyInPandasWithState, and watermarked per-window aggregate validation
(gx_spark/streaming.py).

Micro-batch boundaries are forced with maxFilesPerTrigger=1 over a file
source — availableNow then replays each file as its own micro-batch, so
cross-batch state and watermark advancement are exercised for real."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gx_spark.model import ExpectationSuite
from gx_spark.streaming import (
    detect_cross_batch_duplicates,
    validate_stream_windowed,
)


_MTIME0 = 1_700_000_000


def _write_batches(spark, src, batches, schema):
    """One parquet file per batch with STRICTLY increasing mtimes: the file
    stream source orders unread files by modification time, and same-second
    writes would tie and scramble micro-batch order."""
    os.makedirs(src, exist_ok=True)
    existing = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        parts = sorted(
            (os.path.getmtime(os.path.join(src, f)), f)
            for f in os.listdir(src) if f.endswith(".parquet")
        )
        newest = os.path.join(src, parts[-1][1])
        t = _MTIME0 + (existing + i) * 10
        os.utime(newest, (t, t))


def test_cross_batch_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    schema = "clip_id string, v long"
    # three single-file batches: c2 duplicates WITHIN batch 0; c1 duplicates
    # ACROSS batches 0->2 (invisible to per-batch validation); c9 appears 3x
    b0 = [("c1", 1), ("c2", 2), ("c2", 3), ("c9", 0)]
    b1 = [("c3", 4), ("c9", 1)]
    b2 = [("c1", 5), ("c4", 6), ("c9", 2)]
    # one parquet file per batch so maxFilesPerTrigger=1 = one micro-batch each
    for rows in (b0, b1, b2):
        _write_batches(spark, src, [rows], schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = detect_cross_batch_duplicates(
        stream, ["clip_id"], out, checkpoint_location=chk
    )
    q.awaitTermination(180)
    dup = spark.read.parquet(f"{out}/_dup_violations")
    rows = {(r["clip_id"], r["seen_count"], r["new_in_batch"])
            for r in dup.collect()}
    keys = {r[0] for r in rows}
    assert keys == {"c1", "c2", "c9"}
    # within-batch dup visible immediately
    assert ("c2", 2, 2) in rows
    # cross-batch dup only detectable with state: first seen count 1 (no
    # emit), second arrival lifts to 2
    assert ("c1", 2, 1) in rows
    # c9 re-emits with its growing total (update mode)
    assert ("c9", 2, 1) in rows and ("c9", 3, 1) in rows
    # uniques never emitted
    assert not keys & {"c3", "c4"}


def test_cross_batch_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    schema = "clip_id string, v long"
    _write_batches(spark, src, [[("a", 1), ("b", 2)]], schema)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    detect_cross_batch_duplicates(
        stream, ["clip_id"], out, checkpoint_location=chk
    ).awaitTermination(180)
    assert not os.path.exists(f"{out}/_dup_violations")  # no dups yet
    # new run, same checkpoint: 'a' arrives again -> state remembers run 1
    _write_batches(spark, src, [[("a", 9)]], schema)
    stream2 = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    detect_cross_batch_duplicates(
        stream2, ["clip_id"], out, checkpoint_location=chk
    ).awaitTermination(180)
    dup = spark.read.parquet(f"{out}/_dup_violations")
    assert {(r["clip_id"], r["seen_count"]) for r in dup.collect()} == {("a", 2)}


@pytest.fixture()
def windowed_out(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    schema = "ts timestamp, val double"

    def ts(minute, sec=0):
        import datetime

        return datetime.datetime(2026, 1, 1, 10, minute, sec)

    # batch 0: window [10:00,10:05) gets 4 rows, val mean 2.5
    b0 = [(ts(0), 1.0), (ts(1), 2.0), (ts(2), 3.0), (ts(4), 4.0)]
    # batch 1: max event 10:20 -> watermark becomes 10:15 AFTER this batch
    b1 = [(ts(20), 100.0), (ts(6), 5.0)]
    # batch 2: runs with watermark 10:15 -> EVICTS+EMITS [10:00,10:05) and
    # [10:05,10:10) at its end (Spark merges late rows into still-live
    # state; dropping requires the state to be gone first)
    b2 = [(ts(22), 101.0)]
    # batch 3: late row for the now-evicted first window — DROPPED
    # (asserted via numRowsDroppedByWatermark=1 in the verdicts below);
    # 10:40 advances the watermark so [10:20,10:25) flushes too
    b3 = [(ts(1, 30), 999.0), (ts(40), 7.0)]
    for rows in (b0, b1, b2, b3):
        _write_batches(spark, src, [rows], schema)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    suite = (
        ExpectationSuite("w")
        .add("expect_table_row_count_to_be_between", min_value=1, max_value=10)
        .add("expect_column_mean_to_be_between", column="val",
             min_value=0.0, max_value=50.0)
        .add("expect_column_values_to_not_be_null", column="val", mostly=0.9)
    )
    q = validate_stream_windowed(
        stream, "ts", "5 minutes", suite, out, watermark_delay="5 minutes"
    )
    q.awaitTermination(180)
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress if p["stateOperators"]
    )
    return spark.read.parquet(f"{out}/_window_results"), dropped


def test_windowed_verdicts(windowed_out):
    windowed_out, dropped = windowed_out
    assert dropped == 1  # the 999.0 row, later than the evicted window
    rows = windowed_out.collect()
    by_win = {}
    for r in rows:
        by_win.setdefault(r["window_start"].minute, []).append(r)
    # first window [10:00,10:05) closed by batch 1's watermark advance;
    # the late 999.0 row from batch 2 was dropped -> mean stays 2.5
    w0 = {r["expectation_type"]: r for r in by_win[0]}
    assert w0["expect_table_row_count_to_be_between"]["observed"] == 4.0
    assert w0["expect_column_mean_to_be_between"]["observed"] == 2.5
    assert all(r["success"] for r in by_win[0])
    # window [10:05,10:10): single row val=5
    w5 = {r["expectation_type"]: r for r in by_win[5]}
    assert w5["expect_table_row_count_to_be_between"]["observed"] == 1.0
    # window [10:20,10:25): mean 100.5 breaches max_value=50 -> failure caught
    w20 = {r["expectation_type"]: r for r in by_win[20]}
    assert w20["expect_column_mean_to_be_between"]["observed"] == 100.5
    assert w20["expect_column_mean_to_be_between"]["success"] is False
    assert w20["expect_table_row_count_to_be_between"]["success"] is True
    # the still-open window ([10:40,10:45)) must NOT have emitted
    assert set(by_win) == {0, 5, 20}
    # each closed window emits exactly one verdict row per expectation
    for ws, rs in by_win.items():
        assert len(rs) == 3, (ws, rs)


def test_windowed_rejects_nonincremental(spark, tmp_path):
    os.makedirs(str(tmp_path / "nosrc"))
    stream = spark.readStream.schema("ts timestamp, v double").parquet(
        str(tmp_path / "nosrc"))
    suite = ExpectationSuite("bad").add(
        "expect_column_values_to_be_unique", column="v")
    with pytest.raises(ValueError, match="no incremental windowed"):
        validate_stream_windowed(stream, "ts", "5 minutes", suite,
                                 str(tmp_path / "o"))
