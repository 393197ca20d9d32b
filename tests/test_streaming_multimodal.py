"""Streaming adapter over the FULL multimodal (audio) suite: three
micro-batches through foreachBatch must produce exactly the batch-mode
violation set, with per-batch results + checkpoint (VERDICT r2 punch #8).

The audio suite's decode pandas-UDF runs inside each micro-batch the same
way it does in batch mode (persist-once per validate() call), so the
streaming path inherits the decode-once-per-run guarantee per micro-batch.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, validate  # noqa: E402
from gx_spark.streaming import validate_stream  # noqa: E402
from gx_spark.suites import audio_suite  # noqa: E402


def test_stream_audio_suite_matches_batch(spark, audio_dir, audio_df, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    # shard the batch table into 3 files -> 3 micro-batches at
    # maxFilesPerTrigger=1 (the sandbox table is a single file).  Sharding
    # hashes clip_id so duplicate keys co-locate in ONE micro-batch: global
    # expectations (unique) only match batch mode under key-partitioned
    # micro-batches — inherent to per-batch validation, documented in
    # gx_spark/streaming.py.
    audio_df.repartition(3, F.col("clip_id")).write.parquet(src)

    opts = EngineOptions(unexpected_index_column_names=("clip_id",))
    batch_bundle = validate(spark, spark.read.parquet(src), audio_suite(), opts)
    batch_set = {
        (r["clip_id"], r["expectation_type"])
        for r in batch_bundle.violations_table()
        .select("clip_id", "expectation_type")
        .collect()
    }
    batch_bundle.unpersist()
    assert batch_set  # generator plants violations; the test must see them

    stream = (
        spark.readStream.schema(audio_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = validate_stream(
        stream, audio_suite(), out, opts, checkpoint_location=chk
    )
    q.awaitTermination(300)

    viol = spark.read.parquet(f"{out}/_violations")
    assert viol.select("batch_id").distinct().count() >= 3
    stream_set = {
        (r["clip_id"], r["expectation_type"])
        for r in viol.select("clip_id", "expectation_type").collect()
    }
    assert stream_set == batch_set

    # per-batch EVR rows landed for every micro-batch (one row per
    # expectation per batch), keyed by (run_id-b<batch>, partition_id)
    results = spark.read.parquet(f"{out}/_validation_results")
    n_exp = len(audio_suite().expectations)
    per_batch = (
        results.groupBy("partition_id").agg(F.count("*").alias("n")).collect()
    )
    assert len(per_batch) >= 3
    assert all(r["n"] == n_exp for r in per_batch)


def test_stream_to_iceberg_quarantine(spark, audio_dir, audio_df, tmp_path):
    """Validated streaming ingestion: micro-batches land as one Iceberg
    snapshot each, violating clips quarantined out of the table."""
    from gx_spark.iceberg import IcebergLiteTable
    from gx_spark.streaming import stream_to_iceberg

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    loc = str(tmp_path / "landed")
    audio_df.repartition(3, F.col("clip_id")).write.parquet(src)

    opts = EngineOptions(unexpected_index_column_names=("clip_id",))
    stream = (
        spark.readStream.schema(audio_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_to_iceberg(
        stream, loc, audio_suite(), opts, results_dir=out,
        quarantine=True, checkpoint_location=chk,
    )
    q.awaitTermination(300)

    t = IcebergLiteTable(loc)
    # one snapshot per micro-batch
    assert len(t.snapshots()) == 3
    landed = t.read(spark)
    quar = spark.read.parquet(f"{out}/_quarantine")
    n_src = audio_df.count()
    assert landed.count() + quar.count() == n_src
    assert quar.count() > 0  # generator plants violations
    # the landed table is clean of quarantined clips
    bad_ids = {r.clip_id for r in quar.select("clip_id").distinct().collect()}
    landed_ids = {r.clip_id for r in landed.select("clip_id").collect()}
    assert not (bad_ids & landed_ids)
    # violating clips recorded in _violations all went to quarantine
    viol_ids = {r.clip_id for r in spark.read.parquet(f"{out}/_violations")
                .select("clip_id").distinct().collect()}
    assert viol_ids <= bad_ids
    # incremental read after the first snapshot = batches 2+3
    s1 = t.snapshots()[0]["snapshot-id"]
    inc = t.read(spark, added_after_snapshot_id=s1).count()
    assert 0 < inc < landed.count()
    # re-validating the landed table: per-row map expectations now pass
    bundle = validate(spark, landed, audio_suite(), opts)
    vt = bundle.violations_table()
    per_row_viols = vt.where(
        F.col("expectation_type").startswith("expect_column_values")
        | F.col("expectation_type").startswith("expect_audio")).count()
    bundle.unpersist()
    assert per_row_viols == 0


def test_stream_validate_and_curate(spark, audio_dir, audio_df, tmp_path):
    """Streaming form of the one-decode validate+curate pass: three
    micro-batches through transform+extra_outputs produce a features
    table identical to the batch-mode validate_and_extract_audio output,
    and flag-suite verdicts per batch."""
    from gx_spark.audio_ops import validate_and_extract_audio
    from gx_spark.model import ExpectationSuite

    src = str(tmp_path / "src_cur")
    out = str(tmp_path / "out_cur")
    chk = str(tmp_path / "chk_cur")
    audio_df.repartition(3, F.col("clip_id")).write.parquet(src)

    flag_suite = (
        ExpectationSuite("flags")
        .add("expect_column_values_to_be_in_set", column="decodable",
             value_set=[True], mostly=0.5)
    )
    q = validate_stream(
        spark.readStream.schema(audio_df.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
        flag_suite, out,
        EngineOptions(unexpected_index_column_names=("clip_id",)),
        checkpoint_location=chk,
        transform=lambda d: validate_and_extract_audio(
            d, keep_cols=["clip_id"]),
        extra_outputs={"_features": lambda t: t.select(
            "clip_id", "rms_dbfs", "silence_ratio", "fp64")},
    )
    q.awaitTermination(300)

    feats = spark.read.parquet(f"{out}/_features")
    assert feats.select("batch_id").distinct().count() >= 3
    direct = validate_and_extract_audio(
        spark.read.parquet(src), keep_cols=["clip_id"]
    ).select("clip_id", "rms_dbfs", "silence_ratio", "fp64")
    a = sorted(map(tuple, feats.select("clip_id", "rms_dbfs",
                                       "silence_ratio", "fp64").collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b
    res = spark.read.parquet(f"{out}/_validation_results")
    assert res.where("expectation_type = 'expect_column_values_to_be_in_set'").count() >= 3


def test_stream_to_iceberg_wap_gate(spark, tmp_path):
    """gate='batch' (write-audit-publish): each micro-batch lands whole or
    not at all — a batch with ANY violation never reaches main, surviving
    only as a rejected-<id> tag."""
    from gx_spark.iceberg import IcebergLiteTable
    from gx_spark.streaming import stream_to_iceberg
    from gx_spark import ExpectationSuite

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    loc = str(tmp_path / "landed")
    mk = lambda lo, bad: spark.range(lo, lo + 10).select(  # noqa: E731
        F.col("id").alias("k"),
        F.when(F.col("id") == lo, F.lit(-5.0) if bad else F.lit(1.0))
        .otherwise(F.col("id").cast("double")).alias("v"))
    # three files written one at a time -> three micro-batches at
    # maxFilesPerTrigger=1; the middle one carries a violation
    mk(0, False).coalesce(1).write.mode("append").parquet(src)
    mk(10, True).coalesce(1).write.mode("append").parquet(src)
    mk(20, False).coalesce(1).write.mode("append").parquet(src)

    gate_suite = ExpectationSuite("gate").add(
        "expect_column_values_to_be_between", column="v", min_value=0)
    stream = (
        spark.readStream.schema(mk(0, False).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_to_iceberg(
        stream, loc, gate_suite, EngineOptions(), results_dir=out,
        checkpoint_location=chk, gate="batch",
    )
    q.awaitTermination(300)

    t = IcebergLiteTable(loc)
    landed = t.read(spark)
    assert landed.count() == 20
    # the bad batch is absent WHOLE (not just its violating row)
    ks = {r.k for r in landed.select("k").collect()}
    assert ks == set(range(10)) | set(range(20, 30))
    # main's published history = the two good batches
    assert len(t.metadata["snapshot-log"]) == 2
    # the rejected stage survives under a tag, holding main-at-stage +
    # the bad batch (10..19)
    rejected = [n for n in t.refs if n.startswith("rejected-")]
    assert len(rejected) == 1
    tagged = t.read(spark, ref=rejected[0])
    assert {r.k for r in tagged.select("k").collect()} >= set(range(10, 20))
    # per-batch EVRs + the bad batch's violations were recorded (the
    # batch_id partition dir is the per-batch identity on this path)
    results = spark.read.parquet(f"{out}/_validation_results")
    assert results.select("batch_id").distinct().count() == 3
    viol = spark.read.parquet(f"{out}/_violations")
    assert viol.count() == 1


def test_wap_gates_audio_ingestion(spark, audio_dir, audio_df, tmp_path):
    """The north-rule composite: the FULL audio expectation suite gates
    Iceberg ingestion via write-audit-publish — a clip batch with planted
    decode/SNR/transcript violations never reaches the published table."""
    from gx_spark import validate_and_publish
    from gx_spark.iceberg import IcebergLiteTable

    opts = EngineOptions(unexpected_index_column_names=("clip_id",))
    bundle = validate(spark, audio_df, audio_suite(), opts)
    bad_ids = {r.clip_id for r in bundle.violations_table()
               .select("clip_id").distinct().collect()}
    bundle.unpersist()
    assert bad_ids  # generator plants violations
    clean = audio_df.where(~F.col("clip_id").isin(list(bad_ids)))

    t = IcebergLiteTable.create(str(tmp_path / "clips"), audio_df.schema)
    r1 = validate_and_publish(spark, t, clean.coalesce(1),
                              audio_suite(), opts)
    assert r1.published
    # the dirty batch (contains every planted violation) is rejected
    # whole; duplicates of already-published clips also fail `unique`
    # within the batch-scoped audit only if staged together — the planted
    # violations alone guarantee rejection here
    r2 = validate_and_publish(spark, t, audio_df.coalesce(1),
                              audio_suite(), opts)
    assert not r2.published
    landed = t.read(spark)
    assert landed.count() == clean.count()
    assert not ({r.clip_id for r in landed.select("clip_id").collect()}
                & bad_ids)
    # the rejected stage is preserved for reprocessing
    assert r2.rejected_tag in t.refs
