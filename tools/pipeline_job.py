"""Standalone audio-pipeline job for the scaling benchmark — launched via
`spark-submit --py-files gx_spark.zip tools/pipeline_job.py <table_path>
[max_clips]` (same contract as tools/audio_job.py, but timing the round-3
curation pass: acoustic features + dedup fingerprint from ONE decode).

Prints one JSON line: {"n": ..., "wall_sec": ..., "clips_per_sec": ...,
"cores": ..., "dup_groups": ...}."""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    table_path = sys.argv[1]
    max_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("gx-pipeline-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from gx_spark.audio_ops import extract_audio_features
    from gx_spark.iceberg import IcebergLiteTable

    if IcebergLiteTable.exists(table_path):
        df = IcebergLiteTable(table_path).read(spark)
    else:
        df = spark.read.parquet(table_path)
    if max_clips:
        # deterministic prefix by partition column (same slice at every
        # parallelism level); falls back to limit for partition-less tables
        if "part_id" in df.columns:
            per_part = df.where("part_id = 0").count()
            k = max(1, max_clips // max(per_part, 1))
            df = df.where(F.col("part_id") < k)
        else:
            df = df.limit(max_clips)
    cap = int(os.environ.get("GX_AUDIO_TASKS", "0"))
    if cap and cores > cap:
        df = df.coalesce(cap)
    n = df.count()  # warms scan/footer caches outside the timed section

    t0 = time.time()
    feats = extract_audio_features(
        df, keep_cols=["clip_id"], fingerprint=True).persist()
    stats = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("rms_dbfs").alias("avg_rms"),
        F.sum((F.col("clipping_ratio") > 0.01).cast("long")).alias("clipped"),
    ).collect()[0]
    dup_groups = (
        feats.where(F.col("fp64").isNotNull())
        .groupBy("fp64").count().where("count >= 2").count()
    )
    feats.unpersist()
    wall = time.time() - t0
    assert stats["n"] == n
    print(json.dumps({
        "n": n, "wall_sec": round(wall, 2),
        "clips_per_sec": round(n / wall, 1),
        "cores": cores, "dup_groups": dup_groups,
    }))


if __name__ == "__main__":
    main()
