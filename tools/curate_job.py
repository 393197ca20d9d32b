"""Standalone validate+curate job for the scaling benchmark — launched via
`spark-submit --py-files gx_spark.zip tools/curate_job.py <table_path>
[max_clips]` (same contract as tools/pipeline_job.py, but timing the
round-3 ONE-DECODE combined pass: north-rule validation verdicts +
curation features + dedup grouping from a single decode of each clip).

Prints one JSON line: {"n", "wall_sec", "clips_per_sec", "cores",
"meta_bad", "snr_bad", "tx_bad", "dup_groups"}."""

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

    spark = SparkSession.builder.appName("gx-curate-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from gx_spark.audio_ops import validate_and_extract_audio
    from gx_spark.iceberg import IcebergLiteTable

    if IcebergLiteTable.exists(table_path):
        df = IcebergLiteTable(table_path).read(spark)
    else:
        df = spark.read.parquet(table_path)
    if max_clips:
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
    cur = validate_and_extract_audio(df, keep_cols=["clip_id"]).persist()
    stats = cur.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~(F.col("decodable") & F.col("header_sr_ok")
                 & F.col("dur_ok"))).cast("long")).alias("meta_bad"),
        F.sum((F.col("snr_db") < 30.0).cast("long")).alias("snr_bad"),
        F.sum((~F.col("transcript_ok")).cast("long")).alias("tx_bad"),
        F.avg("rms_dbfs").alias("avg_rms"),
    ).collect()[0]
    dup_groups = (
        cur.where(F.col("fp64").isNotNull())
        .groupBy("fp64").count().where("count >= 2").count()
    )
    cur.unpersist()
    wall = time.time() - t0
    assert stats["n"] == n
    print(json.dumps({
        "n": n, "wall_sec": round(wall, 2),
        "clips_per_sec": round(n / wall, 1),
        "cores": cores,
        "meta_bad": int(stats["meta_bad"] or 0),
        "snr_bad": int(stats["snr_bad"] or 0),
        "tx_bad": int(stats["tx_bad"] or 0),
        "dup_groups": dup_groups,
    }))


if __name__ == "__main__":
    main()
