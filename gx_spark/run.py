"""spark-submit entry point: resumable suite validation over a table.

    spark-submit --py-files gx_spark.zip -m ... gx_spark/run.py \
        --table-path /data/audio_clips  (parquet dir OR Iceberg table) \
        --suite audio | /path/to/suite.json \
        --results-dir /data/_gx_out \
        [--partition-column part_id] [--mode sketch] [--max-partitions N] \
        [--snapshot-id N] [--incremental-from N]   (Iceberg tables)

In-sandbox it runs with a local master; on a cluster the same script runs
unchanged under spark-submit (the session builder respects an existing
SparkSession/conf).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _table_has_binary_column(table_path: str) -> bool:
    """One-footer schema sniff (pyarrow, no SparkSession): does any data
    file under `table_path` carry a binary column?  Works for both layouts
    run.py accepts — a parquet dir and an Iceberg-lite location (whose
    data files are parquet underneath).  Unreadable/empty paths return
    False (the real read will produce the real error)."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        sample = None
        for root, dirs, files in os.walk(table_path):
            # skip Iceberg metadata (avro manifests, json)
            dirs[:] = [d for d in dirs if d != "metadata"]
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    sample = os.path.join(root, fn)
                    break
            if sample:
                break
        if sample is None:
            return False
        schema = pq.ParquetFile(sample).schema_arrow
        return any(
            pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type)
            for f in schema
        )
    except Exception:  # noqa: BLE001 — sniffing must never block the run
        return False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-path", required=True)
    ap.add_argument("--suite", default="audio",
                    help="'audio', 'audio_aggregates', or path to a suite JSON")
    ap.add_argument("--results-dir", required=True)
    ap.add_argument("--partition-column", default="part_id")
    ap.add_argument("--mode", default="exact", choices=["exact", "sketch"])
    ap.add_argument("--index-columns", default="clip_id")
    ap.add_argument("--max-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", default=None)
    ap.add_argument("--binary-scan", default="auto",
                    choices=["auto", "on", "off"],
                    help="measured binary-scan/GC tuning: 'auto' sniffs one "
                         "parquet footer (local paths only), 'on' forces it "
                         "pre-launch (use for s3a://hdfs:// tables, where "
                         "the sniff cannot see a footer), 'off' disables")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="pin an Iceberg snapshot (default: current)")
    ap.add_argument("--incremental-from", type=int, default=None,
                    help="validate only files appended after this Iceberg "
                         "snapshot id (steady-state append-only mode)")
    ap.add_argument("--curate", action="store_true",
                    help="one-decode validate+curate: each partition runs "
                         "validate_and_extract_audio once, the suite "
                         "validates the flag columns (--suite audio swaps "
                         "to the flag form), and per-partition curation "
                         "features + dedup keys land in <results-dir>/"
                         "_features under the same resume manifest")
    ap.add_argument("--plugins", default=None,
                    help="comma-separated custom-expectation plugins: "
                         "dotted module paths, .py files, or plugin "
                         "directories — imported BEFORE the suite loads so "
                         "suite JSON referencing custom expectation types "
                         "resolves (plus any installed gx_spark.plugins "
                         "entry points)")
    ap.add_argument("--actions", default=None,
                    help="comma-separated checkpoint actions fired after "
                         "each validated partition and at run end: 'log', "
                         "'noop', 'file:<path>' (JSONL), or "
                         "'webhook:<url>'")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("gx-spark-run")
    if args.master:
        builder = builder.master(args.master)
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", args.shuffle_partitions)
    from gx_spark.skew import (apply_binary_scan_confs,
                               binary_scan_session_defaults,
                               session_defaults)

    builder = session_defaults(builder)
    # Binary-bearing suites (the north-rule audio table) get the measured
    # scan/GC tuning (BENCH/BASELINE.md) — sniffed from one parquet footer
    # via pyarrow BEFORE the JVM exists so the GC flag can still apply.
    # The sniff only sees LOCAL paths; for s3a://hdfs:// tables pass
    # --binary-scan on (a post-launch schema check below still rescues the
    # runtime-settable confs in auto mode).
    if args.binary_scan == "off":
        binary_table = False
    elif args.binary_scan == "on":
        binary_table = True
    else:
        binary_table = _table_has_binary_column(args.table_path)
    if binary_table:
        builder = binary_scan_session_defaults(builder)
    spark = builder.getOrCreate()
    if binary_table:
        # covers the pre-existing-session path (spark-submit on a cluster
        # re-running in one JVM): the SQL/hadoop confs are per-query
        apply_binary_scan_confs(spark)

    from gx_spark.checkpoint import CheckpointRunner
    from gx_spark.iceberg import IcebergLiteTable
    from gx_spark.model import EngineOptions
    from gx_spark.suite_io import load_suite
    from gx_spark.suites import (audio_aggregate_suite, audio_flag_suite,
                                 audio_suite)
    from gx_spark.table_provider import (IcebergLiteTableProvider,
                                         ParquetDirTableProvider)

    if args.plugins:
        from gx_spark.registry import load_plugins

        load_plugins(args.plugins)

    if args.suite == "audio":
        suite = audio_flag_suite() if args.curate else audio_suite()
    elif args.suite == "audio_aggregates":
        suite = audio_aggregate_suite()
    else:
        suite = load_suite(args.suite)

    options = EngineOptions(
        mode=args.mode,
        unexpected_index_column_names=tuple(
            c for c in args.index_columns.split(",") if c
        ),
    )
    # Iceberg(-lite) tables are auto-detected (the north-rule input shape):
    # true snapshot-id lineage + manifest-driven (metadata-only) partition
    # planning, with optional snapshot pinning / incremental slices.
    if IcebergLiteTable.exists(args.table_path):
        provider = IcebergLiteTableProvider(
            args.table_path, snapshot_id=args.snapshot_id,
            incremental_from=args.incremental_from)
    else:
        if args.snapshot_id is not None or args.incremental_from is not None:
            ap.error("--snapshot-id/--incremental-from require an Iceberg table")
        provider = ParquetDirTableProvider(args.table_path, args.partition_column)
    if args.binary_scan == "auto" and not binary_table:
        # the pyarrow sniff cannot see non-local paths (s3a://, hdfs://):
        # rescue the runtime-settable scan confs from the real schema.
        # Only the launch-only GC flag is lost — say so instead of
        # silently scanning 4096-row batches of multi-MB byte[] rows.
        from pyspark.sql.types import BinaryType

        if any(isinstance(f.dataType, BinaryType)
               for f in provider.load(spark).schema.fields):
            apply_binary_scan_confs(spark)
            print("note: binary column detected post-launch; scan confs "
                  "applied, but the JVM GC flag needs --binary-scan on "
                  "(or spark-submit --conf) at launch", file=sys.stderr)
    transform = None
    extra_outputs = None
    if args.curate:
        from gx_spark.audio_ops import validate_and_extract_audio

        transform = lambda d: validate_and_extract_audio(d)  # noqa: E731
        extra_outputs = {
            "_features": lambda t: t.select(
                "clip_id", "rms_dbfs", "peak", "clipping_ratio",
                "zcr_per_sec", "silence_ratio", "spectral_centroid_hz",
                "dominant_hz", "fp64")
        }
    from gx_spark.actions import parse_actions

    runner = CheckpointRunner(
        spark, suite, provider,
        args.results_dir, options,
        transform=transform, extra_outputs=extra_outputs,
        actions=parse_actions(args.actions),
    )
    res = runner.run(max_partitions=args.max_partitions)
    print(json.dumps({
        "run_id": res.run_id,
        "snapshot_id": res.snapshot_id,
        "validated_partitions": res.validated_partitions,
        "skipped_partitions": res.skipped_partitions,
        "all_success": res.all_success,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
