"""spark-submit CLI (gx_spark/run.py) over parquet dirs AND Iceberg-lite
tables: auto-detection, snapshot pinning, incremental slices."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.iceberg import IcebergLiteTable  # noqa: E402
from gx_spark.run import main as run_main  # noqa: E402
from tests.conftest import audio_dir, spark  # noqa: F401,E402


def _run(capsys, *argv):
    rc = run_main(list(argv))
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    return rc, json.loads(out[-1])


def test_cli_iceberg_autodetect_and_incremental(spark, audio_dir, tmp_path,
                                                capsys):
    loc = str(tmp_path / "audio_ice")
    t = IcebergLiteTable.create_from_parquet(
        loc, f"{audio_dir}/audio_clips.parquet")
    s1 = t.current_snapshot_id()
    results = str(tmp_path / "out")

    rc, res = _run(capsys, "--table-path", loc, "--suite", "audio",
                   "--results-dir", results)
    assert rc == 0
    assert res["snapshot_id"] == str(s1)
    assert len(res["validated_partitions"]) > 0

    # second run over the same snapshot: everything checkpoint-skipped
    rc, res2 = _run(capsys, "--table-path", loc, "--suite", "audio",
                    "--results-dir", results)
    assert res2["validated_partitions"] == []
    assert sorted(res2["skipped_partitions"]) == sorted(res["validated_partitions"])

    # append a slice, validate ONLY the new files via --incremental-from
    new_rows = t.read(spark).limit(8)
    t.append(new_rows)
    rc, res3 = _run(capsys, "--table-path", loc, "--suite", "audio",
                    "--results-dir", results,
                    "--incremental-from", str(s1))
    assert rc == 0
    assert "-inc-" in res3["snapshot_id"]
    assert len(res3["validated_partitions"]) > 0


def test_cli_parquet_dir_rejects_iceberg_flags(audio_dir, tmp_path, capsys):
    import pytest

    with pytest.raises(SystemExit):
        run_main(["--table-path", f"{audio_dir}/audio_clips.parquet",
                  "--suite", "audio",
                  "--results-dir", str(tmp_path / "o"),
                  "--incremental-from", "5"])


def test_cli_curate_writes_features_and_resumes(spark, audio_dir, tmp_path,
                                                capsys):
    """--curate: one-decode validate+curate under the CLI — flag-suite
    verdicts in _validation_results AND per-partition curation features in
    _features, resumable via the same manifest."""
    results = str(tmp_path / "out_curate")
    rc, res = _run(capsys, "--table-path", f"{audio_dir}/audio_clips.parquet",
                   "--suite", "audio", "--results-dir", results,
                   "--curate", "--max-partitions", "3")
    assert rc == 0 and len(res["validated_partitions"]) == 3
    rc, res2 = _run(capsys, "--table-path",
                    f"{audio_dir}/audio_clips.parquet",
                    "--suite", "audio", "--results-dir", results, "--curate")
    assert rc == 0
    assert sorted(res2["skipped_partitions"]) == sorted(res["validated_partitions"])

    feats = spark.read.option(
        "basePath", os.path.join(results, "_features")
    ).parquet(os.path.join(results, "_features"))
    n_src = spark.read.parquet(f"{audio_dir}/audio_clips.parquet").count()
    assert feats.count() == n_src
    assert {"rms_dbfs", "fp64", "partition_id"} <= set(feats.columns)
    # verdicts came from the flag suite (no audio UDF expectation types)
    vres = spark.read.option(
        "basePath", os.path.join(results, "_validation_results")
    ).parquet(os.path.join(results, "_validation_results"))
    types = {r["expectation_type"] for r in
             vres.select("expectation_type").distinct().collect()}
    assert "expect_audio_snr_to_be_at_least" not in types
    assert "expect_column_values_to_be_in_set" in types


def test_cli_curate_iceberg_incremental(spark, audio_dir, tmp_path, capsys):
    """--curate composes with the Iceberg steady-state shape: a full
    curate run over the initial snapshot, then --incremental-from curates
    ONLY the appended files — features accumulate under both snapshots'
    lineage dirs."""
    loc = str(tmp_path / "audio_ice_cur")
    t = IcebergLiteTable.create_from_parquet(
        loc, f"{audio_dir}/audio_clips.parquet")
    s1 = t.current_snapshot_id()
    results = str(tmp_path / "out_ice_cur")

    rc, res = _run(capsys, "--table-path", loc, "--suite", "audio",
                   "--results-dir", results, "--curate")
    assert rc == 0 and len(res["validated_partitions"]) > 0
    n1 = spark.read.parquet(f"{audio_dir}/audio_clips.parquet").count()

    t.append(t.read(spark).limit(8))
    rc, res2 = _run(capsys, "--table-path", loc, "--suite", "audio",
                    "--results-dir", results, "--curate",
                    "--incremental-from", str(s1))
    assert rc == 0 and "-inc-" in res2["snapshot_id"]
    assert len(res2["validated_partitions"]) > 0

    feats = spark.read.option(
        "basePath", os.path.join(results, "_features")
    ).parquet(os.path.join(results, "_features"))
    assert feats.count() == n1 + 8
    assert feats.select("snapshot_id").distinct().count() == 2


def test_binary_scan_conf_sniff_and_apply(spark, audio_dir, tmp_path,
                                          capsys):
    """Binary-bearing tables get the measured scan confs (BENCH/
    BASELINE.md): the pyarrow footer sniff finds the bytes column with no
    SparkSession, and a run over such a table applies the runtime-settable
    confs to the (pre-existing) session."""
    from gx_spark.run import _table_has_binary_column
    from gx_spark.skew import BINARY_SCAN_CONFS

    assert _table_has_binary_column(audio_dir)
    assert not _table_has_binary_column("/root/testdata/sf0.001")
    assert not _table_has_binary_column(str(tmp_path / "nope"))

    def snapshot():
        out = {}
        for k in BINARY_SCAN_CONFS:
            try:
                out[k] = spark.conf.get(k)
            except Exception:
                out[k] = None
        return out

    before = snapshot()
    try:
        loc = str(tmp_path / "audio_ice_conf")
        IcebergLiteTable.create_from_parquet(
            loc, f"{audio_dir}/audio_clips.parquet")
        rc, _ = _run(capsys, "--table-path", loc, "--suite", "audio",
                     "--results-dir", str(tmp_path / "out_conf"))
        assert rc == 0
        after = snapshot()
        for k, v in BINARY_SCAN_CONFS.items():
            assert after[k] == v, k
    finally:
        # the test session is shared; narrow-scan tests should not inherit
        # the small binary-scan columnar batches
        for k, v in before.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_binary_scan_off_flag(tmp_path, capsys, spark, audio_dir):
    """--binary-scan off must skip the measured scan confs even on a
    binary-bearing table (the auto sniff would apply them)."""
    from gx_spark.skew import BINARY_SCAN_CONFS

    def snapshot():
        return {k: spark.conf.get(k, None) for k in BINARY_SCAN_CONFS}

    before = snapshot()
    try:
        rc, _ = _run(capsys, "--table-path", f"{audio_dir}/audio_clips.parquet",
                     "--suite", "audio", "--binary-scan", "off",
                     "--results-dir", str(tmp_path / "out_noconf"))
        assert rc == 0
        assert snapshot() == before
    finally:
        for k, v in before.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
