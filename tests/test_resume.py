"""Checkpoint/resume semantics (SURVEY.md §5 'Resume test'): kill after k
partitions, restart, assert only unvalidated partitions run and the final
result set is identical to an uninterrupted run."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions  # noqa: E402
from gx_spark.checkpoint import CheckpointRunner  # noqa: E402
from gx_spark.suites import audio_suite  # noqa: E402
from gx_spark.table_provider import ParquetDirTableProvider  # noqa: E402

from tests.conftest import AUDIO_DIR  # noqa: E402  (n800 fixture dir)


@pytest.fixture()
def results_dir(tmp_path):
    return str(tmp_path / "out")


def _runner(spark, audio_dir, results_dir):
    provider = ParquetDirTableProvider(
        f"{audio_dir}/audio_clips.parquet", "part_id"
    )
    return CheckpointRunner(
        spark, audio_suite(), provider, results_dir,
        EngineOptions(unexpected_index_column_names=("clip_id",)),
    )


def test_kill_and_resume(spark, audio_dir, results_dir):
    # interrupted run: only 3 partitions complete
    r1 = _runner(spark, audio_dir, results_dir).run(max_partitions=3)
    assert len(r1.validated_partitions) == 3
    assert r1.skipped_partitions == []

    # resume: a NEW runner instance (fresh process semantics) picks up the
    # manifest and validates only the remaining partitions
    runner2 = _runner(spark, audio_dir, results_dir)
    r2 = runner2.run()
    assert sorted(r2.skipped_partitions) == sorted(r1.validated_partitions)
    assert set(r2.validated_partitions).isdisjoint(r1.validated_partitions)
    assert len(r1.validated_partitions) + len(r2.validated_partitions) == 16

    # third run: nothing left to do
    r3 = _runner(spark, audio_dir, results_dir).run()
    assert r3.validated_partitions == []
    assert len(r3.skipped_partitions) == 16

    # results table: one row per expectation per partition, identical to an
    # uninterrupted reference run
    results = runner2.results()
    n_exp = len(audio_suite().expectations)
    assert results.count() == 16 * n_exp

    ref_dir = results_dir + "_ref"
    rref = _runner(spark, audio_dir, ref_dir).run()
    assert len(rref.validated_partitions) == 16
    ref_results = runner2.spark.read.parquet(f"{ref_dir}/_validation_results")

    key_cols = ["partition_id", "expectation_index", "success",
                "element_count", "unexpected_count"]
    got = sorted(map(str, results.select(*key_cols).collect()))
    want = sorted(map(str, ref_results.select(*key_cols).collect()))
    assert got == want

    # violations carry partition lineage and match the sidecar set
    viol = runner2.violations()
    got_v = {
        (r["clip_id"], r["expectation_type"])
        for r in viol.select("clip_id", "expectation_type").collect()
    }
    expected_v = {
        (r["clip_id"], r["expectation_type"])
        for r in spark.read.parquet(f"{AUDIO_DIR}/expected_violations.parquet")
        .where("expectation_type <> 'expect_column_values_to_exist_in_table'")
        .collect()
    }
    assert got_v == expected_v


def test_resume_decodes_each_row_once(spark, audio_dir, results_dir):
    """The observe denominators are read synchronously from the counts job's
    QueryExecution (executor._read_observed_metrics); the old listener-based
    Observation.get raced in this loop and fell back to a re-aggregation.
    Across a killed run + its resume, every row's audio decode must run
    exactly once — no partition pays a second scan of the decode column."""
    import gx_spark.expectations.audio_exp as audio_exp_mod
    import gx_spark.audio as audio_mod

    acc = spark.sparkContext.accumulator(0)
    real_factory = audio_mod.make_audio_flags_udf

    def counting_factory(*args, **kwargs):
        # forward any factory kwargs (e.g. quality=...) and reuse the real
        # UDF's return schema so this shim stays valid as the factory grows
        from pyspark.sql.functions import pandas_udf

        real = real_factory(*args, **kwargs)
        real_udf_fn = real.func

        # NB: no type hints — `from __future__ import annotations` would
        # route pandas_udf through an inference path that drops
        # executor-side accumulator updates (see test_round2)
        @pandas_udf(real.returnType)
        def counted(*series):
            acc.add(len(series[0]))
            return real_udf_fn(*series)

        return counted

    old = audio_exp_mod.make_audio_flags_udf
    audio_exp_mod.make_audio_flags_udf = counting_factory
    try:
        n = spark.read.parquet(f"{audio_dir}/audio_clips.parquet").count()
        r1 = _runner(spark, audio_dir, results_dir).run(max_partitions=5)
        assert len(r1.validated_partitions) == 5
        r2 = _runner(spark, audio_dir, results_dir).run()
        assert len(r1.validated_partitions) + len(r2.validated_partitions) == 16
    finally:
        audio_exp_mod.make_audio_flags_udf = old
    assert acc.value == n, f"decode ran {acc.value} times for {n} rows"


def test_snapshot_change_invalidates(spark, audio_dir, results_dir, tmp_path):
    # copy the table so we can mutate it
    tbl = str(tmp_path / "audio_clips.parquet")
    shutil.copytree(f"{audio_dir}/audio_clips.parquet", tbl) if os.path.isdir(
        f"{audio_dir}/audio_clips.parquet"
    ) else shutil.copy(f"{audio_dir}/audio_clips.parquet", tbl)
    provider = ParquetDirTableProvider(tbl, "part_id")
    runner = CheckpointRunner(
        spark, audio_suite(), provider, results_dir,
        EngineOptions(collect_violations=False),
    )
    r1 = runner.run(max_partitions=2)
    snap1 = r1.snapshot_id
    # touch the file → new snapshot → previously-done partitions re-run
    os.utime(tbl if os.path.isfile(tbl) else os.path.join(tbl, os.listdir(tbl)[0]),
             (1, 1))
    provider2 = ParquetDirTableProvider(tbl, "part_id")
    assert provider2.snapshot_id() != snap1


def test_resumable_validate_and_curate(spark, audio_dir, results_dir):
    """transform + extra_outputs: the one-decode validate+curate pass under
    checkpoint/resume — flag-column suite verdicts AND a per-partition
    features table, killed after 2 partitions and resumed, final features
    identical to a direct uninterrupted pass."""
    from pyspark.sql import functions as F

    from gx_spark.audio_ops import validate_and_extract_audio
    from gx_spark.model import ExpectationSuite
    from gx_spark.table_provider import ParquetDirTableProvider

    flag_suite = (
        ExpectationSuite("audio_flags")
        .add("expect_column_values_to_be_in_set", column="decodable",
             value_set=[True], mostly=0.5)
        .add("expect_column_values_to_not_be_null", column="fp64",
             mostly=0.5)
    )

    def make_runner():
        provider = ParquetDirTableProvider(
            f"{audio_dir}/audio_clips.parquet", "part_id"
        )
        return CheckpointRunner(
            spark, flag_suite, provider, results_dir,
            EngineOptions(unexpected_index_column_names=("clip_id",)),
            transform=lambda d: validate_and_extract_audio(
                d, keep_cols=["clip_id", "part_id"]),
            extra_outputs={
                "_features": lambda t: t.select(
                    "clip_id", "rms_dbfs", "silence_ratio", "fp64")
            },
        )

    r1 = make_runner().run(max_partitions=2)
    assert len(r1.validated_partitions) == 2
    runner2 = make_runner()
    r2 = runner2.run()
    assert len(r1.validated_partitions) + len(r2.validated_partitions) == 16

    feats = runner2.extra("_features")
    direct = validate_and_extract_audio(
        spark.read.parquet(f"{audio_dir}/audio_clips.parquet"),
        keep_cols=["clip_id"],
    ).select("clip_id", "rms_dbfs", "silence_ratio", "fp64")
    a = {r["clip_id"]: (r["rms_dbfs"], r["silence_ratio"], r["fp64"])
         for r in feats.select("clip_id", "rms_dbfs", "silence_ratio",
                               "fp64").collect()}
    b = {r["clip_id"]: (r["rms_dbfs"], r["silence_ratio"], r["fp64"])
         for r in direct.collect()}
    assert a == b
    # lineage columns recovered from the hive dirs
    assert {"snapshot_id", "partition_id"} <= set(feats.columns)
    # re-run: nothing left, features row count unchanged (== table rows;
    # the fixture's duplicate-clip_id violation row is a real extra row)
    n_direct = direct.count()
    r3 = make_runner().run()
    assert r3.validated_partitions == []
    assert runner2.extra("_features").count() == n_direct


def test_manifest_legacy_migration_and_torn_tail(tmp_path):
    """A legacy whole-dict manifest loads, migrates to the JSONL log on
    the next mark, and a torn tail line (killed mid-append) is ignored."""
    import json

    from gx_spark.checkpoint import CheckpointManifest

    p = str(tmp_path / "_m.json")
    legacy = {"snapA:0": {"run_id": "r", "snapshot_id": "snapA",
                          "partition_id": 0, "status": "done",
                          "metrics_rows": 3, "updated_ts": 1}}
    with open(p, "w") as f:
        json.dump(legacy, f, indent=1)
    m = CheckpointManifest(p)
    assert m.is_done("snapA", 0)
    m.mark("snapA", 1, "done", "r2", 3)
    # file is now a JSONL log carrying BOTH entries
    lines = [ln for ln in open(p).read().splitlines() if ln.strip()]
    assert len(lines) == 2 and all(json.loads(ln) for ln in lines)
    m2 = CheckpointManifest(p)
    assert m2.is_done("snapA", 0) and m2.is_done("snapA", 1)
    # torn tail from a kill mid-append: ignored, earlier entries intact
    with open(p, "a") as f:
        f.write('{"run_id": "r3", "snapshot_id": "snapA", "partiti')
    m3 = CheckpointManifest(p)
    assert m3.is_done("snapA", 0) and m3.is_done("snapA", 1)


def test_manifest_skips_non_entry_json_lines(tmp_path):
    """Valid-JSON lines that are not manifest entries (legacy '{}', a bare
    scalar, a dict missing keys) are skipped like torn lines — the resume
    must not crash on them and later entries still load."""
    import json

    from gx_spark.checkpoint import CheckpointManifest

    p = str(tmp_path / "_m.jsonl")
    good = {"run_id": "r", "snapshot_id": "snapA", "partition_id": 0,
            "status": "done", "metrics_rows": 1, "updated_ts": 1}
    with open(p, "w") as f:
        f.write("{}\n")                     # legacy empty manifest line
        f.write("42\n")                      # bare scalar
        f.write('["snapshot_id", 3]\n')      # non-dict JSON
        f.write('{"snapshot_id": "x"}\n')    # dict missing partition_id
        f.write(json.dumps(good) + "\n")
    m = CheckpointManifest(p)
    assert m.is_done("snapA", 0)
    assert len(m.entries) == 1
