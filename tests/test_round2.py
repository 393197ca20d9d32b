"""Round-2 fixes (VERDICT.md next-round items 1-4 + ADVICE):

- violations DF persisted: expensive map conditions evaluated once per run
- broadcast-join violation recovery (no isin literal lists)
- bounded, deterministic partial unexpected lists
- theta prefilter short-circuits only in the sketches' exact regime
- poison expectation isolation (fused-stage runtime failure -> exception EVR
  for the owner, healthy expectations still complete)
- catch_exceptions=False raises
- checkpoint resume is exactly-once (overwrite on deterministic subpaths)
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# persist-once violations
# ---------------------------------------------------------------------------


def test_violations_df_is_persisted_and_released(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("v")
    )
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between", column="v", min_value=0, max_value=5
    )
    bundle = validate(spark, df, suite, EngineOptions())
    assert bundle.violations is not None
    assert bundle.violations.storageLevel.useMemory  # persisted
    # downstream actions read the cache, not a recomputed DAG
    assert "InMemoryTableScan" in _plan(bundle.violations_table())
    bundle.unpersist()
    assert not bundle.violations.storageLevel.useMemory


def test_persist_violations_opt_out(spark):
    df = spark.range(10).select((F.col("id") % 3).alias("v"))
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between", column="v", min_value=0, max_value=1
    )
    bundle = validate(spark, df, suite, EngineOptions(persist_violations=False))
    assert not bundle.violations.storageLevel.useMemory
    assert bundle.suite_result.results[0].result["unexpected_count"] == 3


# ---------------------------------------------------------------------------
# broadcast-join violation recovery
# ---------------------------------------------------------------------------


def test_unique_violation_recovery_broadcast_many_keys(spark):
    # 15k duplicated keys: the old isin(<=100k literals) plan would bloat;
    # the broadcast probe stays a join
    n_dup = 15_000
    df = spark.range(n_dup * 2 + 1000).select(
        F.when(F.col("id") < n_dup * 2, (F.col("id") % n_dup))
        .otherwise(F.col("id") + 1_000_000)
        .alias("k")
    )
    suite = ExpectationSuite("s").add("expect_column_values_to_be_unique", column="k")
    bundle = validate(spark, df, suite, EngineOptions())
    r = bundle.suite_result.results[0]
    assert r.result["unexpected_count"] == n_dup * 2
    assert bundle.violations_table().count() == n_dup * 2
    plan = _plan(bundle.violations)
    assert "BroadcastHashJoin" in plan
    assert "isin" not in plan.lower()
    bundle.unpersist()


def test_compound_unique_broadcast_and_null_keys(spark):
    rows = [(1, None), (1, None), (2, "x"), (3, "y"), (3, "y"), (4, None)]
    df = spark.createDataFrame(rows, "a int, b string")
    suite = ExpectationSuite("s").add(
        "expect_compound_columns_to_be_unique", column_list=["a", "b"],
        ignore_row_if="never",
    )
    bundle = validate(spark, df, suite, EngineOptions())
    r = bundle.suite_result.results[0]
    # (1,null) x2 and (3,'y') x2 are dups; null-safe join must catch (1,null)
    assert r.result["unexpected_count"] == 4
    got = sorted(
        row["observed_value"]
        for row in bundle.violations_table().collect()
    )
    assert len(got) == 4
    assert sum('\\"a\\":1' in g for g in got) == 2
    bundle.unpersist()


def test_referential_violation_recovery_broadcast(spark):
    fact = spark.createDataFrame(
        [(i, i % 50) for i in range(1000)] + [(9999, 777), (9998, 778)],
        "id int, fk int",
    )
    dim = spark.createDataFrame([(i,) for i in range(50)], "k int")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_exist_in_table",
        column="fk", other_table_name="dim", other_column="k",
    )
    bundle = validate(spark, fact, suite, EngineOptions(), tables={"dim": dim})
    assert bundle.suite_result.results[0].result["unexpected_count"] == 2
    vals = sorted(
        int(r["observed_value"].split(":")[1].rstrip("}"))
        for r in bundle.violations_table().collect()
    )
    assert vals == [777, 778]
    assert "BroadcastHashJoin" in _plan(bundle.violations)
    bundle.unpersist()


# ---------------------------------------------------------------------------
# bounded, deterministic partial lists
# ---------------------------------------------------------------------------


def test_partial_lists_first_n_in_row_order(spark):
    # single input partition -> row order is the data order
    df = spark.createDataFrame(
        [(i, 100 + i) for i in range(50)], "idx int, v int"
    ).coalesce(1)
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between", column="v",
        min_value=0, max_value=99,  # every row violates
    )
    b1 = validate(spark, df, suite, EngineOptions(
        result_format="SUMMARY",
        partial_unexpected_count=5, unexpected_index_column_names=("idx",)))
    b2 = validate(spark, df, suite, EngineOptions(
        result_format="SUMMARY",
        partial_unexpected_count=5, unexpected_index_column_names=("idx",)))
    r1 = b1.suite_result.results[0].result
    r2 = b2.suite_result.results[0].result
    assert r1["partial_unexpected_list"] == [100, 101, 102, 103, 104]
    assert r1["partial_unexpected_index_list"] == [0, 1, 2, 3, 4]
    assert r1["partial_unexpected_list"] == r2["partial_unexpected_list"]
    assert r1["unexpected_count"] == 50
    b1.unpersist()
    b2.unpersist()


def test_large_violation_count_bounded_lists(spark):
    # 1M violating rows at BASIC: aggregation state must stay bounded
    df = spark.range(1_000_000).select(F.col("id").alias("v"))
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between", column="v", min_value=-1, max_value=-1
    )
    bundle = validate(spark, df, suite, EngineOptions(partial_unexpected_count=20))
    r = bundle.suite_result.results[0].result
    assert r["unexpected_count"] == 1_000_000
    assert len(r["partial_unexpected_list"]) == 20
    bundle.unpersist()


# ---------------------------------------------------------------------------
# theta prefilter exact-regime guard
# ---------------------------------------------------------------------------


def test_sketch_referential_catches_orphans_above_saturation(spark):
    # 20k distinct FK values (sketch saturated at lgk=12 -> 4096), 5 orphans
    n = 20_000
    fact = spark.range(n).select(F.col("id").alias("fk"))
    dim = spark.range(n - 5).select(F.col("id").alias("k"))
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_exist_in_table",
        column="fk", other_table_name="dim", other_column="k",
    )
    bundle = validate(
        spark, fact, suite,
        EngineOptions(mode="sketch", collect_violations=False),
        tables={"dim": dim},
    )
    assert bundle.suite_result.results[0].result["unexpected_count"] == 5


def test_sketch_referential_short_circuits_in_exact_regime(spark):
    fact = spark.range(2000).select((F.col("id") % 100).alias("fk"))
    dim = spark.range(100).select(F.col("id").alias("k"))
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_exist_in_table",
        column="fk", other_table_name="dim", other_column="k",
    )
    bundle = validate(
        spark, fact, suite,
        EngineOptions(mode="sketch", collect_violations=False),
        tables={"dim": dim},
    )
    r = bundle.suite_result.results[0]
    assert r.success and r.result["unexpected_count"] == 0


# ---------------------------------------------------------------------------
# poison expectation isolation + catch_exceptions=False
# ---------------------------------------------------------------------------


def test_poison_regex_isolated_to_exception_evr(spark):
    df = spark.createDataFrame([("a",), ("bb",), (None,)], "s string")
    suite = (
        ExpectationSuite("s")
        .add("expect_column_values_to_not_be_null", column="s")
        .add("expect_column_values_to_match_regex", column="s", regex="[invalid")
        .add("expect_column_value_lengths_to_be_between", column="s", min_value=1)
    )
    bundle = validate(spark, df, suite, EngineOptions())
    rs = bundle.suite_result.results
    assert rs[0].result["unexpected_count"] == 1  # not_null still computed
    assert rs[1].exception_info["raised_exception"]
    assert rs[2].success and rs[2].result["unexpected_count"] == 0
    # healthy expectations still get violation rows
    vt = bundle.violations_table()
    assert vt is not None
    types = {r["expectation_type"] for r in vt.collect()}
    assert types == {"expect_column_values_to_not_be_null"}
    bundle.unpersist()


def test_catch_exceptions_false_raises(spark):
    df = spark.createDataFrame([(1,)], "a int")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="missing_col",
        catch_exceptions=False,
    )
    from gx_spark.expectations.base import MissingColumnError

    with pytest.raises(MissingColumnError):
        validate(spark, df, suite, EngineOptions())


def test_catch_exceptions_default_still_wraps(spark):
    df = spark.createDataFrame([(1,)], "a int")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="missing_col"
    )
    bundle = validate(spark, df, suite, EngineOptions())
    assert bundle.suite_result.results[0].exception_info["raised_exception"]


# ---------------------------------------------------------------------------
# checkpoint exactly-once on resume
# ---------------------------------------------------------------------------


def test_checkpoint_rerun_after_lost_done_mark_is_exactly_once(spark, tmp_path):
    from gx_spark.checkpoint import CheckpointRunner
    from gx_spark.table_provider import ParquetDirTableProvider

    src = str(tmp_path / "tbl")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("part_id"),
        F.concat(F.lit("clip_"), F.lpad(F.col("id").cast("string"), 10, "0")).alias("clip_id"),
    ).write.partitionBy("part_id").parquet(src)

    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="id"
    )
    results_dir = str(tmp_path / "results")
    runner = CheckpointRunner(
        spark, suite, ParquetDirTableProvider(src, partition_column="part_id"),
        results_dir,
    )
    res1 = runner.run(max_partitions=2)
    assert len(res1.validated_partitions) == 2
    # simulate a crash AFTER the parquet write but BEFORE mark('done'):
    # forget one partition's done state and re-run
    snap = res1.snapshot_id
    lost = res1.validated_partitions[-1]
    del runner.manifest.entries[runner.manifest.key(snap, lost)]
    res2 = runner.run()
    assert lost in res2.validated_partitions
    out = runner.results()
    # exactly one result row per (partition, expectation) despite the re-run
    assert out.count() == 4
    assert out.groupBy("partition_id").count().agg(F.max("count")).first()[0] == 1


# ---------------------------------------------------------------------------
# decode-once: the audio pandas UDF evaluates each row exactly once per run
# ---------------------------------------------------------------------------


def test_audio_decode_runs_once_per_run(spark, audio_dir):
    """Row-counting wrapper around the flags UDF: a full validate() +
    violations count + results materialization must evaluate the decode
    exactly n_rows times (the persisted violations DF serves every
    downstream action; VERDICT r1 found the decode running twice)."""
    import pandas as pd

    import gx_spark.audio as audio_mod
    import gx_spark.expectations.audio_exp as audio_exp_mod
    from gx_spark.suites import audio_suite

    acc = spark.sparkContext.accumulator(0)
    real_factory = audio_mod.make_audio_flags_udf

    def counting_factory(quality=None):
        from pyspark.sql.functions import pandas_udf

        from gx_spark.audio import AUDIO_FLAGS_SCHEMA

        assert quality is None  # plain suite: no quality upgrade requested
        real_udf_fn = real_factory().func  # underlying batch fn

        # NB: no type hints here — this module has `from __future__ import
        # annotations`, which turns hints into strings and silently routes
        # pandas_udf through a different inference path where executor-side
        # accumulator updates are dropped
        @pandas_udf(AUDIO_FLAGS_SCHEMA)
        def counted(*series):
            acc.add(len(series[0]))
            return real_udf_fn(*series)

        return counted

    old = audio_exp_mod.make_audio_flags_udf
    audio_exp_mod.make_audio_flags_udf = counting_factory
    try:
        df = spark.read.parquet(f"{audio_dir}/audio_clips.parquet")
        n = df.count()
        b = validate(spark, df, audio_suite(),
                     EngineOptions(unexpected_index_column_names=("clip_id",)))
        # three downstream consumers, all served by the persisted violations DF
        b.violations_table().count()
        b.violations_table().collect()
        b.results_df(spark).count()
        b.unpersist()
    finally:
        audio_exp_mod.make_audio_flags_udf = old
    assert acc.value == n, f"decode ran {acc.value} times for {n} rows"
