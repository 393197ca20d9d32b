"""Plan-shape tests (SURVEY.md §5): the physical plans must have the shape
the 100 TB design depends on — binary off every shuffle, one fused aggregate
pair, pruned scans."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite  # noqa: E402
from gx_spark.plancheck import (  # noqa: E402
    compile_suite,
    count_nodes,
    exchange_sections,
    formatted_plan,
    read_schemas,
    stage1_df,
    violations_df,
)
from gx_spark.suites import audio_suite  # noqa: E402


def test_bytes_never_in_exchange_and_single_agg_pair(spark, audio_dir):
    df = spark.read.parquet(f"{audio_dir}/audio_clips.parquet")
    # audio suite minus the data-metric expectation (unique) so the fused agg
    # plan stands alone
    suite = ExpectationSuite(
        "a",
        [e for e in audio_suite().expectations
         if e.expectation_type != "expect_column_values_to_be_unique"],
    )
    ctx = compile_suite(spark, df, suite)
    plan = formatted_plan(stage1_df(ctx))
    exchanges = exchange_sections(plan)
    assert exchanges, "expected the partial->final agg exchange"
    for ex in exchanges:
        assert "bytes" not in ex, f"binary column entered a shuffle:\n{ex}"
    # one partial+final pair over one scan: exactly 2 aggregates, 1 exchange
    n_agg = (count_nodes(plan, "HashAggregate")
             + count_nodes(plan, "ObjectHashAggregate")
             + count_nodes(plan, "SortAggregate"))
    assert n_agg == 2, plan
    assert len(exchanges) == 1, plan
    assert count_nodes(plan, "Scan parquet") == 1, plan


def test_violations_pass_is_map_only(spark, audio_dir):
    df = spark.read.parquet(f"{audio_dir}/audio_clips.parquet")
    suite = ExpectationSuite(
        "a",
        [e for e in audio_suite().expectations
         if e.expectation_type != "expect_column_values_to_be_unique"],
    )
    ctx = compile_suite(
        spark, df, suite, EngineOptions(unexpected_index_column_names=("clip_id",))
    )
    plan = formatted_plan(violations_df(ctx))
    assert "Exchange" not in plan, f"violations pass must not shuffle:\n{plan}"


def test_column_pruning_reaches_scan(spark, tmp_path):
    # a 2-column suite over a 7-column table must scan only those 2 columns
    path = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr(
        "id", "id * 2 as a", "id * 3 as b", "cast(id as string) as c",
        "id * 5 as d", "id * 6 as e", "id * 7 as f"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    suite = (
        ExpectationSuite("prune")
        .add("expect_column_values_to_not_be_null", column="a")
        .add("expect_column_mean_to_be_between", column="b", min_value=0)
    )
    ctx = compile_suite(spark, df, suite)
    plan = formatted_plan(stage1_df(ctx))
    schemas = read_schemas(plan)
    assert schemas, plan
    for s in schemas:
        assert "a" in s and "b" in s
        for col in ("c", "d", "e", "f"):
            assert f"{col}:" not in s, f"unpruned column {col}: {s}"


def test_predicate_pushdown_from_row_condition(spark, tmp_path):
    path = str(tmp_path / "t2.parquet")
    spark.range(1000).selectExpr("id", "id % 7 as grp").write.parquet(path)
    df = spark.read.parquet(path)
    suite = ExpectationSuite("pp").add(
        "expect_column_mean_to_be_between", column="id", min_value=0,
        row_condition="grp = 3",
    )
    ctx = compile_suite(spark, df, suite)
    plan = formatted_plan(stage1_df(ctx))
    # domain folding keeps a single scan (no per-domain scans) feeding one
    # partial+final aggregate pair; the when(grp=3, …) conditionals live
    # inside the aggregate expressions, not a separate filtered subplan
    assert count_nodes(plan, "Scan parquet") == 1
    assert count_nodes(plan, "HashAggregate") == 2
    schemas = read_schemas(plan)
    assert any("grp" in s for s in schemas), schemas


def test_image_suite_plan_shape(spark, tmp_path):
    """The image layer must preserve the audio invariants: the binary column
    never enters an Exchange, the stage-1 agg is one partial/final pair that
    never decodes, and the violations pass is map-only."""
    import sys as _sys

    _sys.path.insert(0, REPO)
    from gx_spark import image as gim

    path = str(tmp_path / "imgs.parquet")
    rows = []
    for i in range(50):
        b = gim.raw_encode(gim.synth_image(f"i{i}", 16, 16))
        rows.append((f"i{i}", bytearray(b), 16, 16, 3, "gxraw"))
    spark.createDataFrame(
        rows,
        "img_id string, bytes binary, width int, height int, channels int, format string",
    ).write.parquet(path)
    df = spark.read.parquet(path)
    suite = (
        ExpectationSuite("img")
        .add("expect_image_metadata_to_be_consistent")
        .add("expect_image_mean_intensity_to_be_between",
             min_value=0.0, max_value=255.0)
        .add("expect_column_values_to_not_be_null", column="img_id")
    )
    ctx = compile_suite(
        spark, df, suite, EngineOptions(unexpected_index_column_names=("img_id",))
    )
    s1 = formatted_plan(stage1_df(ctx))
    for ex in exchange_sections(s1):
        assert "bytes" not in ex, f"binary column entered a shuffle:\n{ex}"
    # the stage-1 agg never runs the decode UDF (Catalyst prunes __image)
    assert "ArrowEvalPython" not in s1 and "image_flags" not in s1, s1
    vplan = formatted_plan(violations_df(ctx))
    assert "Exchange" not in vplan, f"violations pass must not shuffle:\n{vplan}"
    assert "ArrowEvalPython" in vplan or "EvalPython" in vplan  # decode lives here


def test_audio_suite_over_iceberg_read_keeps_binary_off_shuffles(
        spark, audio_dir, tmp_path):
    """The bench/scaling jobs read the audio table THROUGH Iceberg-lite
    (north rule); the plan invariants must hold on that path too: binary
    off every exchange, one fused partial/final agg pair, one scan."""
    from gx_spark.iceberg import IcebergLiteTable

    t = IcebergLiteTable.create_from_parquet(
        str(tmp_path / "audio_ice"), f"{audio_dir}/audio_clips.parquet")
    df = t.read(spark)
    suite = ExpectationSuite(
        "a",
        [e for e in audio_suite().expectations
         if e.expectation_type != "expect_column_values_to_be_unique"],
    )
    ctx = compile_suite(spark, df, suite)
    plan = formatted_plan(stage1_df(ctx))
    for ex in exchange_sections(plan):
        assert "bytes" not in ex, f"binary column entered a shuffle:\n{ex}"
    n_agg = (count_nodes(plan, "HashAggregate")
             + count_nodes(plan, "ObjectHashAggregate")
             + count_nodes(plan, "SortAggregate"))
    assert n_agg == 2, plan
    assert count_nodes(plan, "Scan parquet") == 1, plan
    # column pruning still reaches the scan: the fused agg reads no bytes
    assert all("bytes" not in rs for rs in read_schemas(plan)), plan


def test_changelog_delete_legs_broadcast_never_sortmerge(spark, tmp_path):
    """changes() recovers equality-deleted rows via a BROADCAST semi-join
    of the (small) key set against the parent read, and positional pairs
    ride a broadcast inner join — neither delete leg may plan a
    SortMergeJoin that would shuffle the parent table."""
    from pyspark.sql import functions as F

    from gx_spark.iceberg import IcebergLiteTable

    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    t = IcebergLiteTable.create(str(tmp_path / "cdc"), base.schema)
    t.append(base.repartition(4))
    s0 = t.current_snapshot_id()
    t.equality_delete(
        spark, spark.createDataFrame([(i,) for i in range(50)], "k long"),
        ["k"])
    t.delete(spark, "k >= 990")
    ch = t.changes(spark, from_snapshot_id=s0)
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert ch.count() == 60
