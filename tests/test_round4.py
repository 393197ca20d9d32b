"""Round-4 parity surfaces: plugin loading (GE plugins dir / contrib),
the run_diagnostics self-check harness (GE gallery `examples`), and
checkpoint notification actions (GE checkpoint/actions.py shape)."""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import (  # noqa: E402
    EngineOptions,
    ExpectationSuite,
    list_expectations,
    load_plugins,
    run_diagnostics,
    run_diagnostics_all,
    validate,
)

PLUGIN_SRC = '''
from pyspark.sql import functions as F

from gx_spark.expectations.column_map import ColumnMapExpectation
from gx_spark.registry import register_expectation


@register_expectation("expect_column_values_to_be_even")
class BeEven(ColumnMapExpectation):
    """Custom plugin expectation: integer column values must be even."""

    metric_name = "column_values.even"

    examples = [{
        "data": {"n": [2, 4, 5]},
        "schema": "n int",
        "tests": [{"title": "odd value fails",
                   "in": {"column": "n"},
                   "out": {"success": False, "unexpected_count": 1}}],
    }]

    def unexpected_condition(self, cfg, ctx):
        return F.col(cfg.kwargs["column"]) % 2 != 0
'''


def test_load_plugins_file_dir_and_module(tmp_path, spark):
    # plugin as a .py FILE
    p = tmp_path / "even_plugin.py"
    p.write_text(PLUGIN_SRC)
    loaded = load_plugins(str(p))
    assert loaded == ["gx_plugin_even_plugin"]
    assert "expect_column_values_to_be_even" in list_expectations()
    # a suite JSON referencing the custom type now validates
    df = spark.createDataFrame([(2,), (3,), (4,)], "n int")
    suite = ExpectationSuite.from_dict({
        "name": "plug", "expectations": [
            {"expectation_type": "expect_column_values_to_be_even",
             "kwargs": {"column": "n"}}]})
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    evr = b.suite_result.results[0]
    assert evr.success is False and evr.result["unexpected_count"] == 1
    # plugin DIRECTORY: every top-level *.py imports (underscore skipped)
    d = tmp_path / "plugdir"
    d.mkdir()
    (d / "again.py").write_text(PLUGIN_SRC.replace("be_even", "be_even2"))
    (d / "_private.py").write_text("raise RuntimeError('must not import')")
    assert load_plugins(str(d)) == ["gx_plugin_again"]
    assert "expect_column_values_to_be_even2" in list_expectations()
    # dotted MODULE path
    assert load_plugins("gx_spark.expectations.table") == [
        "gx_spark.expectations.table"]
    # comma-separated CLI form + unknown module raises
    with pytest.raises(ImportError):
        load_plugins("definitely_not_a_module_xyz")


def test_run_diagnostics_builtin_examples_pass(spark):
    for name in ("expect_column_values_to_not_be_null",
                 "expect_column_values_to_be_in_set",
                 "expect_column_values_to_be_between",
                 "expect_column_mean_to_be_between"):
        rep = run_diagnostics(spark, name)
        assert rep["success"], rep
        assert rep["examples_run"] == 2 and rep["examples_passed"] == 2
        checks = {c["check"] for c in rep["checklist"]}
        assert {"registered", "plan protocol", "docstring",
                "examples provided"} <= checks


def test_run_diagnostics_catches_wrong_example(tmp_path, spark):
    # author a plugin whose example EXPECTS the wrong outcome: the
    # harness must flag the example test, not crash
    p = tmp_path / "bad_plugin.py"
    p.write_text(PLUGIN_SRC
                 .replace("be_even", "be_even_bad")
                 .replace('"success": False', '"success": True'))
    load_plugins(str(p))
    rep = run_diagnostics(spark, "expect_column_values_to_be_even_bad")
    assert rep["success"] is False
    assert rep["examples_run"] == 1 and rep["examples_passed"] == 0
    bad = [c for c in rep["checklist"] if not c["passed"]]
    assert any("success=" in c["details"] for c in bad)


def test_run_diagnostics_unregistered_and_no_examples(spark):
    rep = run_diagnostics(spark, "expect_totally_unknown")
    assert rep["success"] is False
    assert rep["checklist"][0] == {
        "check": "registered", "passed": False, "details": "not in registry"}
    # a registered type without examples: healthy protocol, examples
    # check fails (maturity gating) so the overall report is not success.
    # r5 made every BUILT-IN example-covered, so register a bare
    # throwaway handler to exercise the gating path.
    from gx_spark.expectations.column_map import ColumnMapExpectation
    from gx_spark.registry import register_expectation

    @register_expectation("expect_diag_exampleless")
    class _Exampleless(ColumnMapExpectation):
        """Throwaway: protocol-complete but example-free."""

        def unexpected_condition(self, cfg, ctx):
            return F.lit(False)

    rep2 = run_diagnostics(spark, "expect_diag_exampleless")
    by = {c["check"]: c["passed"] for c in rep2["checklist"]}
    assert by["registered"] and by["plan protocol"]
    assert by["examples provided"] is False
    assert rep2["success"] is False


def test_run_diagnostics_all_sweeps_registry(spark):
    """r5: EVERY registered type is example-covered and green — media
    (audio/image/video binary payloads from the in-repo codecs),
    two-table referential (the examples `tables` extension), query, and
    schema-only types included.  A new type registered without gallery
    coverage fails this test (and breaks the expectation_diagnostics
    driver hash)."""
    reports = run_diagnostics_all(spark)
    names = [r["expectation_type"] for r in reports]
    assert names == sorted(names) and len(names) >= 60
    # earlier tests register throwaway plugin types (including one with
    # an intentionally wrong example and one example-free) in this
    # session — exclude them
    builtin = [r for r in reports
               if "be_even" not in r["expectation_type"]
               and "diag_exampleless" not in r["expectation_type"]]
    uncovered = [r["expectation_type"] for r in builtin
                 if r["examples_run"] == 0]
    assert not uncovered, uncovered
    failing = [r["expectation_type"] for r in builtin if not r["success"]]
    assert not failing, failing
    # the media + two-table + query types specifically ran real examples
    for needle in ("expect_audio_snr_to_be_at_least",
                   "expect_transcript_to_match_reference",
                   "expect_image_mean_intensity_to_be_between",
                   "expect_video_metadata_to_be_consistent",
                   "expect_column_values_to_exist_in_table",
                   "expect_table_row_count_to_equal_other_table",
                   "expect_query_to_return_no_rows",
                   "expect_column_pii_count_to_be_below"):
        rep = next(r for r in builtin if r["expectation_type"] == needle)
        assert rep["examples_run"] >= 1 and rep["success"], rep


def test_checkpoint_actions_fire_and_isolate(tmp_path, spark):
    from gx_spark.actions import (FileAction, LogAction, NoOpAction,
                                  SlackNotificationAction, parse_actions)
    from gx_spark.checkpoint import CheckpointRunner
    from gx_spark.table_provider import ParquetDirTableProvider

    src = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(40)],
        "clip_id int, part_id int, v double").write.partitionBy(
        "part_id").parquet(src)
    suite = ExpectationSuite("a").add(
        "expect_column_values_to_not_be_null", column="v")
    notif = str(tmp_path / "notify.jsonl")

    class Boom:
        def __call__(self, payload):
            raise RuntimeError("transport down")

    runner = CheckpointRunner(
        spark, suite, ParquetDirTableProvider(src, "part_id"),
        str(tmp_path / "out"),
        EngineOptions(unexpected_index_column_names=("clip_id",)),
        actions=[Boom(), FileAction(notif), LogAction(), NoOpAction()])
    res = runner.run()
    assert res.all_success and len(res.validated_partitions) == 4
    lines = [json.loads(ln) for ln in open(notif)]
    events = [ln["event"] for ln in lines]
    assert events.count("partition_validated") == 4
    assert events[-1] == "run_end"
    assert all(ln["success"] for ln in lines)
    assert sorted(lines[-1]["validated_partitions"]) == [0, 1, 2, 3]
    # slack action formats + respects notify_on filter (no network: the
    # urlopen failure is swallowed by design)
    s = SlackNotificationAction("http://127.0.0.1:1/hook",
                                notify_on="failure", timeout_s=0.2)
    s({"event": "run_end", "success": True})   # filtered: no POST attempt
    body = s.format_body({"event": "run_end", "success": False,
                          "suite_name": "a", "run_id": "r",
                          "snapshot_id": "s"})
    assert b":x:" in body and b"FAILED" in body
    # CLI spec parser
    acts = parse_actions(f"log,noop,file:{notif},webhook:http://x/h")
    assert len(acts) == 4
    with pytest.raises(ValueError):
        parse_actions("smoke-signals")


def test_validate_stream_fires_actions(tmp_path, spark):
    from gx_spark.actions import FileAction
    from gx_spark.streaming import validate_stream

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(i, float(i)) for i in range(30)],
        "clip_id int, v double").repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("clip_id int, v double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    notif = str(tmp_path / "stream_notify.jsonl")
    q = validate_stream(
        stream,
        ExpectationSuite("s").add(
            "expect_column_values_to_not_be_null", column="v"),
        str(tmp_path / "out"),
        EngineOptions(unexpected_index_column_names=("clip_id",)),
        checkpoint_location=str(tmp_path / "chk"),
        actions=[FileAction(notif)])
    q.awaitTermination(300)
    lines = [json.loads(ln) for ln in open(notif)]
    assert len(lines) >= 3
    assert all(ln["event"] == "batch_validated" and ln["success"]
               for ln in lines)
    assert sorted({ln["batch_id"] for ln in lines}) == list(
        range(len({ln["batch_id"] for ln in lines})))


# ---------------------------------------------------------------------------
# scalable global monotonic check (bucketed lag + boundary stitch)
# ---------------------------------------------------------------------------

def _monotonic_result(spark, df, **kwargs):
    suite = ExpectationSuite("mono").add(
        "expect_column_values_to_be_increasing", **kwargs)
    b = validate(spark, df, suite, EngineOptions())
    r = b.suite_result.results[0]
    b.unpersist()
    return r


def test_global_increasing_counts_every_boundary(spark):
    """Strictly decreasing data checked as increasing flags EVERY adjacent
    pair (n-1): proves the bucket-boundary stitch neither drops nor
    double-counts the 31 cross-bucket pairs of the 32-bucket plan."""
    n = 3200
    df = spark.range(n).select(
        (10 * 10**6 - F.col("id")).alias("v"),
        F.col("id").alias("t"),
    ).repartition(8)
    r = _monotonic_result(spark, df, column="v", order_by="t")
    assert r.success is False
    assert r.result["unexpected_count"] == n - 1


def test_global_increasing_sorted_with_ties_passes(spark):
    n = 3200
    df = spark.range(n).select(
        (F.col("id") / 7).cast("long").alias("v"),
        F.col("id").alias("t"),
    ).repartition(8)
    r = _monotonic_result(spark, df, column="v", order_by="t")
    assert r.success is True and r.result["unexpected_count"] == 0
    # strictly: each tie flags, count = serial oracle
    r2 = _monotonic_result(spark, df, column="v", order_by="t",
                           strictly=True)
    vals = [i // 7 for i in range(n)]
    exp = sum(1 for a, b in zip(vals, vals[1:]) if b <= a)
    assert r2.result["unexpected_count"] == exp


def test_global_increasing_random_walk_matches_serial_oracle(spark):
    import random

    rng = random.Random(42)
    vals, v = [], 0
    for _ in range(2000):
        v += rng.choice([-3, 1, 2, 5])
        vals.append(v)
    rows = [(i, x) for i, x in enumerate(vals)]
    df = spark.createDataFrame(rows, "t long, v long").repartition(16)
    exp = sum(1 for a, b in zip(vals, vals[1:]) if b < a)
    r = _monotonic_result(spark, df, column="v", order_by="t")
    assert r.result["unexpected_count"] == exp
    assert r.success is (exp == 0)


def test_global_increasing_string_order_key(spark):
    """Non-numeric order key exercises the repartitionByRange fallback."""
    rows = [(f"k{i:05d}", i if i != 1500 else -1) for i in range(3000)]
    df = spark.createDataFrame(rows, "t string, v long").repartition(8)
    r = _monotonic_result(spark, df, column="v", order_by="t")
    assert r.result["unexpected_count"] == 1  # the drop into -1 at t=1500
    assert r.result["partial_unexpected_list"]
