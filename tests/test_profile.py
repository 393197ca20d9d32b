"""column.partition auto-binning + MetricStore + profile→store→drift
round trip (VERDICT.md next-round item 5)."""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import (  # noqa: E402
    EngineOptions,
    ExpectationSuite,
    MetricStore,
    Profiler,
    Validator,
    build_categorical_partition_object,
    build_continuous_partition_object,
    validate,
)


def test_uniform_partition_object(spark):
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    po = build_continuous_partition_object(df, "v", bins="uniform", n_bins=4)
    assert po["bins"] == [0.0, 24.75, 49.5, 74.25, 99.0]
    assert len(po["weights"]) == 4
    assert math.isclose(sum(po["weights"]), 1.0, rel_tol=1e-12)


def test_quantile_partition_object_equal_mass(spark):
    df = spark.range(10000).select((F.col("id") * F.col("id")).cast("double").alias("v"))
    po = build_continuous_partition_object(df, "v", bins="quantile", n_bins=5)
    assert len(po["bins"]) == 6
    assert all(b1 < b2 for b1, b2 in zip(po["bins"], po["bins"][1:]))
    for w in po["weights"]:
        assert math.isclose(w, 0.2, abs_tol=0.01), po["weights"]


def test_auto_partition_sturges(spark):
    df = spark.range(1024).select(F.col("id").cast("double").alias("v"))
    po = build_continuous_partition_object(df, "v", bins="auto")
    assert len(po["bins"]) - 1 == 11  # ceil(log2(1024)) + 1


def test_categorical_partition_object(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "v string"
    )
    po = build_categorical_partition_object(df, "v")
    assert po["values"] == ["a", "b", "c"]
    assert po["weights"] == [0.6, 0.3, 0.1]


def test_metric_store_roundtrip_and_latest_wins(spark, tmp_path):
    store = MetricStore(spark, str(tmp_path / "metrics"))
    r1 = store.write("t", {("c", "column.mean"): 1.5})
    r2 = store.write("t", {("c", "column.mean"): 2.5})
    assert store.get("t", "c", "column.mean") == 2.5  # latest
    assert store.get("t", "c", "column.mean", run_id=r1) == 1.5
    assert store.resolve_urn(f"urn:gx:metric:t:c:column.mean:{r1}") == 1.5
    with pytest.raises(KeyError):
        store.get("t", "c", "no.such.metric")
    with pytest.raises(ValueError):
        store.resolve_urn("urn:wrong:shape")


def test_profile_store_drift_roundtrip(spark, tmp_path):
    # baseline batch ~ N(0, 1) surrogate; drifted batch shifted by +30
    base = spark.range(5000).select(((F.col("id") % 100)).cast("double").alias("v"))
    drifted = base.select((F.col("v") + 30.0).alias("v"))
    store = MetricStore(spark, str(tmp_path / "metrics"))
    run_id = Profiler(spark, store).profile(
        base, "tbl", columns=["v"], partition_columns=["v"], n_bins=5
    )
    assert store.get("tbl", "", "table.row_count") == 5000
    assert store.get("tbl", "v", "column.mean") == 49.5

    # same-distribution batch passes, drifted batch fails, via URN indirection
    v = Validator(spark, base, EngineOptions(collect_violations=False),
                  metric_store=store)
    r_ok = v.expect_column_kl_divergence_to_be_less_than(
        column="v",
        partition_object={"$PARAMETER": "urn:gx:metric:tbl:v:column.partition"},
        threshold=0.05, tail_weight_holdout=0.01,
    )
    assert r_ok.success, r_ok.result

    v2 = Validator(spark, drifted, EngineOptions(collect_violations=False),
                   metric_store=store)
    r_bad = v2.expect_column_kl_divergence_to_be_less_than(
        column="v",
        partition_object={"$PARAMETER": "urn:gx:metric:tbl:v:column.partition"},
        threshold=0.05, tail_weight_holdout=0.01,
    )
    assert not r_bad.success


def test_validator_head(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "i int, s string")
    v = Validator(spark, df)
    h = v.head(2)
    assert h == [{"i": 1, "s": "a"}, {"i": 2, "s": "b"}]


# ---------------------------------------------------------------------------
# suite suggestion (onboarding profiler)
# ---------------------------------------------------------------------------


def test_suggest_suite_self_satisfying(spark):
    """The suggested suite must pass on the batch it was profiled from."""
    from gx_spark import EngineOptions, validate
    from gx_spark.profile import suggest_suite

    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    suite = suggest_suite(df)
    types = [c.expectation_type for c in suite.expectations]
    assert "expect_table_row_count_to_be_between" in types
    assert "expect_table_columns_to_match_ordered_list" in types
    assert "expect_column_values_to_be_unique" in types      # c_custkey
    assert "expect_column_values_to_be_in_set" in types      # c_mktsegment
    assert "expect_column_value_lengths_to_be_between" in types
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    failed = [r.expectation_config.expectation_type
              for r in b.suite_result.results if not r.success]
    assert not failed, failed


def test_suggest_suite_nulls_get_mostly(spark):
    from gx_spark import EngineOptions, validate
    from gx_spark.profile import suggest_suite

    df = spark.createDataFrame(
        [(i, "x" if i % 10 else None) for i in range(1000)],
        "id long, maybe string",
    )
    suite = suggest_suite(df)
    cfgs = {(c.expectation_type, c.kwargs.get("column")): c.kwargs
            for c in suite.expectations}
    nn = cfgs[("expect_column_values_to_not_be_null", "maybe")]
    assert 0 < nn["mostly"] < 1
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    assert all(r.success for r in b.suite_result.results), [
        (r.expectation_config.expectation_type, r.expectation_config.kwargs)
        for r in b.suite_result.results if not r.success]


def test_suggest_suite_one_null_row_rounds_down(spark):
    """ADVICE r2: one null in a large batch must not round mostly UP to 1.0
    (stricter than observed) — the suite must still pass its own batch."""
    from gx_spark import EngineOptions, validate
    from gx_spark.profile import suggest_suite

    df = spark.createDataFrame(
        [(i, None if i == 0 else "x") for i in range(5000)],
        "id long, maybe string",
    )
    suite = suggest_suite(df)
    cfgs = {(c.expectation_type, c.kwargs.get("column")): c.kwargs
            for c in suite.expectations}
    m = cfgs[("expect_column_values_to_not_be_null", "maybe")]["mostly"]
    assert 0 < m < 1.0
    assert m <= 1 - 1 / 5000 + 1e-9
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    assert all(r.success for r in b.suite_result.results)


def test_suggest_suite_audio_table(spark, audio_dir):
    """Multimodal onboarding: profiling the north-rule audio table emits the
    payload expectations with violation-rate backoff, binary column exempt
    from unique/in_set, and the suite passes its own batch."""
    from gx_spark import EngineOptions, validate
    from gx_spark.profile import suggest_suite

    df = spark.read.parquet(f"{audio_dir}/audio_clips.parquet")
    suite = suggest_suite(df)
    types = [c.expectation_type for c in suite.expectations]
    assert "expect_audio_metadata_to_be_consistent" in types
    assert "expect_audio_snr_to_be_at_least" in types
    assert "expect_transcript_to_match_reference" in types
    # fixture table contains violation rows -> backed-off mostly present
    cfgs = {c.expectation_type: c.kwargs for c in suite.expectations}
    assert 0 < cfgs["expect_audio_metadata_to_be_consistent"]["mostly"] < 1
    # binary payload never suggested for unique/in_set
    for c in suite.expectations:
        if c.kwargs.get("column") == "bytes":
            assert c.expectation_type == "expect_column_values_to_not_be_null"
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    b.unpersist()
    failed = [(r.expectation_config.expectation_type, r.expectation_config.kwargs)
              for r in b.suite_result.results if not r.success]
    assert not failed, failed


def test_suggest_suite_image_table(spark):
    """Image group detection: (bytes + width/height/channels/format)."""
    from gx_spark import EngineOptions, validate
    from gx_spark import image as gim
    from gx_spark.profile import suggest_suite

    rows = []
    for i in range(50):
        img_id = f"img_{i:05d}"
        w, h = 16 + (i % 3) * 8, 16
        b = gim.raw_encode(gim.synth_image(img_id, w, h))
        width = w + 1 if i % 10 == 7 else w  # 10% metadata lies
        rows.append((img_id, bytearray(b), width, h, 3, "gxraw"))
    df = spark.createDataFrame(
        rows,
        "img_id string, bytes binary, width int, height int, channels int, format string",
    )
    suite = suggest_suite(df)
    types = [c.expectation_type for c in suite.expectations]
    assert "expect_image_metadata_to_be_consistent" in types
    assert "expect_image_mean_intensity_to_be_between" in types
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("img_id",)))
    b.unpersist()
    assert all(r.success for r in b.suite_result.results), [
        (r.expectation_config.expectation_type, r.expectation_config.kwargs)
        for r in b.suite_result.results if not r.success]


def test_suggest_suite_video_group(spark):
    """A (bytes + n_frames/fps/width/height/format) column group gets the
    video container expectation, and the suggested suite passes the batch
    it was profiled from."""
    from gx_spark.executor import validate
    from gx_spark.image import raw_encode, synth_image
    from gx_spark.model import EngineOptions
    from gx_spark.profile import suggest_suite

    frames = [raw_encode(synth_image(f"sf{i}", 8, 8)) for i in range(5)]
    rows = [(f"v{i}", bytearray(b"".join(frames)), 5, 10.0, 8, 8,
             "gxraw_frames") for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "vid_id string, bytes binary, n_frames int, fps double, "
        "width int, height int, format string",
    )
    suite = suggest_suite(df)
    types = {e.expectation_type for e in suite.expectations}
    assert "expect_video_metadata_to_be_consistent" in types
    bundle = validate(spark, df, suite, EngineOptions())
    assert bundle.success
    bundle.unpersist()
