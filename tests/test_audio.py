"""North-rule audio correctness layer (FIXTURES.md §1):

- exact violation-row set match vs the generator's sidecar table
- aggregate pins vs gentime DuckDB values
- per-row PCM decode invariant (SNR>=30dB) and transcript equality
- KL drift detection on the shifted partition
"""

from __future__ import annotations

import json
import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark.suites import audio_aggregate_suite, audio_suite  # noqa: E402


def test_violation_rows_match_sidecar_exactly(spark, audio_dir, audio_df):
    bundle = validate(
        spark, audio_df, audio_suite(),
        EngineOptions(unexpected_index_column_names=("clip_id",)),
    )
    got = {
        (r["clip_id"], r["expectation_type"])
        for r in bundle.violations_table().select("clip_id", "expectation_type").collect()
    }
    expected = {
        (r["clip_id"], r["expectation_type"])
        for r in spark.read.parquet(f"{audio_dir}/expected_violations.parquet")
        .where("expectation_type <> 'expect_column_values_to_exist_in_table'")
        .collect()
    }
    assert got == expected, (
        f"missing={sorted(expected - got)[:5]} extra={sorted(got - expected)[:5]}"
    )
    # pass/fail verdicts: exactly the expectations with sidecar entries fail
    failed = {
        r.expectation_config.expectation_type
        for r in bundle.suite_result.results
        if not r.success
    }
    assert failed == {t for _, t in expected}


def test_referential_orphans_match_sidecar(spark, audio_dir):
    cs = spark.read.parquet(f"{audio_dir}/clip_speakers.parquet")
    speakers = spark.read.parquet(f"{audio_dir}/speakers.parquet")
    suite = ExpectationSuite("ref").add(
        "expect_column_values_to_exist_in_table",
        column="speaker_id", other_table_name="speakers",
    )
    bundle = validate(
        spark, cs, suite,
        EngineOptions(unexpected_index_column_names=("clip_id",)),
        tables={"speakers": speakers},
    )
    got = {
        r["clip_id"]
        for r in bundle.violations_table().select("clip_id").collect()
    }
    expected = {
        r["clip_id"]
        for r in spark.read.parquet(f"{audio_dir}/expected_violations.parquet")
        .where("expectation_type = 'expect_column_values_to_exist_in_table'")
        .collect()
    }
    assert got == expected


def test_aggregate_pins(spark, audio_dir, audio_df):
    with open(f"{audio_dir}/expected_aggregates.json") as f:
        pins = json.load(f)
    bundle = validate(spark, audio_df, audio_aggregate_suite(),
                      EngineOptions(collect_violations=False))
    res = {r.expectation_config.expectation_type: r.result for r in bundle.suite_result.results}
    assert bundle.suite_result.statistics["evaluated_expectations"] == 5
    assert math.isclose(res["expect_column_mean_to_be_between"]["observed_value"],
                        pins["mean_dur_ms"], rel_tol=1e-9)
    assert math.isclose(res["expect_column_stdev_to_be_between"]["observed_value"],
                        pins["stdev_dur_ms"], rel_tol=1e-9)
    q = res["expect_column_quantile_values_to_be_between"]["observed_value"]["values"]
    for got, want in zip(q, [pins["q25_dur_ms"], pins["q50_dur_ms"], pins["q75_dur_ms"]]):
        assert math.isclose(got, want, rel_tol=1e-9), (q, pins)
    assert res["expect_column_unique_value_count_to_be_between"]["observed_value"] == int(
        pins["distinct_sr"]
    )
    assert math.isclose(
        res["expect_column_proportion_of_unique_values_to_be_between"]["observed_value"],
        pins["uniq_prop_clip_id"], rel_tol=1e-9,
    )


def test_per_row_pcm_invariant_roundtrip():
    """Direct check of the per-row invariant machinery: clean clip decodes
    allclose (SNR inf), corrupted clip lands below 30 dB."""
    import numpy as np

    from gx_spark.audio import snr_db, synth_pcm, wav_decode, wav_encode

    pcm = synth_pcm("clip_0000000001", 16000, 500)
    sr, back = wav_decode(wav_encode(pcm, 16000))
    assert sr == 16000
    assert np.array_equal(pcm, back)
    assert snr_db(pcm, back) == np.inf
    rng = np.random.default_rng(7)
    rms = np.sqrt(np.mean(pcm.astype(np.float64) ** 2))
    amp = rms * (10 ** (15.0 / 20.0)) * np.sqrt(3)
    noisy = np.clip(
        pcm.astype(np.float64) + rng.uniform(-amp, amp, len(pcm)), -32768, 32767
    ).astype(np.int16)
    s = snr_db(pcm, noisy)
    assert s < 30, s


def test_kl_drift_flags_shifted_partition(spark, audio_dir, audio_df):
    import duckdb

    bins = [200.0, 800.0, 1400.0, 2000.0, 2600.0]
    con = duckdb.connect()
    counts = con.sql(
        f"""
        SELECT CASE WHEN dur_ms >= 2000 THEN 3
                    ELSE CAST(FLOOR((dur_ms - 200) / 600) AS INT) END AS b,
               count(*) AS c
        FROM read_parquet('{audio_dir}/audio_clips.parquet')
        WHERE part_id < 15 GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    total = sum(c for _, c in counts)
    weights = [0.0, 0.0, 0.0, 0.0]
    for b, c in counts:
        weights[b] = c / total
    po = {"bins": bins, "weights": weights}

    def kl_for(where: str):
        suite = ExpectationSuite("kl").add(
            "expect_column_kl_divergence_to_be_less_than", column="dur_ms",
            partition_object=po, threshold=0.1, tail_weight_holdout=0.01,
            row_condition=where,
        )
        b = validate(spark, audio_df, suite, EngineOptions(collect_violations=False))
        return b.suite_result.results[0]

    clean = kl_for("part_id = 0")
    drifted = kl_for("part_id = 15")
    assert clean.success, clean.result
    assert not drifted.success, drifted.result
    assert drifted.result["observed_value"] > clean.result["observed_value"]
