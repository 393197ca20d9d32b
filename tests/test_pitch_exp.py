"""Pitch-gate expectations (expect_audio_voiced_fraction_to_be_between /
expect_audio_pitch_to_be_between): validate() verdicts, the shared
one-decode `__pitch` column, param-conflict detection, and gallery
diagnostics."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark.audio import encode_payload  # noqa: E402

SR = 8000
SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
          "codec string")


def _tone(f: float, n: int = SR // 2) -> np.ndarray:
    t = np.arange(n) / SR
    return np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16)


def _rows():
    rng = np.random.default_rng(3)
    noise = np.clip(rng.normal(0, 0.2, SR // 2) * 32767,
                    -32768, 32767).astype(np.int16)
    return [
        ("speech_band", bytearray(encode_payload(_tone(150.0), SR, "flac")),
         SR, 500, "flac"),
        ("high_f0", bytearray(encode_payload(_tone(420.0), SR,
                                             "pcm_s16le")), SR, 500,
         "pcm_s16le"),
        ("unvoiced", bytearray(encode_payload(noise, SR, "pcm_mulaw")),
         SR, 500, "pcm_mulaw"),
        ("undecodable", bytearray(b"junk"), SR, 500, "pcm_s16le"),
    ]


def test_pitch_gate_verdicts(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    suite = (
        ExpectationSuite("pitch")
        .add("expect_audio_voiced_fraction_to_be_between", min_fraction=0.5)
        .add("expect_audio_pitch_to_be_between", min_hz=100.0, max_hz=300.0)
    )
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    res = {r.expectation_config.expectation_type: r
           for r in b.suite_result.results}
    viol = {(v["clip_id"], v["expectation_type"])
            for v in b.violations_table().collect()}
    b.unpersist()
    vf = res["expect_audio_voiced_fraction_to_be_between"]
    assert not vf.success and vf.result["unexpected_count"] == 1
    f0 = res["expect_audio_pitch_to_be_between"]
    # high_f0 breaks the band; unvoiced has null median (excluded);
    # undecodable has null everything (excluded from both)
    assert not f0.success and f0.result["unexpected_count"] == 1
    assert ("unvoiced",
            "expect_audio_voiced_fraction_to_be_between") in viol
    assert ("high_f0", "expect_audio_pitch_to_be_between") in viol
    assert not any(c == "undecodable" for c, _ in viol)


def test_pitch_gate_single_shared_decode(spark):
    """Both pitch expectations in one suite ride ONE __pitch UDF: the
    violations-pass plan contains exactly one ArrowEvalPython/InPandas
    projection for the pitch column."""
    from gx_spark.plancheck import (
        compile_suite, count_nodes, formatted_plan, violations_df)

    df = spark.createDataFrame(_rows(), SCHEMA)
    suite = (
        ExpectationSuite("pitch")
        .add("expect_audio_voiced_fraction_to_be_between", min_fraction=0.5)
        .add("expect_audio_pitch_to_be_between", min_hz=100.0, max_hz=300.0)
    )
    ctx = compile_suite(
        spark, df, suite,
        EngineOptions(unexpected_index_column_names=("clip_id",)))
    plan = formatted_plan(violations_df(ctx))
    n_python = (count_nodes(plan, "ArrowEvalPython")
                + count_nodes(plan, "BatchEvalPython"))
    assert n_python == 1, f"expected one shared pitch UDF:\n{plan}"
    assert "Exchange" not in plan, f"violations pass must not shuffle:\n{plan}"


def test_pitch_gate_param_conflict(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    suite = (
        ExpectationSuite("pitch")
        .add("expect_audio_voiced_fraction_to_be_between", fmin=60.0)
        .add("expect_audio_pitch_to_be_between", fmin=80.0)
    )
    # plan-time errors are captured per-expectation, not raised (the
    # engine's exception_info convention): the conflicting second
    # expectation fails with the conflict message, the first still runs
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    res = {r.expectation_config.expectation_type: r
           for r in b.suite_result.results}
    b.unpersist()
    conflicted = res["expect_audio_pitch_to_be_between"]
    assert conflicted.exception_info["raised_exception"]
    assert "conflicting pitch decode" in conflicted.exception_info[
        "exception_message"]
    assert not res["expect_audio_voiced_fraction_to_be_between"
                   ].exception_info["raised_exception"]


def test_pitch_gate_diagnostics_gallery(spark):
    from gx_spark.diagnostics import run_diagnostics

    for t in ("expect_audio_voiced_fraction_to_be_between",
              "expect_audio_pitch_to_be_between"):
        rep = run_diagnostics(spark, t)
        assert rep["success"], rep
        assert rep["examples_run"] >= 1
        assert rep["examples_passed"] == rep["examples_run"]
