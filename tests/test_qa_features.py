"""Fused QA features (gx_spark/audio_ops.py qa_features): identical
values to the standalone loudness/pitch/electrical ops from one decode,
null rails, and the map-only plan."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import encode_payload  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    electrical_features,
    loudness_features,
    pitch_features,
    qa_features,
)

SR = 16000
SCHEMA = "clip_id long, bytes binary, codec string"


def _rows():
    t = np.arange(SR) / SR
    out = []
    for i in range(5):
        x = (0.1 + 0.04 * i) * np.sin(2 * np.pi * (120 + 60 * i) * t)
        if i == 2:
            x = x + 0.05  # DC
        if i == 3:
            x = x + 0.1 * np.sin(2 * np.pi * 50.0 * t)  # hum
        pcm = np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)
        out.append((i, bytearray(encode_payload(pcm, SR, "flac")),
                    "flac"))
    out.append((5, bytearray(b"junk"), "pcm_s16le"))
    return out


def test_fused_equals_standalone_ops(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    fused = {r["clip_id"]: r.asDict() for r in qa_features(
        df, keep_cols=["clip_id"]).collect()}
    lo = {r["clip_id"]: r.asDict() for r in loudness_features(
        df, keep_cols=["clip_id"]).collect()}
    pi = {r["clip_id"]: r.asDict() for r in pitch_features(
        df, keep_cols=["clip_id"]).collect()}
    el = {r["clip_id"]: r.asDict() for r in electrical_features(
        df, keep_cols=["clip_id"]).collect()}
    for i in fused:
        for k in ("n_blocks", "lufs_integrated", "lufs_momentary_max",
                  "gated_block_frac"):
            assert fused[i][k] == lo[i][k], (i, k)
        for k in ("n_frames", "voiced_frac", "f0_median_hz",
                  "periodicity_mean"):
            assert fused[i][k] == pi[i][k], (i, k)
        for k in ("dc_frac", "hum_ratio", "hum_base_hz"):
            assert fused[i][k] == el[i][k], (i, k)
    # planted defects visible through the fused pass
    assert abs(fused[2]["dc_frac"]) > 0.02
    assert fused[3]["hum_ratio"] > 0.01
    assert fused[5]["lufs_integrated"] is None  # undecodable rails


def test_map_only_single_python_stage(spark):
    from gx_spark.plancheck import formatted_plan

    df = spark.createDataFrame(_rows()[:2], SCHEMA)
    plan = formatted_plan(qa_features(df, keep_cols=["clip_id"]))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") <= 2  # ONE fused python stage
