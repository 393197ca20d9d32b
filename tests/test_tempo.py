"""WSOLA tempo stretch (gx_spark/audio_ops.py tempo_stretch): pitch
preserved where speed_perturb shifts it, exact output length, COLA
amplitude preservation, and the short-clip / undecodable rails."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    speed_perturb,
    tempo_stretch,
    tempo_stretch_pcm,
)

SR = 16000
SCHEMA = "clip_id long, bytes binary, codec string, dur_ms int"


def _tone(freq: float, dur_ms: int = 1000, amp: float = 0.3):
    t = np.arange(SR * dur_ms // 1000) / SR
    return np.rint(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(
        np.int16)


def _dominant(y: np.ndarray) -> float:
    sp = np.abs(np.fft.rfft(y.astype(np.float64)))
    return float(np.argmax(sp) * SR / len(y))


def test_pcm_exact_length_pitch_rms():
    pcm = _tone(440.0)
    for f in (0.8, 1.1, 1.25):
        y = tempo_stretch_pcm(pcm, SR, f)
        assert len(y) == int(round(len(pcm) / f))
        assert abs(_dominant(y) - 440.0) < 5.0  # pitch PRESERVED
        rms_in = np.sqrt(np.mean((pcm / 32768.0) ** 2))
        rms_out = np.sqrt(np.mean((y / 32768.0) ** 2))
        assert abs(20 * np.log10(rms_out / rms_in)) < 0.5


def test_pcm_identity_and_short_fallback():
    pcm = _tone(440.0)
    assert np.array_equal(tempo_stretch_pcm(pcm, SR, 1.0), pcm)
    short = pcm[:200]  # below one analysis window -> trim/pad fallback
    assert len(tempo_stretch_pcm(short, SR, 1.25)) == 160
    assert len(tempo_stretch_pcm(short, SR, 0.5)) == 400


def test_tempo_vs_speed_pitch_contrast(spark):
    # the defining difference: same 1.25x tempo, tempo_stretch keeps
    # 440 Hz while speed_perturb's resample shifts it to 550 Hz
    pcm = _tone(440.0)
    df = spark.createDataFrame(
        [(0, bytearray(encode_payload(pcm, SR, "flac")), "flac", 1000)],
        SCHEMA)
    rt = tempo_stretch(df, 1.25).collect()[0]
    rs = speed_perturb(df, 1.25).collect()[0]
    _, yt = decode_payload(bytes(rt["bytes"]), rt["codec"])
    _, ys = decode_payload(bytes(rs["bytes"]), rs["codec"])
    assert len(yt) == len(ys) == 12800 and rt["dur_ms"] == 800
    assert abs(_dominant(yt) - 440.0) < 5.0
    assert abs(_dominant(ys) - 550.0) < 5.0


def test_tempo_undecodable_passthrough(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"junk"), "pcm_s16le", 100)], SCHEMA)
    r = tempo_stretch(df, 1.25).collect()[0]
    assert r["bytes"] is None and r["dur_ms"] is None


def test_tempo_map_only_plan(spark):
    from gx_spark.plancheck import formatted_plan

    pcm = _tone(330.0, 300)
    df = spark.createDataFrame(
        [(i, bytearray(encode_payload(pcm, SR, "pcm_s16le")),
          "pcm_s16le", 300) for i in range(4)], SCHEMA)
    assert "Exchange" not in formatted_plan(tempo_stretch(df, 1.1))


def test_fused_pipeline_tempo_stage_bit_identical(spark):
    # fused noise -> tempo -> window == the chained three ops, byte for
    # byte (same contract the speed stage is pinned to)
    from gx_spark.audio_ops import augment_noise, augment_pipeline, pad_or_trim

    rows = []
    for i in range(6):
        pcm = _tone(220.0 + 40 * i, 900)
        rows.append((i, bytearray(encode_payload(pcm, SR, "flac")),
                     "flac", 900))
    df = spark.createDataFrame(rows, SCHEMA)
    fused = augment_pipeline(
        df, snr_db=20.0, tempo=1.25, target_ms=600, seed=7)
    chained = pad_or_trim(
        tempo_stretch(augment_noise(df, 20.0, seed=7), 1.25), 600)
    f = {r["clip_id"]: bytes(r["bytes"]) for r in fused.collect()}
    c = {r["clip_id"]: bytes(r["bytes"]) for r in chained.collect()}
    assert f == c
    d = {r["clip_id"]: r["dur_ms"] for r in fused.collect()}
    assert all(v == 600 for v in d.values())
