"""Clipping repair (gx_spark/audio_ops.py declip_pcm / declip_audio):
cubic-Hermite interpolation over rail-clipped runs (the Janssen-class
interpolation declipper), re-fit to int16 with a documented global
gain.  Closed-form numpy checks run Spark-free; the Spark tests pin the
mapInPandas plumbing (passthrough bytes, codec rewrite, null-on-junk,
map-only plan)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload  # noqa: E402
from gx_spark.audio_ops import declip_audio, declip_pcm  # noqa: E402

SR = 16000
RAIL = int(round(32767 * 0.999))


def _sine(amp: float, dur_s: float = 0.3, freq: float = 440.0,
          sr: int = SR) -> tuple[np.ndarray, np.ndarray]:
    """(clipped int16 pcm, unclipped float64 'true' waveform)."""
    t = np.arange(int(sr * dur_s)) / sr
    raw = amp * 32767 * np.sin(2 * np.pi * freq * t)
    return np.clip(np.rint(raw), -32768, 32767).astype(np.int16), raw


def test_clean_clip_is_untouched():
    pcm, _ = _sine(0.3)
    y, n, g = declip_pcm(pcm)
    assert y is pcm and n == 0 and g == 0.0


def test_clipped_sine_repair_counts_and_headroom():
    pcm, raw = _sine(1.4)
    expected = int(np.count_nonzero((pcm >= RAIL) | (pcm <= -RAIL)))
    y, n, g = declip_pcm(pcm)
    assert n == expected > 0
    assert g < 0.0  # reconstruction overshoots full scale, so gain < 1
    peak = int(np.max(np.abs(y.astype(np.int32))))
    # repaired peak sits below BOTH the rail and the features clip_rail
    assert peak <= int(0.97 * 32767) + 1
    assert np.count_nonzero(np.abs(y.astype(np.int32)) >= 32000) == 0


def test_repair_is_closer_to_truth_than_the_clipped_input():
    """On the clipped samples, the interpolated waveform must track the
    true (unclipped) sine far better than the rail values did — compare
    both against gain*truth on the same sample set."""
    pcm, raw = _sine(1.4)
    mask = (pcm >= RAIL) | (pcm <= -RAIL)
    y, n, g = declip_pcm(pcm)
    gain = 10.0 ** (g / 20.0)
    err_repaired = np.mean(np.abs(y[mask] - gain * raw[mask]))
    err_clipped = np.mean(np.abs(gain * pcm[mask] - gain * raw[mask]))
    assert err_repaired < 0.3 * err_clipped


def test_declip_is_idempotent():
    pcm, _ = _sine(2.0)
    y1, n1, _ = declip_pcm(pcm)
    y2, n2, g2 = declip_pcm(y1)
    assert n1 > 0 and n2 == 0 and g2 == 0.0
    assert y2 is y1


def test_edge_runs_hold_nearest_clean_value():
    # first 50 samples clipped at +rail, rest a clean ramp
    pcm = np.concatenate([
        np.full(50, 32767, dtype=np.int16),
        np.linspace(1000, 2000, 100).astype(np.int16),
    ])
    y, n, g = declip_pcm(pcm)
    assert n == 50
    gain = 10.0 ** (g / 20.0)
    # held at the nearest clean value (the ramp start), then scaled
    assert np.all(y[:50] == int(np.rint(1000 * gain)))


def test_all_clipped_clip_survives():
    pcm = np.full(100, -32768, dtype=np.int16)
    y, n, g = declip_pcm(pcm)
    assert n == 100
    # nothing clean to anchor on: values stay at the (scaled) rail
    assert len(y) == 100


def test_declip_audio_spark_plumbing(spark):
    clean, _ = _sine(0.3)
    clipped, _ = _sine(1.4)
    rows = [
        (1, bytearray(encode_payload(clean, SR, "pcm_s16le")), "pcm_s16le"),
        (2, bytearray(encode_payload(clipped, SR, "flac")), "flac"),
        (3, bytearray(b"junk"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary, codec string")
    out = {r["clip_id"]: r.asDict() for r in declip_audio(df).collect()}

    # clean clip: ORIGINAL bytes verbatim, codec kept, zero counts
    assert bytes(out[1]["bytes"]) == bytes(rows[0][1])
    assert out[1]["codec"] == "pcm_s16le"
    assert out[1]["n_clipped"] == 0 and out[1]["declip_gain_db"] == 0.0

    # repaired clip: re-encoded pcm_s16le, decodes rail-free
    assert out[2]["codec"] == "pcm_s16le"
    assert out[2]["n_clipped"] > 0 and out[2]["declip_gain_db"] < 0.0
    sr, pcm = decode_payload(bytes(out[2]["bytes"]), "pcm_s16le")
    assert sr == SR
    assert np.count_nonzero(np.abs(pcm.astype(np.int32)) >= RAIL) == 0

    # undecodable row: null bytes, null counts (trim_silence convention)
    assert out[3]["bytes"] is None and out[3]["n_clipped"] is None


def test_declip_audio_plan_is_map_only(spark):
    from gx_spark.plancheck import formatted_plan

    pcm, _ = _sine(0.3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_payload(pcm, SR, "pcm_s16le")), "pcm_s16le")],
        "clip_id long, bytes binary, codec string")
    plan = formatted_plan(declip_audio(df))
    assert "Exchange" not in plan
