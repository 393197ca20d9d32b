"""Click/pop repair (gx_spark/audio_ops.py declick_pcm/declick_audio):
exact detection count on injected impulses, bit-identical passthrough
for clean program material, and the null-bytes rail."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload  # noqa: E402
from gx_spark.audio_ops import declick_audio, declick_pcm  # noqa: E402

SR = 16000
SCHEMA = "clip_id long, bytes binary, codec string"


def _tone(freq=440.0, amp=0.3):
    t = np.arange(SR) / SR
    return np.rint(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(
        np.int16)


def _inject(pcm, positions):
    bad = pcm.copy()
    for p in positions:
        bad[p] = 32000 if bad[p] < 0 else -32000
    return bad


def test_pcm_exact_count_and_repair_quality():
    pcm = _tone()
    pos = [1000, 1700, 5003, 9000, 12345]
    y, k = declick_pcm(_inject(pcm, pos))
    assert k == 5
    err = np.abs(y.astype(int) - pcm.astype(int))
    assert err.max() < 0.1 * 32767  # repaired to the local waveform
    # untouched samples are bit-identical
    mask = np.ones(SR, bool)
    for p in pos:
        mask[p] = False
    assert np.array_equal(y[mask], pcm[mask])


def test_pcm_clean_passthrough_and_short():
    pcm = _tone()
    y, k = declick_pcm(pcm)
    assert k == 0 and np.array_equal(y, pcm)
    y2, k2 = declick_pcm(pcm[:4])
    assert k2 == 0 and len(y2) == 4


def test_df_counts_and_original_bytes_for_clean(spark):
    pcm = _tone()
    rows = [
        (0, bytearray(encode_payload(pcm, SR, "flac")), "flac"),
        (1, bytearray(encode_payload(_inject(pcm, [800, 4000, 9999]),
                                     SR, "pcm_s16le")), "pcm_s16le"),
        (2, bytearray(b"junk"), "pcm_s16le"),
    ]
    out = {r["clip_id"]: r for r in declick_audio(
        spark.createDataFrame(rows, SCHEMA)).collect()}
    assert out[0]["n_clicks"] == 0 and out[0]["codec"] == "flac"
    assert bytes(out[0]["bytes"]) == bytes(rows[0][1])  # untouched
    assert out[1]["n_clicks"] == 3 and out[1]["codec"] == "pcm_s16le"
    sr, y = decode_payload(bytes(out[1]["bytes"]), "pcm_s16le")
    assert np.abs(y.astype(int) - pcm.astype(int)).max() < 3300
    assert out[2]["bytes"] is None and out[2]["n_clicks"] is None


def test_df_map_only_plan(spark):
    from gx_spark.plancheck import formatted_plan

    df = spark.createDataFrame(
        [(0, bytearray(encode_payload(_tone(), SR, "pcm_s16le")),
          "pcm_s16le")], SCHEMA)
    assert "Exchange" not in formatted_plan(declick_audio(df))


def test_click_expectation_and_gallery(spark):
    import gx_spark
    from gx_spark.diagnostics import run_diagnostics

    pcm = _tone()
    rows = [
        (0, bytearray(encode_payload(pcm, SR, "pcm_s16le")), "pcm_s16le"),
        (1, bytearray(encode_payload(_inject(pcm, [900, 4100]),
                                     SR, "pcm_s16le")), "pcm_s16le"),
        (2, bytearray(b"junk"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    suite = gx_spark.ExpectationSuite("clicks")
    suite.add("expect_audio_click_count_to_be_below", max_clicks=1)
    b = gx_spark.validate(spark, df, suite)
    r = b.suite_result.results[0]
    # clip 1 flagged, undecodable clip 2 excluded from the denominator
    assert r.success is False
    assert r.result["unexpected_count"] == 1
    d = run_diagnostics(spark, "expect_audio_click_count_to_be_below")
    assert d["success"] and d["examples_passed"] == d["examples_run"] >= 1
