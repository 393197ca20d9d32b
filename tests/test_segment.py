"""VAD segmentation (utterance splitting): closed-form segment stats on
the 25 ms frame grid, gap-merge semantics, and the segment_audio explode
(one row per utterance, exact payload slices).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload, wav_encode  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    segment_audio,
    segment_stats,
    segment_stats_row,
)

SR = 16000


def _tone(ms: int) -> np.ndarray:
    t = np.arange(SR * ms // 1000) / SR
    return (0.5 * 32767 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.int16)


def _sil(ms: int) -> np.ndarray:
    return np.zeros(SR * ms // 1000, dtype=np.int16)


def _clip(*parts: np.ndarray) -> bytes:
    return wav_encode(np.concatenate(parts), SR)


def test_segment_stats_closed_form():
    two = _clip(_sil(200), _tone(300), _sil(500), _tone(300), _sil(200))
    # gap 500 >= min_gap 150: two segments, longest internal gap 500
    assert segment_stats_row(two, "pcm_s16le") == (2, 600, 500)
    # raising min_gap above the gap merges them (span absorbs the gap)
    assert segment_stats_row(two, "pcm_s16le", min_gap_ms=600) == (1, 1100, 0)
    # sub-threshold gap merges at the default
    one = _clip(_sil(100), _tone(300), _sil(100), _tone(300))
    assert segment_stats_row(one, "pcm_s16le") == (1, 700, 0)
    # boundary: gap == min_gap splits (strict <)
    edge = _clip(_tone(300), _sil(150), _tone(300))
    assert segment_stats_row(edge, "pcm_s16le", min_gap_ms=150) == (2, 600, 150)
    # all-silent clip: zero segments
    assert segment_stats_row(_clip(_sil(500)), "pcm_s16le") == (0, 0, 0)
    # decode failure
    assert segment_stats_row(b"junk", "flac") == (None, None, None)
    assert segment_stats_row(None, "pcm_s16le") == (None, None, None)


def test_segment_stats_spark_mixed_codecs(spark):
    rows = []
    for i in range(9):
        gap = (i % 3) * 200  # 0 / 200 / 400 ms
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i % 3]
        pcm = np.concatenate([_tone(300), _sil(gap), _tone(300)]) if gap \
            else np.concatenate([_tone(300), _tone(300)])
        rows.append((f"s{i}", bytearray(encode_payload(pcm, SR, codec)), codec))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r.clip_id: r for r in segment_stats(df, keep_cols=["clip_id"]).collect()}
    for i in range(9):
        gap = (i % 3) * 200
        r = got[f"s{i}"]
        if gap:
            assert (r.n_segments, r.speech_ms, r.longest_gap_ms) == (2, 600, gap), i
        else:
            assert (r.n_segments, r.speech_ms, r.longest_gap_ms) == (1, 600, 0), i


def test_normalize_gain_closed_form():
    from gx_spark.audio_ops import normalize_gain_pcm

    def _amp_tone(amp: float, ms: int = 500) -> np.ndarray:
        t = np.arange(SR * ms // 1000) / SR
        return np.rint(amp * 32767 * np.sin(2 * np.pi * 440.0 * t)).astype(
            np.int16)

    def _rms_dbfs(pcm: np.ndarray) -> float:
        x = pcm.astype(np.float64) / 32768.0
        return 10.0 * np.log10(float(np.mean(x * x)))

    # amp 0.1 sine: rms ~= -23.01 dBFS -> gain to -20 is ~+3.01 dB
    y, g = normalize_gain_pcm(_amp_tone(0.1), -20.0, 0.999)
    assert abs(_rms_dbfs(y) - (-20.0)) < 0.05
    assert abs(g - 3.01) < 0.05
    # loud clip normalized DOWN
    y, g = normalize_gain_pcm(_amp_tone(0.45), -20.0, 0.999)
    assert abs(_rms_dbfs(y) - (-20.0)) < 0.05 and g < 0
    # peak cap: amp 0.9 to -3 dBFS wants gain 1.113 but peak would hit
    # 1.002 -> capped at 0.999/0.9, never introducing clipping
    tone = _amp_tone(0.9)
    y, g = normalize_gain_pcm(tone, -3.0, 0.999)
    peak = float(np.max(np.abs(y))) / 32768.0
    assert peak <= 0.9995
    assert abs(g - 20 * np.log10(0.999 / (np.max(np.abs(tone)) / 32768.0))) < 0.01
    assert _rms_dbfs(y) < -3.0  # cap means the target is NOT reached
    # all-silent: unchanged, gain 0
    z = np.zeros(1000, dtype=np.int16)
    y, g = normalize_gain_pcm(z, -20.0, 0.999)
    assert y is z and g == 0.0


def test_normalize_gain_spark_mixed(spark):
    from gx_spark.audio_ops import compute_features_row, normalize_gain

    rows = []
    for i in range(9):
        amp = 0.05 + (i % 5) * 0.1
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i % 3]
        t = np.arange(SR * 300 // 1000) / SR
        pcm = np.rint(amp * 32767 * np.sin(2 * np.pi * 440.0 * t)).astype(
            np.int16)
        rows.append((f"g{i}", bytearray(encode_payload(pcm, SR, codec)),
                     SR, 300, codec))
    rows.append(("silent", bytearray(wav_encode(_sil(300), SR)), SR, 300,
                 "pcm_s16le"))
    rows.append(("junk", bytearray(b"zz"), SR, 300, "flac"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    out = {r.clip_id: r for r in normalize_gain(df, target_dbfs=-20.0).collect()}
    for i in range(9):
        r = out[f"g{i}"]
        assert r.codec == "pcm_s16le" and (r.sr_hz, r.dur_ms) == (SR, 300)
        feats = compute_features_row(bytes(r.bytes), "pcm_s16le")
        tol = 0.2 if i % 3 == 2 else 0.05  # mu-law quantization noise
        assert abs(feats["rms_dbfs"] - (-20.0)) < tol, (i, feats["rms_dbfs"])
    assert out["silent"].gain_db == 0.0
    assert bytes(out["silent"].bytes) == bytes(rows[9][1])
    assert out["junk"].bytes is None and out["junk"].gain_db is None


def test_transcode_audio(spark):
    import pytest

    from gx_spark.audio_ops import transcode_audio

    tone = _tone(300)
    rows = [
        ("wav", bytearray(wav_encode(tone, SR)), SR, 300, "pcm_s16le"),
        ("flc", bytearray(encode_payload(tone, SR, "flac")), SR, 300, "flac"),
        ("mul", bytearray(encode_payload(tone, SR, "pcm_mulaw")), SR, 300,
         "pcm_mulaw"),
        ("bad", bytearray(b"zz"), SR, 300, "flac"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    # to flac: lossless for the PCM sources — decode round-trips exactly
    out = {r.clip_id: r for r in transcode_audio(df, "flac").collect()}
    assert out["wav"].codec == "flac"
    sr2, pcm2 = decode_payload(bytes(out["wav"].bytes), "flac")
    np.testing.assert_array_equal(pcm2, tone)
    # flac -> flac re-encode still round-trips
    _, pcm3 = decode_payload(bytes(out["flc"].bytes), "flac")
    np.testing.assert_array_equal(pcm3, tone)
    # mu-law source: transcode preserves the (already companded) decode
    _, mul_dec = decode_payload(bytes(rows[2][1]), "pcm_mulaw")
    _, pcm4 = decode_payload(bytes(out["mul"].bytes), "flac")
    np.testing.assert_array_equal(pcm4, mul_dec)
    # undecodable passthrough: null bytes, codec untouched
    assert out["bad"].bytes is None and out["bad"].codec == "flac"
    # schema preserved
    assert transcode_audio(df, "pcm_s16le").columns == df.columns
    with pytest.raises(ValueError):
        transcode_audio(df, "opus")


def test_segment_audio_explode(spark):
    pcm2 = np.concatenate([_sil(200), _tone(300), _sil(500), _tone(300)])
    rows = [
        ("a", bytearray(wav_encode(pcm2, SR)), SR, 1300, "pcm_s16le"),
        ("b", bytearray(_clip(_sil(500))), SR, 500, "pcm_s16le"),  # all silent
        ("c", bytearray(b"junk"), SR, 100, "flac"),  # undecodable
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    out = segment_audio(df).collect()
    assert [c for c in segment_audio(df).columns] == [
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "seg_idx"]
    # silent + undecodable clips produce zero rows; 'a' explodes to 2
    assert sorted((r.clip_id, r.seg_idx) for r in out) == [("a", 0), ("a", 1)]
    by_idx = {r.seg_idx: r for r in out}
    for k, start in [(0, 200), (1, 1000)]:
        r = by_idx[k]
        assert (r.sr_hz, r.dur_ms, r.codec) == (SR, 300, "pcm_s16le")
        sr2, seg = decode_payload(bytes(r.bytes), "pcm_s16le")
        a = SR * start // 1000
        np.testing.assert_array_equal(seg, pcm2[a:a + SR * 300 // 1000])
