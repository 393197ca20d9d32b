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
