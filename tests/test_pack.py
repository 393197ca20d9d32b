"""Sequence packing (gx_spark/audio_ops.py pack_clips): metadata-speed
bin assignment via the token_shards prefix sum, payload concatenation
with silence separators, and the mixed-rate / undecodable safety rails."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload  # noqa: E402
from gx_spark.audio_ops import pack_clips  # noqa: E402

SR = 16000


def _clip(i: int, dur_ms: int = 300, freq: float | None = None,
          sr: int = SR, codec: str = "pcm_s16le"):
    f = freq if freq is not None else 200.0 + 10.0 * i
    t = np.arange(sr * dur_ms // 1000) / sr
    pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16)
    return (i, bytearray(encode_payload(pcm, sr, codec)), codec, dur_ms)


SCHEMA = "clip_id long, bytes binary, codec string, dur_ms int"


def test_pack_uniform_clips_exact_arithmetic(spark):
    # 12 clips of 300 ms, target 1200 -> bins of exactly 4, ids in order
    df = spark.createDataFrame([_clip(i) for i in range(12)], SCHEMA)
    out = {r["bin"]: r.asDict()
           for r in pack_clips(df, 1200, gap_ms=0).collect()}
    assert set(out) == {0, 1, 2}
    for b in out:
        r = out[b]
        assert r["n_clips"] == 4 and r["n_bad"] == 0
        assert r["sr_hz"] == SR
        assert r["total_samples"] == 4 * 4800 and r["dur_ms"] == 1200
        assert r["clip_ids"] == ",".join(str(4 * b + k) for k in range(4))
        sr, pcm = decode_payload(bytes(r["bytes"]), r["codec"])
        assert len(pcm) == 4 * 4800
    # the packed payload is the exact concatenation in id order
    sr, pcm = decode_payload(bytes(out[0]["bytes"]), "pcm_s16le")
    first = decode_payload(bytes(_clip(0)[1]), "pcm_s16le")[1]
    assert np.array_equal(pcm[:4800], first)
    third = decode_payload(bytes(_clip(2)[1]), "pcm_s16le")[1]
    assert np.array_equal(pcm[2 * 4800:3 * 4800], third)


def test_pack_gap_separators(spark):
    df = spark.createDataFrame([_clip(i) for i in range(4)], SCHEMA)
    r = pack_clips(df, 1200, gap_ms=100).collect()[0]
    # 4 clips + 3 gaps of 1600 samples
    assert r["total_samples"] == 4 * 4800 + 3 * 1600
    assert r["dur_ms"] == 1500
    sr, pcm = decode_payload(bytes(r["bytes"]), r["codec"])
    # the separator region is digital silence
    assert np.all(pcm[4800:4800 + 1600] == 0)


def test_pack_next_fit_overflow_bound(spark):
    # 500 ms clips, target 1200: prefix 0/500/1000/1500... -> bins of
    # size 3/2/3/2... (overflow by < one clip, never more)
    df = spark.createDataFrame(
        [_clip(i, dur_ms=500) for i in range(10)], SCHEMA)
    out = {r["bin"]: r["n_clips"]
           for r in pack_clips(df, 1200).collect()}
    assert out == {0: 3, 1: 2, 2: 3, 3: 2}


def test_pack_mixed_rate_and_bad_rows_fail_closed(spark):
    rows = [_clip(0), _clip(1, sr=8000), _clip(2), _clip(3)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = pack_clips(df, 1200).collect()[0]
    assert r["bytes"] is None and r["sr_hz"] is None  # mixed rates
    rows2 = [_clip(0), _clip(1), (2, bytearray(b"junk"), "pcm_s16le", 300),
             _clip(3)]
    r2 = pack_clips(spark.createDataFrame(rows2, SCHEMA), 1200).collect()[0]
    assert r2["bytes"] is None and r2["n_bad"] == 1


def test_pack_plan_single_payload_shuffle(spark):
    from gx_spark.plancheck import formatted_plan

    df = spark.createDataFrame([_clip(i) for i in range(8)], SCHEMA)
    plan = formatted_plan(pack_clips(df, 1200))
    # the assignment pass is a separate narrow job (collected at call
    # time); the returned plan holds ONLY the single bin-aligned payload
    # exchange — no join, no second shuffle after assembly (formatted
    # plans list each node twice: tree + detail)
    assert plan.count("Exchange") <= 2
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_pack_transcripts_follow_audio(spark):
    rows = [_clip(i) + (f"word{i}",) for i in range(8)]
    df = spark.createDataFrame(
        rows, SCHEMA + ", transcript string")
    out = {r["bin"]: r for r in pack_clips(
        df, 1200, transcript_col="transcript").collect()}
    assert out[0]["transcript"] == "word0 word1 word2 word3"
    assert out[1]["transcript"] == "word4 word5 word6 word7"
    # a bad member fails the bin closed: transcript null too
    rows2 = [_clip(0) + ("a",), (1, bytearray(b"junk"), "pcm_s16le",
                                 300, "b"), _clip(2) + ("c",),
             _clip(3) + ("d",)]
    r2 = pack_clips(spark.createDataFrame(rows2, SCHEMA + ", transcript "
                    "string"), 1200, transcript_col="transcript"
                    ).collect()[0]
    assert r2["bytes"] is None and r2["transcript"] is None


def test_pack_stratified_by_rate(spark):
    # 6 clips at 16 kHz interleaved with 6 at 8 kHz: stratified packing
    # fills per-stratum bins in per-stratum id order — no mixed-rate
    # failures, bin numbering restarts per stratum
    rows = []
    for i in range(12):
        sr = 16000 if i % 2 == 0 else 8000
        rows.append(_clip(i, sr=sr) + (sr,))
    df = spark.createDataFrame(rows, SCHEMA + ", sr_hz int")
    out = pack_clips(df, 1200, stratify_col="sr_hz").collect()
    by = {(r["stratum"], r["bin"]): r for r in out}
    assert set(by) == {("16000", 0), ("16000", 1), ("8000", 0),
                       ("8000", 1)}
    for (s, b), r in by.items():
        assert r["n_bad"] == 0 and r["sr_hz"] == int(s)
        # members are the stratum's ids in order: 6 clips of 300 ms per
        # stratum pack 4 into bin 0 and the remaining 2 into bin 1
        start = 0 if s == "16000" else 1
        n_in_bin = 4 if b == 0 else 2
        want = [str(start + 2 * (4 * b + k)) for k in range(n_in_bin)]
        assert r["clip_ids"] == ",".join(want)
        assert r["n_clips"] == n_in_bin
        assert r["total_samples"] == n_in_bin * (int(s) * 300 // 1000)


def test_pack_stratified_null_stratum(spark):
    rows = [_clip(i) + (None if i < 4 else "en",) for i in range(8)]
    df = spark.createDataFrame(rows, SCHEMA + ", lang string")
    out = pack_clips(df, 1200, stratify_col="lang").collect()
    strata = {r["stratum"]: r for r in out}
    assert set(strata) == {None, "en"}
    assert strata[None]["clip_ids"] == "0,1,2,3"
    assert strata["en"]["clip_ids"] == "4,5,6,7"


def test_pack_resample_at_pack_and_skip_bad(spark):
    # mixed 16k/8k members + one undecodable: resample_to unifies the
    # rate at assembly (8 kHz 2400-sample members become exactly 4800),
    # skip_bad drops the corrupt member but keeps the window
    rows = [_clip(0), _clip(1, sr=8000),
            (2, bytearray(b"junk"), "pcm_s16le", 300), _clip(3)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = pack_clips(df, 1200, resample_to=16000, skip_bad=True,
                   gap_ms=0).collect()[0]
    assert r["n_clips"] == 3 and r["n_bad"] == 1
    assert r["sr_hz"] == 16000
    assert r["total_samples"] == 3 * 4800
    assert r["clip_ids"] == "0,1,2,3"  # membership includes the bad id
    sr, pcm = decode_payload(bytes(r["bytes"]), r["codec"])
    assert sr == 16000 and len(pcm) == 3 * 4800
    # default rails unchanged: same input fails closed
    r2 = pack_clips(df, 1200).collect()[0]
    assert r2["bytes"] is None and r2["n_bad"] == 1
