"""Multi-channel WAV support: wav_encode_multi/wav_decode_multi (PCM16 +
IEEE-float32, tags 1/3), the header-only channel probe (payload_channels
and its pure-JVM twin channel_count_expr), channel_stats / downmix_audio
ops, the decode-free mono gate, and the pcm_f32le codec label."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import (  # noqa: E402
    decode_payload,
    encode_payload,
    payload_channels,
    wav_decode_full,
    wav_decode_multi,
    wav_encode_multi,
)
from gx_spark.audio_ops import (  # noqa: E402
    channel_stats,
    compute_channel_row,
    downmix_audio,
)

SR = 16000


def _tone(amp: float, freq: float = 440.0, n: int = 4800) -> np.ndarray:
    t = np.arange(n) / SR
    return np.rint(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(
        np.int16)


# ---------------------------------------------------------------------------
# container round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt_tag", [1, 3])
@pytest.mark.parametrize("ch", [1, 2, 4])
def test_multi_roundtrip_bit_exact(fmt_tag, ch):
    pcm = np.stack([_tone(0.1 * (k + 1), 200.0 * (k + 1)) for k in range(ch)],
                   axis=1)
    b = wav_encode_multi(pcm, SR, fmt_tag)
    ft, sr, out = wav_decode_multi(b)
    assert (ft, sr) == (fmt_tag, SR)
    assert out.shape == (4800, ch)
    assert np.array_equal(out, pcm)  # f32 uses /32768 both ways: exact


def test_mono_path_rejects_multichannel():
    b = wav_encode_multi(np.stack([_tone(0.2), _tone(0.2)], 1), SR)
    with pytest.raises(ValueError, match="mono"):
        wav_decode_full(b)


def test_pcm_f32le_codec_label_roundtrip():
    pcm = _tone(0.37)
    b = encode_payload(pcm, SR, "pcm_f32le")
    sr, out = decode_payload(b, "pcm_f32le")
    assert sr == SR and np.array_equal(out, pcm)
    # mislabeled container is rejected, same as the other WAV codecs
    with pytest.raises(ValueError):
        decode_payload(b, "pcm_s16le")


def test_payload_channels_probe():
    from gx_spark.oggopus import ogg_opus_encode

    mono = encode_payload(_tone(0.3), SR, "pcm_s16le")
    stereo = wav_encode_multi(np.stack([_tone(0.3)] * 2, 1), SR)
    stereo_f32 = wav_encode_multi(np.stack([_tone(0.3)] * 2, 1), SR, 3)
    flac = encode_payload(_tone(0.3), SR, "flac")
    opus = ogg_opus_encode("c1", SR, 300)
    assert payload_channels(mono, "pcm_s16le") == 1
    assert payload_channels(stereo, "pcm_s16le") == 2
    assert payload_channels(stereo_f32, "pcm_f32le") == 2
    assert payload_channels(flac, "flac") == 1
    assert payload_channels(opus, "opus") == 1
    assert payload_channels(b"junk", "pcm_s16le") is None
    assert payload_channels(mono, "weird") is None


# ---------------------------------------------------------------------------
# row-level channel stats
# ---------------------------------------------------------------------------


def test_compute_channel_row_balance():
    L, R = _tone(0.4), _tone(0.1)
    st = wav_encode_multi(np.stack([L, R], 1), SR)
    r = compute_channel_row(st, "pcm_s16le")
    assert r["n_channels"] == 2
    # RMS ratio of amp 0.4 vs 0.1 sines = 20*log10(4) = 12.0412 dB
    assert r["balance_db"] == pytest.approx(12.0412, abs=0.01)
    assert len(r["ch_rms_dbfs"]) == 2

    mono = encode_payload(L, SR, "pcm_s16le")
    rm = compute_channel_row(mono, "pcm_s16le")
    assert rm["n_channels"] == 1 and rm["balance_db"] is None
    assert len(rm["ch_rms_dbfs"]) == 1

    # a digitally-silent channel has no dB RMS -> balance undefined
    sil = wav_encode_multi(
        np.stack([L, np.zeros(4800, np.int16)], 1), SR)
    rs = compute_channel_row(sil, "pcm_s16le")
    assert rs["n_channels"] == 2 and rs["balance_db"] is None
    assert rs["ch_rms_dbfs"][1] is None

    rj = compute_channel_row(b"junk", "pcm_s16le")
    assert rj["n_channels"] is None and rj["ch_rms_dbfs"] is None


# ---------------------------------------------------------------------------
# Spark ops
# ---------------------------------------------------------------------------


def _table(spark):
    L, R = _tone(0.4), _tone(0.1)
    rows = [
        (1, bytearray(encode_payload(L, SR, "pcm_s16le")), "pcm_s16le"),
        (2, bytearray(wav_encode_multi(np.stack([L, L], 1), SR)),
         "pcm_s16le"),
        (3, bytearray(wav_encode_multi(np.stack([L, R], 1), SR, 3)),
         "pcm_f32le"),
        (4, bytearray(b"junk"), "pcm_s16le"),
    ]
    return spark.createDataFrame(
        rows, "clip_id long, bytes binary, codec string"), rows


def test_channel_stats_op(spark):
    df, _ = _table(spark)
    out = {r["clip_id"]: r.asDict() for r in
           channel_stats(df, keep_cols=["clip_id"]).collect()}
    assert out[1]["n_channels"] == 1 and out[1]["balance_db"] is None
    assert out[2]["n_channels"] == 2
    assert out[2]["balance_db"] == pytest.approx(0.0, abs=1e-9)
    assert out[3]["n_channels"] == 2
    assert out[3]["balance_db"] == pytest.approx(12.0412, abs=0.01)
    assert out[4]["n_channels"] is None
    assert "bytes" not in channel_stats(df).columns


def test_downmix_audio_op(spark):
    df, rows = _table(spark)
    out = {r["clip_id"]: r.asDict() for r in downmix_audio(df).collect()}

    # mono: ORIGINAL bytes verbatim
    assert bytes(out[1]["bytes"]) == bytes(rows[0][1])
    assert out[1]["n_channels_in"] == 1 and out[1]["codec"] == "pcm_s16le"

    # identical channels: downmix == the channel, bit-identical
    L = _tone(0.4)
    sr2, pcm2 = decode_payload(bytes(out[2]["bytes"]), out[2]["codec"])
    assert out[2]["n_channels_in"] == 2 and out[2]["codec"] == "pcm_s16le"
    assert np.array_equal(pcm2, L)

    # mean of distinct channels (f32 source re-encodes pcm_s16le)
    R = _tone(0.1)
    expect = np.clip(np.rint((L.astype(np.float64) + R) / 2.0),
                     -32768, 32767).astype(np.int16)
    _, pcm3 = decode_payload(bytes(out[3]["bytes"]), out[3]["codec"])
    assert np.array_equal(pcm3, expect)

    # junk: null bytes (trim_silence convention)
    assert out[4]["bytes"] is None and out[4]["n_channels_in"] is None


def test_channel_ops_plans_are_map_only(spark):
    from gx_spark.plancheck import formatted_plan

    df, _ = _table(spark)
    assert "Exchange" not in formatted_plan(downmix_audio(df))
    assert "Exchange" not in formatted_plan(
        channel_stats(df, keep_cols=["clip_id"]))


# ---------------------------------------------------------------------------
# JVM header expression + expectation
# ---------------------------------------------------------------------------


def test_channel_count_expr_matches_python_probe(spark):
    from pyspark.sql import functions as F

    from gx_spark.expectations.audio_exp import channel_count_expr
    from gx_spark.oggopus import ogg_opus_encode

    L = _tone(0.3)
    rows = [
        ("wav1", bytearray(encode_payload(L, SR, "pcm_s16le")), "pcm_s16le"),
        ("wav2", bytearray(wav_encode_multi(np.stack([L] * 3, 1), SR)),
         "pcm_s16le"),
        ("f32", bytearray(wav_encode_multi(np.stack([L] * 2, 1), SR, 3)),
         "pcm_f32le"),
        ("ulaw", bytearray(encode_payload(L, SR, "pcm_mulaw")), "pcm_mulaw"),
        ("alaw", bytearray(encode_payload(L, SR, "pcm_alaw")), "pcm_alaw"),
        ("adpcm", bytearray(encode_payload(L, SR, "adpcm_ima")), "adpcm_ima"),
        ("flac", bytearray(encode_payload(L, SR, "flac")), "flac"),
        ("opus", bytearray(ogg_opus_encode("c", SR, 300)), "opus"),
        ("junk", bytearray(b"junk"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r["clip_id"]: r["ch"] for r in df.select(
        "clip_id",
        channel_count_expr(F.col("bytes"), F.col("codec")).alias("ch"),
    ).collect()}
    for cid, bb, cc in rows:
        assert got[cid] == payload_channels(bytes(bb), cc), cid


def test_mono_gate_expectation(spark):
    from gx_spark import validate
    from gx_spark.model import ExpectationSuite

    df, _ = _table(spark)
    # unknown codec rows are excluded, not unexpected
    extra = spark.createDataFrame(
        [(9, bytearray(b"whatever"), "weird")],
        "clip_id long, bytes binary, codec string")
    b = validate(
        spark, df.unionByName(extra),
        ExpectationSuite("mono").add(
            "expect_audio_channel_count_to_equal", n_channels=1))
    r = b.suite_result.results[0]
    # stereo (2), stereo f32 (3), junk header (4) -> 3 unexpected of 4 known
    assert r.success is False
    assert r.result.get("unexpected_count") == 3


def test_mono_gate_diagnostics_gallery(spark):
    from gx_spark.diagnostics import run_diagnostics

    rep = run_diagnostics(spark, "expect_audio_channel_count_to_equal")
    assert rep["success"], rep
    assert rep["examples_run"] >= 1
    assert rep["examples_passed"] == rep["examples_run"]
