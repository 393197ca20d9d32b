"""Spectral-subtraction noise reduction (gx_spark/audio_ops.py
denoise_pcm/denoise_audio): exact-identity OLA, interior-gap
suppression, signal preservation, and the null-bytes rail."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload  # noqa: E402
from gx_spark.audio_ops import denoise_audio, denoise_pcm  # noqa: E402

SR = 16000


def _gated(noise_sigma=0.0, seed=7):
    t = np.arange(SR) / SR
    tone = 0.3 * 32767 * np.sin(2 * np.pi * 440 * t)
    gate = ((t * 1000) // 250) % 2 == 0  # 250 ms bursts with gaps
    clean = np.rint(tone * gate).astype(np.int16)
    if noise_sigma == 0.0:
        return clean, clean, gate
    rng = np.random.default_rng(seed)
    noisy = np.clip(np.rint(clean + rng.normal(
        0, noise_sigma * 32767, SR)), -32768, 32767).astype(np.int16)
    return noisy, clean, gate


def _interior_silence():
    phase = (np.arange(SR) / SR * 1000).astype(int) % 500
    return (phase >= 290) & (phase <= 460)


def test_ola_identity_when_gain_one():
    rng = np.random.default_rng(3)
    x = np.clip(np.rint(rng.normal(0, 0.1 * 32767, SR)),
                -32768, 32767).astype(np.int16)
    y = denoise_pcm(x, SR, oversub=0.0, floor_gain=0.0)
    assert np.array_equal(y, x)  # exact COLA reconstruction


def test_gap_noise_suppressed_signal_kept():
    noisy, clean, gate = _gated(0.03)
    den = denoise_pcm(noisy, SR)
    assert len(den) == SR
    sil = _interior_silence()

    def rms(x, m):
        return np.sqrt(np.mean(x[m].astype(np.float64) ** 2))

    # >= 9 dB suppression in the interior of the gaps
    assert rms(den, sil) < rms(noisy, sil) / 2.8
    # the tone bursts are not degraded beyond the original noise level
    e_n = noisy[gate].astype(float) - clean[gate].astype(float)
    e_d = den[gate].astype(float) - clean[gate].astype(float)
    assert np.sqrt(np.mean(e_d ** 2)) < 1.1 * np.sqrt(np.mean(e_n ** 2))


def test_clean_gated_tone_nearly_untouched():
    clean, _, _ = _gated(0.0)
    q = denoise_pcm(clean, SR)
    err = q.astype(float) - clean.astype(float)
    ref = np.sqrt(np.mean(clean.astype(np.float64) ** 2))
    assert np.sqrt(np.mean(err ** 2)) < 0.01 * ref


def test_short_clip_passthrough():
    x = np.arange(100, dtype=np.int16)
    assert np.array_equal(denoise_pcm(x, SR), x)


def test_df_roundtrip_and_bad_rows(spark):
    noisy, clean, gate = _gated(0.03)
    rows = [(0, bytearray(encode_payload(noisy, SR, "flac")), "flac"),
            (1, bytearray(b"junk"), "pcm_s16le")]
    out = {r["clip_id"]: r for r in denoise_audio(
        spark.createDataFrame(
            rows, "clip_id long, bytes binary, codec string")).collect()}
    sr, y = decode_payload(bytes(out[0]["bytes"]), out[0]["codec"])
    ref = denoise_pcm(noisy, SR)
    assert np.array_equal(y, ref) and sr == SR  # df == pcm path
    assert out[1]["bytes"] is None
