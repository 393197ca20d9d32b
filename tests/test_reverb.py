"""Reverberation augmentation (gx_spark/audio_ops.py make_rir /
reverb_pcm / augment_reverb): closed-form echo arithmetic, exp-decay
energy normalization, determinism, and the Spark plumbing."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload  # noqa: E402
from gx_spark.audio_ops import augment_reverb, make_rir, reverb_pcm  # noqa: E402

SR = 16000
N = 4800  # 300 ms


def _tone(amp: float, freq: float) -> np.ndarray:
    x = amp * np.sin(2 * np.pi * freq * np.arange(N) / SR)
    return np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)


def test_echo_rir_closed_form():
    # 400 Hz tone (period 40) with a 50 ms echo (D=800 = 20 periods):
    # y = x for k < 800, y = 1.5x for k >= 800 — exact sample arithmetic
    pcm = _tone(0.3, 400.0)
    h = make_rir(SR, kind="echo", delay_ms=50.0, gain=0.5)
    assert len(h) == 801 and h[0] == 1.0 and h[800] == 0.5
    y = reverb_pcm(pcm, h)
    assert len(y) == N
    want = pcm.astype(np.float64).copy()
    want[800:] *= 1.5
    want = np.clip(np.rint(want), -32768, 32767)
    assert np.max(np.abs(y - want)) <= 1  # FFT round trip: <= 1 LSB

    # power ratio (800·1 + 4000·2.25)/4800 -> +3.098 dB
    db = 10 * np.log10(np.mean(y.astype(np.float64) ** 2)
                       / np.mean(pcm.astype(np.float64) ** 2))
    assert db == pytest.approx(10 * np.log10(9800 / 4800), abs=0.01)


def test_exp_decay_tail_energy_is_normalized():
    rng = np.random.default_rng(7)
    h = make_rir(SR, kind="exp_decay", rt60_ms=300.0, gain=0.5, rng=rng)
    assert h[0] == 1.0
    assert float(np.dot(h[1:], h[1:])) == pytest.approx(0.25, rel=1e-12)
    # white input through the RIR gains ~ 1 + gain^2 in power
    rng2 = np.random.default_rng(8)
    x = np.clip(np.rint(rng2.standard_normal(4 * SR) * 0.1 * 32767),
                -32768, 32767).astype(np.int16)
    y = reverb_pcm(x, h)
    ratio = np.mean(y.astype(np.float64) ** 2) / np.mean(
        x.astype(np.float64) ** 2)
    assert ratio == pytest.approx(1.25, rel=0.05)


def test_identity_gain_returns_input():
    pcm = _tone(0.3, 400.0)
    assert reverb_pcm(pcm, make_rir(SR, gain=0.0)) is pcm


def test_augment_reverb_spark(spark):
    from gx_spark.plancheck import formatted_plan

    rows = [
        ("a", bytearray(encode_payload(_tone(0.3, 400.0), SR, "pcm_s16le")),
         "pcm_s16le"),
        ("b", bytearray(encode_payload(_tone(0.2, 250.0), SR, "flac")),
         "flac"),
        ("junk", bytearray(b"junk"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    out = {r["clip_id"]: r.asDict()
           for r in augment_reverb(df, gain=0.5).collect()}
    assert out["a"]["codec"] == "pcm_s16le"
    assert out["a"]["reverb_wet_db"] == pytest.approx(-6.0206, abs=1e-3)
    sr, y = decode_payload(bytes(out["a"]["bytes"]), "pcm_s16le")
    assert sr == SR and len(y) == N  # duration preserved
    assert out["b"]["codec"] == "pcm_s16le"
    assert out["junk"]["bytes"] is None
    assert out["junk"]["reverb_wet_db"] is None

    # determinism: a second run is bit-identical
    out2 = {r["clip_id"]: r.asDict()
            for r in augment_reverb(df, gain=0.5).collect()}
    assert bytes(out["a"]["bytes"]) == bytes(out2["a"]["bytes"])
    assert bytes(out["b"]["bytes"]) == bytes(out2["b"]["bytes"])

    # identity gain: ORIGINAL bytes pass through, wet null
    ident = {r["clip_id"]: r.asDict()
             for r in augment_reverb(df, gain=0.0).collect()}
    assert bytes(ident["a"]["bytes"]) == bytes(rows[0][1])
    assert ident["a"]["reverb_wet_db"] is None

    assert "Exchange" not in formatted_plan(augment_reverb(df))


def test_augment_pipeline_reverb_stage_matches_chained(spark):
    """Fused reverb->noise->speed->window reproduces the chained four-op
    output byte for byte (same crc32(seed:rir:id) RIR stream, same int16
    grid at every stage boundary)."""
    from gx_spark.audio_ops import (augment_noise, augment_pipeline,
                                    pad_or_trim, speed_perturb)

    rows = []
    for i, f in enumerate((300.0, 900.0, 2500.0)):
        t = np.arange(SR * 400 // 1000) / SR
        pcm = np.clip(np.rint(0.4 * 32767 * np.sin(2 * np.pi * f * t)),
                      -32768, 32767).astype(np.int16)
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i]
        rows.append((f"a{i}", bytearray(encode_payload(pcm, SR, codec)),
                     SR, 400, codec))
    rows.append(("a_silent", bytearray(encode_payload(
        np.zeros(SR // 5, np.int16), SR, "flac")), SR, 200, "flac"))
    rows.append(("a_bad", bytearray(b"junk"), SR, 100, "pcm_s16le"))
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    chained = pad_or_trim(
        speed_perturb(
            augment_noise(
                augment_reverb(df, gain=0.5).drop("reverb_wet_db"),
                snr_db=20.0),
            1.1),
        target_ms=1000)
    fused = augment_pipeline(df, reverb_gain=0.5, snr_db=20.0, speed=1.1,
                             target_ms=1000)
    a = {r["clip_id"]: r.asDict() for r in chained.collect()}
    b = {r["clip_id"]: r.asDict() for r in fused.collect()}
    assert set(a) == set(b)
    for cid in a:
        for k in ("bytes", "codec", "dur_ms", "noise_rms_dbfs"):
            av, bv = a[cid].get(k), b[cid].get(k)
            if isinstance(av, (bytes, bytearray)) or isinstance(
                    bv, (bytes, bytearray)):
                av = bytes(av) if av is not None else None
                bv = bytes(bv) if bv is not None else None
            assert av == bv, (cid, k)
