"""Electrical-defect screens (gx_spark/audio_ops.py): DC offset + mains
hum from one shared decode (compute_electrical_row / electrical_features),
the two gates riding `__electrical`, and the remove_dc_offset repair op."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    compute_electrical_row,
    electrical_features,
    remove_dc_offset,
)

SR = 16000
N = 4800  # 300 ms: integer cycles for 50 Hz (15), 60 Hz (18), 440 Hz (132)


def _mk(x: np.ndarray, codec: str = "pcm_s16le") -> bytes:
    pcm = np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)
    return encode_payload(pcm, SR, codec)


def _tone(amp: float, freq: float) -> np.ndarray:
    return amp * np.sin(2 * np.pi * freq * np.arange(N) / SR)


def test_clean_tone_has_no_defects():
    r = compute_electrical_row(_mk(_tone(0.3, 440.0)), "pcm_s16le")
    assert abs(r["dc_frac"]) < 1e-4
    # integer cycles of an off-grid tone: essentially zero hum energy
    assert r["hum_ratio"] < 1e-6


@pytest.mark.parametrize("base", [50.0, 60.0])
def test_planted_hum_ratio_closed_form(base):
    # tone amp 0.3 + hum amp 0.15: ratio = A^2/(A^2+B^2) = 0.2 exactly
    x = _tone(0.3, 440.0) + _tone(0.15, base)
    r = compute_electrical_row(_mk(x), "pcm_s16le")
    assert r["hum_ratio"] == pytest.approx(0.2, abs=1e-3)
    assert r["hum_base_hz"] == base


def test_hum_harmonics_are_counted():
    # energy split across the 50 Hz fundamental and its 2nd/3rd harmonics
    x = (_tone(0.3, 440.0) + _tone(0.1, 50.0) + _tone(0.1, 100.0)
         + _tone(0.1, 150.0))
    r = compute_electrical_row(_mk(x), "pcm_s16le")
    want = 3 * 0.1 ** 2 / (3 * 0.1 ** 2 + 0.3 ** 2)
    assert r["hum_ratio"] == pytest.approx(want, abs=1e-3)
    assert r["hum_base_hz"] == 50.0


def test_dc_offset_measured_and_excluded_from_hum():
    x = _tone(0.3, 440.0) + 0.1
    r = compute_electrical_row(_mk(x), "pcm_s16le")
    assert r["dc_frac"] == pytest.approx(0.1, abs=1e-3)
    assert r["hum_ratio"] < 1e-6  # DC removed before the probe


def test_silent_and_junk_rows_are_null():
    r = compute_electrical_row(_mk(np.zeros(N)), "pcm_s16le")
    assert r["dc_frac"] == 0.0 and r["hum_ratio"] is None
    rj = compute_electrical_row(b"junk", "pcm_s16le")
    assert rj["dc_frac"] is None and rj["hum_ratio"] is None


def test_remove_dc_offset_repair():
    clean = _mk(_tone(0.3, 440.0))
    offset = _mk(_tone(0.3, 440.0) + 0.1, "flac")
    y, n_clip, _ = None, None, None
    sr, pcm = decode_payload(offset, "flac")
    dc = int(np.rint(np.mean(pcm)))
    assert dc == pytest.approx(3277, abs=1)
    # numpy-level check via the op below (Spark test)


def test_electrical_spark_ops(spark):
    from pyspark.sql import functions as F

    from gx_spark.plancheck import formatted_plan

    rows = [
        (1, bytearray(_mk(_tone(0.3, 440.0))), "pcm_s16le"),
        (2, bytearray(_mk(_tone(0.3, 440.0) + _tone(0.15, 60.0), "flac")),
         "flac"),
        (3, bytearray(_mk(_tone(0.3, 440.0) + 0.1)), "pcm_s16le"),
        (4, bytearray(b"junk"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary, codec string")
    out = {r["clip_id"]: r.asDict() for r in
           electrical_features(df, keep_cols=["clip_id"]).collect()}
    assert out[1]["hum_ratio"] < 1e-6
    assert out[2]["hum_ratio"] == pytest.approx(0.2, abs=1e-3)
    assert out[2]["hum_base_hz"] == 60.0
    assert out[3]["dc_frac"] == pytest.approx(0.1, abs=1e-3)
    assert out[4]["dc_frac"] is None
    assert "Exchange" not in formatted_plan(
        electrical_features(df, keep_cols=["clip_id"]))

    fixed = remove_dc_offset(df)
    got = {r["clip_id"]: r.asDict() for r in fixed.collect()}
    # clean clip passes ORIGINAL bytes through
    assert bytes(got[1]["bytes"]) == bytes(rows[0][1])
    assert got[1]["dc_removed"] == 0
    # offset clip: dc subtracted, re-encoded, now measures ~0
    assert got[3]["dc_removed"] == pytest.approx(3277, abs=1)
    post = compute_electrical_row(bytes(got[3]["bytes"]), got[3]["codec"])
    assert abs(post["dc_frac"]) < 1e-3
    assert got[4]["bytes"] is None and got[4]["dc_removed"] is None
    assert "Exchange" not in formatted_plan(remove_dc_offset(df))


def test_electrical_gates_share_one_decode(spark):
    from gx_spark import EngineOptions, validate
    from gx_spark.model import ExpectationSuite

    rows = [
        ("clean", bytearray(_mk(_tone(0.3, 440.0))), "pcm_s16le"),
        ("hum", bytearray(_mk(_tone(0.3, 440.0) + _tone(0.15, 50.0))),
         "pcm_s16le"),
        ("dc", bytearray(_mk(_tone(0.3, 440.0) + 0.1)), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    suite = (ExpectationSuite("elec")
             .add("expect_audio_dc_offset_to_be_below", max_frac=0.02)
             .add("expect_audio_hum_ratio_to_be_below", max_ratio=0.01))
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    viol = {(v["clip_id"], v["expectation_type"])
            for v in b.violations_table().collect()}
    b.unpersist()
    assert viol == {("dc", "expect_audio_dc_offset_to_be_below"),
                    ("hum", "expect_audio_hum_ratio_to_be_below")}


def test_electrical_params_conflict_rejected(spark):
    from gx_spark import validate
    from gx_spark.model import ExpectationSuite

    df = spark.createDataFrame(
        [("c", bytearray(_mk(_tone(0.3, 440.0))), "pcm_s16le")],
        "clip_id string, bytes binary, codec string")
    suite = (ExpectationSuite("bad")
             .add("expect_audio_dc_offset_to_be_below", n_harmonics=3)
             .add("expect_audio_hum_ratio_to_be_below", n_harmonics=5))
    # plan-time errors surface via the engine's exception_info convention
    b = validate(spark, df, suite)
    conflicted = b.suite_result.results[1]
    assert conflicted.success is False
    assert "conflicting electrical" in conflicted.exception_info[
        "exception_message"]


def test_electrical_diagnostics_gallery(spark):
    from gx_spark.diagnostics import run_diagnostics

    for name in ("expect_audio_dc_offset_to_be_below",
                 "expect_audio_hum_ratio_to_be_below"):
        rep = run_diagnostics(spark, name)
        assert rep["success"], (name, rep)
        assert rep["examples_passed"] == rep["examples_run"] >= 1


# ---------------------------------------------------------------------------
# remove_hum (detection-gated FFT notch)
# ---------------------------------------------------------------------------


def test_remove_hum_pcm_closed_form():
    from gx_spark.audio_ops import remove_hum_pcm

    x = _tone(0.3, 440.0) + _tone(0.15, 50.0)
    pcm = np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)
    y, ratio = remove_hum_pcm(pcm, SR)
    assert ratio == pytest.approx(0.2, abs=1e-3)
    post = compute_electrical_row(encode_payload(y, SR, "pcm_s16le"),
                                  "pcm_s16le")
    assert post["hum_ratio"] < 1e-4          # hum gone
    # the 440 Hz program content survives: RMS equals the tone's RMS
    want = 10 * np.log10((0.3 * 32767 / 32768) ** 2 / 2)
    got = 10 * np.log10(np.mean((y.astype(np.float64) / 32768.0) ** 2))
    assert got == pytest.approx(want, abs=0.02)


def test_remove_hum_gate_passthrough():
    from gx_spark.audio_ops import remove_hum_pcm

    pcm = np.clip(np.rint(_tone(0.3, 440.0) * 32767),
                  -32768, 32767).astype(np.int16)
    y, ratio = remove_hum_pcm(pcm, SR)
    assert y is pcm and ratio < 1e-6  # below the gate: untouched object


def test_remove_hum_spark_op(spark):
    from gx_spark.audio_ops import remove_hum
    from gx_spark.plancheck import formatted_plan

    rows = [
        (1, bytearray(_mk(_tone(0.3, 440.0))), "pcm_s16le"),
        (2, bytearray(_mk(_tone(0.3, 440.0) + _tone(0.15, 60.0), "flac")),
         "flac"),
        (3, bytearray(b"junk"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary, codec string")
    out = {r["clip_id"]: r.asDict() for r in remove_hum(df).collect()}
    assert bytes(out[1]["bytes"]) == bytes(rows[0][1])  # clean passthrough
    assert out[1]["codec"] == "pcm_s16le"
    assert out[2]["codec"] == "pcm_s16le"  # repaired re-encode
    assert out[2]["hum_removed_ratio"] == pytest.approx(0.2, abs=1e-3)
    post = compute_electrical_row(bytes(out[2]["bytes"]), "pcm_s16le")
    assert post["hum_ratio"] < 1e-4
    assert out[3]["bytes"] is None and out[3]["hum_removed_ratio"] is None
    assert "Exchange" not in formatted_plan(remove_hum(df))
