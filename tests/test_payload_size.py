"""expect_audio_payload_size_to_be_consistent — the decode-free
container-arithmetic screen (truncation / label-mismatch / missing
payload) that runs at metadata speed before the decode suite."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark.audio import encode_payload, synth_pcm  # noqa: E402

SR, DUR = 8000, 200  # n = 1600 samples


def _clip(cid: str, codec: str = "pcm_s16le", **over) -> dict:
    pcm = synth_pcm(cid, SR, DUR)
    row = dict(clip_id=cid, bytes=bytearray(encode_payload(pcm, SR, codec)),
               sr_hz=SR, dur_ms=DUR, codec=codec)
    row.update(over)
    return row


SCHEMA = "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"


def test_payload_size_verdicts(spark):
    n = SR * DUR // 1000
    good_pcm = _clip("good_pcm")
    assert len(good_pcm["bytes"]) == 44 + 2 * n  # the arithmetic the
    good_mu = _clip("good_mu", "pcm_mulaw")      # expectation encodes
    assert len(good_mu["bytes"]) == 44 + n
    good_al = _clip("good_al", "pcm_alaw")
    good_fl = _clip("good_fl", "flac")
    assert 42 < len(good_fl["bytes"]) <= int(1.02 * 2 * n) + 64
    rows = [
        good_pcm, good_mu, good_al, good_fl,
        # violations
        _clip("trunc_pcm", bytes=_clip("trunc_pcm")["bytes"][:-7]),
        _clip("bad_label", dur_ms=DUR + 50),   # label says 2000 samples
        _clip("trunc_mu", "pcm_mulaw",
              bytes=_clip("trunc_mu", "pcm_mulaw")["bytes"][:-1]),
        _clip("trunc_fl", "flac",
              bytes=_clip("trunc_fl", "flac")["bytes"][:10]),
        _clip("zero_dur", dur_ms=0),
        _clip("null_sr", sr_hz=None),
        # missing, not unexpected: null payload is not_be_null's concern
        # (the audio family's map-denominator convention)
        _clip("null_bytes", bytes=None),
        # excluded: unknown codec has no size arithmetic
        dict(clip_id="opus_row", bytes=bytearray(b"OggS" + b"x" * 50),
             sr_hz=SR, dur_ms=DUR, codec="opus"),
    ]
    df = spark.createDataFrame([tuple(r[k] for k in (
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec")) for r in rows],
        SCHEMA)
    suite = ExpectationSuite("sz").add(
        "expect_audio_payload_size_to_be_consistent")
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    r = b.suite_result.results[0]
    viol = {v["clip_id"] for v in b.violations_table().collect()}
    b.unpersist()
    assert not r.success
    assert r.result["unexpected_count"] == 6
    assert r.result["missing_count"] == 1  # the null payload
    assert viol == {"trunc_pcm", "bad_label", "trunc_mu", "trunc_fl",
                    "zero_dur", "null_sr"}


def test_payload_size_tolerance_and_ratio(spark):
    rows = [
        _clip("off_by_3", bytes=_clip("off_by_3")["bytes"][:-3]),
        _clip("off_by_9", bytes=_clip("off_by_9")["bytes"][:-9]),
    ]
    df = spark.createDataFrame([tuple(r[k] for k in (
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec")) for r in rows],
        SCHEMA)
    suite = ExpectationSuite("sz").add(
        "expect_audio_payload_size_to_be_consistent", tolerance_bytes=4)
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    r = b.suite_result.results[0]
    viol = {v["clip_id"] for v in b.violations_table().collect()}
    b.unpersist()
    assert r.result["unexpected_count"] == 1 and viol == {"off_by_9"}


def test_payload_size_flac_upper_bound_fires(spark):
    """An incompressible (random) payload padded past verbatim+overhead is
    flagged; the honest random FLAC itself stays within the 1.02 bound."""
    rng = np.random.default_rng(7)
    pcm = rng.integers(-32768, 32768, SR * DUR // 1000).astype(np.int16)
    fl = encode_payload(pcm, SR, "flac")
    n = SR * DUR // 1000
    assert len(fl) <= int(np.ceil(1.02 * 2 * n)) + 64
    rows = [
        ("honest", bytearray(fl), SR, DUR, "flac"),
        ("padded", bytearray(fl + b"\x00" * (2 * n)), SR, DUR, "flac"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    suite = ExpectationSuite("sz").add(
        "expect_audio_payload_size_to_be_consistent")
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    viol = {v["clip_id"] for v in b.violations_table().collect()}
    b.unpersist()
    assert viol == {"padded"}


def test_payload_size_is_pure_jvm(spark, tmp_path):
    """No Python evaluation anywhere: length() arithmetic rides the agg
    scan — the whole point of the pre-decode screen.  (bytes IS read —
    length needs it — but never crosses into a Python worker.)"""
    from gx_spark.plancheck import compile_suite, formatted_plan, stage1_df

    src = spark.createDataFrame(
        [tuple(_clip("a")[k] for k in (
            "clip_id", "bytes", "sr_hz", "dur_ms", "codec"))], SCHEMA)
    path = str(tmp_path / "sz_clips")
    src.write.parquet(path)
    df = spark.read.parquet(path)
    suite = ExpectationSuite("sz").add(
        "expect_audio_payload_size_to_be_consistent")
    ctx = compile_suite(spark, df, suite)
    plan = formatted_plan(stage1_df(ctx))
    assert "EvalPython" not in plan and "InPandas" not in plan
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    ok = b.suite_result.results[0].success
    b.unpersist()
    assert ok


def test_payload_size_diagnostics_gallery(spark):
    from gx_spark.diagnostics import run_diagnostics

    rep = run_diagnostics(
        spark, "expect_audio_payload_size_to_be_consistent")
    assert rep["success"], rep
    assert rep["examples_run"] >= 1 and rep["examples_passed"] == rep[
        "examples_run"]


def test_committed_driver_literals_rederive():
    """The oracle literals in __spark_entry__.oracle_sql()['audio_payload_size']
    re-derive from the live encoders (the mel-literal convention)."""
    t = np.arange(SR * 200 // 1000) / SR
    pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * 300.0 * t)).astype(
        np.int16)
    lens = {c: len(encode_payload(pcm, SR, c))
            for c in ("pcm_s16le", "pcm_mulaw", "pcm_alaw", "flac")}
    assert lens == {"pcm_s16le": 3244, "pcm_mulaw": 1644,
                    "pcm_alaw": 1644, "flac": 3253}


def test_payload_size_adpcm_branch(spark):
    """adpcm_ima rows get exact block arithmetic: 1600 samples -> 4
    blocks of 256 B + 60 B framing = 1084 B; truncation and label
    inflation both fire."""
    n = SR * DUR // 1000
    good = _clip("good_ad", "adpcm_ima")
    assert len(good["bytes"]) == 60 + 256 * ((n + 504) // 505) == 1084
    rows = [
        good,
        _clip("trunc_ad", "adpcm_ima",
              bytes=_clip("trunc_ad", "adpcm_ima")["bytes"][:-256]),
        _clip("bad_dur_ad", "adpcm_ima", dur_ms=DUR + 200),
    ]
    df = spark.createDataFrame([tuple(r[k] for k in (
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec")) for r in rows],
        SCHEMA)
    suite = ExpectationSuite("sz").add(
        "expect_audio_payload_size_to_be_consistent")
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    viol = {v["clip_id"] for v in b.violations_table().collect()}
    b.unpersist()
    assert viol == {"trunc_ad", "bad_dur_ad"}


def test_payload_size_f32_branch(spark):
    """pcm_f32le rows get exact float-container arithmetic: 1600 samples
    -> 56 B framing (incl. the mandatory fact chunk) + 4 B/sample =
    6456 B; truncation and label inflation both fire."""
    n = SR * DUR // 1000
    good = _clip("good_f32", "pcm_f32le")
    assert len(good["bytes"]) == 56 + 4 * n == 6456
    rows = [
        good,
        _clip("trunc_f32", "pcm_f32le",
              bytes=_clip("trunc_f32", "pcm_f32le")["bytes"][:-400]),
        _clip("bad_dur_f32", "pcm_f32le", dur_ms=DUR + 100),
    ]
    df = spark.createDataFrame([tuple(r[k] for k in (
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec")) for r in rows],
        SCHEMA)
    suite = ExpectationSuite("sz").add(
        "expect_audio_payload_size_to_be_consistent")
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    viol = {v["clip_id"] for v in b.violations_table().collect()}
    b.unpersist()
    assert viol == {"trunc_f32", "bad_dur_f32"}
