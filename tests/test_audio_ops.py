"""Audio pipeline ops (gx_spark/audio_ops.py): acoustic features,
cross-codec fingerprint dedup, windowed-sinc resampling.  Closed-form
numpy checks run Spark-free; the Spark tests pin the DataFrame plumbing
(binary pruned before any shuffle, mapInPandas schema round-trip)."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import decode_payload, encode_payload, synth_pcm, wav_encode  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    audio_dedup_groups,
    augment_noise_pcm,
    compute_features_row,
    compute_fingerprint_row,
    extract_audio_features,
    fingerprint_audio,
    resample_audio,
    resample_sinc,
)

SR = 16000


def _tone(freq: float, amp: float, dur_s: float = 0.4, sr: int = SR) -> np.ndarray:
    t = np.arange(int(sr * dur_s)) / sr
    return np.clip(amp * np.sin(2 * np.pi * freq * t) * 32767,
                   -32768, 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# features: closed forms
# ---------------------------------------------------------------------------


def test_features_pure_tone_closed_forms():
    f = 100 * 31.25  # on the 512-frame bin grid, but any tone works here
    x = _tone(f, 0.5)
    r = compute_features_row(wav_encode(x, SR), "pcm_s16le")
    assert r["n_samples"] == len(x)
    assert r["header_sr"] == SR
    # sine rms = a / sqrt(2)
    assert abs(r["rms_dbfs"] - 20 * math.log10(0.5 / math.sqrt(2))) < 0.01
    assert abs(r["peak"] - 0.5) < 0.001
    assert r["clipping_ratio"] == 0.0
    # zcr of a tone ~ 2f (quantized zeros eat a few crossings)
    assert abs(r["zcr_per_sec"] - 2 * f) < 0.06 * 2 * f
    assert abs(r["dominant_hz"] - f) < SR / len(x) + 0.01
    assert abs(r["spectral_centroid_hz"] - f) < 20.0
    assert r["silence_ratio"] == 0.0


def test_features_silence_pad_and_clipping():
    x = _tone(1000.0, 0.5)
    pad = np.zeros(SR // 10, dtype=np.int16)  # 100 ms on the 25 ms frame grid
    r = compute_features_row(wav_encode(np.concatenate([pad, x]), SR), "pcm_s16le")
    n_frames = (len(pad) + len(x)) // (SR * 25 // 1000)
    assert r["silence_ratio"] == pytest.approx(4 / n_frames)
    hot = np.clip(_tone(1000.0, 0.5).astype(np.int32) * 3, -32768, 32767).astype(
        np.int16)
    rh = compute_features_row(wav_encode(hot, SR), "pcm_s16le")
    assert rh["clipping_ratio"] > 0.05
    assert rh["peak"] > 0.97
    # the rail survives a mu-law round trip thanks to the 32000 default rail
    rm = compute_features_row(encode_payload(hot, SR, "pcm_mulaw"), "pcm_mulaw")
    assert rm["clipping_ratio"] > 0.05


def test_features_decode_failure_is_all_null():
    r = compute_features_row(b"not audio at all", "pcm_s16le")
    assert all(v is None for v in r.values())
    r2 = compute_features_row(None, "pcm_s16le")
    assert all(v is None for v in r2.values())


def test_features_all_zero_clip():
    z = np.zeros(SR // 2, dtype=np.int16)
    r = compute_features_row(wav_encode(z, SR), "pcm_s16le")
    assert r["rms_dbfs"] is None
    assert r["silence_ratio"] == 1.0
    assert r["peak"] == 0.0


# ---------------------------------------------------------------------------
# fingerprint: invariance and distinctness
# ---------------------------------------------------------------------------


def _two_tone(b1: int, b2: int, gain: float = 1.0) -> np.ndarray:
    t = np.arange(6400) / SR
    x = 0.6 * np.sin(2 * np.pi * b1 * 31.25 * t) + 0.3 * np.sin(
        2 * np.pi * b2 * 31.25 * t)
    return np.clip(x * gain * 32767, -32768, 32767).astype(np.int16)


def test_fingerprint_codec_and_gain_invariant():
    pcm = _two_tone(100, 137)
    ref = compute_fingerprint_row(wav_encode(pcm, SR), "pcm_s16le")
    assert ref is not None
    for codec in ("flac", "pcm_mulaw", "pcm_alaw"):
        assert compute_fingerprint_row(
            encode_payload(pcm, SR, codec), codec) == ref, codec
    for gain in (0.5, 0.8, 0.25):
        scaled = (pcm.astype(np.float64) * gain).astype(np.int16)
        assert compute_fingerprint_row(wav_encode(scaled, SR), "pcm_s16le") == ref


def test_fingerprint_distinct_content():
    a = compute_fingerprint_row(wav_encode(_two_tone(100, 137), SR), "pcm_s16le")
    b = compute_fingerprint_row(wav_encode(_two_tone(102, 137), SR), "pcm_s16le")
    c = compute_fingerprint_row(wav_encode(_two_tone(100, 144), SR), "pcm_s16le")
    assert len({a, b, c}) == 3
    # different sample rate of identical bytes-per-sample content: no collision
    d = compute_fingerprint_row(wav_encode(_two_tone(100, 137), 8000), "pcm_s16le")
    assert d != a


def test_fingerprint_too_short_or_bad_is_none():
    assert compute_fingerprint_row(
        wav_encode(np.zeros(100, dtype=np.int16), SR), "pcm_s16le") is None
    assert compute_fingerprint_row(b"garbage", "flac") is None


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


def _snr_vs(ref: np.ndarray, got: np.ndarray, guard: int) -> float:
    m = slice(guard, min(len(ref), len(got)) - guard)
    err = got[m].astype(np.float64) - ref[m].astype(np.float64)
    return 10 * math.log10(
        float(np.mean(ref[m].astype(np.float64) ** 2) / np.mean(err ** 2)))


def test_resample_upsample_snr():
    f = 1600.0
    x = _tone(f, 0.6)
    y = resample_sinc(x, SR, 32000)
    assert len(y) == 2 * len(x)
    t = np.arange(len(y)) / 32000
    ref = np.clip(0.6 * np.sin(2 * np.pi * f * t) * 32767, -32768, 32767)
    assert _snr_vs(ref, y, 64) > 60.0


def test_resample_downsample_antialiased():
    f = 1600.0
    x = _tone(f, 0.6)
    y = resample_sinc(x, SR, 8000)
    t = np.arange(len(y)) / 8000
    ref = np.clip(0.6 * np.sin(2 * np.pi * f * t) * 32767, -32768, 32767)
    assert _snr_vs(ref, y, 32) > 50.0


def test_resample_identity_and_edges():
    x = _tone(440.0, 0.4)
    assert np.array_equal(resample_sinc(x, SR, SR), x)
    assert len(resample_sinc(np.zeros(0, dtype=np.int16), SR, 8000)) == 0
    with pytest.raises(ValueError):
        resample_sinc(x, 0, 8000)


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def _clips_df(spark):
    rows = []
    for i in range(24):
        pcm = _two_tone(20 + 4 * (i % 8), 137, gain=[1.0, 0.5, 0.8][i % 3])
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i % 3]
        rows.append((f"c{i:04d}", bytearray(encode_payload(pcm, SR, codec)), codec))
    return spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")


def test_extract_features_spark_matches_row_fn(spark):
    df = _clips_df(spark)
    out = extract_audio_features(df, keep_cols=["clip_id", "codec"])
    assert "bytes" not in out.columns
    got = {r.clip_id: r.asDict() for r in out.collect()}
    local = {}
    for r in df.select("clip_id", "bytes", "codec").collect():
        local[r.clip_id] = compute_features_row(bytes(r.bytes), r.codec)
    assert set(got) == set(local)
    for cid, lf in local.items():
        for k, v in lf.items():
            gv = got[cid][k]
            if isinstance(v, float):
                assert gv == pytest.approx(v, rel=1e-9), (cid, k)
            else:
                assert gv == v, (cid, k)


def test_extract_features_with_fingerprint_single_decode(spark):
    df = _clips_df(spark)
    out = extract_audio_features(df, keep_cols=["clip_id"], fingerprint=True)
    rows = out.collect()
    assert "fp64" in out.columns and "bytes" not in out.columns
    # 8 contents x 3 codecs/gains -> 8 distinct fp64 values, each x3
    from collections import Counter

    counts = Counter(r.fp64 for r in rows)
    assert None not in counts
    assert sorted(counts.values()) == [3] * 8
    # a garbage row gets null fp64, NOT the xxhash64(NULL) seed constant
    bad = spark.createDataFrame(
        [("bad", bytearray(b"junk"), "pcm_s16le")],
        "clip_id string, bytes binary, codec string")
    r = extract_audio_features(bad, keep_cols=["clip_id"],
                               fingerprint=True).collect()[0]
    assert r.fp64 is None and r.rms_dbfs is None


def test_audio_dedup_groups_spark(spark):
    # 24 clips over 8 contents x 3 encodings -> 8 groups of 3
    df = _clips_df(spark)
    g = audio_dedup_groups(df).collect()
    assert len(g) == 8
    assert all(r.n_clips == 3 for r in g)
    assert all(len(r.clip_ids) == 3 for r in g)


def test_audio_dedup_salted_identical_on_all_identical_fingerprints(spark):
    """The r5 salted pre-cap must be output-identical to the unsalted
    plan on the degenerate input it exists for: EVERY clip one
    fingerprint group (47 > 2*cap members), so the group spans all salt
    shards and the final slice must recover exactly the global first-20
    ids while n_clips still counts every member."""
    pcm = synth_pcm("same-content", SR, 80)
    payload = bytearray(encode_payload(pcm, SR, "pcm_s16le"))
    rows = [(f"clip{i:03d}", payload, "pcm_s16le") for i in range(47)]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string")
    salted = audio_dedup_groups(df, salt_buckets=8).collect()
    plain = audio_dedup_groups(df, salt_buckets=1).collect()
    assert len(salted) == len(plain) == 1
    s, p = salted[0], plain[0]
    assert (s.fp64, s.n_clips, s.clip_ids) == (p.fp64, p.n_clips, p.clip_ids)
    assert s.n_clips == 47
    assert s.clip_ids == [f"clip{i:03d}" for i in range(20)]
    # plan: the pre-cap window partitions on (fp64, salt)
    plan = (
        audio_dedup_groups(df, salt_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan


def test_fingerprint_binary_never_shuffles(spark):
    df = _clips_df(spark)
    plan = (
        audio_dedup_groups(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for section in re.findall(r"Exchange[^\n]*", plan):
        assert "bytes" not in section, section


def test_resample_audio_spark_roundtrip(spark):
    rows = []
    for i in range(9):
        pcm = _two_tone(40 + 8 * i, 200)
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i % 3]
        rows.append((f"r{i}", bytearray(encode_payload(pcm, SR, codec)),
                     SR, 400, codec))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    out = resample_audio(df, 8000).collect()
    assert len(out) == 9
    for r in out:
        assert r.sr_hz == 8000 and r.codec == "pcm_s16le"
        assert r.dur_ms == 400
        sr2, pcm2 = decode_payload(bytes(r.bytes), "pcm_s16le")
        assert sr2 == 8000 and len(pcm2) == 3200
        # dominant tone survives the rate change (tones are < 4 kHz Nyquist)
        feats = compute_features_row(bytes(r.bytes), "pcm_s16le")
        i = int(r.clip_id[1:])
        assert abs(feats["dominant_hz"] - (40 + 8 * i) * 31.25) < 3.0


def test_resample_audio_bad_rows_pass_through_null(spark):
    df = spark.createDataFrame(
        [("bad", bytearray(b"junk"), SR, 100, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    r = resample_audio(df, 8000).collect()[0]
    assert r.bytes is None and r.sr_hz is None and r.dur_ms is None


# ---------------------------------------------------------------------------
# quality expectations (clipping / silence) on the shared audio decode
# ---------------------------------------------------------------------------


def _quality_table(spark):
    rows = []
    for i in range(60):
        tone = _tone(440.0 + 10 * i, 0.5, dur_s=0.4)
        if i % 5 == 0:  # hot: into the rail
            pcm = np.clip(tone.astype(np.int32) * 3, -32768, 32767).astype(np.int16)
        elif i % 5 == 1:  # mostly silent: 300 ms dead air + 100 ms tone
            pcm = np.concatenate(
                [np.zeros(SR * 300 // 1000, dtype=np.int16), tone[: SR // 10]])
        else:
            pcm = tone
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i % 3]
        dur = int(round(len(pcm) * 1000 / SR))
        rows.append((f"q{i:04d}", bytearray(encode_payload(pcm, SR, codec)),
                     SR, dur, codec, "text"))
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")


def test_quality_expectations_counts(spark):
    from gx_spark import EngineOptions, ExpectationSuite, validate

    df = _quality_table(spark)
    suite = (
        ExpectationSuite("q")
        .add("expect_audio_clipping_ratio_to_be_below", max_ratio=0.01)
        .add("expect_audio_silence_ratio_to_be_below", max_ratio=0.5)
        .add("expect_audio_metadata_to_be_consistent")
    )
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    by_type = {r.expectation_config.expectation_type: r
               for r in b.suite_result.results}
    clip_r = by_type["expect_audio_clipping_ratio_to_be_below"]
    sil_r = by_type["expect_audio_silence_ratio_to_be_below"]
    meta_r = by_type["expect_audio_metadata_to_be_consistent"]
    b.unpersist()
    assert clip_r.result["unexpected_count"] == 12  # i % 5 == 0
    assert sil_r.result["unexpected_count"] == 12   # i % 5 == 1
    assert not clip_r.success and not sil_r.success
    assert meta_r.success, meta_r.result


def test_quality_decode_runs_once_for_five_expectation_suite(spark, audio_dir):
    """Adding the two quality expectations to the full audio suite must not
    add a second decode pass: the shared __audio column is upgraded to the
    quality schema, still one UDF instance, one evaluation per row."""
    import pandas as pd  # noqa: F401

    import gx_spark.audio as audio_mod
    import gx_spark.expectations.audio_exp as audio_exp_mod
    from gx_spark import EngineOptions, validate
    from gx_spark.suites import audio_suite

    acc = spark.sparkContext.accumulator(0)
    real_factory = audio_mod.make_audio_flags_udf

    def counting_factory(quality=None):
        from pyspark.sql.functions import pandas_udf

        from gx_spark.audio import AUDIO_FLAGS_SCHEMA, AUDIO_QUALITY_FLAGS_SCHEMA

        real_udf_fn = real_factory(quality=quality).func
        schema = (AUDIO_QUALITY_FLAGS_SCHEMA if quality is not None
                  else AUDIO_FLAGS_SCHEMA)

        @pandas_udf(schema)
        def counted(*series):
            acc.add(len(series[0]))
            return real_udf_fn(*series)

        return counted

    old = audio_exp_mod.make_audio_flags_udf
    audio_exp_mod.make_audio_flags_udf = counting_factory
    try:
        df = spark.read.parquet(f"{audio_dir}/audio_clips.parquet")
        n = df.count()
        suite = (
            audio_suite()
            .add("expect_audio_clipping_ratio_to_be_below")
            .add("expect_audio_silence_ratio_to_be_below", max_ratio=0.9)
        )
        b = validate(spark, df, suite,
                     EngineOptions(unexpected_index_column_names=("clip_id",)))
        b.violations_table().count()
        b.results_df(spark).count()
        by_type = {r.expectation_config.expectation_type: r
                   for r in b.suite_result.results}
        b.unpersist()
    finally:
        audio_exp_mod.make_audio_flags_udf = old
    assert acc.value == n, f"decode ran {acc.value} times for {n} rows"
    # the quality fields actually made it through the upgraded struct
    assert "unexpected_count" in by_type[
        "expect_audio_clipping_ratio_to_be_below"].result


def test_conflicting_quality_params_raise(spark):
    from gx_spark import EngineOptions, ExpectationSuite, validate

    df = _quality_table(spark)
    suite = (
        ExpectationSuite("q")
        .add("expect_audio_clipping_ratio_to_be_below", clip_rail=32000)
        .add("expect_audio_silence_ratio_to_be_below", clip_rail=30000,
             catch_exceptions=False)
    )
    with pytest.raises(ValueError, match="conflicting audio quality params"):
        validate(spark, df, suite, EngineOptions())


# ---------------------------------------------------------------------------
# silence bounds / trim
# ---------------------------------------------------------------------------


def _padded(lead_ms: int, trail_ms: int, tone_ms: int = 400) -> np.ndarray:
    tone = _tone(1000.0, 0.5, dur_s=tone_ms / 1000.0)
    return np.concatenate([
        np.zeros(SR * lead_ms // 1000, dtype=np.int16),
        tone,
        np.zeros(SR * trail_ms // 1000, dtype=np.int16),
    ])


def test_silence_bounds_closed_form():
    from gx_spark.audio_ops import silence_bounds_row

    b = wav_encode(_padded(100, 150), SR)
    assert silence_bounds_row(b, "pcm_s16le") == (100, 150, 400)
    # no padding
    assert silence_bounds_row(wav_encode(_padded(0, 0), SR),
                              "pcm_s16le") == (0, 0, 400)
    # all silent
    z = wav_encode(np.zeros(SR // 2, dtype=np.int16), SR)
    assert silence_bounds_row(z, "pcm_s16le") == (500, 0, 0)
    # decode failure
    assert silence_bounds_row(b"junk", "flac") == (None, None, None)
    # voiced partial trailing frame joins the active span
    odd = np.concatenate([
        np.zeros(SR // 10, dtype=np.int16),
        _tone(1000.0, 0.5, dur_s=0.41),  # 410 ms: 10 ms partial frame
    ])
    lead, trail, active = silence_bounds_row(wav_encode(odd, SR), "pcm_s16le")
    assert (lead, trail, active) == (100, 0, 410)


def test_silence_bounds_spark_and_trim_roundtrip(spark):
    from gx_spark.audio_ops import silence_bounds, trim_silence

    rows = []
    for i in range(12):
        lead, trail = (i % 4) * 50, (i % 3) * 50
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i % 3]
        pcm = _padded(lead, trail)
        rows.append((f"t{i:02d}", bytearray(encode_payload(pcm, SR, codec)),
                     SR, 400 + lead + trail, codec))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")

    got = {r.clip_id: r for r in silence_bounds(
        df, keep_cols=["clip_id"]).collect()}
    for i in range(12):
        r = got[f"t{i:02d}"]
        assert (r.lead_ms, r.trail_ms, r.active_ms) == \
            ((i % 4) * 50, (i % 3) * 50, 400), i

    out = {r.clip_id: r for r in trim_silence(df).collect()}
    for i in range(12):
        r = out[f"t{i:02d}"]
        assert r.dur_ms == 400 and r.codec == "pcm_s16le"
        sr2, pcm2 = decode_payload(bytes(r.bytes), "pcm_s16le")
        assert sr2 == SR and len(pcm2) == SR * 400 // 1000
        feats = compute_features_row(bytes(r.bytes), "pcm_s16le")
        assert feats["silence_ratio"] == 0.0


# ---------------------------------------------------------------------------
# speaking-rate expectation (transcript chars/sec vs labeled duration)
# ---------------------------------------------------------------------------


def test_speaking_rate_counts_and_observed(spark):
    from gx_spark import EngineOptions, ExpectationSuite, validate

    # 40 label-only rows (no payload decode involved): dur 2000 ms, and a
    # 30-char transcript => 15 cps nominal.  Planted classes:
    #   i%8==0 too fast (30 chars / 200 ms = 150 cps)
    #   i%8==1 too slow (3 chars / 30 s = 0.1 cps)
    #   i%8==2 zero duration   -> unexpected (rate undefined)
    #   i%8==3 null duration   -> unexpected
    #   i%8==4 null transcript -> excluded from the denominator
    rows = []
    for i in range(40):
        tr, dur = "x" * 30, 2000
        if i % 8 == 0:
            dur = 200
        elif i % 8 == 1:
            tr, dur = "abc", 30000
        elif i % 8 == 2:
            dur = 0
        elif i % 8 == 3:
            dur = None
        elif i % 8 == 4:
            tr = None
        rows.append((f"c{i:02d}", dur, tr))
    df = spark.createDataFrame(
        rows, "clip_id string, dur_ms int, transcript string")
    suite = ExpectationSuite("rate").add(
        "expect_speaking_rate_to_be_between", min_cps=1.0, max_cps=50.0)
    b = validate(spark, df, suite,
                 EngineOptions(unexpected_index_column_names=("clip_id",)))
    r = b.suite_result.results[0]
    viol = {v["clip_id"]: v for v in b.violations_table().collect()}
    b.unpersist()
    assert r.result["element_count"] == 40
    assert r.result["missing_count"] == 5         # null transcripts excluded
    assert r.result["unexpected_count"] == 20     # classes 0..3, 5 each
    assert not r.success
    # observed value = rounded cps; null-duration rows observe null
    assert viol["c08"]["observed_value"] == '{"v":150.0}'
    assert viol["c09"]["observed_value"] == '{"v":0.1}'
    assert viol["c11"]["observed_value"] in (None, "{}")
    assert "c12" not in viol and "c04" not in viol  # null tr not violated


def test_speaking_rate_is_pure_jvm(spark, tmp_path):
    """No Python evaluation anywhere in the stage-1 pass: the check is
    length/division arithmetic riding the agg scan, unlike the decode
    family — and the parquet ReadSchema prunes the bytes column away."""
    from gx_spark import EngineOptions, ExpectationSuite, validate
    from gx_spark.plancheck import (
        compile_suite, formatted_plan, read_schemas, stage1_df)

    src = spark.createDataFrame(
        [("a", bytearray(b"\x00\x01"), 1000, "twelve chars")],
        "clip_id string, bytes binary, dur_ms int, transcript string")
    path = str(tmp_path / "rate_clips")
    src.write.parquet(path)
    df = spark.read.parquet(path)
    suite = ExpectationSuite("rate").add("expect_speaking_rate_to_be_between")
    ctx = compile_suite(spark, df, suite)
    plan = formatted_plan(stage1_df(ctx))
    assert "EvalPython" not in plan and "InPandas" not in plan
    schemas = read_schemas(plan)
    assert schemas and all("bytes" not in s for s in schemas), schemas
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    ok = b.suite_result.results[0].success
    b.unpersist()
    assert ok


# ---------------------------------------------------------------------------
# additive-noise augmentation at fixed SNR
# ---------------------------------------------------------------------------


def test_augment_noise_hits_target_snr_rowfn():
    rng = np.random.default_rng(123)
    tone = _tone(440.0, 0.3, dur_s=0.4)
    mixed, floor = augment_noise_pcm(tone, 20.0, rng)
    assert len(mixed) == len(tone)
    clean = tone.astype(np.float64) / 32768.0
    noise = mixed.astype(np.float64) / 32768.0 - clean
    snr = 10 * np.log10(np.mean(clean**2) / np.mean(noise**2))
    # int16 re-quantization perturbs the measured ratio only slightly
    assert abs(snr - 20.0) < 0.2, snr
    # the reported floor is the exact pre-quantization arithmetic
    exp_floor = 10 * np.log10(np.mean(clean**2)) - 20.0
    assert floor == pytest.approx(exp_floor, abs=1e-9)


def test_augment_noise_silent_passthrough_and_spark_determinism(spark):
    from gx_spark.audio_ops import augment_noise

    rows = []
    for i in range(24):
        if i % 6 == 5:
            pcm = np.zeros(SR // 5, dtype=np.int16)  # silent
        else:
            pcm = _tone(300.0 + 20 * i, 0.4, dur_s=0.2)
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i % 3]
        b = bytearray(encode_payload(pcm, SR, codec))
        if i % 6 == 4:
            b = b[:7]  # undecodable
        rows.append((f"n{i:02d}", b, codec))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string")

    def run(d):
        return {r.clip_id: r for r in augment_noise(
            d, 15.0, seed=7).collect()}

    one = run(df.coalesce(1))
    many = run(df.repartition(8, "clip_id"))
    assert set(one) == set(many)
    for cid in one:
        a, b = one[cid], many[cid]
        # bit-identical at any parallelism / partitioning
        assert (a.bytes is None) == (b.bytes is None)
        if a.bytes is not None:
            assert bytes(a.bytes) == bytes(b.bytes), cid
        assert a.noise_rms_dbfs == b.noise_rms_dbfs, cid
    i_silent, i_bad = "n05", "n04"
    assert one[i_silent].noise_rms_dbfs is None
    assert bytes(one[i_silent].bytes) == bytes(rows[5][1])  # untouched
    assert one[i_bad].bytes is None and one[i_bad].noise_rms_dbfs is None
    # distinct clips draw distinct noise (seeded per row id)
    floors = {cid: r.noise_rms_dbfs for cid, r in one.items()
              if r.noise_rms_dbfs is not None}
    mixed0 = decode_payload(bytes(one["n00"].bytes), "pcm_s16le")[1]
    mixed6 = decode_payload(bytes(one["n06"].bytes), "pcm_s16le")[1]
    clean0 = _tone(300.0, 0.4, dur_s=0.2).astype(np.int32)
    clean6 = _tone(420.0, 0.4, dur_s=0.2).astype(np.int32)
    n0 = mixed0.astype(np.int32) - clean0
    n6 = mixed6.astype(np.int32) - clean6
    assert not np.array_equal(n0, n6)
    assert len(floors) == 24 - 4 - 4  # minus silent and undecodable rows


# ---------------------------------------------------------------------------
# speed perturbation and fixed-window pad/trim
# ---------------------------------------------------------------------------


def test_speed_perturb_length_and_pitch(spark):
    from gx_spark.audio_ops import speed_perturb

    f = 400.0  # on-grid for the zero-padded FFT at the perturbed lengths
    rows = []
    for i, codec in enumerate(["pcm_s16le", "flac", "pcm_mulaw"]):
        pcm = _tone(f, 0.4, dur_s=0.3)
        rows.append((f"s{i}", bytearray(encode_payload(pcm, SR, codec)),
                     SR, 300, codec))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    n_in = SR * 300 // 1000
    for factor in (0.9, 1.1):
        out = {r.clip_id: r for r in speed_perturb(df, factor).collect()}
        for cid, r in out.items():
            sr2, pcm2 = decode_payload(bytes(r.bytes), r.codec)
            assert sr2 == SR and r.codec == "pcm_s16le"
            assert len(pcm2) == int(round(n_in / factor)), (cid, factor)
            assert r.dur_ms == int(round(len(pcm2) * 1000.0 / SR))
            # pitch scales WITH the factor (resample-and-relabel semantics)
            feats = compute_features_row(wav_encode(pcm2, SR), "pcm_s16le")
            assert abs(feats["dominant_hz"] - f * factor) < 6.0, (
                cid, factor, feats["dominant_hz"])
    # identity factor is a pcm re-encode with unchanged content
    one = {r.clip_id: r for r in speed_perturb(df, 1.0).collect()}
    _, ref = decode_payload(bytes(rows[0][1]), "pcm_s16le")
    _, got = decode_payload(bytes(one["s0"].bytes), one["s0"].codec)
    assert np.array_equal(ref, got)


def test_pad_or_trim_exact_window(spark):
    from gx_spark.audio_ops import pad_or_trim

    rows = [
        ("long", bytearray(encode_payload(_tone(500.0, 0.4, dur_s=0.5),
                                          SR, "flac")), SR, 500, "flac"),
        ("short", bytearray(encode_payload(_tone(500.0, 0.4, dur_s=0.1),
                                           SR, "pcm_mulaw")), SR, 100,
         "pcm_mulaw"),
        ("bad", bytearray(b"nope"), SR, 100, "flac"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    out = {r.clip_id: r for r in pad_or_trim(df, 300).collect()}
    n_t = SR * 300 // 1000
    for cid in ("long", "short"):
        sr2, pcm2 = decode_payload(bytes(out[cid].bytes), out[cid].codec)
        assert sr2 == SR and len(pcm2) == n_t and out[cid].dur_ms == 300
    # truncation keeps the head; padding appends digital silence
    _, src_long = decode_payload(bytes(rows[0][1]), "flac")
    _, got_long = decode_payload(bytes(out["long"].bytes), "pcm_s16le")
    assert np.array_equal(src_long[:n_t], got_long)
    _, src_short = decode_payload(bytes(rows[1][1]), "pcm_mulaw")
    _, got_short = decode_payload(bytes(out["short"].bytes), "pcm_s16le")
    assert np.array_equal(src_short, got_short[: len(src_short)])
    assert not got_short[len(src_short):].any()
    assert out["bad"].bytes is None and out["bad"].dur_ms is None
    with pytest.raises(ValueError):
        pad_or_trim(df, 0)


# ---------------------------------------------------------------------------
# fused augmentation pipeline
# ---------------------------------------------------------------------------


def _aug_rows():
    rows = []
    for i, f in enumerate((300.0, 900.0, 2500.0)):
        pcm = _tone(f, 0.4)
        codec = ["pcm_s16le", "flac", "pcm_mulaw"][i]
        rows.append((f"a{i}", bytearray(encode_payload(pcm, SR, codec)),
                     SR, 400, codec))
    silent = np.zeros(SR // 5, dtype=np.int16)
    rows.append(("a_silent", bytearray(encode_payload(silent, SR, "flac")),
                 SR, 200, "flac"))
    rows.append(("a_bad", bytearray(b"junk"), SR, 100, "pcm_s16le"))
    return rows


def test_augment_pipeline_bit_identical_to_chain(spark):
    """The fused one-decode pass reproduces the chained three-op output
    byte for byte (the intermediate pcm16 WAV round-trips losslessly, so
    fusing cannot change a single sample)."""
    from gx_spark.audio_ops import (
        augment_noise, augment_pipeline, pad_or_trim, speed_perturb)

    df = spark.createDataFrame(
        _aug_rows(),
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    chained = pad_or_trim(
        speed_perturb(augment_noise(df, snr_db=20.0), 1.1), target_ms=1000)
    fused = augment_pipeline(df, snr_db=20.0, speed=1.1, target_ms=1000)
    a = {r["clip_id"]: r.asDict() for r in chained.collect()}
    b = {r["clip_id"]: r.asDict() for r in fused.collect()}
    assert set(a) == set(b)
    assert chained.columns == fused.columns
    for cid in a:
        for k in a[cid]:
            assert a[cid][k] == b[cid][k], (cid, k)


def test_augment_pipeline_single_stages_match_single_ops(spark):
    from gx_spark.audio_ops import (
        augment_noise, augment_pipeline, pad_or_trim, speed_perturb)

    df = spark.createDataFrame(
        _aug_rows(),
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    pairs = [
        (augment_noise(df, snr_db=15.0),
         augment_pipeline(df, snr_db=15.0)),
        (speed_perturb(df, 0.9), augment_pipeline(df, speed=0.9)),
        (pad_or_trim(df, target_ms=700),
         augment_pipeline(df, target_ms=700)),
    ]
    for one, fused in pairs:
        a = sorted((r["clip_id"], bytes(r["bytes"]) if r["bytes"] else None,
                    r["codec"], r["dur_ms"]) for r in one.collect())
        b = sorted((r["clip_id"], bytes(r["bytes"]) if r["bytes"] else None,
                    r["codec"], r["dur_ms"]) for r in fused.collect())
        assert a == b


def test_augment_pipeline_validates_params(spark):
    from gx_spark.audio_ops import augment_pipeline

    df = spark.createDataFrame(
        [("a", None, 8000, 1, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    with pytest.raises(ValueError):
        augment_pipeline(df)
    with pytest.raises(ValueError):
        augment_pipeline(df, speed=0.0)
    with pytest.raises(ValueError):
        augment_pipeline(df, target_ms=-1)


# ---------------------------------------------------------------------------
# spectral shape features
# ---------------------------------------------------------------------------


def test_spectral_row_pure_tone_closed_forms():
    from gx_spark.audio_ops import compute_spectral_row

    f = 1100.0
    x = _tone(f, 0.3)
    r = compute_spectral_row(wav_encode(x, SR), "pcm_s16le")
    assert r["n_samples"] == len(x)
    # Hann mainlobe is symmetric: centroid sits on the tone to <0.5 Hz
    assert abs(r["spectral_centroid_hz"] - f) < 0.5
    # bandwidth of a windowed tone = mainlobe width, a couple of bins
    assert r["spectral_bandwidth_hz"] < 10.0
    # 85% of the power is inside the mainlobe
    assert abs(r["spectral_rolloff_hz"] - f) < 3 * SR / 16384
    # tonal: Wiener entropy ~ 0; int16 quantization keeps it < 1e-9
    assert r["spectral_flatness"] < 1e-9


def test_spectral_row_noise_vs_tone_flatness():
    from gx_spark.audio_ops import compute_spectral_row

    rng = np.random.default_rng(7)
    noise = np.clip(rng.normal(0, 0.2, SR // 2) * 32767,
                    -32768, 32767).astype(np.int16)
    rn = compute_spectral_row(wav_encode(noise, SR), "pcm_s16le")
    rt = compute_spectral_row(wav_encode(_tone(500.0, 0.3), SR),
                              "pcm_s16le")
    # white noise: flatness orders of magnitude above a tone, centroid
    # near the flat-spectrum mean sr/4
    assert rn["spectral_flatness"] > 0.1 > 1e6 * rt["spectral_flatness"]
    assert abs(rn["spectral_centroid_hz"] - SR / 4) < 0.1 * SR / 4


def test_spectral_row_edge_cases():
    from gx_spark.audio_ops import compute_spectral_row

    assert compute_spectral_row(None, "pcm_s16le")["n_samples"] is None
    r = compute_spectral_row(b"junk", "pcm_s16le")
    assert r["spectral_centroid_hz"] is None
    silent = np.zeros(SR // 4, dtype=np.int16)
    r = compute_spectral_row(wav_encode(silent, SR), "pcm_s16le")
    assert r["n_samples"] == SR // 4
    assert r["spectral_flatness"] is None  # no shape for digital silence


def test_spectral_features_spark_plumbing(spark):
    from gx_spark.audio_ops import compute_spectral_row, spectral_features

    rows = [
        ("s0", bytearray(encode_payload(_tone(700.0, 0.3), SR, "flac")),
         "flac"),
        ("s1", bytearray(encode_payload(_tone(1500.0, 0.3), SR,
                                        "pcm_mulaw")), "pcm_mulaw"),
        ("s_bad", bytearray(b"nope"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    out = {r["clip_id"]: r.asDict()
           for r in spectral_features(df).collect()}
    assert set(out) == {"s0", "s1", "s_bad"}
    assert out["s_bad"]["spectral_centroid_hz"] is None
    for cid, f in (("s0", 700.0), ("s1", 1500.0)):
        # must equal the row function bit-for-bit (same decode, same fft)
        ref = compute_spectral_row(
            bytes(rows[0 if cid == "s0" else 1][1]),
            "flac" if cid == "s0" else "pcm_mulaw")
        assert out[cid]["spectral_centroid_hz"] == ref["spectral_centroid_hz"]
        assert abs(out[cid]["spectral_centroid_hz"] - f) < 5.0
    assert "bytes" not in spectral_features(df).columns


# ---------------------------------------------------------------------------
# pitch features
# ---------------------------------------------------------------------------


def test_pitch_row_pure_tones_within_1pct():
    from gx_spark.audio_ops import compute_pitch_row

    for f in (80.0, 125.0, 220.0, 333.0, 480.0):
        r = compute_pitch_row(wav_encode(_tone(f, 0.3), SR), "pcm_s16le")
        assert r["n_frames"] == 1 + (len(_tone(f, 0.3)) - SR * 40 // 1000) \
            // (SR * 20 // 1000)
        assert r["voiced_frac"] == 1.0, f
        assert abs(r["f0_median_hz"] - f) / f < 0.015, (f, r["f0_median_hz"])
        assert r["periodicity_mean"] > 0.6


def test_pitch_row_noise_is_unvoiced():
    from gx_spark.audio_ops import compute_pitch_row

    rng = np.random.default_rng(11)
    noise = np.clip(rng.normal(0, 0.2, SR // 2) * 32767,
                    -32768, 32767).astype(np.int16)
    r = compute_pitch_row(wav_encode(noise, SR), "pcm_s16le")
    # white noise: ACF peak in the pitch lag range is small
    assert r["voiced_frac"] < 0.2
    assert r["periodicity_mean"] < 0.3
    silent = np.zeros(SR // 2, dtype=np.int16)
    r = compute_pitch_row(wav_encode(silent, SR), "pcm_s16le")
    assert r["voiced_frac"] == 0.0 and r["f0_median_hz"] is None
    assert compute_pitch_row(None, "flac")["n_frames"] is None


def test_pitch_row_subframe_clip():
    from gx_spark.audio_ops import compute_pitch_row

    tiny = _tone(200.0, 0.3, dur_s=0.02)  # 20 ms < one 40 ms frame
    r = compute_pitch_row(wav_encode(tiny, SR), "pcm_s16le")
    assert r["n_frames"] == 0 and r["f0_median_hz"] is None


def test_pitch_features_spark_plumbing(spark):
    from gx_spark.audio_ops import pitch_features

    rows = [
        ("p0", bytearray(encode_payload(_tone(150.0, 0.3), SR, "flac")),
         "flac"),
        ("p1", bytearray(encode_payload(_tone(400.0, 0.3), SR,
                                        "pcm_alaw")), "pcm_alaw"),
        ("p_bad", bytearray(b"x"), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    out = {r["clip_id"]: r.asDict() for r in pitch_features(df).collect()}
    assert out["p_bad"]["f0_median_hz"] is None
    assert abs(out["p0"]["f0_median_hz"] - 150.0) < 2.0
    assert abs(out["p1"]["f0_median_hz"] - 400.0) < 5.0
    assert out["p0"]["voiced_frac"] == 1.0
    assert "bytes" not in pitch_features(df).columns
