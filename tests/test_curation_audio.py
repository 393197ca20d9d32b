"""validate_and_extract_audio: north-rule validation flags + curation
features + dedup key from ONE decode.

Pins:
- the flag columns reproduce the audio suite's per-row verdicts exactly
  (same violation clip sets for metadata / SNR / transcript classes);
- the feature/fingerprint columns equal extract_audio_features' output
  from its own decode;
- decode runs once per clip (accumulator-counted).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio_ops import extract_audio_features, validate_and_extract_audio  # noqa: E402
from gx_spark.executor import validate  # noqa: E402
from gx_spark.model import EngineOptions  # noqa: E402
from gx_spark.suites import audio_suite  # noqa: E402


@pytest.fixture(scope="module")
def curated(audio_df):
    df = validate_and_extract_audio(audio_df).persist()
    df.count()
    yield df
    df.unpersist()


def test_flags_reproduce_suite_verdicts(spark, audio_df, curated):
    """Plain column predicates over the one-decode flag columns must
    select exactly the clips the decode-in-suite audio_suite() flags."""
    bundle = validate(
        spark, audio_df, audio_suite(),
        EngineOptions(unexpected_index_column_names=("clip_id",)),
    )
    viol = bundle.violations_table().toPandas()
    suite_sets = {
        t: set(g["clip_id"]) for t, g in viol.groupby("expectation_type")
    }
    bundle.unpersist()

    flat = curated.select(
        "clip_id", "decodable", "header_sr_ok", "dur_ok", "snr_db",
        "transcript_ok").toPandas()
    ok = (flat["decodable"].eq(True) & flat["header_sr_ok"].eq(True)
          & flat["dur_ok"].eq(True))
    meta_bad = set(flat[~ok]["clip_id"])
    snr_bad = set(flat[flat["snr_db"].notna() & (flat["snr_db"] < 30.0)]
                  ["clip_id"])
    tx_bad = set(flat[flat["transcript_ok"].eq(False)]["clip_id"])
    assert meta_bad == suite_sets.get(
        "expect_audio_metadata_to_be_consistent", set())
    assert snr_bad == suite_sets.get("expect_audio_snr_to_be_at_least", set())
    assert tx_bad == suite_sets.get(
        "expect_transcript_to_match_reference", set())


def test_features_match_standalone_extract(audio_df, curated):
    feats = extract_audio_features(
        audio_df, keep_cols=["clip_id"], fingerprint=True)
    a = (feats.select("clip_id", "rms_dbfs", "clipping_ratio",
                      "silence_ratio", "fp64")
         .toPandas().set_index("clip_id").sort_index())
    b = (curated.select("clip_id", "rms_dbfs", "clipping_ratio",
                        "silence_ratio", "fp64")
         .toPandas().set_index("clip_id").sort_index())
    assert a.equals(b)


def test_row_level_single_decode(monkeypatch):
    """compute_curation_row must decode the payload exactly ONCE while
    filling both the validation flags and the feature/fingerprint fields
    (the whole point of the combined pass).  Row-level check so the patch
    is visible (a worker-process UDF re-imports the real module)."""
    import gx_spark.audio as ga
    from gx_spark.audio import encode_payload, ref_transcript, synth_pcm
    from gx_spark.audio_ops import compute_curation_row

    cid, sr, dur = "clip_0000000001", 16000, 400
    payload = encode_payload(synth_pcm(cid, sr, dur), sr, "pcm_s16le")
    calls = []
    orig = ga.decode_payload

    def counting(b, codec):
        calls.append(codec)
        return orig(b, codec)

    monkeypatch.setattr(ga, "decode_payload", counting)
    r = compute_curation_row(cid, payload, sr, dur, "pcm_s16le",
                             ref_transcript(cid))
    assert calls == ["pcm_s16le"], calls
    assert r["decodable"] and r["header_sr_ok"] and r["dur_ok"]
    assert r["transcript_ok"] and r["snr_db"] > 30.0
    assert r["rms_dbfs"] is not None and r["fp_sig"]
    # undecodable codec: zero decode calls, flags false, features null
    calls.clear()
    r2 = compute_curation_row(cid, payload, sr, dur, "mp3", None)
    assert calls == [] and r2["decodable"] is False
    assert r2["rms_dbfs"] is None and r2["fp_sig"] is None
