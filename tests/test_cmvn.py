"""Corpus CMVN (gx_spark/audio_ops.py cmvn_partials/cmvn_stats/
apply_cmvn): partials merge to the exact serial statistics, applying
them zeroes the corpus mean and unit-izes the variance per band, and
the plan keeps payloads out of the aggregate."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import encode_payload  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    apply_cmvn,
    cmvn_partials,
    cmvn_stats,
    mel_filterbank,
    specaugment,
)

SR = 16000
SCHEMA = "clip_id long, bytes binary, codec string"


def _pcm(i: int, dur_ms: int = 500):
    t = np.arange(SR * dur_ms // 1000) / SR
    return np.rint(
        (0.1 + 0.05 * (i % 4)) * 32767
        * np.sin(2 * np.pi * (150 + 60 * i) * t)).astype(np.int16)


def _df(spark, n=8, parts=3):
    rows = [(i, bytearray(encode_payload(_pcm(i), SR, "pcm_s16le")),
             "pcm_s16le") for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA).repartition(parts)


def _serial_mel(i: int):
    x = _pcm(i).astype(np.float64) / 32768.0
    win, hop = 400, 160
    nf = 1 + (len(x) - win) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(win)[None, :]
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)
    pwr = np.abs(np.fft.rfft(x[idx] * hann, 512, axis=1)) ** 2
    fb = mel_filterbank(SR, 512, 26)
    return 10.0 * np.log10(np.maximum(pwr @ fb.T, 1e-10))


def test_stats_match_serial_numpy(spark):
    n, means, stds = cmvn_stats(_df(spark))
    mats = np.vstack([_serial_mel(i) for i in range(8)])
    assert n == mats.shape[0]
    assert np.allclose(means, mats.mean(axis=0), atol=1e-9)
    assert np.allclose(stds, mats.std(axis=0), atol=1e-9)


def test_apply_zeroes_mean_units_variance(spark):
    df = _df(spark)
    n, means, stds = cmvn_stats(df)
    feats = specaugment(df, keep_cols=["clip_id"], time_masks=0,
                        freq_masks=0)
    normed = apply_cmvn(feats, means, stds)
    mats = np.vstack([np.array(r["logmel"])
                      for r in normed.collect()])
    assert mats.shape[0] == n
    assert np.allclose(mats.mean(axis=0), 0.0, atol=1e-8)
    assert np.allclose(mats.std(axis=0), 1.0, atol=1e-6)


def test_partials_skip_bad_rows(spark):
    rows = [(0, bytearray(b"junk"), "pcm_s16le"),
            (1, bytearray(encode_payload(_pcm(1), SR, "pcm_s16le")),
             "pcm_s16le")]
    out = {r["clip_id"]: r for r in cmvn_partials(
        spark.createDataFrame(rows, SCHEMA),
        keep_cols=["clip_id"]).collect()}
    assert out[0]["n_frames"] == 0 and sum(out[0]["band_sum"]) == 0.0
    assert out[1]["n_frames"] == 48  # 1 + (8000-400)//160


def test_apply_cmvn_no_shuffle_no_udf(spark):
    from gx_spark.plancheck import formatted_plan

    rows = [(i, bytearray(encode_payload(_pcm(i), SR, "pcm_s16le")),
             "pcm_s16le") for i in range(4)]
    src = spark.createDataFrame(rows, SCHEMA)  # no repartition: the
    # asserted plan must contain only what the ops themselves add
    feats = specaugment(src, keep_cols=["clip_id"],
                        time_masks=0, freq_masks=0)
    _, means, stds = cmvn_stats(src)
    plan = formatted_plan(apply_cmvn(feats, means, stds))
    # the normalization itself adds neither an exchange nor a second
    # python stage beyond the feature extraction's own
    assert plan.count("Exchange") == 0
    assert plan.count("MapInPandas") <= 2  # tree+detail of the ONE UDF
