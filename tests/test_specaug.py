"""SpecAugment (gx_spark/audio_ops.py specaugment): deterministic mask
geometry, exact bookkeeping vs a recount of the emitted matrix, and the
unmasked-cells-untouched invariant."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gx_spark.audio import encode_payload  # noqa: E402
from gx_spark.audio_ops import specaugment  # noqa: E402

SR = 16000
SCHEMA = "clip_id long, bytes binary, codec string"


def _df(spark, n=6, parts=1):
    rows = []
    for i in range(n):
        t = np.arange(SR) / SR
        pcm = np.rint(
            0.3 * 32767 * np.sin(2 * np.pi * (200 + 30 * i) * t)
        ).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, SR, "pcm_s16le")),
                     "pcm_s16le"))
    return spark.createDataFrame(rows, SCHEMA).repartition(parts)


def test_mask_bookkeeping_matches_matrix_recount(spark):
    out = specaugment(_df(spark), keep_cols=["clip_id"]).collect()
    assert len(out) == 6
    for r in out:
        m = np.array(r["logmel"])
        assert m.shape == (r["n_frames"], r["n_mels"]) == (98, 26)
        rows_masked = int(np.sum(np.all(m == -80.0, axis=1)))
        cols_masked = int(np.sum(np.all(m == -80.0, axis=0)))
        # a fully-floor row/col can only be a mask (natural cells clamp
        # at -100, tones never hit exactly -80 everywhere)
        assert rows_masked == r["masked_frames"]
        assert cols_masked == r["masked_bands"]
        mf, mb, nf, nm = (r["masked_frames"], r["masked_bands"],
                          r["n_frames"], r["n_mels"])
        assert abs(r["masked_cell_frac"]
                   - (mf * nm + mb * nf - mf * mb) / (nf * nm)) < 1e-12
        covered = int(np.sum(m == -80.0))
        assert covered >= mf * nm + mb * nf - mf * mb  # ties can add


def test_deterministic_at_any_parallelism(spark):
    a = {r["clip_id"]: r["logmel"] for r in specaugment(
        _df(spark, parts=1), keep_cols=["clip_id"]).collect()}
    b = {r["clip_id"]: r["logmel"] for r in specaugment(
        _df(spark, parts=4), keep_cols=["clip_id"]).collect()}
    assert a == b


def test_unmasked_cells_untouched(spark):
    base = {r["clip_id"]: np.array(r["logmel"]) for r in specaugment(
        _df(spark), keep_cols=["clip_id"], time_masks=0,
        freq_masks=0).collect()}
    aug = specaugment(_df(spark), keep_cols=["clip_id"]).collect()
    for r in aug:
        m = np.array(r["logmel"])
        rows = np.all(m == -80.0, axis=1)
        cols = np.all(m == -80.0, axis=0)
        keep = np.ix_(~rows, ~cols)
        assert np.array_equal(m[keep], base[r["clip_id"]][keep])
    # zero-mask run reports zero coverage
    z = specaugment(_df(spark, 1), keep_cols=["clip_id"], time_masks=0,
                    freq_masks=0).collect()[0]
    assert z["masked_frames"] == 0 and z["masked_cell_frac"] == 0.0


def test_undecodable_and_short_rows_null(spark):
    rows = [(0, bytearray(b"junk"), "pcm_s16le"),
            (1, bytearray(encode_payload(
                np.zeros(10, np.int16), SR, "pcm_s16le")), "pcm_s16le")]
    out = specaugment(spark.createDataFrame(rows, SCHEMA),
                      keep_cols=["clip_id"]).collect()
    for r in out:
        assert r["logmel"] is None and r["n_frames"] is None
        assert r["n_mels"] == 26


def test_hof_recount_jvm_side(spark):
    # the driver-oracle mechanism: recount masked frames/bands with
    # Spark higher-order functions over the emitted matrix — no UDF
    out = specaugment(_df(spark), keep_cols=["clip_id"])
    chk = out.select(
        "clip_id",
        (F.expr("size(filter(logmel, r -> forall(r, c -> c = -80.0D)))")
         == F.col("masked_frames")).alias("frames_ok"),
        (F.expr("size(filter(sequence(0, n_mels - 1), j -> "
                "forall(logmel, r -> r[j] = -80.0D)))")
         == F.col("masked_bands")).alias("bands_ok"),
    ).collect()
    assert all(r["frames_ok"] and r["bands_ok"] for r in chk)
