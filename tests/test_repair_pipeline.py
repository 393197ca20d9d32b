"""Fused repair pipeline (gx_spark/audio_ops.py repair_pipeline):
bit-identical to chaining remove_dc_offset -> declip_audio ->
declick_audio -> remove_hum, per-stage stats preserved, clean clips
keep original bytes."""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import encode_payload  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    declick_audio,
    declip_audio,
    remove_dc_offset,
    remove_hum,
    repair_pipeline,
)

SR = 16000
SCHEMA = "clip_id long, bytes binary, codec string"


def _rows():
    t = np.arange(SR) / SR
    tone = 0.3 * np.sin(2 * np.pi * 440.0 * t)
    hum = 0.15 * np.sin(2 * np.pi * 50.0 * t)

    def enc(x):
        pcm = np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)
        return pcm

    clean = enc(tone)
    dc = enc(tone + 0.1)
    clipped = enc(4.0 * tone)  # amplitude 1.2 FS -> rail-clipped runs
    clicked = enc(tone)
    for p in (900, 5000, 12000):
        clicked[p] = 32000 if clicked[p] < 0 else -32000
    hummy = enc(tone + hum)
    combo = enc(tone + 0.08 + hum)
    for p in (2000, 9000):
        combo[p] = 32000 if combo[p] < 0 else -32000
    out = []
    for i, pcm in enumerate([clean, dc, clipped, clicked, hummy, combo]):
        out.append((i, bytearray(encode_payload(pcm, SR, "pcm_s16le")),
                    "pcm_s16le"))
    out.append((6, bytearray(b"junk"), "pcm_s16le"))
    return out


def test_fused_equals_chained_bit_identical(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    fused = {r["clip_id"]: r.asDict() for r in
             repair_pipeline(df).collect()}
    chained_df = remove_hum(declick_audio(declip_audio(
        remove_dc_offset(df))))
    chained = {r["clip_id"]: r.asDict() for r in chained_df.collect()}
    assert set(fused) == set(chained) == set(range(7))
    for i in fused:
        f, c = fused[i], chained[i]
        fb = bytes(f["bytes"]) if f["bytes"] is not None else None
        cb = bytes(c["bytes"]) if c["bytes"] is not None else None
        assert fb == cb, i
        for k in ("codec", "dc_removed", "n_clipped", "n_clicks",
                  "hum_removed_ratio"):
            assert f[k] == c[k], (i, k, f[k], c[k])


def test_stage_stats_and_clean_passthrough(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = {r["clip_id"]: r for r in repair_pipeline(df).collect()}
    rows = _rows()
    # clean clip: untouched bytes, zeroed stats
    assert bytes(out[0]["bytes"]) == bytes(rows[0][1])
    assert (out[0]["dc_removed"], out[0]["n_clipped"],
            out[0]["n_clicks"]) == (0, 0, 0)
    # each defect caught by its stage
    assert out[1]["dc_removed"] != 0
    assert out[2]["n_clipped"] > 0
    assert out[3]["n_clicks"] == 3
    assert out[4]["hum_removed_ratio"] > 0.01
    # the combined clip triggers dc + hum, and its two impulses are
    # repaired between the declip and declick stages (DC subtraction
    # saturates the negative click into the rail, so declip catches it;
    # the positive one stays an isolated impulse for declick)
    assert out[5]["dc_removed"] != 0
    assert out[5]["n_clipped"] + out[5]["n_clicks"] == 2
    assert out[5]["hum_removed_ratio"] > 0.01
    # undecodable rails
    assert out[6]["bytes"] is None and out[6]["n_clicks"] is None


def test_map_only_plan(spark):
    from gx_spark.plancheck import formatted_plan

    df = spark.createDataFrame(_rows()[:2], SCHEMA)
    plan = formatted_plan(repair_pipeline(df, denoise=True))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") <= 2  # ONE fused python stage
