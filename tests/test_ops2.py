"""Round-2 pipeline-op fixes: map-side SimHash, value-distinct dedup keys,
multi-probe ANN recall, audio codec-flag hardening."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_simhash_map_side_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fp = ops.simhash64(docs, "doc_id", "text")
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: pure projection over scan
    rows = fp.collect()
    assert len(rows) == docs.count()
    assert all(r["simhash"] is not None and r["simhash"] >= 0 for r in rows)


def test_simhash_matches_explode_formulation(spark):
    df = spark.createDataFrame(
        [("d1", "the quick brown fox"), ("d2", "the quick brown fox"),
         ("d3", "completely different words here entirely")],
        "doc_id string, text string",
    )
    got = {r["id"]: r["simhash"] for r in ops.simhash64(df, "doc_id", "text").collect()}
    # identical docs -> identical fingerprints; different doc -> different
    assert got["d1"] == got["d2"]
    assert got["d1"] != got["d3"]
    # reference (explode->groupBy) formulation gives the same bits
    toks = df.select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    sums = toks.groupBy("id").agg(
        *[F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)).alias(f"b{b}") for b in range(64)]
    )
    ref = {
        r["id"]: r["simhash"]
        for r in sums.select(
            "id",
            sum((F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
                 * F.lit(1 << b)) for b in range(63)).alias("simhash"),
        ).collect()
    }
    assert got == ref


def test_exact_dedup_value_distinct_with_nulls(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), ("b", "x"), (None, None), (None, None)],
        "t string, u string",
    )
    r = ops.exact_dedup_stats(df, ["t", "u"]).collect()[0]
    # ('a','x') x2 and (null,null) x2 are dup groups; ('a',null) distinct
    assert r["n_rows"] == 6
    assert r["n_distinct"] == 4
    assert r["n_dup_rows"] == 4
    assert r["n_removable"] == 2


def test_ann_multiprobe_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0)
         .select("embedding").first()[0]]
    exact = [r["id"] for r in ops.cosine_topk(emb, "vec_id", "embedding", q, 10).collect()]
    approx = [r["id"] for r in ops.ann_topk_lsh(emb, "vec_id", "embedding", q, 10).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, (recall, exact, approx)


def test_audio_flags_codec_hardening():
    from gx_spark.audio import compute_flags_row, synth_pcm, wav_encode

    pcm = synth_pcm("clip_0000000001", 16000, 300)
    wav = wav_encode(pcm, 16000)
    stub = b"STUBclip_0000000001" + bytes(64)

    # unknown codec label: cannot certify -> decodable False
    f = compute_flags_row("clip_0000000001", wav, 16000, 300, "mp3", None)
    assert f["decodable"] is False

    # opus is container-validated now: a valid Ogg-Opus stream passes with
    # its OpusHead rate and granule duration checked (snr stays null —
    # packet decode is out of scope in-sandbox)
    from gx_spark.oggopus import ogg_opus_encode

    ogg = ogg_opus_encode("clip_0000000001", 16000, 300)
    f = compute_flags_row("clip_0000000001", ogg, 16000, 300, "opus", None)
    assert f["decodable"] is True and f["header_sr_ok"] is True
    assert f["dur_ok"] is True and f["snr_db"] is None

    # OpusHead rate lie / granule-duration lie / corrupt page CRC: flagged
    f = compute_flags_row("clip_0000000001", ogg, 8000, 300, "opus", None)
    assert f["header_sr_ok"] is False
    f = compute_flags_row("clip_0000000001", ogg, 16000, 900, "opus", None)
    assert f["dur_ok"] is False
    bad = bytearray(ogg); bad[-5] ^= 0xFF
    f = compute_flags_row("clip_0000000001", bytes(bad), 16000, 300, "opus", None)
    assert f["decodable"] is False

    # opaque non-Ogg bytes labeled opus: flagged (previously a waved-through stub)
    f = compute_flags_row("clip_0000000001", stub, 16000, 300, "opus", None)
    assert f["decodable"] is False

    # RIFF payload mislabeled as opus: flagged
    f = compute_flags_row("clip_0000000001", wav, 16000, 300, "opus", None)
    assert f["decodable"] is False

    # flac now decodes for real: stub bytes under the flac label are flagged
    f = compute_flags_row("clip_0000000001", stub, 16000, 300, "flac", None)
    assert f["decodable"] is False
    f = compute_flags_row("clip_0000000001", wav, 16000, 300, "flac", None)
    assert f["decodable"] is False  # WAV container mislabeled as flac

    # pcm path unchanged
    f = compute_flags_row("clip_0000000001", wav, 16000, 300, "pcm_s16le", None)
    assert f["decodable"] is True and f["header_sr_ok"] is True and f["dur_ok"] is True


def test_curation_pipeline_stages_all_bite(spark):
    from gx_spark import ops

    rows = [
        # 3 copies of one good English doc -> dedup keeps 1
        (0, "the cat and the dog walk to the house of cards."),
        (1, "the cat and the dog walk to the house of cards."),
        (2, "the cat and the dog walk to the house of cards."),
        # good unique English docs
        (3, "a small boat and the river of dreams is calm today."),
        (4, "the sun rises and sets of its own accord in the west."),
        # wrong language -> lang filter drops
        (5, "el rio y los montes una tierra."),
        (6, "und der berg nicht weit."),
        # English but junk quality: too few tokens
        (7, "the of and."),
        # English but punctuation soup (punct_ratio > 0.2)
        (8, "the and of the good day !!!! ,,,, ;;;; !!!! ,,,, ;;;; !!!! ,,,,"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ops.curation_pipeline(df, "doc_id", "text").collect()[0]
    assert out.n_input == 9
    assert out.n_after_dedup == 7          # dedup removed 2 copies
    assert out.n_after_lang == 5           # es + de dropped
    assert out.n_final == 3                # short + punct-soup dropped
    expected_tokens = sum(len(rows[i][1].split()) for i in (0, 3, 4))
    assert out.final_tokens == expected_tokens


def test_bpe_token_count_segmentation(spark):
    from gx_spark import ops

    df = spark.createDataFrame(
        [("it's 2024, don't stop!",), ("hello   world",), ("",)],
        "text string")
    out = [r[0] for r in df.select(
        ops.bpe_token_count(F.col("text"))).collect()]
    # "it" "'s" " 2024" "," " don" "'t" " stop" "!"  -> 8
    # "hello" "   " (ws run) "world"... leading-space fold: "hello" "  " "world" -> 3
    assert out[0] == 8
    assert out[1] == 3
    assert out[2] == 0
    # always >= whitespace tokens on plain prose
    txt = "the quick brown fox jumps over the lazy dog"
    n = spark.createDataFrame([(txt,)], "text string").select(
        ops.bpe_token_count(F.col("text")),
        ops.token_count(F.col("text"))).collect()[0]
    assert n[0] == n[1] == 9


def test_winnowing_guarantee_and_overlap(spark):
    from gx_spark import ops

    shared = "a common stretch of copied text that is long enough"
    rows = [
        (1, "unique preamble one. " + shared + " tail one."),
        (2, "another beginning here. " + shared + " different end."),
        (3, "completely unrelated content with no copying at all here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = ops.winnowing_fingerprints(df, "doc_id", "text", k=8, window=4)
    by_doc = {r.id: set() for r in fps.collect()}
    for r in fps.collect():
        by_doc[r.id].add(r.fp)
    # winnowing guarantee: shared substring >= k+window-1 chars =>
    # at least one shared fingerprint
    assert by_doc[1] & by_doc[2]
    pairs = {(r.id_a, r.id_b): r.shared
             for r in ops.fingerprint_overlap_pairs(fps, min_shared=3)
             .collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert not any(3 in p for p in pairs)
    # fingerprints are a small fraction of all k-grams (~2/(w+1))
    total_grams = sum(len(t) for _, t in
                      [(i, r[1].lower()) for i, r in enumerate(rows)]) - 3 * 7
    assert sum(len(v) for v in by_doc.values()) < 0.6 * total_grams
