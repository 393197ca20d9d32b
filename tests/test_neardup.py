"""Near-dup family: minhash seed correctness, exact word-Jaccard inverted
index, LSH-verified pairs, exact/LSH cosine near-dups.

Regression anchor: pyspark passes the element INDEX as the second argument
to 2-arg higher-order-function lambdas, which once silently replaced the
minhash seed with the array position (every signature slot collapsed to the
same position-dependent hash).  test_minhash_agreement_tracks_jaccard pins
the fixed behavior to LSH theory.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_agreement_tracks_jaccard(spark):
    """Per-slot signature values must differ across seeds, and the
    agreement fraction must estimate the true word-set Jaccard."""
    df = spark.createDataFrame(
        [("a", "w1 w2 w3 w4 w5 w6 w7 w8"), ("b", "w1 w2 w3 w4 w5 w6 xx yy")],
        "doc_id string, text string",
    )
    sigs = {r["id"]: r["sig"]
            for r in ops.minhash_signatures(df, "doc_id", "text",
                                            shingle_k=1, n_hashes=64).collect()}
    # distinct seeds -> (almost all) distinct per-slot hashes
    assert len(set(sigs["a"])) > 60
    agree = sum(1 for x, y in zip(sigs["a"], sigs["b"]) if x == y) / 64
    true_j = 6 / 10
    assert abs(agree - true_j) < 0.2, (agree, true_j)


def test_word_jaccard_exact_small_case(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id long, text string",
    )
    rows = ops.word_jaccard_pairs(df, "doc_id", "text", 0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.jaccard == pytest.approx(3 / 5)


def test_minhash_verified_pairs_exact_precision_good_recall(spark, docs):
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in ops.word_jaccard_pairs(docs, "doc_id", "text", 0.5).collect()}
    verified = {(r.id_a, r.id_b): r.jaccard
                for r in ops.minhash_verified_pairs(docs, "doc_id", "text", 0.5).collect()}
    # precision is EXACT: every verified pair is a true pair with the same jaccard
    for k, j in verified.items():
        assert k in exact
        assert j == pytest.approx(exact[k])
    # recall at j>=0.8 is near-total (band prob 1-(1-j^4)^8 ~ 0.998)
    high = {k for k, j in exact.items() if j >= 0.8}
    got_high = set(verified) & high
    assert len(got_high) / len(high) > 0.95, len(got_high) / len(high)


def test_cosine_near_dups_exact_vs_lsh_recall(spark):
    """True near-dups (cosine >= 0.9, the LSH design point: sign-agreement
    prob p = 1 - theta/pi = 0.86, so 12-table recall 1-(1-p^8)^12 ~ 0.98).
    The testdata embeddings have no genuine near-dups (max pairwise cosine
    ~0.48), so build perturbed duplicates deterministically."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((150, 16))
    rows = []
    vid = 0
    for i, v in enumerate(base):
        rows.append((vid, [float(x) for x in v])); vid += 1
        if i % 3 == 0:  # every third vector gets a tiny-perturbation twin
            w = v + 0.05 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in w])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r.id_a, r.id_b) for r in ops.cosine_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.9, mode="exact").collect()}
    lsh = {(r.id_a, r.id_b) for r in ops.cosine_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.9, mode="lsh").collect()}
    assert len(exact) >= 40  # the planted twins
    # precision exact (every LSH pair is cosine-verified)
    assert lsh <= exact
    # OR-amplified 12-table recall at the design threshold
    assert len(lsh) / len(exact) >= 0.9, (len(lsh), len(exact))


def test_cosine_near_dups_empty_input(spark, emb):
    out = ops.cosine_near_dup_pairs(emb.limit(0), "vec_id", "embedding",
                                    threshold=0.9, mode="lsh")
    assert out.count() == 0


def test_edit_distance_pairs_exact_small_case(spark):
    """Known distances on hand-built near-dups; banded form returns -1 /
    null sim beyond the band; unicode counted by CODEPOINTS (Spark
    semantics — one substitution in 'café', not the 2-byte count a
    byte-based engine reports)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # dist 3 to 1
        (3, "the quick brown fox jumped over that lazy dog"),  # dist 4 to 1
        (4, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r for r in ops.edit_distance_pairs(
        df, "doc_id", "text", jaccard_threshold=0.5).collect()}
    assert (1, 2) in out and out[(1, 2)].dist == 3
    assert (1, 3) in out and out[(1, 3)].dist == 4
    assert all(4 not in k for k in out)
    ln = len(rows[0][1])
    assert out[(1, 2)].sim_milli == int(1000.0 * (1.0 - 3.0 / ln) // 1)
    # banded: k=3 keeps (1,2) at 3, bands out (1,3) as dist=-1/null sim
    banded = {(r.id_a, r.id_b): r for r in ops.edit_distance_pairs(
        df, "doc_id", "text", jaccard_threshold=0.5, max_dist=3).collect()}
    assert banded[(1, 2)].dist == 3 and banded[(1, 2)].sim_milli is not None
    assert banded[(1, 3)].dist == -1 and banded[(1, 3)].sim_milli is None
    # sim_threshold keeps only the tightest pair
    kept = ops.edit_distance_pairs(
        df, "doc_id", "text", jaccard_threshold=0.5,
        sim_threshold=0.92).collect()
    assert {(r.id_a, r.id_b) for r in kept} == {(1, 2)}


def test_edit_distance_codepoint_semantics(spark):
    df = spark.createDataFrame(
        [(1, "café au lait s'il vous plaît"),
         (2, "cafe au lait s'il vous plaît")],
        "doc_id long, text string")
    out = ops.edit_distance_pairs(
        df, "doc_id", "text", jaccard_threshold=0.5).collect()
    assert len(out) == 1 and out[0].dist == 1


def test_edit_distance_pairs_plan_no_cross_join(spark):
    """Verification joins stay keyed hash joins: no CartesianProduct /
    BroadcastNestedLoopJoin anywhere — the DP only ever runs on pairs the
    prefix filter proposed."""
    from gx_spark.plancheck import formatted_plan

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(ops.edit_distance_pairs(
        df, "doc_id", "text", jaccard_threshold=0.9, max_dist=100))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan
