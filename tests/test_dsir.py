"""DSIR importance weighting (gx_spark/ops.py dsir_weights/dsir_sample;
Xie et al. 2023): pure-Python recompute of the hashed-n-gram bucket
model, target-likeness ordering, determinism of the Gumbel sample, and
the zero-shuffle plan pin for the scoring pass.
"""
import hashlib
import math

import pytest

from gx_spark import ops

BUCKETS = 64
SALT = "gx_dsir"


def _bucket(g: str) -> int:
    return int(hashlib.md5((SALT + g).encode()).hexdigest()[:15], 16) % BUCKETS


def _grams(text) -> list[str]:
    ws = [] if text is None else [w for w in text.strip().lower().split() if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _expected_weights(raw, target, alpha=1.0):
    def counts(docs):
        c = {}
        for _, t in docs:
            for g in _grams(t):
                b = _bucket(g)
                c[b] = c.get(b, 0) + 1
        return c, sum(c.values())

    tc, tt = counts(target)
    rc, rt = counts(raw)
    td, rd = tt + alpha * BUCKETS, rt + alpha * BUCKETS
    ratio = [
        math.log((tc.get(b, 0) + alpha) / td)
        - math.log((rc.get(b, 0) + alpha) / rd)
        for b in range(BUCKETS)
    ]
    out = {}
    for i, t in raw:
        gs = _grams(t)
        out[i] = (
            len(gs),
            round(sum(ratio[_bucket(g)] for g in gs), 6) if gs else None,
        )
    return out


def test_matches_python_recompute(spark):
    raw = [(1, "the cat sat"), (2, "stock market crash report"),
           (3, "the dog sat"), (4, ""), (5, "singleton"), (6, None)]
    target = [(10, "the cat sat on the mat"), (11, "the dog sat down")]
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    out = ops.dsir_weights(raw_df, tgt_df, "doc_id", "text",
                           buckets=BUCKETS)
    got = {r["doc_id"]: (r["n_features"], r["log_importance_weight"])
           for r in out.collect()}
    exp = _expected_weights(raw, target)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        if exp[i][1] is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6)
    # target-likeness ordering: the doc sharing the target's word pairs
    # outscores the out-of-domain one
    assert got[1][1] > got[2][1]
    assert got[3][1] > got[2][1]


def test_gumbel_sample_deterministic_and_weighted(spark):
    # 30 target-like docs + 30 out-of-domain docs; k=20 should be
    # dominated by target-like ones, and two runs must agree exactly
    raw = [(i, "alpha beta gamma delta") for i in range(30)]
    raw += [(100 + i, "zork quux blorb frotz") for i in range(30)]
    target = [(1000, "alpha beta gamma delta alpha beta")]
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    w = ops.dsir_weights(raw_df, tgt_df, "doc_id", "text", buckets=BUCKETS)
    s1 = ops.dsir_sample(w, 20).collect()
    s2 = ops.dsir_sample(w, 20).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == 20
    target_like = sum(1 for r in s1 if r["doc_id"] < 100)
    assert target_like >= 15  # weights dominate the bounded noise


def test_scoring_pass_is_zero_shuffle(spark):
    from gx_spark.plancheck import formatted_plan

    raw = spark.createDataFrame(
        [(i, f"w{i % 5} w{(i + 1) % 5}") for i in range(50)],
        "doc_id long, text string")
    tgt = spark.createDataFrame([(0, "w1 w2")], "doc_id long, text string")
    out = ops.dsir_weights(raw, tgt, "doc_id", "text", buckets=BUCKETS)
    plan = formatted_plan(out)
    assert "Exchange" not in plan, (
        f"DSIR scoring must fold map-side over the literal ratio "
        f"array:\n{plan}")
    assert "Join" not in plan, plan


def test_sample_compiles_to_take_ordered(spark):
    from gx_spark.plancheck import formatted_plan

    raw = spark.createDataFrame(
        [(i, f"w{i % 5} w{(i + 1) % 5}") for i in range(50)],
        "doc_id long, text string")
    tgt = spark.createDataFrame([(0, "w1 w2")], "doc_id long, text string")
    w = ops.dsir_weights(raw, tgt, "doc_id", "text", buckets=BUCKETS)
    plan = formatted_plan(ops.dsir_sample(w, 5))
    assert "TakeOrderedAndProject" in plan, plan
