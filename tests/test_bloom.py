"""bloom_blocklist_filter — blocklist screening via a plan-literal Bloom
bitmap probed with portable md5 arithmetic (no join, no shuffle)."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402


def _pos(t: str, s: int, m: int) -> int:
    return int(hashlib.md5(f"{t}|{s}".encode()).hexdigest()[:15], 16) % m


def _py_bloom(corpus, blocklist, m, k):
    """Independent reimplementation: position-set membership (the dense
    bitmap is just a representation of this set)."""
    P = {_pos(t, s, m) for t in blocklist for s in range(k)}
    out = {}
    for doc, text in corpus.items():
        toks = {w for w in text.strip().lower().split() if w}
        flagged = {t for t in toks
                   if all(_pos(t, s, m) in P for s in range(k))}
        out[doc] = (len(flagged), len(flagged) > 0)
    return out


CORPUS = {
    "d1": "alpha beta gamma delta",
    "d2": "beta BETA  beta epsilon",   # case/whitespace normalization
    "d3": "zeta eta theta iota kappa",
    "d4": "   ",                       # no tokens -> 0 / false
    "d5": "gamma nu xi omicron pi rho sigma tau",
}
BLOCKLIST = ["beta", "gamma", "absent-term"]


def test_bloom_matches_python_reference(spark):
    df = spark.createDataFrame(list(CORPUS.items()),
                               "doc_id string, text string")
    for m, k in ((16, 2), (64, 3), (4096, 3)):
        got = {r["doc_id"]: (r["n_flagged_tokens"], r["bloom_hit"])
               for r in ops.bloom_blocklist_filter(
                   df, "doc_id", "text", BLOCKLIST, m_bits=m, k=k
               ).collect()}
        assert got == _py_bloom(CORPUS, BLOCKLIST, m, k), (m, k)


def test_bloom_no_false_negatives(spark):
    """Every doc containing a blocklist term is hit at ANY m/k — the
    defining Bloom guarantee."""
    df = spark.createDataFrame(list(CORPUS.items()),
                               "doc_id string, text string")
    for m, k in ((8, 1), (16, 4), (65536, 3)):
        got = {r["doc_id"]: r["bloom_hit"]
               for r in ops.bloom_blocklist_filter(
                   df, "doc_id", "text", BLOCKLIST, m_bits=m, k=k
               ).collect()}
        assert got["d1"] and got["d2"] and got["d5"], (m, k)
        assert not got["d4"]


def test_bloom_false_positive_exists_at_tiny_m(spark):
    """At m=8 with 3 terms x 2 seeds the bitmap saturates: innocent
    tokens collide — proof the probe is a real Bloom filter, not an
    equality join in disguise.  The python reference agrees on the exact
    false-positive set."""
    df = spark.createDataFrame(list(CORPUS.items()),
                               "doc_id string, text string")
    m, k = 8, 2
    ref = _py_bloom(CORPUS, BLOCKLIST, m, k)
    truly = {"d1", "d2", "d5"}  # docs actually containing beta/gamma
    fp_docs = {d for d, (_, hit) in ref.items() if hit} - truly
    assert fp_docs, "pick a smaller m: reference shows no FP"
    got = {r["doc_id"]: r["bloom_hit"]
           for r in ops.bloom_blocklist_filter(
               df, "doc_id", "text", BLOCKLIST, m_bits=m, k=k).collect()}
    assert {d for d, h in got.items() if h} == truly | fp_docs


def test_bloom_plan_is_jvm_and_shuffle_free(spark):
    df = spark.createDataFrame(list(CORPUS.items()),
                               "doc_id string, text string")
    out = ops.bloom_blocklist_filter(df, "doc_id", "text", BLOCKLIST)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_bloom_param_validation(spark):
    df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        ops.bloom_blocklist_filter(df, "doc_id", "text", ["x"], m_bits=10)
    with pytest.raises(ValueError):
        ops.bloom_blocklist_filter(df, "doc_id", "text", ["x"], k=0)
