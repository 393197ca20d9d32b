"""Real BPE (Sennrich ACL'16): corpus-trained merge table + UDF encoding.

Pins: deterministic greedy merges, lossless reconstruction (tokens
concatenate back to the pretokenized words), compression on repeated
vocabulary, and the documents-table smoke path.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402
from gx_spark.ops import BPE_PY_PATTERN  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_train_merges_most_frequent_pair_first(spark):
    df = spark.createDataFrame(
        [(i, "aaab aaab aaab xyz") for i in range(20)], ["i", "t"])
    merges = ops.train_bpe_merges(df, "t", n_merges=3)
    assert merges[0] == ("a", "a")  # most frequent adjacent pair
    # determinism: identical result on a re-run and at other parallelism
    assert merges == ops.train_bpe_merges(df.repartition(7), "t", n_merges=3)


def test_encode_reconstructs_and_compresses(spark):
    df = spark.createDataFrame(
        [(i, "the quick the quick the lazy dog") for i in range(30)],
        ["doc_id", "text"])
    merges = ops.train_bpe_merges(df, "text", n_merges=60)
    out = ops.bpe_encode(df, "doc_id", "text", merges).collect()
    pat = re.compile(BPE_PY_PATTERN)
    for r in out:
        toks = r["tokens"]
        assert r["n_bpe_tokens"] == len(toks)
        # lossless: joining pieces and splitting on </w> rebuilds the words
        words = "".join(toks).split("</w>")[:-1]
        assert words == pat.findall("the quick the quick the lazy dog")
    # after enough merges the frequent words collapse to single tokens
    assert "the</w>" in out[0]["tokens"]
    n_chars = len("the quick the quick the lazy dog".replace(" ", ""))
    assert out[0]["n_bpe_tokens"] < n_chars


def test_bpe_documents_smoke(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = ops.train_bpe_merges(docs, "text", n_merges=200)
    assert len(merges) > 50
    enc = ops.bpe_encode(docs, "doc_id", "text", merges)
    row = enc.first()
    assert row["n_bpe_tokens"] > 0
    stats = enc.agg({"n_bpe_tokens": "sum"}).collect()[0][0]
    total_chars = docs.selectExpr("sum(length(text))").collect()[0][0]
    assert 0 < stats < total_chars  # genuine compression vs characters
    # null text rows encode to null, not a crash
    import pyspark.sql.functions as F

    dirty = docs.withColumn(
        "text", F.when(F.col("doc_id") % 7 == 0, None)
        .otherwise(F.col("text")))
    out = ops.bpe_encode(dirty, "doc_id", "text", merges)
    assert out.where("tokens is null").count() > 0


def test_non_ascii_round_trip(spark):
    """Train and encode must pretokenize non-ASCII text identically (the
    Java-regex \\w is ASCII-only, so a JVM train-side split would produce
    'caf'+'é' word units the Python encode side never sees — train now
    uses the same compiled Python regex as encode)."""
    text = "café café café über über naïve 北京 北京"
    df = spark.createDataFrame([(i, text) for i in range(25)], ["i", "t"])
    merges = ops.train_bpe_merges(df, "t", n_merges=80)
    # the trained vocabulary collapses the repeated accented word to ONE
    # token — only possible if train saw 'café' whole, not 'caf'+'é'
    out = ops.bpe_encode(df, "i", "t", merges).first()
    assert " café</w>" in out["tokens"] or "café</w>" in out["tokens"]
    # lossless reconstruction through the same Python pretokenizer
    pat = re.compile(BPE_PY_PATTERN)
    words = "".join(out["tokens"]).split("</w>")[:-1]
    assert words == pat.findall(text)
    # determinism across parallelism still holds with the pandas-UDF path
    assert merges == ops.train_bpe_merges(df.repartition(9), "t", n_merges=80)


def test_rank_order_fixpoint_equivalence(spark):
    """The DuckDB oracle for bpe_tokenize_documents applies merges in RANK
    ORDER with a per-rank replace-all fixpoint (a recursive CTE).  That is
    equivalent to ops._bpe_encode_word's greedy min-rank loop because a
    merge learned at rank k can only create symbols whose pairs were
    learned after k — pin the equivalence exhaustively over the sf0.001
    corpus vocabulary with a corpus-trained table."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = ops.train_bpe_merges(docs, "text", n_merges=300)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    pat = re.compile(BPE_PY_PATTERN)
    words = set()
    for (t,) in docs.select("text").collect():
        if t:
            words.update(pat.findall(t))
    assert len(words) > 20
    US = chr(31)
    for w in words:
        s = US + US.join(list(w) + ["</w>"]) + US
        for a, b in merges:  # rank order; replace-all fixpoint per rank
            p, rep = US + a + US + b + US, US + a + b + US
            while p in s:
                s = s.replace(p, rep)
        assert s.strip(US).split(US) == ops._bpe_encode_word(w, ranks), w
