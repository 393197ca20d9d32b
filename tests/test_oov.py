"""Transcript normalization + lexicon-coverage (OOV rate) ops, and the
expect_transcript_oov_rate_to_be_below gate.

The DuckDB oracle lives in __spark_entry__.oracle_sql()
['oov_stats_documents']; these tests pin the normalization semantics the
oracle replays (lower / [a-z0-9'] / collapse), the corpus-derived-lexicon
rule (frequency >= min_count), the explicit-lexicon path, and the
expectation's empty-transcript handling.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402
from gx_spark.model import ExpectationSuite  # noqa: E402
from gx_spark.executor import validate  # noqa: E402


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "The cat sat; the cat ran!"),
        (2, "Don't stop -- the DOG barked?"),
        (3, "zzyx the qwfp"),
        (4, ""),
        (5, "!!! ... ???"),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_normalize_transcript(spark, corpus):
    got = _by_id(ops.normalize_transcript(corpus, "doc_id", "text"))
    assert got[1]["norm_text"] == "the cat sat the cat ran"
    assert got[1]["n_tokens"] == 6
    # apostrophe survives: contraction stays one token
    assert got[2]["norm_text"] == "don't stop the dog barked"
    assert got[2]["n_tokens"] == 5
    # punctuation-only and empty normalize to '' with 0 tokens
    assert got[4]["norm_text"] == "" and got[4]["n_tokens"] == 0
    assert got[5]["norm_text"] == "" and got[5]["n_tokens"] == 0
    # NULL stays NULL
    assert got[6]["norm_text"] is None and got[6]["n_tokens"] == 0


def test_oov_stats_corpus_lexicon(spark, corpus):
    # corpus token frequencies: the=5, cat=2, sat=1, ran=1, don't=1,
    # stop=1, dog=1, barked=1, zzyx=1, qwfp=1 -> lexicon(min_count=2) =
    # {the, cat}
    got = _by_id(ops.oov_stats(corpus, "doc_id", "text", min_count=2))
    assert got[1]["n_tokens"] == 6 and got[1]["n_oov"] == 2  # sat, ran
    assert got[2]["n_tokens"] == 5 and got[2]["n_oov"] == 4
    assert got[3]["n_tokens"] == 3 and got[3]["n_oov"] == 2
    assert got[3]["oov_rate"] == pytest.approx(0.666667)
    # empty / null docs preserved with NULL rate
    for d in (4, 5, 6):
        assert got[d]["n_tokens"] == 0 and got[d]["n_oov"] == 0
        assert got[d]["oov_rate"] is None


def test_oov_stats_explicit_lexicon(spark, corpus):
    lex = spark.createDataFrame(
        [("the",), ("cat",), ("dog",), ("don't",)], "w string")
    got = _by_id(ops.oov_stats(corpus, "doc_id", "text", lexicon=lex))
    assert got[1]["n_oov"] == 2            # sat, ran
    assert got[2]["n_oov"] == 2            # stop, barked
    assert got[3]["n_oov"] == 2            # zzyx, qwfp
    assert got[1]["oov_rate"] == pytest.approx(2 / 6, abs=1e-6)


def test_oov_stats_parallelism_independent(spark, corpus):
    a = sorted(map(tuple, ops.oov_stats(
        corpus, "doc_id", "text").collect()))
    b = sorted(map(tuple, ops.oov_stats(
        corpus.repartition(7), "doc_id", "text").collect()))
    assert a == b


def test_expectation_oov_gate(spark, corpus):
    suite = ExpectationSuite("oov").add(
        "expect_transcript_oov_rate_to_be_below",
        transcript_column="text",
        lexicon=["the", "cat", "sat", "dog", "ran", "don't", "stop",
                 "barked"],
        max_rate=0.5,
    )
    bundle = validate(spark, corpus, suite)
    r = bundle.suite_result.results[0]
    # doc 3 (2/3 OOV) and docs 4/5 (no lexical content) are unexpected;
    # doc 6 (NULL) is excluded from the denominator
    assert r.result["element_count"] == 6
    assert r.result["unexpected_count"] == 3
    assert not r.success


def test_expectation_requires_lexicon(spark, corpus):
    # planning error -> exception EVR under the catch_exceptions contract
    suite = ExpectationSuite("oov").add(
        "expect_transcript_oov_rate_to_be_below", transcript_column="text")
    r = validate(spark, corpus, suite).suite_result.results[0]
    assert not r.success
    assert r.exception_info["raised_exception"]
    assert "lexicon" in r.exception_info["exception_message"]
