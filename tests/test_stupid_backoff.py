"""Stupid-backoff bigram LM scoring (gx_spark/ops.py
stupid_backoff_logprob; Brants et al. 2007 §4): hand-computed scores on a
tiny corpus, the backoff and OOV paths, pruning, empty docs, and the
token-normalization convention.
"""
import math

import pytest

from gx_spark import ops


def _rows(df):
    return {r["doc_id"]: (r["n_tokens"], r["logprob_per_token"])
            for r in df.collect()}


def test_hand_computed_no_pruning(spark):
    # corpus: d1="a b a", d2="a b", d3="c"
    # c1: a=3, b=2, c=1; N=6
    # c2: (a,b)=2, (b,a)=1
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "c")], "doc_id long, text string")
    out = _rows(ops.stupid_backoff_logprob(
        df, "doc_id", "text", alpha=0.4, min_count=1))
    # d1: S(a)=3/6; S(b|a)=2/3; S(a|b)=1/2
    d1 = (math.log(3 / 6) + math.log(2 / 3) + math.log(1 / 2)) / 3
    # d2: S(a)=3/6; S(b|a)=2/3
    d2 = (math.log(3 / 6) + math.log(2 / 3)) / 2
    # d3: S(c)=1/6
    d3 = math.log(1 / 6)
    assert out[1] == (3, pytest.approx(round(d1, 6), abs=1e-9))
    assert out[2] == (2, pytest.approx(round(d2, 6), abs=1e-9))
    assert out[3] == (1, pytest.approx(round(d3, 6), abs=1e-9))


def test_pruning_backoff_and_oov(spark):
    # min_count=2 prunes the hapax bigram (b,a) and the hapax unigram c:
    # c1: a=3, b=2, c=1; N=6; kept bigrams: (a,b)=2; kept unigrams: a, b
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "c")], "doc_id long, text string")
    out = _rows(ops.stupid_backoff_logprob(
        df, "doc_id", "text", alpha=0.4, min_count=2))
    a = 0.4
    # d1: S(a)=3/6; S(b|a)=2/3; (b,a) pruned -> alpha*S(a)=alpha*3/6
    d1 = (math.log(3 / 6) + math.log(2 / 3)
          + math.log(a) + math.log(3 / 6)) / 3
    # d3: c pruned as unigram -> OOV floor alpha/N
    d3 = math.log(a / 6)
    assert out[1] == (3, pytest.approx(round(d1, 6), abs=1e-9))
    assert out[3] == (1, pytest.approx(round(d3, 6), abs=1e-9))
    # unseen bigram whose SECOND word is also unseen would get
    # ln(alpha) + ln(alpha/N); build it: d4="b q" scores S(b)=2/6 then
    # backoff-to-OOV for q after context b
    df2 = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "c"), (4, "b q")],
        "doc_id long, text string")
    out2 = _rows(ops.stupid_backoff_logprob(
        df2, "doc_id", "text", alpha=0.4, min_count=2))
    # corpus now: a=3, b=3, q=1, c=1; N=8; bigrams kept: (a,b)=2
    d4 = (math.log(3 / 8) + math.log(a) + math.log(a / 8)) / 2
    assert out2[4] == (2, pytest.approx(round(d4, 6), abs=1e-9))


def test_empty_docs_and_normalization(spark):
    df = spark.createDataFrame(
        [(1, "  The   THE the "), (2, ""), (3, None), (4, "the the")],
        "doc_id long, text string")
    out = _rows(ops.stupid_backoff_logprob(
        df, "doc_id", "text", alpha=0.4, min_count=1))
    # all tokens normalize to 'the': c1=5, N=5; bigram (the,the)=3
    # d1: S(the)=1 then 2 bigrams S(the|the)=3/5
    d1 = (math.log(1) + 2 * math.log(3 / 5)) / 3
    assert out[1] == (3, pytest.approx(round(d1, 6), abs=1e-9))
    assert out[2] == (0, None)
    assert out[3] == (0, None)


def test_word_salad_scores_below_natural_order(spark):
    # the capability the bigram adds over the unigram LM: same bag of
    # words, scrambled order -> lower score
    natural = "the cat sat on the mat"
    rows = [(i, natural) for i in range(10)]
    rows.append((100, "mat the on sat cat the"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(ops.stupid_backoff_logprob(
        df, "doc_id", "text", alpha=0.4, min_count=2))
    assert out[100][1] < out[0][1]
    # while the unigram LM cannot tell them apart
    uni = _rows(ops.unigram_logprob(df, "doc_id", "text"))
    assert uni[100][1] == uni[0][1]


def test_scoring_pass_plan_shape(spark):
    """Scale-shape pin: the LM tables reach the token stream as
    BroadcastHashJoins (the corpus token stream is never the shuffled
    side of an LM lookup), and the only doc-keyed Exchange carries
    post-partial aggregate rows, not token-level (prev, w) rows."""
    from gx_spark.plancheck import exchange_sections, formatted_plan

    rows = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{i % 5}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ops.stupid_backoff_logprob(df, "doc_id", "text", min_count=2)
    plan = formatted_plan(out)
    assert plan.count("BroadcastHashJoin") >= 3, plan  # bg-denom, bg, ug
    for ex in exchange_sections(plan):
        if "hashpartitioning(doc_id" in ex:
            assert "prev#" not in ex, (
                f"token-level rows entered a doc-keyed shuffle:\n{ex}")
