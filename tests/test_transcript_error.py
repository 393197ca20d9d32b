"""transcript_error_stats (ops.py): word_edit_distance vs a brute-force
DP reference (hypothesis-driven), CER/WER verdicts on planted edits, and
the zero-Exchange plan shape."""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.ops import transcript_error_stats, word_edit_distance  # noqa: E402


def _brute(a, b):
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return d[la][lb]


WORDS = st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]), max_size=12)


@settings(max_examples=200, deadline=None)
@given(WORDS, WORDS)
def test_word_edit_distance_matches_bruteforce(a, b):
    assert word_edit_distance(a, b) == _brute(a, b)


def test_word_edit_distance_basics():
    assert word_edit_distance([], []) == 0
    assert word_edit_distance(["x"], []) == 1
    assert word_edit_distance([], ["x", "y"]) == 2
    assert word_edit_distance(["the", "cat"], ["the", "cat"]) == 0
    assert word_edit_distance(["the", "fat", "cat"], ["the", "cat"]) == 1
    # OOV substitutions + deletions: distance is exactly D + S
    ref = ["w1", "w2", "w3", "w4", "w5", "w6"]
    hyp = ["w1", "w3~", "w4", "w6~~"]  # drop w2,w5; substitute w3,w6
    assert word_edit_distance(hyp, ref) == 4


def test_transcript_error_stats(spark):
    rows = [
        (1, "the quick brown fox", "the quick brown fox"),   # perfect
        (2, "the quick fox", "the quick brown fox"),          # 1 deletion
        (3, "teh quick brown fox", "the quick brown fox"),    # 1 sub word
        (4, None, "ab cd"),                                   # null hyp
    ]
    df = spark.createDataFrame(rows, "doc_id long, hyp string, ref string")
    out = {r["doc_id"]: r for r in
           transcript_error_stats(df, "doc_id", "hyp", "ref").collect()}
    assert out[1]["word_edits"] == 0 and out[1]["cer"] == 0.0
    assert out[2]["word_edits"] == 1
    assert out[2]["wer"] == pytest.approx(0.25)
    assert out[3]["word_edits"] == 1
    assert out[3]["char_edits"] == 2  # teh -> the is one transposition
    assert out[3]["cer"] == pytest.approx(round(2 / 19, 6))
    assert out[4]["word_edits"] == 2 and out[4]["char_edits"] == 5


def test_transcript_error_plan_is_map_only(spark):
    from gx_spark.plancheck import formatted_plan

    df = spark.createDataFrame([(1, "a", "a")],
                               "doc_id long, hyp string, ref string")
    plan = formatted_plan(transcript_error_stats(df, "doc_id", "hyp", "ref"))
    assert "Exchange" not in plan, plan
