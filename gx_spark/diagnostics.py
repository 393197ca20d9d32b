"""Expectation self-check harness (ref: GE expectations/expectation.py
`run_diagnostics` + the gallery `examples` convention).

Upstream, every Expectation class can carry `examples` — small inline
datasets plus test cases ("in"/"out") — and `run_diagnostics()` executes
them against each execution engine, producing a maturity checklist.  This
engine has one execution engine (Catalyst), so the harness is leaner but
serves the same two users:

* custom-expectation AUTHORS get an immediate self-test: register a
  handler, attach `examples`, call `run_diagnostics(spark, name)`;
* the GALLERY role: `run_diagnostics_all(spark)` sweeps every registered
  type and reports which are example-covered and healthy.

Example shape (a direct translation of the public GE gallery schema):

    examples = [{
        "data": {"a": [1, 2, None]},            # column -> values
        "schema": "a int",                       # optional explicit DDL
        "tables": {                              # optional named side
            "dim": {"data": {"k": [1, 2]},       # tables for referential /
                    "schema": "k int"},          # other-table expectations
        },
        "tests": [
            {"title": "positive",
             "exact_match_out": False,
             "in": {"column": "a", "mostly": 0.5},   # expectation kwargs
             "out": {"success": True}},              # expected EVR fields
        ],
    }]

Supported `out` keys: `success` (required), `observed_value`,
`unexpected_count` — compared exactly (floats to 9 places).

Media expectations (audio/image/video) need binary payloads built from
the in-repo codecs, so their gallery entries live in
GALLERY_EXAMPLE_BUILDERS as lazy zero-arg callables — resolved only when
diagnostics actually run (importing this module stays cheap and
Spark-free).
"""

from __future__ import annotations

import functools
from typing import Any

from pyspark.sql import SparkSession

from .model import EngineOptions, ExpectationSuite
from .registry import _REGISTRY, get_expectation


# Central gallery for built-ins (GE keeps examples on each class; four
# classes carry them as the authoring pattern, the rest live here so the
# handler files stay lean).  Handler-attached `examples` win.
GALLERY_EXAMPLES: dict[str, list[dict]] = {
    "expect_column_values_to_be_null": [{
        "data": {"a": [None, None, 3]}, "schema": "a int",
        "tests": [{"title": "non-null fails", "in": {"column": "a"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_not_be_in_set": [{
        "data": {"c": ["A", "B"]}, "schema": "c string",
        "tests": [{"title": "forbidden member flagged",
                   "in": {"column": "c", "value_set": ["B"]},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_match_regex": [{
        "data": {"s": ["ab1", "ab2", "xx"]}, "schema": "s string",
        "tests": [{"title": "one mismatch",
                   "in": {"column": "s", "regex": "^ab\\d$"},
                   "out": {"success": False, "unexpected_count": 1}},
                  {"title": "mostly passes",
                   "in": {"column": "s", "regex": "^ab\\d$", "mostly": 0.6},
                   "out": {"success": True}}]}],
    "expect_column_values_to_not_match_regex": [{
        "data": {"s": ["ok", "bad7"]}, "schema": "s string",
        "tests": [{"title": "digit suffix flagged",
                   "in": {"column": "s", "regex": "\\d"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_value_lengths_to_be_between": [{
        "data": {"s": ["a", "abcd", "abcdefgh"]}, "schema": "s string",
        "tests": [{"title": "bounds inclusive",
                   "in": {"column": "s", "min_value": 1, "max_value": 8},
                   "out": {"success": True, "unexpected_count": 0}},
                  {"title": "short value flagged",
                   "in": {"column": "s", "min_value": 2, "max_value": 8},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_value_lengths_to_equal": [{
        "data": {"s": ["ab", "cd", "xyz"]}, "schema": "s string",
        "tests": [{"title": "one wrong length",
                   "in": {"column": "s", "value": 2},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_be_json_parseable": [{
        "data": {"j": ['{"a": 1}', "[2, 3]", "{nope"]},
        "schema": "j string",
        "tests": [{"title": "malformed json flagged",
                   "in": {"column": "j"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_be_unique": [{
        "data": {"k": [1, 2, 2, 3]}, "schema": "k int",
        "tests": [{"title": "both members of a dup group count",
                   "in": {"column": "k"},
                   "out": {"success": False, "unexpected_count": 2}}]}],
    "expect_column_median_to_be_between": [{
        "data": {"v": [1.0, 2.0, 9.0]}, "schema": "v double",
        "tests": [{"title": "median observed",
                   "in": {"column": "v", "min_value": 2, "max_value": 2},
                   "out": {"success": True, "observed_value": 2.0}}]}],
    "expect_column_stdev_to_be_between": [{
        "data": {"v": [2.0, 4.0, 6.0]}, "schema": "v double",
        "tests": [{"title": "sample stdev (ddof=1) observed",
                   "in": {"column": "v", "min_value": 1.9, "max_value": 2.1},
                   "out": {"success": True, "observed_value": 2.0}}]}],
    "expect_column_min_to_be_between": [{
        "data": {"v": [5.0, 7.0]}, "schema": "v double",
        "tests": [{"title": "min observed",
                   "in": {"column": "v", "min_value": 4, "max_value": 6},
                   "out": {"success": True, "observed_value": 5.0}}]}],
    "expect_column_max_to_be_between": [{
        "data": {"v": [5.0, 7.0]}, "schema": "v double",
        "tests": [{"title": "out-of-band max fails",
                   "in": {"column": "v", "min_value": 1, "max_value": 6},
                   "out": {"success": False, "observed_value": 7.0}}]}],
    "expect_column_sum_to_be_between": [{
        "data": {"v": [1, 2, 3]}, "schema": "v int",
        "tests": [{"title": "sum observed",
                   "in": {"column": "v", "min_value": 6, "max_value": 6},
                   "out": {"success": True, "observed_value": 6.0}}]}],
    "expect_column_unique_value_count_to_be_between": [{
        "data": {"c": ["x", "x", "y", None]}, "schema": "c string",
        "tests": [{"title": "nulls excluded from distinct count",
                   "in": {"column": "c", "min_value": 2, "max_value": 2},
                   "out": {"success": True, "observed_value": 2}}]}],
    "expect_column_distinct_values_to_contain_set": [{
        "data": {"c": ["x", "y", "z"]}, "schema": "c string",
        "tests": [{"title": "missing required member fails",
                   "in": {"column": "c", "value_set": ["x", "w"]},
                   "out": {"success": False}}]}],
    "expect_table_row_count_to_be_between": [{
        "data": {"a": [1, 2, 3]}, "schema": "a int",
        "tests": [{"title": "count observed",
                   "in": {"min_value": 3, "max_value": 3},
                   "out": {"success": True, "observed_value": 3}}]}],
    "expect_table_row_count_to_equal": [{
        "data": {"a": [1, 2, 3]}, "schema": "a int",
        "tests": [{"title": "wrong expected count fails",
                   "in": {"value": 4},
                   "out": {"success": False, "observed_value": 3}}]}],
    "expect_column_pair_values_a_to_be_greater_than_b": [{
        "data": {"a": [5, 1], "b": [2, 4]}, "schema": "a int, b int",
        "tests": [{"title": "one inverted pair",
                   "in": {"column_A": "a", "column_B": "b"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_multicolumn_sum_to_equal": [{
        "data": {"a": [4, 2], "b": [6, 7]}, "schema": "a int, b int",
        "tests": [{"title": "one row off-total",
                   "in": {"column_list": ["a", "b"], "sum_total": 10},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    # -- r5 gallery completion: every registered type example-covered ----
    "expect_column_to_exist": [{
        "data": {"a": [1], "b": [2]}, "schema": "a int, b int",
        "tests": [{"title": "present at the right index",
                   "in": {"column": "b", "column_index": 1},
                   "out": {"success": True}},
                  {"title": "missing column fails",
                   "in": {"column": "zzz"},
                   "out": {"success": False}}]}],
    "expect_table_column_count_to_be_between": [{
        "data": {"a": [1], "b": [2]}, "schema": "a int, b int",
        "tests": [{"title": "2 columns in [1,3]",
                   "in": {"min_value": 1, "max_value": 3},
                   "out": {"success": True, "observed_value": 2}}]}],
    "expect_table_column_count_to_equal": [{
        "data": {"a": [1], "b": [2]}, "schema": "a int, b int",
        "tests": [{"title": "wrong count fails",
                   "in": {"value": 3},
                   "out": {"success": False, "observed_value": 2}}]}],
    "expect_table_columns_to_match_ordered_list": [{
        "data": {"a": [1], "b": [2]}, "schema": "a int, b int",
        "tests": [{"title": "order matters",
                   "in": {"column_list": ["b", "a"]},
                   "out": {"success": False}},
                  {"title": "exact order passes",
                   "in": {"column_list": ["a", "b"]},
                   "out": {"success": True}}]}],
    "expect_table_columns_to_match_set": [{
        "data": {"a": [1], "b": [2]}, "schema": "a int, b int",
        "tests": [{"title": "set ignores order",
                   "in": {"column_set": ["b", "a"]},
                   "out": {"success": True}},
                  {"title": "subset ok when exact_match off",
                   "in": {"column_set": ["a"], "exact_match": False},
                   "out": {"success": True}}]}],
    "expect_table_row_count_to_equal_other_table": [{
        "data": {"a": [1, 2, 3]}, "schema": "a int",
        "tables": {"other": {"data": {"x": [10, 20, 30]},
                             "schema": "x int"}},
        "tests": [{"title": "equal counts",
                   "in": {"other_table_name": "other"},
                   "out": {"success": True}}]}],
    "expect_column_values_to_exist_in_table": [{
        "data": {"k": [1, 2, 9]}, "schema": "k int",
        "tables": {"dim": {"data": {"k": [1, 2, 3]}, "schema": "k int"}},
        "tests": [{"title": "orphan key flagged",
                   "in": {"column": "k", "other_table_name": "dim"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_query_to_return_no_rows": [{
        "data": {"x": [1, -2, 3]}, "schema": "x int",
        "tests": [{"title": "violating rows returned",
                   "in": {"query": "SELECT * FROM batch WHERE x < 0"},
                   "out": {"success": False, "observed_value": 1}}]}],
    "expect_column_values_to_be_of_type": [{
        "data": {"a": [1]}, "schema": "a int",
        "tests": [{"title": "schema-resolved match",
                   "in": {"column": "a", "type_": "IntegerType"},
                   "out": {"success": True, "observed_value": "IntegerType"}},
                  {"title": "wrong type fails",
                   "in": {"column": "a", "type_": "StringType"},
                   "out": {"success": False}}]}],
    "expect_column_values_to_be_in_type_list": [{
        "data": {"a": [1]}, "schema": "a bigint",
        "tests": [{"title": "alias accepted",
                   "in": {"column": "a", "type_list": ["int", "bigint"]},
                   "out": {"success": True}}]}],
    "expect_column_values_to_be_dateutil_parseable": [{
        "data": {"d": ["2021-01-02", "2021-01-02 03:04:05", "not a date"]},
        "schema": "d string",
        "tests": [{"title": "unparseable flagged",
                   "in": {"column": "d"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_match_strftime_format": [{
        "data": {"d": ["2021-01-02", "2021-13-40"]}, "schema": "d string",
        "tests": [{"title": "impossible date flagged",
                   "in": {"column": "d", "strftime_format": "%Y-%m-%d"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_match_json_schema": [{
        "data": {"j": ['{"a": 1}', '{"a": "nope"}', "{broken"]},
        "schema": "j string",
        "tests": [{"title": "type violation + malformed flagged",
                   "in": {"column": "j",
                          "json_schema": {
                              "type": "object",
                              "properties": {"a": {"type": "integer"}},
                              "required": ["a"]}},
                   "out": {"success": False, "unexpected_count": 2}}]}],
    "expect_column_values_to_match_like_pattern": [{
        "data": {"s": ["abc", "abx", "zzz"]}, "schema": "s string",
        "tests": [{"title": "SQL LIKE, one miss",
                   "in": {"column": "s", "like_pattern": "ab%"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_not_match_like_pattern": [{
        "data": {"s": ["ok", "bad_x"]}, "schema": "s string",
        "tests": [{"title": "forbidden pattern flagged",
                   "in": {"column": "s", "like_pattern": "%x"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_match_like_pattern_list": [{
        "data": {"s": ["ax", "bx", "cx"]}, "schema": "s string",
        "tests": [{"title": "any-of list, one miss",
                   "in": {"column": "s",
                          "like_pattern_list": ["a%", "b%"]},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_not_match_like_pattern_list": [{
        "data": {"s": ["a1", "a3"]}, "schema": "s string",
        "tests": [{"title": "one forbidden match",
                   "in": {"column": "s",
                          "like_pattern_list": ["%1", "%2"]},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_match_regex_list": [{
        "data": {"s": ["ax", "bx", "cx"]}, "schema": "s string",
        "tests": [{"title": "match_on=any, one miss",
                   "in": {"column": "s", "regex_list": ["^a", "^b"]},
                   "out": {"success": False, "unexpected_count": 1}},
                  {"title": "match_on=all",
                   "in": {"column": "s", "regex_list": ["^a", "x$"],
                          "match_on": "all"},
                   "out": {"success": False, "unexpected_count": 2}}]}],
    "expect_column_values_to_not_match_regex_list": [{
        "data": {"s": ["a1", "b"]}, "schema": "s string",
        "tests": [{"title": "digit anywhere flagged",
                   "in": {"column": "s", "regex_list": ["\\d"]},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_be_increasing": [{
        "data": {"v": [1, 2, 3, 2, 5]}, "schema": "v int",
        "tests": [{"title": "one inversion in batch order",
                   "in": {"column": "v"},
                   "out": {"success": False, "unexpected_count": 1}},
                  {"title": "strictly flags the plateau",
                   "in": {"column": "v", "order_by": "v",
                          "strictly": True},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_be_decreasing": [{
        "data": {"v": [5, 4, 4, 1]}, "schema": "v int",
        "tests": [{"title": "non-strict tolerates the tie",
                   "in": {"column": "v"},
                   "out": {"success": True, "unexpected_count": 0}},
                  {"title": "strictly flags it",
                   "in": {"column": "v", "strictly": True},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_value_z_scores_to_be_less_than": [{
        "data": {"v": [0.0] * 9 + [20.0]}, "schema": "v double",
        "tests": [{"title": "outlier beyond 2 sigma flagged",
                   "in": {"column": "v", "threshold": 2,
                          "double_sided": True},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_distinct_values_to_be_in_set": [{
        "data": {"c": ["x", "y", "z"]}, "schema": "c string",
        "tests": [{"title": "stray member fails",
                   "in": {"column": "c", "value_set": ["x", "y"]},
                   "out": {"success": False}},
                  {"title": "subset passes",
                   "in": {"column": "c", "value_set": ["x", "y", "z", "w"]},
                   "out": {"success": True}}]}],
    "expect_column_distinct_values_to_equal_set": [{
        "data": {"c": ["x", "y", "y"]}, "schema": "c string",
        "tests": [{"title": "exact distinct set",
                   "in": {"column": "c", "value_set": ["y", "x"]},
                   "out": {"success": True}},
                  {"title": "missing member fails",
                   "in": {"column": "c", "value_set": ["x", "y", "z"]},
                   "out": {"success": False}}]}],
    "expect_column_most_common_value_to_be_in_set": [{
        "data": {"c": ["a", "a", "b"]}, "schema": "c string",
        "tests": [{"title": "mode membership",
                   "in": {"column": "c", "value_set": ["a"]},
                   "out": {"success": True}},
                  {"title": "mode outside set fails",
                   "in": {"column": "c", "value_set": ["b"]},
                   "out": {"success": False}}]}],
    "expect_column_proportion_of_unique_values_to_be_between": [{
        "data": {"v": [1, 2, 2, 3]}, "schema": "v int",
        "tests": [{"title": "3 distinct of 4 nonnull",
                   "in": {"column": "v", "min_value": 0.7,
                          "max_value": 0.8},
                   "out": {"success": True, "observed_value": 0.75}}]}],
    "expect_column_quantile_values_to_be_between": [{
        "data": {"v": [float(i) for i in range(1, 10)]},
        "schema": "v double",
        "tests": [{"title": "median in band (PERCENTILE_CONT)",
                   "in": {"column": "v",
                          "quantile_ranges": {
                              "quantiles": [0.5],
                              "value_ranges": [[4, 6]]}},
                   "out": {"success": True}},
                  {"title": "band miss fails",
                   "in": {"column": "v",
                          "quantile_ranges": {
                              "quantiles": [0.5],
                              "value_ranges": [[6, 7]]}},
                   "out": {"success": False}}]}],
    "expect_column_kl_divergence_to_be_less_than": [{
        "data": {"v": [0.5, 0.5, 1.5, 1.5]}, "schema": "v double",
        "tests": [{"title": "matching histogram, zero divergence",
                   "in": {"column": "v", "threshold": 0.1,
                          "partition_object": {"bins": [0, 1, 2],
                                               "weights": [0.5, 0.5]}},
                   "out": {"success": True, "observed_value": 0.0}},
                  {"title": "skewed histogram fails",
                   "in": {"column": "v", "threshold": 0.1,
                          "partition_object": {"bins": [0, 1, 2],
                                               "weights": [0.95, 0.05]}},
                   "out": {"success": False}}]}],
    "expect_column_psi_to_be_less_than": [{
        "data": {"v": [0.5, 0.5, 1.5, 1.5]}, "schema": "v double",
        "tests": [{"title": "matching histogram, zero PSI",
                   "in": {"column": "v", "threshold": 0.1,
                          "partition_object": {"bins": [0, 1, 2],
                                               "weights": [0.5, 0.5]}},
                   "out": {"success": True, "observed_value": 0.0}}]}],
    "expect_column_chisquare_test_p_value_to_be_greater_than": [{
        "data": {"c": ["a"] * 20 + ["b"] * 20}, "schema": "c string",
        "tests": [{"title": "uniform categories match 50/50",
                   "in": {"column": "c",
                          "partition_object": {"values": ["a", "b"],
                                               "weights": [0.5, 0.5]}},
                   "out": {"success": True}},
                  {"title": "95/5 expectation rejected",
                   "in": {"column": "c",
                          "partition_object": {"values": ["a", "b"],
                                               "weights": [0.95, 0.05]}},
                   "out": {"success": False}}]}],
    "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than": [{
        "data": {"v": [i / 10 + 0.05 for i in range(40)]},
        "schema": "v double",
        "tests": [{"title": "seeded bootstrap accepts matching uniform",
                   "in": {"column": "v",
                          "partition_object": {"bins": [0, 2, 4],
                                               "weights": [0.5, 0.5]},
                          "bootstrap_samples": 100, "seed": 7},
                   "out": {"success": True}}]}],
    "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than": [{
        "data": {"v": [(i + 0.5) / 50 for i in range(50)]},
        "schema": "v double",
        "tests": [{"title": "uniform(0,1) accepted",
                   "in": {"column": "v", "distribution": "uniform",
                          "params": {"loc": 0.0, "scale": 1.0}},
                   "out": {"success": True}},
                  {"title": "uniform(0,10) rejected",
                   "in": {"column": "v", "distribution": "uniform",
                          "params": {"loc": 0.0, "scale": 10.0}},
                   "out": {"success": False}}]}],
    "expect_column_pair_values_to_be_equal": [{
        "data": {"a": [1, 1], "b": [1, 2]}, "schema": "a int, b int",
        "tests": [{"title": "one unequal pair",
                   "in": {"column_A": "a", "column_B": "b"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_pair_values_to_be_in_set": [{
        "data": {"a": [1, 1], "b": [1, 2]}, "schema": "a int, b int",
        "tests": [{"title": "pair outside allowed set",
                   "in": {"column_A": "a", "column_B": "b",
                          "value_pairs_set": [[1, 1], [2, 2]]},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_select_column_values_to_be_unique_within_record": [{
        "data": {"a": [1, 3], "b": [2, 3]}, "schema": "a int, b int",
        "tests": [{"title": "intra-row duplicate flagged",
                   "in": {"column_list": ["a", "b"]},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_compound_columns_to_be_unique": [{
        "data": {"a": [1, 1, 1], "b": [1, 1, 2]}, "schema": "a int, b int",
        "tests": [{"title": "both members of the dup pair count",
                   "in": {"column_list": ["a", "b"]},
                   "out": {"success": False, "unexpected_count": 2}}]}],
    "expect_multicolumn_values_to_be_unique": [{
        "data": {"a": [1, 1, 2], "b": [1, 1, 2]}, "schema": "a int, b int",
        "tests": [{"title": "duplicated tuple flagged",
                   "in": {"column_list": ["a", "b"]},
                   "out": {"success": False, "unexpected_count": 2}}]}],
}


_AUDIO_SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
                 "codec string, transcript string")
_IMAGE_SCHEMA = ("img_id string, bytes binary, width int, height int, "
                 "channels int, format string")
_VIDEO_SCHEMA = ("vid_id string, bytes binary, n_frames int, fps double, "
                 "width int, height int, format string")


def _rows_to_data(rows: list[dict]) -> dict:
    return {k: [r[k] for r in rows] for k in rows[0]}


@functools.lru_cache(maxsize=None)
def _audio_rows():
    """Gallery clips from the in-repo codecs: payloads encoded from the
    SAME deterministic synthesis the SNR check re-derives, so a clean row
    passes every audio expectation and each violation is planted
    surgically.  Deterministic, so cached — five gallery builders each
    pull two rows from this six-clip set, and re-synthesizing per builder
    would triple the encode work of a registry sweep."""
    import numpy as np

    from .audio import encode_payload, ref_transcript, synth_pcm

    sr, dur = 8000, 100

    def clip(cid: str, **over) -> dict:
        pcm = synth_pcm(cid, sr, dur)
        row = dict(clip_id=cid, bytes=encode_payload(pcm, sr, "pcm_s16le"),
                   sr_hz=sr, dur_ms=dur, codec="pcm_s16le",
                   transcript=ref_transcript(cid))
        row.update(over)
        return row

    good = clip("diag_good")
    bad_sr = clip("diag_badsr", sr_hz=16000)  # header says 8000
    noise = clip("diag_noise", bytes=encode_payload(
        synth_pcm("some_other_clip", sr, dur), sr, "pcm_s16le"))
    bad_tr = clip("diag_badtr", transcript="wrong words entirely")
    hot = clip("diag_hot", bytes=encode_payload(
        np.clip(synth_pcm("diag_hot", sr, dur).astype(np.int32) * 12,
                -32768, 32767).astype(np.int16), sr, "pcm_s16le"))
    silent = clip("diag_silent", bytes=encode_payload(
        np.zeros(sr * dur // 1000, dtype=np.int16), sr, "pcm_s16le"))
    return dict(good=good, bad_sr=bad_sr, noise=noise, bad_tr=bad_tr,
                hot=hot, silent=silent)


def _audio_example(rows: list[dict], test: dict) -> list[dict]:
    return [{"data": _rows_to_data(rows), "schema": _AUDIO_SCHEMA,
             "tests": [test]}]


def _gallery_audio_metadata():
    r = _audio_rows()
    return _audio_example(
        [r["good"], r["bad_sr"]],
        {"title": "column sr disagrees with header",
         "in": {}, "out": {"success": False, "unexpected_count": 1}})


def _gallery_audio_snr():
    r = _audio_rows()
    return _audio_example(
        [r["good"], r["noise"]],
        {"title": "wrong content fails the 30 dB reference SNR",
         "in": {}, "out": {"success": False, "unexpected_count": 1}})


def _gallery_audio_transcript():
    r = _audio_rows()
    return _audio_example(
        [r["good"], r["bad_tr"]],
        {"title": "transcript != deterministic reference",
         "in": {}, "out": {"success": False, "unexpected_count": 1}})


def _gallery_audio_clipping():
    r = _audio_rows()
    return _audio_example(
        [r["good"], r["hot"]],
        {"title": "12x-gain clip exceeds the 1% rail ratio",
         "in": {}, "out": {"success": False, "unexpected_count": 1}})


def _gallery_audio_silence():
    r = _audio_rows()
    return _audio_example(
        [r["good"], r["silent"]],
        {"title": "all-zero payload is all silence frames",
         "in": {}, "out": {"success": False, "unexpected_count": 1}})


def _gallery_speaking_rate():
    # rate needs no payload decode, so plant the violation in the labels:
    # good = 100 ms clip with its ~short reference transcript; bad = same
    # transcript claimed to span 60 s -> cps far below min_cps.
    r = _audio_rows()
    slow = dict(r["good"], clip_id="diag_slow", dur_ms=120000)
    return _audio_example(
        [r["good"], slow],
        {"title": "a <=90-char transcript over 120 s is below 1 cps",
         "in": {"min_cps": 1.0, "max_cps": 1000.0},
         "out": {"success": False, "unexpected_count": 1}})


def _gallery_image_metadata():
    from .image import raw_encode, synth_image

    def row(iid: str, **over) -> dict:
        r = dict(img_id=iid, bytes=raw_encode(synth_image(iid, 8, 8, 3)),
                 width=8, height=8, channels=3, format="gxraw")
        r.update(over)
        return r

    rows = [row("i_good"), row("i_dims", width=16),
            dict(img_id="i_corrupt", bytes=b"not an image", width=8,
                 height=8, channels=3, format="gxraw")]
    return [{"data": _rows_to_data(rows), "schema": _IMAGE_SCHEMA,
             "tests": [{"title": "dims mismatch + corrupt payload flagged",
                        "in": {},
                        "out": {"success": False, "unexpected_count": 2}}]}]


def _gallery_image_intensity():
    from .image import raw_encode, synth_image

    px = synth_image("i_mean", 8, 8, 3)
    mean = float(px.mean())
    rows = [dict(img_id="i_mean", bytes=raw_encode(px), width=8, height=8,
                 channels=3, format="gxraw")]
    return [{"data": _rows_to_data(rows), "schema": _IMAGE_SCHEMA,
             "tests": [
                 {"title": "decoded mean inside band",
                  "in": {"min_value": mean - 1, "max_value": mean + 1},
                  "out": {"success": True, "unexpected_count": 0}},
                 {"title": "band above the mean flags the row",
                  "in": {"min_value": mean + 50},
                  "out": {"success": False, "unexpected_count": 1}}]}]


def _gallery_video_metadata():
    from .image import raw_encode, synth_image

    frames = [raw_encode(synth_image(f"vf{i}", 8, 8, 3)) for i in range(5)]
    payload = b"".join(frames)
    rows = [
        dict(vid_id="v_good", bytes=payload, n_frames=5, fps=10.0,
             width=8, height=8, format="gxraw_frames"),
        dict(vid_id="v_count", bytes=payload, n_frames=7, fps=10.0,
             width=8, height=8, format="gxraw_frames"),
    ]
    return [{"data": _rows_to_data(rows), "schema": _VIDEO_SCHEMA,
             "tests": [{"title": "frame-count mismatch flagged",
                        "in": {},
                        "out": {"success": False,
                                "unexpected_count": 1}}]}]


def _gallery_audio_payload_size():
    # decode-free screen: plant the violation in the container arithmetic
    # (truncate the payload) — the good row's length is exactly
    # 44 + 2 * (8000 * 100 / 1000).
    r = _audio_rows()
    short = dict(r["good"], clip_id="diag_short",
                 bytes=r["good"]["bytes"][:-7])
    return _audio_example(
        [r["good"], short],
        {"title": "7-byte truncation breaks 44 + 2n container arithmetic",
         "in": {}, "out": {"success": False, "unexpected_count": 1}})


@functools.lru_cache(maxsize=None)
def _pitch_rows():
    """Gallery clips for the pitch gates: a 150 Hz tone (every frame
    voiced, F0 on the adult-speech band), a 400 Hz tone (voiced but
    outside a [100, 300] band), and seeded white noise (unvoiced)."""
    import numpy as np

    from .audio import encode_payload

    sr, dur = 8000, 100
    n = sr * dur // 1000
    t = np.arange(n) / sr

    def clip(cid: str, pcm) -> dict:
        return dict(clip_id=cid, bytes=encode_payload(pcm, sr, "pcm_s16le"),
                    sr_hz=sr, dur_ms=dur, codec="pcm_s16le",
                    transcript="x")

    def tone(f: float):
        return np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)

    rng = np.random.default_rng(13)
    noise = np.clip(rng.normal(0, 0.2, n) * 32767, -32768, 32767).astype(
        np.int16)
    return dict(voiced=clip("diag_voiced", tone(150.0)),
                high=clip("diag_high_f0", tone(400.0)),
                noise=clip("diag_unvoiced", noise))


def _gallery_voiced_fraction():
    r = _pitch_rows()
    return _audio_example(
        [r["voiced"], r["noise"]],
        {"title": "white noise falls below 0.5 voiced fraction",
         "in": {"min_fraction": 0.5},
         "out": {"success": False, "unexpected_count": 1}})


def _gallery_pitch_between():
    r = _pitch_rows()
    return _audio_example(
        [r["voiced"], r["high"]],
        {"title": "400 Hz median F0 breaks the [100, 300] speech band",
         "in": {"min_hz": 100.0, "max_hz": 300.0},
         "out": {"success": False, "unexpected_count": 1}})


def _gallery_loudness():
    """A healthy-level 997 Hz tone (~-9 LUFS) vs a gain-bug-quiet one
    (~-43 LUFS): the quiet clip breaks a [-20, 0] LUFS delivery band.
    Clips are 500 ms so each spans at least one 400 ms gating block."""
    import numpy as np

    from .audio import encode_payload

    sr, dur = 8000, 500
    t = np.arange(sr * dur // 1000) / sr

    def clip(cid: str, amp: float) -> dict:
        pcm = np.rint(amp * 32767 * np.sin(2 * np.pi * 997.0 * t)).astype(
            np.int16)
        return dict(clip_id=cid, bytes=encode_payload(pcm, sr, "pcm_s16le"),
                    sr_hz=sr, dur_ms=dur, codec="pcm_s16le", transcript="x")

    return _audio_example(
        [clip("diag_level_ok", 0.5), clip("diag_too_quiet", 0.01)],
        {"title": "-43 LUFS clip breaks the [-20, 0] delivery band",
         "in": {"min_lufs": -20.0, "max_lufs": 0.0},
         "out": {"success": False, "unexpected_count": 1}})


def _gallery_channel_count():
    """A mono clip vs an interleaved stereo WAV: the stereo payload
    violates the default mono gate.  Decode-free — the expectation reads
    a few header bytes JVM-side (channel_count_expr)."""
    import numpy as np

    from .audio import encode_payload, wav_encode_multi

    sr = 8000
    tone = np.rint(
        0.3 * 32767 * np.sin(2 * np.pi * 440.0 * np.arange(800) / sr)
    ).astype(np.int16)
    mono = encode_payload(tone, sr, "pcm_s16le")
    stereo = wav_encode_multi(np.stack([tone, tone], axis=1), sr)
    return [{
        "data": {
            "clip_id": ["diag_mono", "diag_stereo"],
            "bytes": [bytearray(mono), bytearray(stereo)],
            "codec": ["pcm_s16le", "pcm_s16le"],
        },
        "schema": "clip_id string, bytes binary, codec string",
        "tests": [{
            "title": "a stereo payload violates the mono gate",
            "in": {"n_channels": 1},
            "out": {"success": False, "unexpected_count": 1},
        }],
    }]


#: Lazy builders for examples whose payloads come from the in-repo codecs
#: (numpy work happens only when diagnostics run).
def _electrical_rows():
    import numpy as np

    from .audio import encode_payload

    sr = 8000
    t = np.arange(sr * 400 // 1000) / sr
    tone = 0.3 * np.sin(2 * np.pi * 440.0 * t)
    hum = 0.15 * np.sin(2 * np.pi * 50.0 * t)

    def clip(cid, x, off=0.0):
        pcm = np.clip(np.rint((x + off) * 32767), -32768, 32767).astype(
            np.int16)
        return dict(clip_id=cid,
                    bytes=bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                    codec="pcm_s16le")

    return [clip("diag_clean", tone), clip("diag_dc", tone, off=0.1),
            clip("diag_hum", tone + hum)]


def _gallery_dc_offset():
    rows = _electrical_rows()
    return [{
        "data": {k: [r[k] for r in rows[:2]] for k in rows[0]},
        "schema": "clip_id string, bytes binary, codec string",
        "tests": [{
            "title": "a 10%-of-full-scale DC offset breaks the 2% gate",
            "in": {"max_frac": 0.02},
            "out": {"success": False, "unexpected_count": 1},
        }],
    }]


def _gallery_hum_ratio():
    rows = [_electrical_rows()[0], _electrical_rows()[2]]
    return [{
        "data": {k: [r[k] for r in rows] for k in rows[0]},
        "schema": "clip_id string, bytes binary, codec string",
        "tests": [{
            "title": "planted 50 Hz hum at 20% of AC power breaks the gate",
            "in": {"max_ratio": 0.01},
            "out": {"success": False, "unexpected_count": 1},
        }],
    }]


def _gallery_click_count():
    import numpy as np

    from .audio import encode_payload

    sr = 8000
    t = np.arange(sr * 400 // 1000) / sr
    tone = np.rint(0.3 * 32767 * np.sin(2 * np.pi * 440.0 * t)).astype(
        np.int16)
    clicked = tone.copy()
    for p in (500, 1200, 2100):
        clicked[p] = 32000 if clicked[p] < 0 else -32000
    rows = [
        dict(clip_id="diag_clean",
             bytes=bytearray(encode_payload(tone, sr, "pcm_s16le")),
             codec="pcm_s16le"),
        dict(clip_id="diag_clicked",
             bytes=bytearray(encode_payload(clicked, sr, "pcm_s16le")),
             codec="pcm_s16le"),
    ]
    return [{
        "data": {k: [r[k] for r in rows] for k in rows[0]},
        "schema": "clip_id string, bytes binary, codec string",
        "tests": [{
            "title": "three planted impulses break the any-click gate",
            "in": {"max_clicks": 1},
            "out": {"success": False, "unexpected_count": 1},
        }],
    }]


def _gallery_oov_rate():
    rows = [
        dict(clip_id="diag_in_lex", transcript="The cat sat, the DOG ran."),
        dict(clip_id="diag_oov", transcript="zzyx qwfp the grblt vohm"),
    ]
    return [{
        "data": {k: [r[k] for r in rows] for k in rows[0]},
        "schema": "clip_id string, transcript string",
        "tests": [{
            "title": "4/5 tokens outside the lexicon break the gate",
            "in": {"lexicon": ["the", "cat", "sat", "dog", "ran"],
                   "max_rate": 0.5},
            "out": {"success": False, "unexpected_count": 1},
        }],
    }]


GALLERY_EXAMPLE_BUILDERS: dict = {
    "expect_transcript_oov_rate_to_be_below": _gallery_oov_rate,
    "expect_audio_channel_count_to_equal": _gallery_channel_count,
    "expect_audio_click_count_to_be_below": _gallery_click_count,
    "expect_audio_dc_offset_to_be_below": _gallery_dc_offset,
    "expect_audio_hum_ratio_to_be_below": _gallery_hum_ratio,
    "expect_audio_loudness_to_be_between": _gallery_loudness,
    "expect_audio_voiced_fraction_to_be_between": _gallery_voiced_fraction,
    "expect_audio_pitch_to_be_between": _gallery_pitch_between,
    "expect_audio_metadata_to_be_consistent": _gallery_audio_metadata,
    "expect_audio_snr_to_be_at_least": _gallery_audio_snr,
    "expect_transcript_to_match_reference": _gallery_audio_transcript,
    "expect_audio_clipping_ratio_to_be_below": _gallery_audio_clipping,
    "expect_audio_silence_ratio_to_be_below": _gallery_audio_silence,
    "expect_speaking_rate_to_be_between": _gallery_speaking_rate,
    "expect_audio_payload_size_to_be_consistent": _gallery_audio_payload_size,
    "expect_image_metadata_to_be_consistent": _gallery_image_metadata,
    "expect_image_mean_intensity_to_be_between": _gallery_image_intensity,
    "expect_video_metadata_to_be_consistent": _gallery_video_metadata,
}


def _build_df(spark: SparkSession, data: dict, schema: str | None):
    cols = list(data)
    n = max((len(v) for v in data.values()), default=0)
    rows = [tuple(data[c][i] if i < len(data[c]) else None for c in cols)
            for i in range(n)]
    if schema:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows, cols)


def _check(title: str, passed: bool, details: str = "") -> dict:
    return {"check": title, "passed": bool(passed), "details": details}


def run_diagnostics(spark: SparkSession, expectation_type: str) -> dict:
    """Execute one expectation's registration/protocol/examples checklist.

    Returns {"expectation_type", "checklist": [{check, passed, details}],
    "examples_run", "examples_passed", "success"} — `success` means every
    applicable check passed (an expectation with no examples can still be
    'registered + protocol ok' but reports the missing-examples check as
    failed, mirroring the gallery's maturity gating)."""
    from .executor import validate

    checklist: list[dict] = []
    handler = None
    try:
        handler = get_expectation(expectation_type)
        checklist.append(_check("registered", True))
    except KeyError:
        checklist.append(_check("registered", False, "not in registry"))
    if handler is not None:
        checklist.append(_check(
            "plan protocol", callable(getattr(handler, "plan", None)),
            "handler.plan(ctx, cfg, index) missing or not callable"))
        import inspect

        # inspect.getdoc inherits: a handler documented by its base
        # protocol class (ColumnMapExpectation etc.) counts as documented
        doc = (inspect.getdoc(type(handler)) or "").strip()
        checklist.append(_check("docstring", bool(doc)))
    examples = (getattr(handler, "examples", None)
                or GALLERY_EXAMPLES.get(expectation_type))
    if not examples:
        builder = GALLERY_EXAMPLE_BUILDERS.get(expectation_type)
        examples = builder() if builder else []
    examples = list(examples)
    checklist.append(_check(
        "examples provided", bool(examples),
        "" if examples else "attach `examples` to the handler class"))

    run = passed = 0
    for ei, ex in enumerate(examples):
        try:
            df = _build_df(spark, ex.get("data", {}), ex.get("schema"))
            tables = {
                name: _build_df(spark, spec.get("data", {}),
                                spec.get("schema"))
                for name, spec in (ex.get("tables") or {}).items()
            } or None
        except Exception as e:  # noqa: BLE001 — reported, not raised
            checklist.append(_check(f"example[{ei}] data builds", False,
                                    repr(e)))
            continue
        for t in ex.get("tests", []):
            run += 1
            title = f"example[{ei}] test {t.get('title', run)!r}"
            try:
                suite = ExpectationSuite(f"diag_{expectation_type}").add(
                    expectation_type, **t.get("in", {}))
                bundle = validate(
                    spark, df, suite,
                    EngineOptions(collect_violations=False),
                    tables=tables)
                evr = bundle.suite_result.results[0]
            except Exception as e:  # noqa: BLE001
                checklist.append(_check(title, False, f"raised {e!r}"))
                continue
            want, got_details = t.get("out", {}), []
            ok = True
            if bool(evr.success) != bool(want.get("success", True)):
                ok = False
                got_details.append(f"success={evr.success}")
            for key in ("observed_value", "unexpected_count"):
                if key in want:
                    got = evr.result.get(key)
                    exp = want[key]
                    same = (round(float(got), 9) == round(float(exp), 9)
                            if isinstance(exp, (int, float))
                            and isinstance(got, (int, float))
                            else got == exp)
                    if not same:
                        ok = False
                        got_details.append(f"{key}={got!r} want {exp!r}")
            passed += ok
            checklist.append(_check(title, ok, "; ".join(got_details)))
    return {
        "expectation_type": expectation_type,
        "checklist": checklist,
        "examples_run": run,
        "examples_passed": passed,
        "success": all(c["passed"] for c in checklist),
    }


def run_diagnostics_all(spark: SparkSession) -> list[dict]:
    """Gallery sweep: diagnostics for every registered expectation type,
    sorted by name.  Types without examples report success=False on the
    examples check only — the summary separates 'healthy, example-covered'
    from 'registered but unexercised'."""
    return [run_diagnostics(spark, name) for name in sorted(_REGISTRY)]
