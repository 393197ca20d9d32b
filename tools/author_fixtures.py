"""One-time authoring of the GE-format JSON fixture corpus (FIXTURES.md §2).

The reference mount was empty at survey time, so these representative cases
are re-authored by hand in the upstream tests/test_definitions/ format with
hand-computed expected outputs.  Run: python tools/author_fixtures.py
"""

from __future__ import annotations

import json
import math
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

# shared mini-dataset (FIXTURES.md §2, mirroring upstream style)
D = {
    "data": {
        "w": [1, 2, 3, 4, 5, 5, 4, 3, 2, 1],
        "x": [2, 3, 4, 5, 6, 7, 8, 9, None, None],
        "y": [1, 1, 1, 2, 2, 2, 3, 3, 3, 4],
        "z": ["a", "b", "c", "d", "e", None, None, None, None, None],
        "zz": ["1/1/2016", "1/2/2016", "2/2/2016", "2/2/2016", "3/1/2016",
               None, None, None, None, None],
        "s": ["cat", "Cat", "dog", "DOG", "fish", "fish", None, None, None, None],
    },
    "schemas": {"spark": {"w": "IntegerType", "x": "IntegerType", "y": "IntegerType",
                          "z": "StringType", "zz": "StringType", "s": "StringType"}},
}

PAIR = {
    "data": {"a": [1, 2, 3, 4, None], "b": [1, 2, 9, None, None]},
    "schemas": {"spark": {"a": "IntegerType", "b": "IntegerType"}},
}

TRIPLE = {
    "data": {"a": [1, 2, 5], "b": [2, 3, 5], "c": [7, 5, 1]},
    "schemas": {"spark": {"a": "IntegerType", "b": "IntegerType", "c": "IntegerType"}},
}

COMPOUND = {
    "data": {"a": [1, 1, 2, 2], "b": [1, 1, 2, 3]},
    "schemas": {"spark": {"a": "IntegerType", "b": "IntegerType"}},
}

JSONDS = {
    "data": {"j": ['{"a": 1}', "[1, 2]", "not json", "3", None]},
    "schemas": {"spark": {"j": "StringType"}},
}

TABLE_DS = {
    "data": {"a": [1, 2], "b": ["u", "v"], "_id": [0, 1]},
    "schemas": {"spark": {"a": "IntegerType", "b": "StringType", "_id": "IntegerType"}},
}


def T(title, _in, out):
    return {"title": title, "exact_match_out": False, "in": _in, "out": out}


CORPUS: dict[str, list] = {
    "expect_column_values_to_not_be_null": [
        (D, [
            T("fail_half_null", {"column": "z"},
              {"success": False, "element_count": 10, "unexpected_count": 5,
               "unexpected_index_list": [5, 6, 7, 8, 9]}),
            T("mostly_boundary_pass", {"column": "z", "mostly": 0.5}, {"success": True}),
            T("mostly_above_boundary_fail", {"column": "z", "mostly": 0.51},
              {"success": False}),
            T("two_nulls_mostly_pass", {"column": "x", "mostly": 0.8},
              {"success": True, "unexpected_count": 2, "unexpected_percent": 20.0}),
        ]),
    ],
    "expect_column_values_to_be_null": [
        (D, [
            T("mostly_pass", {"column": "z", "mostly": 0.5},
              {"success": True, "unexpected_count": 5}),
            T("vanilla_fail", {"column": "w"}, {"success": False, "unexpected_count": 10}),
        ]),
    ],
    "expect_column_values_to_be_in_set": [
        (D, [
            T("vanilla_pass", {"column": "w", "value_set": [1, 2, 3, 4, 5]},
              {"success": True, "unexpected_count": 0}),
            T("vanilla_fail", {"column": "w", "value_set": [1, 2, 3]},
              {"success": False, "unexpected_count": 4,
               "unexpected_list": [4, 5, 5, 4], "unexpected_index_list": [3, 4, 5, 6]}),
            T("mostly_boundary", {"column": "w", "value_set": [1, 2, 3], "mostly": 0.6},
              {"success": True}),
            T("mostly_fail", {"column": "w", "value_set": [1, 2, 3], "mostly": 0.7},
              {"success": False}),
            T("nulls_excluded", {"column": "z", "value_set": ["a", "b", "c", "d", "e"]},
              {"success": True, "element_count": 10, "missing_count": 5,
               "unexpected_count": 0}),
            T("row_condition_domain",
              {"column": "w", "value_set": [1, 2, 3], "row_condition": "w <= 3"},
              {"success": True, "element_count": 6, "unexpected_count": 0}),
        ]),
    ],
    "expect_column_values_to_not_be_in_set": [
        (D, [
            T("vanilla_fail", {"column": "s", "value_set": ["fish"]},
              {"success": False, "unexpected_count": 2, "unexpected_index_list": [4, 5]}),
            T("vanilla_pass", {"column": "s", "value_set": ["bird"]}, {"success": True}),
        ]),
    ],
    "expect_column_values_to_be_between": [
        (D, [
            T("vanilla_pass", {"column": "w", "min_value": 1, "max_value": 5},
              {"success": True}),
            T("min_cuts_two", {"column": "w", "min_value": 2, "max_value": 5},
              {"success": False, "unexpected_count": 2, "unexpected_index_list": [0, 9]}),
            T("mostly_pass", {"column": "w", "min_value": 2, "max_value": 5, "mostly": 0.8},
              {"success": True}),
            T("strict_max", {"column": "w", "min_value": 1, "max_value": 5,
                             "strict_max": True},
              {"success": False, "unexpected_count": 2, "unexpected_index_list": [4, 5]}),
            T("nulls_excluded", {"column": "x", "min_value": 2, "max_value": 9},
              {"success": True, "missing_count": 2, "unexpected_count": 0}),
            T("open_ended_min_only", {"column": "x", "min_value": 2}, {"success": True}),
        ]),
    ],
    "expect_column_values_to_match_regex": [
        (D, [
            T("vanilla_pass", {"column": "z", "regex": "^[a-e]$"},
              {"success": True, "unexpected_count": 0}),
            T("case_fail", {"column": "s", "regex": "^[a-z]+$"},
              {"success": False, "unexpected_count": 2,
               "unexpected_list": ["Cat", "DOG"], "unexpected_index_list": [1, 3]}),
            T("mostly_boundary", {"column": "s", "regex": "^[a-z]+$", "mostly": 0.66},
              {"success": True}),
            T("mostly_fail", {"column": "s", "regex": "^[a-z]+$", "mostly": 0.67},
              {"success": False}),
        ]),
    ],
    "expect_column_values_to_not_match_regex": [
        (D, [
            T("vanilla", {"column": "s", "regex": "^[A-Z]+$"},
              {"success": False, "unexpected_count": 1, "unexpected_list": ["DOG"]}),
        ]),
    ],
    "expect_column_values_to_match_regex_list": [
        (D, [
            T("any_pass", {"column": "z", "regex_list": ["^[a-c]$", "^[d-e]$"],
                           "match_on": "any"},
              {"success": True, "unexpected_count": 0}),
            T("all_fail", {"column": "z", "regex_list": ["^[a-c]$", "^[d-e]$"],
                           "match_on": "all"},
              {"success": False, "unexpected_count": 5}),
        ]),
    ],
    "expect_column_values_to_match_like_pattern": [
        (D, [
            T("single_char", {"column": "z", "like_pattern": "_"},
              {"success": True, "unexpected_count": 0}),
            T("substring_fail", {"column": "s", "like_pattern": "%is%"},
              {"success": False, "unexpected_count": 4}),
        ]),
    ],
    "expect_column_values_to_not_match_like_pattern": [
        (D, [
            T("prefix", {"column": "z", "like_pattern": "a%"},
              {"success": False, "unexpected_count": 1, "unexpected_index_list": [0]}),
        ]),
    ],
    "expect_column_value_lengths_to_be_between": [
        (D, [
            T("vanilla_pass", {"column": "s", "min_value": 3, "max_value": 4},
              {"success": True, "unexpected_count": 0}),
            T("max_3_fail", {"column": "s", "min_value": 1, "max_value": 3},
              {"success": False, "unexpected_count": 2,
               "unexpected_list": ["fish", "fish"]}),
        ]),
    ],
    "expect_column_value_lengths_to_equal": [
        (D, [
            T("vanilla_pass", {"column": "z", "value": 1}, {"success": True}),
            T("vanilla_fail", {"column": "s", "value": 3},
              {"success": False, "unexpected_count": 2}),
        ]),
    ],
    "expect_column_values_to_match_strftime_format": [
        (D, [
            T("mdY_pass", {"column": "zz", "strftime_format": "%m/%d/%Y"},
              {"success": True, "unexpected_count": 0, "missing_count": 5}),
            T("iso_fail", {"column": "zz", "strftime_format": "%Y-%m-%d"},
              {"success": False, "unexpected_count": 5}),
        ]),
    ],
    "expect_column_values_to_be_dateutil_parseable": [
        (D, [
            T("mdY_parseable", {"column": "zz"}, {"success": True, "unexpected_count": 0}),
            T("words_not_parseable", {"column": "s"},
              {"success": False, "unexpected_count": 6}),
        ]),
    ],
    "expect_column_values_to_be_json_parseable": [
        (JSONDS, [
            T("vanilla", {"column": "j"},
              {"success": False, "unexpected_count": 1, "unexpected_index_list": [2]}),
            T("mostly", {"column": "j", "mostly": 0.75}, {"success": True}),
        ]),
    ],
    "expect_column_values_to_match_json_schema": [
        (JSONDS, [
            T("type_object", {"column": "j", "json_schema": {"type": "object"}},
              {"success": False, "unexpected_count": 3}),
            T("required_property",
              {"column": "j", "json_schema": {"type": "object", "required": ["a"],
                                              "properties": {"a": {"type": "integer"}}}},
              {"success": False, "unexpected_count": 3,
               "unexpected_index_list": [1, 2, 3]}),
        ]),
    ],
    "expect_column_values_to_be_unique": [
        (D, [
            T("all_dup_fail", {"column": "w"}, {"success": False, "unexpected_count": 10}),
            T("partial_dup", {"column": "y"}, {"success": False, "unexpected_count": 9}),
            T("unique_pass", {"column": "z"}, {"success": True, "unexpected_count": 0}),
            T("nulls_excluded_mostly", {"column": "s", "mostly": 0.66},
              {"success": True, "unexpected_count": 2,
               "unexpected_list": ["fish", "fish"]}),
        ]),
    ],
    "expect_column_values_to_be_increasing": [
        (D, [
            T("nonstrict_pass", {"column": "y"}, {"success": True, "unexpected_count": 0}),
            T("strict_fail", {"column": "y", "strictly": True},
              {"success": False, "unexpected_count": 6}),
            T("not_monotonic", {"column": "w"}, {"success": False, "unexpected_count": 4}),
        ]),
    ],
    "expect_column_values_to_be_decreasing": [
        (D, [
            T("vanilla_fail", {"column": "y"}, {"success": False, "unexpected_count": 3}),
        ]),
    ],
    "expect_column_value_z_scores_to_be_less_than": [
        (D, [
            T("threshold_2_pass", {"column": "y", "threshold": 2, "double_sided": True},
              {"success": True, "unexpected_count": 0}),
            T("threshold_15_fail", {"column": "y", "threshold": 1.5, "double_sided": True},
              {"success": False, "unexpected_count": 1, "unexpected_index_list": [9]}),
            T("threshold_15_mostly", {"column": "y", "threshold": 1.5,
                                      "double_sided": True, "mostly": 0.9},
              {"success": True}),
        ]),
    ],
    "expect_column_mean_to_be_between": [
        (D, [
            T("vanilla_pass", {"column": "x", "min_value": 5, "max_value": 6},
              {"success": True, "observed_value": 5.5}),
            T("strict_min_boundary_fail", {"column": "x", "min_value": 5.5,
                                           "strict_min": True},
              {"success": False}),
            T("open_ended", {"column": "x", "min_value": 5}, {"success": True}),
        ]),
    ],
    "expect_column_median_to_be_between": [
        (D, [
            T("even_interpolated", {"column": "x", "min_value": 5.5, "max_value": 5.5},
              {"success": True, "observed_value": 5.5}),
            T("vanilla_w", {"column": "w", "min_value": 3, "max_value": 3},
              {"success": True, "observed_value": 3.0}),
        ]),
    ],
    "expect_column_stdev_to_be_between": [
        (D, [
            T("sample_stdev", {"column": "x", "min_value": 2.4, "max_value": 2.5},
              {"success": True, "observed_value": math.sqrt(6)}),
        ]),
    ],
    "expect_column_min_to_be_between": [
        (D, [
            T("vanilla", {"column": "x", "min_value": 1, "max_value": 2},
              {"success": True, "observed_value": 2}),
            T("strict_fail", {"column": "x", "min_value": 2, "strict_min": True},
              {"success": False}),
        ]),
    ],
    "expect_column_max_to_be_between": [
        (D, [
            T("vanilla", {"column": "x", "min_value": 9, "max_value": 9},
              {"success": True, "observed_value": 9}),
        ]),
    ],
    "expect_column_sum_to_be_between": [
        (D, [
            T("vanilla", {"column": "w", "min_value": 30, "max_value": 30},
              {"success": True, "observed_value": 30}),
        ]),
    ],
    "expect_column_quantile_values_to_be_between": [
        (D, [
            T("w_quantiles", {"column": "w", "quantile_ranges": {
                "quantiles": [0.0, 0.5, 1.0],
                "value_ranges": [[0, 1], [2, 4], [5, 5]]}},
              {"success": True,
               "observed_value": {"quantiles": [0.0, 0.5, 1.0],
                                  "values": [1.0, 3.0, 5.0]}}),
            T("x_interpolated", {"column": "x", "quantile_ranges": {
                "quantiles": [0.25, 0.75],
                "value_ranges": [[3.75, 3.75], [7.25, 7.25]]}},
              {"success": True}),
            T("range_fail", {"column": "w", "quantile_ranges": {
                "quantiles": [0.5], "value_ranges": [[4, 5]]}},
              {"success": False}),
        ]),
    ],
    "expect_column_unique_value_count_to_be_between": [
        (D, [
            T("s_five_distinct", {"column": "s", "min_value": 5, "max_value": 5},
              {"success": True, "observed_value": 5}),
            T("y_four", {"column": "y", "min_value": 4, "max_value": 4},
              {"success": True, "observed_value": 4}),
        ]),
    ],
    "expect_column_proportion_of_unique_values_to_be_between": [
        (D, [
            T("y_04", {"column": "y", "min_value": 0.4, "max_value": 0.4},
              {"success": True, "observed_value": 0.4}),
            T("s_5_of_6", {"column": "s", "min_value": 0.83, "max_value": 0.84},
              {"success": True}),
        ]),
    ],
    "expect_column_distinct_values_to_be_in_set": [
        (D, [
            T("subset_pass", {"column": "y", "value_set": [1, 2, 3, 4, 5]},
              {"success": True, "observed_value": [1, 2, 3, 4]}),
            T("subset_fail", {"column": "y", "value_set": [1, 2, 3]}, {"success": False}),
        ]),
    ],
    "expect_column_distinct_values_to_contain_set": [
        (D, [
            T("contains_pass", {"column": "y", "value_set": [1, 4]}, {"success": True}),
            T("contains_fail", {"column": "y", "value_set": [1, 5]}, {"success": False}),
        ]),
    ],
    "expect_column_distinct_values_to_equal_set": [
        (D, [
            T("equal_pass", {"column": "y", "value_set": [1, 2, 3, 4]}, {"success": True}),
            T("equal_fail", {"column": "y", "value_set": [1, 2, 3]}, {"success": False}),
        ]),
    ],
    "expect_column_most_common_value_to_be_in_set": [
        (D, [
            T("ties_okay_pass", {"column": "y", "value_set": [1], "ties_okay": True},
              {"success": True, "observed_value": [1, 2, 3]}),
            T("all_modes_pass", {"column": "y", "value_set": [1, 2, 3]},
              {"success": True}),
            T("no_ties_fail", {"column": "y", "value_set": [1]}, {"success": False}),
        ]),
    ],
    "expect_column_values_to_be_of_type": [
        (D, [
            T("int_pass", {"column": "w", "type_": "IntegerType"},
              {"success": True, "observed_value": "IntegerType"}),
            T("wrong_fail", {"column": "w", "type_": "StringType"}, {"success": False}),
        ]),
    ],
    "expect_column_values_to_be_in_type_list": [
        (D, [
            T("list_pass", {"column": "w", "type_list": ["IntegerType", "LongType"]},
              {"success": True}),
        ]),
    ],
    "expect_column_pair_values_to_be_equal": [
        (PAIR, [
            T("default_ignore_both_missing", {"column_A": "a", "column_B": "b"},
              {"success": False, "element_count": 5, "unexpected_count": 2,
               "unexpected_index_list": [2, 3]}),
            T("ignore_either_missing",
              {"column_A": "a", "column_B": "b", "ignore_row_if": "either_value_is_missing"},
              {"success": False, "unexpected_count": 1, "unexpected_index_list": [2]}),
            T("mostly", {"column_A": "a", "column_B": "b",
                         "ignore_row_if": "either_value_is_missing", "mostly": 0.6},
              {"success": True}),
        ]),
    ],
    "expect_column_pair_values_a_to_be_greater_than_b": [
        (PAIR, [
            T("vanilla_fail", {"column_A": "a", "column_B": "b"},
              {"success": False, "unexpected_count": 3}),
            T("or_equal", {"column_A": "a", "column_B": "b", "or_equal": True},
              {"success": False, "unexpected_count": 1, "unexpected_index_list": [2]}),
        ]),
    ],
    "expect_column_pair_values_to_be_in_set": [
        (PAIR, [
            T("vanilla", {"column_A": "a", "column_B": "b",
                          "value_pairs_set": [[1, 1], [2, 2]]},
              {"success": False, "unexpected_count": 2}),
        ]),
    ],
    "expect_multicolumn_sum_to_equal": [
        (TRIPLE, [
            T("vanilla", {"column_list": ["a", "b", "c"], "sum_total": 10},
              {"success": False, "unexpected_count": 1, "unexpected_index_list": [2]}),
            T("mostly", {"column_list": ["a", "b", "c"], "sum_total": 10, "mostly": 0.6},
              {"success": True}),
        ]),
    ],
    "expect_select_column_values_to_be_unique_within_record": [
        (TRIPLE, [
            T("vanilla", {"column_list": ["a", "b", "c"]},
              {"success": False, "unexpected_count": 1, "unexpected_index_list": [2]}),
        ]),
    ],
    "expect_compound_columns_to_be_unique": [
        (COMPOUND, [
            T("vanilla", {"column_list": ["a", "b"]},
              {"success": False, "unexpected_count": 2,
               "unexpected_index_list": [0, 1]}),
        ]),
    ],
    "expect_table_row_count_to_be_between": [
        (D, [
            T("vanilla", {"min_value": 10, "max_value": 10},
              {"success": True, "observed_value": 10}),
            T("row_condition", {"min_value": 6, "max_value": 6,
                                "row_condition": "w <= 3"}, {"success": True}),
        ]),
    ],
    "expect_table_row_count_to_equal": [
        (D, [
            T("vanilla", {"value": 10}, {"success": True, "observed_value": 10}),
            T("fail", {"value": 11}, {"success": False}),
        ]),
    ],
    "expect_table_column_count_to_equal": [
        (TABLE_DS, [T("vanilla", {"value": 3}, {"success": True, "observed_value": 3})]),
    ],
    "expect_table_column_count_to_be_between": [
        (TABLE_DS, [T("vanilla", {"min_value": 1, "max_value": 5}, {"success": True})]),
    ],
    "expect_table_columns_to_match_ordered_list": [
        (TABLE_DS, [
            T("vanilla", {"column_list": ["a", "b", "_id"]}, {"success": True}),
            T("order_matters", {"column_list": ["b", "a", "_id"]}, {"success": False}),
        ]),
    ],
    "expect_table_columns_to_match_set": [
        (TABLE_DS, [
            T("exact", {"column_set": ["b", "a", "_id"]}, {"success": True}),
            T("subset_ok", {"column_set": ["a"], "exact_match": False},
              {"success": True}),
            T("exact_fail", {"column_set": ["a"]}, {"success": False}),
        ]),
    ],
    "expect_column_to_exist": [
        (D, [
            T("exists", {"column": "w"}, {"success": True}),
            T("missing", {"column": "nope"}, {"success": False}),
        ]),
    ],
    "expect_column_kl_divergence_to_be_less_than": [
        (D, [
            T("continuous_pass", {"column": "w", "partition_object": {
                "bins": [0, 2, 4, 6], "weights": [0.4, 0.4, 0.2]}, "threshold": 0.2},
              {"success": True, "observed_value": 0.13862943611198905}),
            T("continuous_fail", {"column": "w", "partition_object": {
                "bins": [0, 2, 4, 6], "weights": [0.4, 0.4, 0.2]}, "threshold": 0.1},
              {"success": False}),
            T("tail_mass_no_holdout_inf", {"column": "w", "partition_object": {
                "bins": [2, 4], "weights": [1.0]}, "threshold": 10},
              {"success": False}),
            T("tail_weight_holdout_exact", {"column": "w", "partition_object": {
                "bins": [2, 4], "weights": [1.0]}, "threshold": 0.001,
                "tail_weight_holdout": 0.4},
              {"success": True, "observed_value": 0.0}),
            T("categorical_unlisted_inf", {"column": "y", "partition_object": {
                "values": [1, 2, 3], "weights": [0.3, 0.3, 0.4]}, "threshold": 10},
              {"success": False}),
            T("categorical_holdout", {"column": "y", "partition_object": {
                "values": [1, 2, 3], "weights": [0.3, 0.3, 0.4]}, "threshold": 0.01,
                "tail_weight_holdout": 0.1},
              {"success": True, "observed_value": 0.008519842829741668}),
        ]),
    ],
    "expect_column_psi_to_be_less_than": [
        (D, [
            T("psi_pass", {"column": "w", "partition_object": {
                "bins": [0, 2, 4, 6], "weights": [0.4, 0.4, 0.2]}, "threshold": 0.3},
              {"success": True, "observed_value": 0.2772588722239781}),
            T("psi_fail", {"column": "w", "partition_object": {
                "bins": [0, 2, 4, 6], "weights": [0.4, 0.4, 0.2]}, "threshold": 0.2},
              {"success": False}),
        ]),
    ],
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for etype, datasets in CORPUS.items():
        spec = {
            "expectation_type": etype,
            "datasets": [
                {"data": ds["data"], "schemas": ds["schemas"], "tests": tests}
                for ds, tests in datasets
            ],
        }
        with open(f"{OUT}/{etype}.json", "w") as f:
            json.dump(spec, f, indent=1)
    print(f"wrote {len(CORPUS)} fixture files to {OUT}")


if __name__ == "__main__":
    main()
