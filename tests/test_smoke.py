"""End-to-end smoke: the minimum slice of SURVEY.md §7 step 1."""

from __future__ import annotations

from gx_spark import EngineOptions, ExpectationSuite, validate


def test_minimum_slice(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, None), (3, 30.0, "c"), (4, 40.0, "d")],
        "id int, x double, s string",
    )
    suite = (
        ExpectationSuite("smoke")
        .add("expect_table_row_count_to_be_between", min_value=1, max_value=10)
        .add("expect_column_mean_to_be_between", column="x", min_value=20, max_value=30)
        .add("expect_column_values_to_not_be_null", column="s", mostly=0.7)
        .add("expect_column_values_to_be_in_set", column="s", value_set=["a", "c", "d"])
        .add("expect_column_values_to_be_unique", column="id")
    )
    bundle = validate(
        spark, df, suite, EngineOptions(unexpected_index_column_names=("id",))
    )
    res = {r.expectation_config.expectation_type: r for r in bundle.suite_result.results}
    assert bundle.success, [r.to_dict() for r in bundle.suite_result.results]
    assert res["expect_table_row_count_to_be_between"].result["observed_value"] == 4
    assert res["expect_column_mean_to_be_between"].result["observed_value"] == 25.0
    nn = res["expect_column_values_to_not_be_null"].result
    assert nn["element_count"] == 4 and nn["unexpected_count"] == 1
    assert nn["unexpected_percent"] == 25.0  # denominator = all rows
    ins = res["expect_column_values_to_be_in_set"].result
    assert ins["unexpected_count"] == 0 and ins["missing_count"] == 1


def test_violations_and_mostly(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "zz"), (4, "y"), (4, "w")], "id int, s string"
    )
    suite = (
        ExpectationSuite("v")
        .add("expect_column_values_to_be_in_set", column="s", value_set=["x", "y", "w"])
        .add("expect_column_values_to_be_unique", column="id")
        .add("expect_column_value_lengths_to_equal", column="s", value=1, mostly=0.8)
    )
    bundle = validate(
        spark, df, suite, EngineOptions(unexpected_index_column_names=("id",))
    )
    res = bundle.suite_result.results
    assert res[0].success is False
    assert res[0].result["partial_unexpected_list"] == ["zz"]
    assert res[1].success is False
    assert res[1].result["unexpected_count"] == 2  # both rows with id=4
    assert res[2].success is True  # 4/5 = 0.8 >= mostly
    viol = bundle.violations.collect()
    types = sorted(v["expectation_type"] for v in viol)
    assert types.count("expect_column_values_to_be_unique") == 2
    assert types.count("expect_column_values_to_be_in_set") == 1
