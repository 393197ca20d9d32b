"""CSV/JSON batch loaders + parse_strings_as_datetimes (VERDICT item 9)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark.table_provider import FileTableProvider, read_batch  # noqa: E402


def test_read_batch_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "data.csv")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id int, s string"
    ).coalesce(1).write.option("header", True).csv(p)
    df = read_batch(spark, p, "csv", header=True, inferSchema=True)
    assert df.count() == 3
    assert dict(df.dtypes)["id"] == "int"
    b = validate(spark, df,
                 ExpectationSuite("s").add("expect_column_values_to_not_be_null",
                                           column="s"),
                 EngineOptions(collect_violations=False))
    assert b.suite_result.results[0].result["unexpected_count"] == 1


def test_read_batch_json_and_bad_format(spark, tmp_path):
    p = str(tmp_path / "data.json")
    spark.createDataFrame([(1, "x")], "id long, s string").coalesce(1).write.json(p)
    df = read_batch(spark, p, "json")
    assert df.count() == 1
    with pytest.raises(ValueError):
        read_batch(spark, p, "xml")
    # avro is a supported format now, but routes through the stdlib OCF
    # reader: pointing it at a json dir fails fast on the file scan
    with pytest.raises(FileNotFoundError):
        read_batch(spark, p, "avro")
    # and the stdlib route refuses schema/options rather than ignore them
    with pytest.raises(ValueError):
        read_batch(spark, p, "avro", header="true")


def test_file_table_provider_checkpoint_csv(spark, tmp_path):
    from gx_spark.checkpoint import CheckpointRunner

    src = str(tmp_path / "tbl_csv")
    spark.range(40).select(
        F.col("id"), (F.col("id") % 2).alias("part_id")
    ).coalesce(1).write.option("header", True).partitionBy("part_id").csv(src)
    provider = FileTableProvider(src, format="csv", header=True, inferSchema=True)
    runner = CheckpointRunner(
        spark, ExpectationSuite("s").add("expect_column_values_to_not_be_null",
                                         column="id"),
        provider, str(tmp_path / "out"), options=EngineOptions(),
    )
    res = runner.run()
    assert sorted(res.validated_partitions) == [0, 1]
    assert runner.results().count() == 2


def test_in_set_parse_strings_as_datetimes(spark):
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-01 00:00:00",), ("01/02/2024",), ("nope",)],
        "d string",
    )
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_in_set", column="d",
        value_set=["2024-01-01", "2024-01-02"],
        parse_strings_as_datetimes=True,
    )
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    r = b.suite_result.results[0].result
    # '2024-01-01' and its midnight-timestamp spelling both match;
    # '01/02/2024' is not ISO-parseable BY SPARK (cast fails) -> unexpected;
    # 'nope' unparseable -> unexpected
    assert r["unexpected_count"] == 2


def test_between_parse_strings_as_datetimes(spark):
    df = spark.createDataFrame(
        [("2024-03-15",), ("2023-01-01",), ("2024-12-31",), ("garbage",)],
        "d string",
    )
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between", column="d",
        min_value="2024-01-01", max_value="2024-06-30",
        parse_strings_as_datetimes=True,
    )
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    assert b.suite_result.results[0].result["unexpected_count"] == 3


def test_pair_greater_parse_strings_as_datetimes(spark):
    df = spark.createDataFrame(
        [("2024-05-02", "2024-05-01"), ("2024-05-01", "2024-05-02")],
        "a string, b string",
    )
    suite = ExpectationSuite("s").add(
        "expect_column_pair_values_a_to_be_greater_than_b",
        column_A="a", column_B="b", parse_strings_as_datetimes=True,
    )
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    assert b.suite_result.results[0].result["unexpected_count"] == 1
