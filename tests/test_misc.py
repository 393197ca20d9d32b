"""Splitters/samplers, interactive Validator dispatch, evaluation parameters,
query expectation, streaming adapter."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gx_spark import EngineOptions, ExpectationSuite  # noqa: E402
from gx_spark import sampling  # noqa: E402
from gx_spark.validator import Validator  # noqa: E402


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, i % 5, f"2024-0{1 + i % 3}-15", float(i)) for i in range(100)],
        "id long, grp int, d string, v double",
    ).withColumn("d", F.to_date("d"))


def test_splitters(spark, df):
    assert sampling.split_on_column_value(df, "grp", 3).count() == 20
    assert sampling.split_on_mod_integer(df, "id", 10, 7).count() == 10
    assert sampling.split_on_divided_integer(df, "id", 25, 1).count() == 25
    assert sampling.split_on_year_and_month(df, "d", 2024, 2).count() == 33
    assert sampling.split_values(df, "grp") == [0, 1, 2, 3, 4]
    total = sum(
        sampling.split_on_hashed_column(df, "id", 4, b).count() for b in range(4)
    )
    assert total == 100


def test_samplers(spark, df):
    assert sampling.sample_using_limit(df, 7).count() == 7
    assert sampling.sample_using_mod(df, "id", 4, 0).count() == 25
    assert sampling.sample_using_a_list(df, "grp", [0, 1]).count() == 40
    n = sampling.sample_using_random(df, 0.3, seed=1).count()
    assert 10 <= n <= 55  # probabilistic but seeded


def test_interactive_validator_and_eval_params(spark, df):
    v = Validator(
        spark, df, EngineOptions(collect_violations=False),
        evaluation_parameters={"max_id": 99},
    )
    r = v.expect_column_values_to_not_be_null(column="id")
    assert r.success
    r = v.expect_column_max_to_be_between(
        column="id", max_value={"$PARAMETER": "max_id"}
    )
    assert r.success and r.result["observed_value"] == 99
    r = v.expect_column_mean_to_be_between(column="v", min_value=1000)
    assert not r.success
    suite = v.get_expectation_suite()
    assert len(suite.expectations) == 3
    # resolved parameter is baked into the exported suite
    assert suite.expectations[1].kwargs["max_value"] == 99


def test_query_expectation(spark, df):
    from gx_spark import validate

    suite = ExpectationSuite("q").add(
        "expect_query_to_return_no_rows",
        query="SELECT * FROM batch WHERE v < 0",
    )
    b = validate(spark, df, suite)
    assert b.suite_result.results[0].success
    suite2 = ExpectationSuite("q2").add(
        "expect_query_to_return_no_rows",
        query="SELECT * FROM batch WHERE grp = 0",
    )
    b2 = validate(spark, df, suite2)
    assert not b2.suite_result.results[0].success
    assert b2.suite_result.results[0].result["observed_value"] == 20


def test_streaming_foreach_batch(spark, tmp_path, df):
    from gx_spark.streaming import validate_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    df.write.parquet(src)
    stream = spark.readStream.schema(
        "id long, grp int, d date, v double"
    ).parquet(src)
    suite = (
        ExpectationSuite("stream")
        .add("expect_column_values_to_not_be_null", column="id")
        .add("expect_column_values_to_be_between", column="grp", min_value=0,
             max_value=3)
    )
    q = validate_stream(stream, suite, out, EngineOptions(
        unexpected_index_column_names=("id",)
    ), checkpoint_location=chk)
    q.awaitTermination(120)
    results = spark.read.parquet(f"{out}/_validation_results")
    assert results.count() == 2
    viol = spark.read.parquet(f"{out}/_violations")
    assert viol.count() == 20  # grp==4 rows


# ---------------------------------------------------------------------------
# legacy V2 SparkDFDataset wrapper (SURVEY §3.3)
# ---------------------------------------------------------------------------


def test_sparkdf_dataset_v2_api(spark):
    from gx_spark import SparkDFDataset

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.0), (3, None, 9.0), (3, "c", 11.0)],
        "id long, name string, v double",
    )
    ds = SparkDFDataset(df)
    # positional column arg (the V2 calling convention)
    r = ds.expect_column_values_to_not_be_null("name")
    assert not r.success
    assert r.result["unexpected_count"] == 1
    r = ds.expect_column_values_to_be_between("v", 0, 100)
    assert r.success
    r = ds.expect_column_values_to_be_in_set("name", ["a", "b", "c"])
    assert r.success  # nulls excluded from the denominator
    r = ds.expect_column_values_to_be_unique("id")
    assert not r.success
    # .validate() re-runs the accumulated suite in one fused pass
    suite_result = ds.validate()
    assert len(suite_result.results) == 4
    assert [e.success for e in suite_result.results] == [False, True, True, False]
    # unknown attributes still raise
    import pytest as _pytest
    with _pytest.raises(AttributeError):
        ds.not_an_expectation


def test_type_matches_accepts_all_ddl_aliases():
    """Every Spark DDL alias must resolve to its DataType class — 'integer',
    'long', 'smallint', 'tinyint', and parameterized 'decimal(10,2)' used
    to fail against correctly-typed columns (review r5)."""
    from gx_spark.expectations.column_agg import _type_matches

    for actual, goods in {
        "IntegerType": ["int", "integer", "IntegerType"],
        "LongType": ["bigint", "long", "LongType"],
        "ShortType": ["smallint", "short"],
        "ByteType": ["tinyint", "byte"],
        "FloatType": ["float", "real"],
        "DecimalType": ["decimal", "decimal(10,2)", "numeric", "DecimalType"],
        "BooleanType": ["boolean", "bool"],
    }.items():
        for e in goods:
            assert _type_matches(actual, e), (actual, e)
    assert not _type_matches("IntegerType", "bigint")
    assert not _type_matches("LongType", "int")
    assert not _type_matches("StringType", "decimal(10,2)")


def test_be_of_type_ddl_alias_end_to_end(spark):
    from gx_spark import validate, EngineOptions, ExpectationSuite, ExpectationConfiguration

    df = spark.createDataFrame([(1, 2)], "a int, b bigint")
    suite = ExpectationSuite("t", [
        ExpectationConfiguration("expect_column_values_to_be_of_type",
                                 {"column": "a", "type_": "integer"}),
        ExpectationConfiguration("expect_column_values_to_be_of_type",
                                 {"column": "b", "type_": "long"}),
        ExpectationConfiguration("expect_column_values_to_be_of_type",
                                 {"column": "a", "type_": "long"}),
    ])
    b = validate(spark, df, suite, EngineOptions())
    assert [r.success for r in b.suite_result.results] == [True, True, False]
    b.unpersist()
