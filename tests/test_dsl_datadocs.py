"""GE mini-DSL condition parser + data-docs HTML sink."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite, validate  # noqa: E402
from gx_spark.row_conditions import DSLError, ge_condition_to_sql  # noqa: E402


@pytest.mark.parametrize("dsl,sql", [
    ('col("x") > 5', "`x` > 5"),
    ('col("x") == "a"', "`x` = 'a'"),
    ('col("x") != 3.5', "`x` <> 3.5"),
    ('col("my col") <= -2', "`my col` <= -2"),
    ('col("x").isNull()', "`x` IS NULL"),
    ('col("x").notNull()', "`x` IS NOT NULL"),
    ('col("x").isin([1, 2, 3])', "`x` IN (1, 2, 3)"),
    ('col("x") in ["a", "b"]', "`x` IN ('a', 'b')"),
    ('col("x") > 1 and col("y") < 2', "`x` > 1 AND `y` < 2"),
    ('col("x") > 1 or not col("y") == "z"', "`x` > 1 OR (NOT `y` = 'z')"),
    ('(col("a") > 0 and col("b") > 0) or col("c").isNull()',
     "(`a` > 0 AND `b` > 0) OR `c` IS NULL"),
    ("col('x') == None", "`x` IS NULL"),
])
def test_dsl_translation(dsl, sql):
    assert ge_condition_to_sql(dsl) == sql


@pytest.mark.parametrize("bad", [
    "x > 5",                     # bare identifier, not col("x")
    'col("x") >',                # missing literal
    'col("x") maybe 5',          # unknown operator
    'col("x").explode()',        # unknown method
    'DROP TABLE users',          # definitely not the dialect
])
def test_dsl_rejects_bad_input(bad):
    with pytest.raises(DSLError):
        ge_condition_to_sql(bad)


def test_ge_parser_row_condition_end_to_end(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", None), ("B", 2), ("B", None), ("B", 3)], "flag string, v int"
    )
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="v",
        row_condition='col("flag") == "B"',
        condition_parser="great_expectations",
    )
    b = validate(spark, df, suite, EngineOptions(collect_violations=False))
    r = b.suite_result.results[0]
    assert r.result["element_count"] == 3
    assert r.result["unexpected_count"] == 1
    # EVR reports the ORIGINAL (untranslated) configuration
    assert r.expectation_config.kwargs["row_condition"] == 'col("flag") == "B"'
    assert r.expectation_config.kwargs["condition_parser"] == "great_expectations"


def test_data_docs_site(spark, tmp_path):
    from gx_spark.datadocs import DataDocsSite

    df = spark.createDataFrame([(1,), (None,)], "v int")
    suite = (
        ExpectationSuite("docs_suite")
        .add("expect_column_values_to_not_be_null", column="v")
        .add("expect_column_values_to_not_be_null", column="missing")
    )
    bundle = validate(spark, df, suite, EngineOptions())
    site = DataDocsSite(str(tmp_path / "docs"))
    page = site.write_result(bundle.suite_result)
    html_text = open(page).read()
    assert "docs_suite" in html_text
    assert "FAIL" in html_text       # the null violation
    assert "ERROR" in html_text      # the missing-column exception EVR
    assert "expect_column_values_to_not_be_null" in html_text
    index = open(os.path.join(str(tmp_path / "docs"), "index.html")).read()
    assert "docs_suite" in index
    # second run replaces, index has both runs listed once each
    bundle2 = validate(spark, df, suite, EngineOptions())
    site.write_result(bundle2.suite_result)
    import json

    entries = json.load(open(os.path.join(str(tmp_path / "docs"), "index.json")))
    assert len(entries) == 2
    bundle.unpersist()
    bundle2.unpersist()
