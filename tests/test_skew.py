"""Key-salting (gx_spark/skew.py): exact equivalence to the unsalted plans
on a deliberately skewed key distribution, plus the salted referential path.

Skew shape: one hot key carries 50% of the rows (the classic hotspot a
shuffled join/collect cannot survive at 10^12 scale without salting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gx_spark import ExpectationSuite, validate
from gx_spark import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 20_000 rows: key "hot" on even ids (50%), else k<id mod 97>
    left = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key"),
        (F.col("id") % 1000).alias("val"),
    )
    # right: keys k0..k79 plus "hot" — so k80..k96 are unmatched on the left
    right = spark.range(81).select(
        F.when(F.col("id") == 80, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("key"),
        (F.col("id") * 10).alias("rv"),
    )
    return left.persist(), right.persist()


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(skewed, how):
    left, right = skewed
    plain = left.join(right, on="key", how=how)
    salted = skew.salted_join(left, right, on="key", how=how, buckets=8)
    cols = plain.columns
    assert salted.columns == cols
    assert _canon(salted, cols) == _canon(plain, cols)


def test_salted_join_rejects_right_sided(skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        skew.salted_join(left, right, on="key", how="right")
    with pytest.raises(ValueError):
        skew.salted_join(left, right, on="key", how="full_outer")


def test_salt_in_join_plan(skewed):
    """The shuffle actually happens on (key, salt): the salt column must be
    present in the physical plan's join keys."""
    left, right = skewed
    plan = (
        skew.salted_join(left, right, on="key", how="left_anti", buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "__gx_salt" in plan


def test_salted_groupby_collect_matches_plain(skewed):
    left, _ = skewed
    plain = left.groupBy("key").agg(
        F.sort_array(F.collect_set("val")).alias("vals")
    )
    salted = skew.salted_groupby_collect(
        left, ["key"], {"val": "vals"}, buckets=8
    ).select("key", F.sort_array("vals").alias("vals"))
    assert _canon(salted, ["key", "vals"]) == _canon(plain, ["key", "vals"])


def test_salted_anti_keys(skewed):
    left, right = skewed
    missing = skew.salted_anti_keys(left, "key", right, "key", buckets=8)
    got = sorted(r[0] for r in missing.collect())
    assert got == sorted(f"k{i}" for i in range(80, 97))


def test_referential_salted_matches_broadcast(spark):
    # orders-like fact with skew (custkey 1 = half the rows) + 3 orphan keys
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise((F.col("id") % 50) + 1)
        .alias("fk")
    )
    orphans = spark.range(3).select((F.col("id") + 1000).alias("fk"))
    fact = fact.unionAll(orphans).unionAll(orphans)  # 6 orphan rows, 3 keys
    dim = spark.range(50).select((F.col("id") + 1).alias("pk"))
    suite_b = ExpectationSuite("b").add(
        "expect_column_values_to_exist_in_table",
        column="fk", other_table_name="dim", other_column="pk",
    )
    suite_s = ExpectationSuite("s").add(
        "expect_column_values_to_exist_in_table",
        column="fk", other_table_name="dim", other_column="pk",
        dim_strategy="salted", salt_buckets=8,
    )
    rb = validate(spark, fact, suite_b, tables={"dim": dim}).suite_result.results
    rs = validate(spark, fact, suite_s, tables={"dim": dim}).suite_result.results
    assert rb[0].result["unexpected_count"] == 6
    assert rs[0].result["unexpected_count"] == 6
    assert rb[0].success is False and rs[0].success is False


def test_aqe_confs_documented():
    assert skew.AQE_SKEW_CONFS["spark.sql.adaptive.skewJoin.enabled"] == "true"


def test_binary_scan_defaults_append_existing_jvm_opts():
    """binary_scan_session_defaults must APPEND the GC flag to
    driver.extraJavaOptions already set on the builder, not overwrite them
    (overwriting silently drops user heap/tmpdir/GC-logging flags)."""
    from pyspark.sql import SparkSession

    from gx_spark.skew import BINARY_SCAN_JVM_OPTS, binary_scan_session_defaults

    b = SparkSession.builder.config(
        "spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp/x -Xss4m")
    b = binary_scan_session_defaults(b)
    opts = b._options["spark.driver.extraJavaOptions"].split()
    assert "-Djava.io.tmpdir=/tmp/x" in opts
    assert "-Xss4m" in opts
    assert BINARY_SCAN_JVM_OPTS in opts
    # idempotent: applying twice must not duplicate the flag
    b = binary_scan_session_defaults(b)
    assert b._options["spark.driver.extraJavaOptions"].split().count(
        BINARY_SCAN_JVM_OPTS) == 1
