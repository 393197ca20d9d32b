"""Distributed Avro batch source (gx_spark/avro_source.py): per-task
stdlib OCF decode via mapInPandas, schema from one header read.

Fixtures are written by the repo's own spec-faithful writer
(gx_spark/avro_ocf.py write_ocf) — the same codec pair Iceberg-lite
manifests already round-trip through — so the test pins the SOURCE layer:
file fan-out, avro->spark schema mapping (incl. logical types), nullable
unions, nested records/arrays/maps, and deflate blocks."""

from __future__ import annotations

import datetime
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from gx_spark.avro_ocf import write_ocf  # noqa: E402
from gx_spark.avro_source import avro_to_spark_type, read_avro  # noqa: E402
from gx_spark.table_provider import read_batch  # noqa: E402
from tests.conftest import spark  # noqa: F401,E402

SCHEMA = {
    "type": "record", "name": "row", "fields": [
        {"name": "k", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "nested", "type": {
            "type": "record", "name": "inner", "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"}]}},
    ],
}


def _rows(lo, n):
    return [{"k": i, "name": None if i % 5 == 0 else f"n{i}",
             "score": i * 1.5, "tags": [f"t{i % 3}", "x"],
             "props": {"p": i}, "nested": {"a": i * 2, "b": f"b{i}"}}
            for i in range(lo, lo + n)]


@pytest.fixture()
def avro_dir(tmp_path):
    d = str(tmp_path / "av")
    os.makedirs(d)
    write_ocf(os.path.join(d, "part-0.avro"), SCHEMA, _rows(0, 40))
    write_ocf(os.path.join(d, "part-1.avro"), SCHEMA, _rows(40, 40),
              codec="deflate")
    write_ocf(os.path.join(d, "part-2.avro"), SCHEMA, _rows(80, 20))
    return d


def test_reads_all_files_and_values(spark, avro_dir):
    df = read_avro(spark, avro_dir)
    assert df.count() == 100
    got = {r["k"]: r for r in df.collect()}
    assert got[7]["name"] == "n7" and got[10]["name"] is None
    assert got[3]["score"] == 4.5
    assert got[3]["tags"] == ["t0", "x"]
    assert got[3]["props"] == {"p": 3}
    assert got[3]["nested"]["a"] == 6 and got[3]["nested"]["b"] == "b3"


def test_schema_mapping(spark, avro_dir):
    df = read_avro(spark, avro_dir)
    assert df.schema["k"].dataType == T.LongType()
    assert df.schema["name"].dataType == T.StringType()
    assert df.schema["tags"].dataType == T.ArrayType(T.StringType())
    assert df.schema["props"].dataType == T.MapType(
        T.StringType(), T.LongType())
    assert isinstance(df.schema["nested"].dataType, T.StructType)


def test_decode_is_distributed(spark, avro_dir):
    # one input split per file: the decode fans out, no driver data path
    df = read_avro(spark, avro_dir)
    assert df.rdd.getNumPartitions() == 3


def test_logical_types(spark, tmp_path):
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
    ]}
    p = str(tmp_path / "lt.avro")
    write_ocf(p, sch, [{"d": 19723, "ts": 1_700_000_000_000_000}])
    df = read_avro(spark, p)
    assert df.schema["d"].dataType == T.DateType()
    assert df.schema["ts"].dataType == T.TimestampType()
    row = df.collect()[0]
    assert row["d"] == datetime.date(1970, 1, 1) + datetime.timedelta(
        days=19723)
    assert row["ts"].year == 2023


def test_read_batch_routes_avro(spark, avro_dir):
    df = read_batch(spark, avro_dir, format="avro")
    assert df.count() == 100
    assert df.agg(F.sum("k")).first()[0] == sum(range(100))


def test_validates_like_any_batch(spark, avro_dir):
    from gx_spark import ExpectationSuite, validate

    suite = (ExpectationSuite("avro")
             .add("expect_column_values_to_be_unique", column="k")
             .add("expect_column_values_to_not_be_null", column="name",
                  mostly=0.75)
             .add("expect_column_mean_to_be_between", column="score",
                  min_value=0))
    bundle = validate(spark, read_avro(spark, avro_dir), suite)
    assert bundle.success


def test_missing_files_raise(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_avro(spark, str(tmp_path / "empty"))


def test_avro_to_spark_rejects_general_union():
    with pytest.raises(ValueError, match="union"):
        avro_to_spark_type(["string", "long"])


# ---------------------------------------------------------------------------
# writer + round trip
# ---------------------------------------------------------------------------

def test_write_avro_roundtrip(spark, tmp_path):
    from gx_spark.avro_source import write_avro

    df = spark.createDataFrame(
        [(i,
          None if i % 5 == 0 else f"n{i}",
          float(i) * 1.5,
          [f"t{i % 3}", None],
          {"p": i},
          (i * 2, f"b{i}"),
          bytes([i % 256, 255]))
         for i in range(100)],
        "k long, name string, score double, tags array<string>, "
        "props map<string,long>, nested struct<a:long,b:string>, "
        "blob binary").repartition(4)
    out = str(tmp_path / "out")
    n = write_avro(df, out)
    assert n == 100
    assert len(os.listdir(out)) == 4  # one OCF per partition
    back = read_avro(spark, out)
    a = sorted(df.collect(), key=lambda r: r["k"])
    b = sorted(back.collect(), key=lambda r: r["k"])
    assert [r.asDict(recursive=True) for r in a] == [
        r.asDict(recursive=True) for r in b]


def test_write_avro_logical_roundtrip(spark, tmp_path):
    from gx_spark.avro_source import write_avro

    df = spark.sql("""
        SELECT id AS k,
               DATE'2024-02-29' + make_interval(0,0,0, CAST(id AS INT)) AS d,
               TIMESTAMP'2023-11-14 22:13:20.123456'
                 + make_interval(0,0,0,0,0,0, CAST(id AS INT)) AS ts
        FROM range(50)""")
    out = str(tmp_path / "lt_out")
    assert write_avro(df, out, codec="deflate") == 50
    back = read_avro(spark, out)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b  # exact to the microsecond


def test_write_avro_nested_logical_in_array(spark, tmp_path):
    from gx_spark.avro_source import write_avro

    df = spark.sql(
        "SELECT id AS k, array(DATE'2020-01-01', NULL, "
        "DATE'2020-01-01' + make_interval(0,0,0, CAST(id AS INT))) AS ds "
        "FROM range(10)")
    out = str(tmp_path / "nl_out")
    write_avro(df, out)
    back = read_avro(spark, out)
    a = sorted([(r["k"], tuple(r["ds"])) for r in df.collect()])
    b = sorted([(r["k"], tuple(r["ds"])) for r in back.collect()])
    assert a == b


def test_file_table_provider_avro(spark, tmp_path):
    # checkpointable avro tables for free: FileTableProvider routes
    # through read_batch, snapshot identity = file-listing hash
    from gx_spark.avro_source import write_avro
    from gx_spark.table_provider import FileTableProvider

    df = spark.range(60).selectExpr(
        "id AS k", "CAST(id % 4 AS INT) AS part_id",
        "CAST(id * 2 AS DOUBLE) AS v")
    d = str(tmp_path / "prov")
    write_avro(df.repartition(3), d)
    prov = FileTableProvider(d, format="avro")
    assert prov.load(spark).count() == 60
    s1 = prov.snapshot_id()
    parts = prov.partitions(spark)
    assert [p.partition_id for p in parts] == [0, 1, 2, 3]
    # adding a file changes the snapshot identity
    write_ocf(os.path.join(d, "part-extra.avro"),
              {"type": "record", "name": "row", "fields": [
                  {"name": "k", "type": ["null", "long"]},
                  {"name": "part_id", "type": ["null", "int"]},
                  {"name": "v", "type": ["null", "double"]}]},
              [{"k": 1000, "part_id": 0, "v": 1.0}])
    assert prov.snapshot_id() != s1
    assert prov.load(spark).count() == 61


def test_write_avro_decimal_roundtrip(spark, tmp_path):
    from gx_spark.avro_source import write_avro

    df = spark.sql(
        "SELECT id AS k, CAST(id AS DECIMAL(20,4)) / 7 AS dec, "
        "CAST(-id AS DECIMAL(10,2)) AS neg FROM range(30)")
    out = str(tmp_path / "dec_out")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema["dec"].dataType == df.schema["dec"].dataType
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_write_avro_mode_semantics(spark, tmp_path):
    from gx_spark.avro_source import write_avro

    df8 = spark.range(80).selectExpr("id AS k").repartition(8)
    df2 = spark.range(20).selectExpr("id AS k").repartition(2)
    out = str(tmp_path / "m")
    write_avro(df8, out)
    # default 'error' refuses a non-empty target (stale wider shards
    # would otherwise read back as duplicate rows)
    with pytest.raises(FileExistsError):
        write_avro(df2, out)
    assert write_avro(df2, out, mode="overwrite") == 20
    assert read_avro(spark, out).count() == 20  # no stale part-00002..7


def test_timestamps_are_utc_instants_under_any_session_tz(spark, tmp_path):
    from gx_spark.avro_source import write_avro

    out = str(tmp_path / "tz")
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql(
            "SELECT TIMESTAMP'1970-01-01 00:00:00' AS ts")  # local NY wall
        write_avro(df, out)
        # the FILE must hold the UTC instant: 00:00 NY = 05:00Z = 5h micros
        from gx_spark.avro_ocf import read_ocf
        _sch, recs = read_ocf(os.path.join(out, os.listdir(out)[0]))
        assert recs[0]["ts"] == 5 * 3600 * 1_000_000
        # and the round trip restores the same wall-clock in-session
        back = read_avro(spark, out).collect()[0]["ts"]
        assert back == df.collect()[0]["ts"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_unknown_logical_type_falls_back_to_base(spark, tmp_path):
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "tm", "type": {"type": "long",
                                "logicalType": "time-micros"}},
    ]}
    p = str(tmp_path / "u.avro")
    write_ocf(p, sch, [{"u": "ab-cd", "tm": 123}])
    df = read_avro(spark, p)
    assert df.schema["u"].dataType == T.StringType()
    assert df.schema["tm"].dataType == T.LongType()
    assert df.collect()[0]["u"] == "ab-cd"


def test_read_batch_avro_rejects_options(spark, avro_dir):
    with pytest.raises(ValueError, match="no schema"):
        read_batch(spark, avro_dir, format="avro", header=True)
    with pytest.raises(ValueError, match="no schema"):
        read_batch(spark, avro_dir, format="avro", schema="k long")
