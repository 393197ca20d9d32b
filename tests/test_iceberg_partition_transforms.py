"""Hidden partitioning (gx_spark/iceberg.py partition transforms):
spec parsing, the md5-idiom bucket / truncate / UTC time transforms
(Spark expr vs driver-side mirror), hidden-column write layout, source-
column filter pruning with residual re-pinning, and the guards.
"""
import datetime
import hashlib

import pytest
import pyspark.sql.functions as F

from gx_spark.iceberg import (
    IcebergLiteTable,
    parse_partition_entry,
    transform_value,
)


def _bucket(v, n):
    return int(hashlib.md5(f"gxb:{v}".encode()).hexdigest()[:15], 16) % n


def test_parse_partition_entry():
    assert parse_partition_entry("col") == {
        "source": "col", "transform": "identity", "name": "col"}
    assert parse_partition_entry("bucket(16, k)") == {
        "source": "k", "transform": "bucket[16]", "name": "k_bucket"}
    assert parse_partition_entry("truncate(4, s)") == {
        "source": "s", "transform": "truncate[4]", "name": "s_trunc"}
    for fn, t in [("days", "day"), ("day", "day"), ("months", "month"),
                  ("years", "year"), ("hours", "hour")]:
        assert parse_partition_entry(f"{fn}(d)") == {
            "source": "d", "transform": t, "name": f"d_{t}"}
    for bad in ["bucket(k)", "bucket(0, k)", "truncate(x, s)",
                "days(a, b)", "median(k)"]:
        with pytest.raises(ValueError):
            parse_partition_entry(bad)


def test_transform_value_python_mirror():
    assert transform_value("bucket[8]", 5) == _bucket(5, 8)
    assert transform_value("bucket[8]", "u7") == _bucket("u7", 8)
    assert transform_value("truncate[4]", 1234567) == 1234564
    assert transform_value("truncate[4]", -7) == -8  # floor, not toward 0
    assert transform_value("truncate[2]", "hello") == "he"
    d = datetime.date(2024, 1, 10)
    assert transform_value("day", d) == (d - datetime.date(1970, 1, 1)).days
    assert transform_value("month", d) == (2024 - 1970) * 12 + 0
    assert transform_value("year", d) == 54
    pre = datetime.date(1969, 12, 30)
    assert transform_value("day", pre) == -2
    assert transform_value("year", pre) == -1
    ts = datetime.datetime(2024, 1, 10, 13, 30, tzinfo=datetime.timezone.utc)
    assert transform_value("hour", ts) == int(ts.timestamp() // 3600)
    assert transform_value("day", ts) == transform_value("day", d)
    assert transform_value("bucket[8]", None) is None
    with pytest.raises(ValueError):  # naive datetime: session-tz ambiguity
        transform_value("day", datetime.datetime(2024, 1, 10, 13, 30))


def test_expr_matches_mirror_on_spark(spark):
    from gx_spark.iceberg import transform_expr

    rows = [(i, i - 50, f"name{i}", datetime.date(1969, 11, 1)
             + datetime.timedelta(days=7 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, j long, s string, d date")
    out = df.select(
        "id", "j", "s", "d",
        transform_expr("bucket[16]", "id", "long").alias("b"),
        transform_expr("truncate[10]", "j", "long").alias("tj"),
        transform_expr("truncate[3]", "s", "string").alias("ts"),
        transform_expr("day", "d", "date").alias("dd"),
        transform_expr("month", "d", "date").alias("dm"),
        transform_expr("year", "d", "date").alias("dy"),
    ).collect()
    for r in out:
        assert r["b"] == transform_value("bucket[16]", r["id"])
        assert r["tj"] == transform_value("truncate[10]", r["j"])
        assert r["ts"] == transform_value("truncate[3]", r["s"])
        assert r["dd"] == transform_value("day", r["d"])
        assert r["dm"] == transform_value("month", r["d"])
        assert r["dy"] == transform_value("year", r["d"])


@pytest.fixture()
def hp_table(spark, tmp_path):
    df = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") % 23).alias("k"),
        F.concat(F.lit("u"), (F.col("id") % 7).cast("string")).alias("nm"),
        F.date_add(F.lit("2023-12-28").cast("date"),
                   (F.col("id") % 10).cast("int")).alias("d"),
    )
    t = IcebergLiteTable.create(
        str(tmp_path / "hp"), df.schema,
        partition_by=["bucket(4, k)", "days(d)"])
    t.append(df)
    return t, df


def test_hidden_write_layout_and_round_trip(spark, hp_table):
    t, df = hp_table
    fields = t.partition_fields
    assert [(p["name"], p["transform"], p["value_type"]) for p in fields] \
        == [("k_bucket", "bucket[4]", "int"), ("d_day", "day", "int")]
    files = t.plan_files()
    # manifest tuples carry the derived values
    for f in files:
        assert set(f.partition) == {"k_bucket", "d_day"}
        assert 0 <= f.partition["k_bucket"] < 4
    # hidden: the SOURCE columns live in the data files, the derived
    # partition values only in dirs/metadata
    one = spark.read.parquet(files[0].file_path)
    assert "k" in one.columns and "d" in one.columns
    assert "k_bucket" not in one.columns and "d_day" not in one.columns
    got = t.read(spark)
    assert got.count() == 300
    assert sorted(got.columns) == sorted(df.columns)
    assert got.agg(F.sum("k"), F.max("d")).collect() \
        == df.agg(F.sum("k"), F.max("d")).collect()


def test_source_filter_prunes_and_repins(spark, hp_table):
    t, df = hp_table
    total = len(t.plan_files())
    for k in (0, 5, 22):
        pf = t.plan_files(partition_filter={"k": k})
        assert 0 < len(pf) < total
        assert all(f.partition["k_bucket"] == _bucket(k, 4) for f in pf)
        out = t.read(spark, partition_filter={"k": k})
        assert out.count() == df.where(F.col("k") == k).count()
        # the bucket holds ~6 distinct k values; rows must be re-pinned
        assert out.select("k").distinct().count() == 1
    d = datetime.date(2024, 1, 3)
    out = t.read(spark, partition_filter={"d": d})
    assert out.count() == df.where(F.col("d") == F.lit(d)).count() > 0
    # raw partition-field-name filters still work (back-compat surface)
    raw = t.plan_files(partition_filter={"k_bucket": _bucket(5, 4)})
    assert {f.file_path for f in raw} \
        == {f.file_path for f in t.plan_files(partition_filter={"k": 5})}


def test_compaction_preserves_transform_pruning(spark, hp_table):
    t, df = hp_table
    t.rewrite_data_files(spark)
    out = t.read(spark, partition_filter={"k": 9})
    assert out.count() == df.where("k = 9").count()
    pf = t.plan_files(partition_filter={"k": 9})
    assert pf and all(f.partition["k_bucket"] == _bucket(9, 4) for f in pf)


def test_guards(spark, tmp_path, hp_table):
    t, _ = hp_table
    with pytest.raises(ValueError):
        t.drop_column("k")  # transform source is load-bearing
    df = spark.range(3).select(
        F.col("id"), F.col("id").alias("k"),
        F.col("id").cast("int").alias("k_bucket"))
    with pytest.raises(ValueError):
        IcebergLiteTable.create(
            str(tmp_path / "clash"), df.schema, partition_by=["bucket(4, k)"])
    d2 = spark.range(3).select(F.col("id"), F.lit("x").alias("s"))
    with pytest.raises(ValueError):  # bucket source must be int/long/string
        IcebergLiteTable.create(
            str(tmp_path / "bad"),
            spark.range(3).select(
                F.current_date().alias("d")).schema,
            partition_by=["bucket(4, d)"])
    with pytest.raises(ValueError):  # time transform needs date/timestamp
        IcebergLiteTable.create(
            str(tmp_path / "bad2"), d2.schema, partition_by=["days(s)"])


def test_hour_on_timestamp_non_utc_session(spark, tmp_path):
    """The finding-1 regression pin: hours() over a TIMESTAMP column must
    prune/re-pin identically under a non-UTC session timezone (the write
    expr reads the internal UTC instant; the mirror requires tz-aware
    filter values), and hour(date) is rejected outright."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [(i, datetime.datetime(2024, 1, 1, i % 48 // 2,
                                      tzinfo=datetime.timezone.utc)
                 + datetime.timedelta(hours=i % 5))
                for i in range(60)]
        df = spark.createDataFrame(rows, "id long, ts timestamp")
        t = IcebergLiteTable.create(
            str(tmp_path / "hrs"), df.schema, partition_by=["hours(ts)"])
        t.append(df)
        probe = rows[7][1]
        out = t.read(spark, partition_filter={"ts": probe})
        exp = df.where(F.col("ts") == F.lit(probe)).count()
        assert out.count() == exp > 0
        pf = t.plan_files(partition_filter={"ts": probe})
        assert 0 < len(pf) < len(t.plan_files())
        assert all(
            f.partition["ts_hour"] == transform_value("hour", probe)
            for f in pf)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    with pytest.raises(ValueError):  # hour is finer than a date
        IcebergLiteTable.create(
            str(tmp_path / "hd"),
            spark.range(1).select(F.current_date().alias("d")).schema,
            partition_by=["hours(d)"])


def test_duplicate_spec_names_rejected(spark, tmp_path):
    df = spark.range(3).select(F.col("id"), (F.col("id") % 5).alias("k"))
    with pytest.raises(ValueError):
        IcebergLiteTable.create(
            str(tmp_path / "dup"), df.schema,
            partition_by=["bucket(4, k)", "bucket(8, k)"])


def test_multi_transform_same_source_prunes_by_both(spark, tmp_path):
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 13).alias("k"))
    t = IcebergLiteTable.create(
        str(tmp_path / "multi"), df.schema,
        partition_by=["bucket(4, k)", "truncate(5, k)"])
    t.append(df)
    pf = t.plan_files(partition_filter={"k": 11})
    assert pf
    for f in pf:  # both derived tuples must match, not just the first
        assert f.partition["k_bucket"] == _bucket(11, 4)
        assert f.partition["k_trunc"] == 10
    out = t.read(spark, partition_filter={"k": 11})
    assert out.count() == df.where("k = 11").count()
    assert out.select("k").distinct().collect()[0][0] == 11


def test_partition_spec_evolution(spark, tmp_path):
    """update_partition_spec: old files keep their spec and prune by it;
    new files use the new spec; mixed-spec source filters stay exact via
    the residual; compaction rewrites everything under the new spec."""
    df1 = spark.range(0, 120).select(
        F.col("id"), (F.col("id") % 9).alias("k"))
    t = IcebergLiteTable.create(
        str(tmp_path / "evo"), df1.schema, partition_by=[])  # unpartitioned
    t.append(df1)
    assert t.partition_fields == []
    sid = t.update_partition_spec(["bucket(4, k)"])
    assert sid == 1 and t.partition_fields[0]["name"] == "k_bucket"
    df2 = spark.range(200, 320).select(
        F.col("id"), (F.col("id") % 9).alias("k"))
    t.append(df2)
    both = df1.unionByName(df2)
    # all rows still there
    assert t.read(spark).count() == 240
    # filter: new-spec files prune by bucket, old-spec files all kept,
    # residual re-pins rows from both eras
    out = t.read(spark, partition_filter={"k": 3})
    assert out.count() == both.where("k = 3").count()
    assert out.select("k").distinct().collect()[0][0] == 3
    pf = t.plan_files(partition_filter={"k": 3})
    specs = {f.partition.get("k_bucket") for f in pf}
    assert None in specs  # old unpartitioned files kept (tuple empty)
    assert _bucket(3, 4) in specs  # new files carry the derived tuple
    # new-spec files with other buckets were pruned
    all_new = [f for f in t.plan_files() if f.partition.get("k_bucket")
               not in (None, _bucket(3, 4))]
    kept_paths = {f.file_path for f in pf}
    assert all(f.file_path not in kept_paths for f in all_new)
    # compaction rewrites the old era under the new spec
    t.rewrite_data_files(spark)
    assert all(f.partition.get("k_bucket") is not None
               for f in t.plan_files())
    out2 = t.read(spark, partition_filter={"k": 3})
    assert out2.count() == both.where("k = 3").count()
    # evolving to identity keeps exactness without residual
    t.update_partition_spec(["k"])
    t.append(spark.range(400, 420).select(
        F.col("id"), (F.col("id") % 9).alias("k")))
    out3 = t.read(spark, partition_filter={"k": 4})
    third = spark.range(400, 420).select(
        F.col("id"), (F.col("id") % 9).alias("k"))
    assert out3.count() == both.unionByName(third).where("k = 4").count()
    assert out3.where("k != 4").count() == 0


def test_checkpoint_provider_over_transforms_and_evolution(spark, tmp_path):
    """IcebergLiteTableProvider.partitions() must yield DISJOINT,
    COVERING slices keyed by the current spec, for transform-partitioned
    AND spec-evolved tables (predicates are transform SQL over source
    columns, so they work on the loaded DataFrame in every era)."""
    from gx_spark.table_provider import IcebergLiteTableProvider

    df1 = spark.range(0, 90).select(
        F.col("id"), (F.col("id") % 11).alias("k"))
    t = IcebergLiteTable.create(
        str(tmp_path / "prov"), df1.schema, partition_by=["bucket(3, k)"])
    t.append(df1)
    prov = IcebergLiteTableProvider(str(tmp_path / "prov"))
    parts = prov.partitions(spark)
    df = prov.load(spark)
    counts = [df.filter(p.predicate).count() for p in parts]
    assert sum(counts) == 90 and all(c > 0 for c in counts)
    assert len({p.partition_id for p in parts}) == len(parts)
    # now evolve: old bucket-era files + new identity-era files
    t.update_partition_spec(["k"])
    t.append(spark.range(200, 240).select(
        F.col("id"), (F.col("id") % 11).alias("k")))
    prov2 = IcebergLiteTableProvider(str(tmp_path / "prov"))
    parts2 = prov2.partitions(spark)
    df2 = prov2.load(spark)
    counts2 = [df2.filter(p.predicate).count() for p in parts2]
    # disjoint + covering across BOTH eras, keyed by identity k (11 vals)
    assert sum(counts2) == 130
    assert len(parts2) == 11
    assert len({p.partition_id for p in parts2}) == 11


def test_raw_derived_key_read_refused_on_evolved_table(spark, tmp_path):
    df = spark.range(0, 60).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    t = IcebergLiteTable.create(
        str(tmp_path / "raw"), df.schema, partition_by=["bucket(4, k)"])
    t.append(df)
    # single spec: raw derived-name reads remain available
    assert t.read(spark, partition_filter={"k_bucket": 0}).count() >= 0
    t.update_partition_spec(["bucket(8, k)"])
    t.append(spark.range(100, 160).select(
        F.col("id"), (F.col("id") % 7).alias("k")))
    with pytest.raises(ValueError):
        t.read(spark, partition_filter={"k_bucket": 2})
    # source-column reads stay exact across the width change
    out = t.read(spark, partition_filter={"k": 2})
    both = df.unionByName(spark.range(100, 160).select(
        F.col("id"), (F.col("id") % 7).alias("k")))
    assert out.count() == both.where("k = 2").count() > 0
    assert out.where("k != 2").count() == 0


def test_update_spec_idempotent_and_dropped_source(spark, tmp_path):
    df = spark.range(0, 40).select(
        F.col("id"), (F.col("id") % 5).alias("k"),
        (F.col("id") % 3).alias("j"))
    t = IcebergLiteTable.create(
        str(tmp_path / "idem"), df.schema, partition_by=["k"])
    t.append(df)
    sid1 = t.update_partition_spec(["bucket(4, j)"])
    assert sid1 == 1
    assert t.update_partition_spec(["bucket(4, j)"]) == 1  # no new spec
    assert len(t.metadata["partition-specs"]) == 2
    assert t.update_partition_spec(["k"]) == 0  # evolve back: reused
    assert len(t.metadata["partition-specs"]) == 2
    # drop a column that only an OLD spec used as identity source:
    # filters on it must be a no-op (prune nothing), not prune old eras
    t.update_partition_spec(["bucket(4, j)"])
    t.drop_column("k")
    assert len(t.plan_files(partition_filter={"k": 2})) \
        == len(t.plan_files())
