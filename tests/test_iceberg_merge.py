"""Iceberg-lite round 5: MERGE INTO (single-snapshot MoR upsert), named
refs (tags/branches + expiry protection), and metadata tables.

Semantics under test come from the published Iceberg spec
(https://iceberg.apache.org/spec/): an equality delete at sequence s
applies only to data files with sequence < s, so a merge that commits its
delete manifest and its data manifest at the SAME sequence number must let
its own inserts survive — that property (not two separate commits) is what
makes merge_into atomic."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gx_spark.iceberg import IcebergLiteTable  # noqa: E402
from tests.conftest import spark  # noqa: F401,E402


@pytest.fixture()
def table(spark, tmp_path):
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    t = IcebergLiteTable.create(str(tmp_path / "t"), base.schema)
    t.append(base.coalesce(2))
    return t


def _as_dict(df):
    return {r["k"]: r["v"] for r in df.collect()}


# ---------------------------------------------------------------------------
# merge_into
# ---------------------------------------------------------------------------

def test_merge_upsert_updates_and_inserts(spark, table):
    src = spark.createDataFrame(
        [(k, k * 100) for k in range(5)] + [(12, 1200)], "k long, v long")
    n_before = len(table.snapshots())
    table.merge_into(spark, src, ["k"])
    out = _as_dict(table.read(spark))
    expected = ({k: k * 100 for k in range(5)}
                | {k: k * 10 for k in range(5, 10)} | {12: 1200})
    assert out == expected
    # ONE new snapshot, operation 'overwrite', carrying BOTH manifests
    snaps = table.snapshots()
    assert len(snaps) == n_before + 1
    assert snaps[-1]["summary"]["operation"] == "overwrite"
    assert "added-delete-files" in snaps[-1]["summary"]
    assert "added-data-files" in snaps[-1]["summary"]


def test_merge_inserts_survive_own_deletes(spark, table):
    """The same-sequence rule: the merge's eq-deletes must not swallow the
    rows the merge itself appends (strict < scoping)."""
    src = spark.createDataFrame([(3, 999)], "k long, v long")
    table.merge_into(spark, src, ["k"])
    assert _as_dict(table.read(spark))[3] == 999


def test_merge_update_only_skips_unmatched(spark, table):
    src = spark.createDataFrame([(7, 777), (99, 9900)], "k long, v long")
    table.merge_into(spark, src, ["k"],
                     when_matched="update", when_not_matched="none")
    out = _as_dict(table.read(spark))
    assert out[7] == 777
    assert 99 not in out
    assert len(out) == 10


def test_merge_delete_mode(spark, table):
    keys = spark.createDataFrame([(0,), (4,), (77,)], "k long")
    table.merge_into(spark, keys, ["k"],
                     when_matched="delete", when_not_matched="none")
    out = _as_dict(table.read(spark))
    assert 0 not in out and 4 not in out and len(out) == 8


def test_merge_insert_if_absent(spark, table):
    src = spark.createDataFrame([(2, 2222), (50, 500)], "k long, v long")
    table.merge_into(spark, src, ["k"], when_matched="none")
    out = _as_dict(table.read(spark))
    assert out[2] == 20  # matched row untouched
    assert out[50] == 500


def test_merge_idempotent_operation_id(spark, table):
    src = spark.createDataFrame([(1, 111)], "k long, v long")
    sid = table.merge_into(spark, src, ["k"], operation_id="batch-7")
    assert table.merge_into(spark, src, ["k"], operation_id="batch-7") == sid
    assert len(table.snapshots()) == 2  # replay did not commit again
    assert _as_dict(table.read(spark))[1] == 111


def test_merge_empty_source_is_noop(spark, table):
    src = spark.createDataFrame([], "k long, v long")
    assert table.merge_into(spark, src, ["k"]) is None
    assert len(table.snapshots()) == 1


def test_merge_validates_arguments(spark, table):
    src = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError):
        table.merge_into(spark, src, ["nope"])
    with pytest.raises(ValueError):
        table.merge_into(spark, src, ["k"],
                         when_matched="none", when_not_matched="none")
    with pytest.raises(ValueError):
        table.merge_into(spark, src.select("k"), ["k"])  # missing v
    with pytest.raises(ValueError):
        table.merge_into(spark, src, ["k"], when_matched="replace")


def test_merge_then_time_travel_sees_old_values(spark, table):
    sid0 = table.current_snapshot_id()
    table.merge_into(
        spark, spark.createDataFrame([(0, 1)], "k long, v long"), ["k"])
    assert _as_dict(table.read(spark, snapshot_id=sid0))[0] == 0
    assert _as_dict(table.read(spark))[0] == 1


def test_merge_partitioned_table(spark, tmp_path):
    base = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p"),
        (F.col("id") * 10).alias("v"))
    t = IcebergLiteTable.create(str(tmp_path / "pt"), base.schema,
                                partition_by=["p"])
    t.append(base)
    src = spark.createDataFrame([(3, 3, 333), (21, 1, 2100)],
                                "k long, p long, v long")
    t.merge_into(spark, src, ["k"])
    out = {r["k"]: (r["p"], r["v"]) for r in t.read(spark).collect()}
    assert out[3] == (3, 333)
    assert out[21] == (1, 2100)
    assert len(out) == 21
    # partition pruning still works over merged data
    pr = t.read(spark, partition_filter={"p": 1})
    assert {r["k"] for r in pr.collect()} == {1, 5, 9, 13, 17, 21}


# ---------------------------------------------------------------------------
# refs: tags and branches
# ---------------------------------------------------------------------------

def test_tag_pins_snapshot_across_appends(spark, table):
    table.create_tag("v1")
    table.append(spark.createDataFrame([(100, 1)], "k long, v long"))
    assert table.read(spark, ref="v1").count() == 10
    assert table.read(spark, ref="main").count() == 11


def test_ref_errors(spark, table):
    table.create_tag("v1")
    with pytest.raises(ValueError):
        table.create_tag("v1")  # duplicate
    with pytest.raises(ValueError):
        table.create_tag("main")
    with pytest.raises(ValueError):
        table.drop_ref("main")
    with pytest.raises(ValueError):
        table.read(spark, ref="ghost")
    with pytest.raises(ValueError):
        table.read(spark, ref="v1", snapshot_id=table.current_snapshot_id())
    table.drop_ref("v1")
    with pytest.raises(ValueError):
        table.drop_ref("v1")


def test_expire_keeps_ref_snapshots(spark, table):
    table.create_tag("keepme")
    tagged = table.current_snapshot_id()
    for i in range(3):
        table.append(spark.createDataFrame([(100 + i, 1)], "k long, v long"))
    stats = table.expire_snapshots(keep_last=1)
    assert stats["expired_snapshots"] == 2  # middle two, not the tagged one
    assert any(s["snapshot-id"] == tagged for s in table.snapshots())
    assert table.read(spark, ref="keepme").count() == 10


def test_branch_is_readable_pointer(spark, table):
    table.create_branch("audit")
    table.append(spark.createDataFrame([(100, 1)], "k long, v long"))
    refs = table.refs
    assert refs["audit"]["type"] == "branch"
    assert table.read(spark, ref="audit").count() == 10
    # main advanced with the append, audit did not
    assert refs["main"]["snapshot-id"] == table.current_snapshot_id()


# ---------------------------------------------------------------------------
# metadata tables
# ---------------------------------------------------------------------------

def test_meta_snapshots_and_history(spark, table):
    table.merge_into(
        spark, spark.createDataFrame([(0, 1)], "k long, v long"), ["k"])
    snaps = table.meta_df(spark, "snapshots").collect()
    assert len(snaps) == len(table.snapshots())
    assert [r["operation"] for r in snaps] == ["append", "overwrite"]
    assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]
    hist = table.meta_df(spark, "history").collect()
    assert [r["snapshot_id"] for r in hist] == \
        [r["snapshot_id"] for r in snaps]
    assert all(r["is_current_ancestor"] for r in hist)


def test_meta_files_and_partitions(spark, tmp_path):
    base = spark.range(12).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p"))
    t = IcebergLiteTable.create(str(tmp_path / "m"), base.schema,
                                partition_by=["p"])
    t.append(base)
    files = t.meta_df(spark, "files")
    assert files.count() == len(t.plan_files())
    assert files.agg(F.sum("record_count")).first()[0] == 12
    parts = {tuple(sorted(r["partition"].items())): r["record_count"]
             for r in t.meta_df(spark, "partitions").collect()}
    assert parts == {(("p", str(i)),): 4 for i in range(3)}


def test_meta_delete_files_and_manifests(spark, table):
    table.merge_into(
        spark, spark.createDataFrame([(0, 1)], "k long, v long"), ["k"])
    dels = table.meta_df(spark, "delete_files").collect()
    assert dels and all(r["content"] == 2 for r in dels)
    man = table.meta_df(spark, "manifests").collect()
    assert {r["content"] for r in man} == {0, 1}
    files_at_tagged = table.meta_df(
        spark, "files", snapshot_id=table.snapshots()[0]["snapshot-id"])
    assert files_at_tagged.count() == 2  # the two initial data files


def test_meta_refs_table(spark, table):
    table.create_tag("x")
    rows = {r["name"]: (r["type"], r["snapshot_id"])
            for r in table.meta_df(spark, "refs").collect()}
    assert rows["x"] == ("tag", table.current_snapshot_id())
    assert rows["main"][0] == "branch"


def test_meta_unknown_table(spark, table):
    with pytest.raises(ValueError):
        table.meta_df(spark, "nope")
