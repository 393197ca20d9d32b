"""rewrite_manifests — metadata-only manifest consolidation (the
planning-cost half of the small-file problem; Iceberg's rewrite_manifests
action).  Pins that consolidation is invisible to every consumer of
per-entry numbers: reads, incremental reads, changelog provenance,
equality-delete sequence scoping, and mixed-spec pruning."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gx_spark.avro_ocf import read_ocf  # noqa: E402
from gx_spark.iceberg import IcebergLiteTable  # noqa: E402
from tests.conftest import spark  # noqa: F401,E402


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "k long, v long")


def _n_manifests(t):
    _, manifests = read_ocf(t._resolve_snapshot()["manifest-list"])
    return len(manifests)


@pytest.fixture()
def table(spark, tmp_path):
    t = IcebergLiteTable.create(
        str(tmp_path / "t"), _kv(spark, (0, 0)).schema)
    for i in range(4):
        t.append(_kv(spark, (i, i * 10)).coalesce(1))
    return t


def test_consolidates_to_one_manifest_same_rows(spark, table):
    assert _n_manifests(table) == 4
    before = sorted(map(tuple, table.read(spark).collect()))
    stats = table.rewrite_manifests()
    assert stats["manifests_before"] == 4
    assert stats["manifests_after"] == 1
    assert _n_manifests(table) == 1
    assert sorted(map(tuple, table.read(spark).collect())) == before
    assert table.snapshots()[-1]["summary"]["operation"] == "replace"


def test_second_rewrite_is_a_noop(spark, table):
    table.rewrite_manifests()
    n_snaps = len(table.snapshots())
    stats = table.rewrite_manifests()
    assert stats["manifests_before"] == stats["manifests_after"] == 1
    assert len(table.snapshots()) == n_snaps


def test_incremental_reads_survive_consolidation(spark, table):
    # incremental from the 2nd snapshot must return rows of commits 3+4
    # only — after consolidation every entry lives in a manifest with the
    # NEW sequence, so this pins the per-entry pruning
    s2 = table.snapshots()[1]["snapshot-id"]
    want = sorted(map(tuple, table.read(
        spark, added_after_snapshot_id=s2).collect()))
    assert want == [(2, 20), (3, 30)]
    table.rewrite_manifests()
    got = sorted(map(tuple, table.read(
        spark, added_after_snapshot_id=s2).collect()))
    assert got == want


def test_changelog_provenance_survives_consolidation(spark, table):
    sids = [s["snapshot-id"] for s in table.snapshots()]
    table.rewrite_manifests()
    ch = table.changes(spark)
    rows = {r["k"]: (r["_change_type"], r["_commit_snapshot_id"])
            for r in ch.collect()}
    # the rewrite itself is silent; each row still blames its own commit
    assert rows == {i: ("insert", sids[i]) for i in range(4)}


def test_equality_delete_scoping_survives_consolidation(spark, table):
    # kill k=1, then re-insert it: the eq delete applies strictly below
    # its sequence, so the re-insert survives — before AND after rewrite
    table.equality_delete(spark, _kv(spark, (1, 10)).select("k"), ["k"])
    table.append(_kv(spark, (1, 111)).coalesce(1))
    want = sorted(map(tuple, table.read(spark).collect()))
    assert (1, 111) in want and (1, 10) not in want
    stats = table.rewrite_manifests()
    assert stats["manifests_after"] == 2  # one data + one delete manifest
    assert sorted(map(tuple, table.read(spark).collect())) == want


def test_position_deletes_survive_consolidation(spark, table):
    table.delete(spark, "k >= 2")
    want = sorted(map(tuple, table.read(spark).collect()))
    assert want == [(0, 0), (1, 10)]
    table.rewrite_manifests()
    assert sorted(map(tuple, table.read(spark).collect())) == want


def test_mixed_spec_tables_keep_one_manifest_per_spec(spark, tmp_path):
    base = _kv(spark, (0, 0))
    t = IcebergLiteTable.create(str(tmp_path / "m"), base.schema,
                                partition_by=["bucket(4, k)"])
    # k = 3, 4, 5 land in buckets 3, 2, 1 (distinct — k = 0..2 all hash
    # to bucket 3 under the md5 idiom, which would defeat the prune pin)
    for i in range(3, 6):
        t.append(_kv(spark, (i, i * 10)).coalesce(1))
    t.update_partition_spec(["truncate(1, v)"])
    for i in range(6, 9):
        t.append(_kv(spark, (i, i * 10)).coalesce(1))
    before = sorted(map(tuple, t.read(spark).collect()))
    stats = t.rewrite_manifests()
    assert stats["manifests_before"] == 6
    assert stats["manifests_after"] == 2  # one per partition spec
    assert sorted(map(tuple, t.read(spark).collect())) == before
    # spec-aware pruning still fires through the consolidated manifests:
    # old-era files prune by bucket(k), new-era files (k unknown to their
    # spec) all survive, the residual re-pins rows
    pf = t.plan_files(partition_filter={"k": 4})
    assert len(pf) == 4  # 1 of 3 old-era + all 3 new-era
    got = sorted(map(tuple, t.read(
        spark, partition_filter={"k": 4}).collect()))
    assert got == [(4, 40)]


def test_dropped_source_column_group_is_carried_not_lossy(spark, tmp_path):
    # identity-partition on v, evolve to k, then DROP v: the old spec's
    # partition key can no longer be typed by the current schema, so its
    # manifests must be carried forward untouched (lossless), while the
    # new-spec group still consolidates
    t = IcebergLiteTable.create(str(tmp_path / "d"),
                                _kv(spark, (0, 0)).schema,
                                partition_by=["v"])
    for i in range(2):
        t.append(_kv(spark, (i, i * 10)).coalesce(1))
    t.update_partition_spec(["k"])
    for i in range(2, 5):
        t.append(_kv(spark, (i, i * 10)).coalesce(1))
    t.drop_column("v")
    before = sorted(r["k"] for r in t.read(spark).collect())
    stats = t.rewrite_manifests()
    assert stats["manifests_before"] == 5
    # 2 old-spec manifests carried verbatim + 1 consolidated new-spec
    assert stats["manifests_after"] == 3
    assert sorted(r["k"] for r in t.read(spark).collect()) == before
    # old-spec partition tuples still present in the metadata
    from gx_spark.avro_ocf import read_ocf
    _, manifests = read_ocf(t._resolve_snapshot()["manifest-list"])
    old = [m for m in manifests if m["partition_spec_id"] == 0]
    assert len(old) == 2
    for m in old:
        _, entries = read_ocf(m["manifest_path"])
        assert all("v" in (e["data_file"].get("partition") or {})
                   for e in entries)


def test_noop_rewrite_strands_no_files(spark, tmp_path):
    # after a rewrite that carried an untypable group forward, a SECOND
    # call must be a clean no-op: no new snapshot AND no manifest file
    # written then abandoned in the metadata dir
    t = IcebergLiteTable.create(str(tmp_path / "n"),
                                _kv(spark, (0, 0)).schema,
                                partition_by=["v"])
    for i in range(2):
        t.append(_kv(spark, (i, i * 10)).coalesce(1))
    t.update_partition_spec(["k"])
    for i in range(2, 5):
        t.append(_kv(spark, (i, i * 10)).coalesce(1))
    t.drop_column("v")
    t.rewrite_manifests()
    n_snaps = len(t.snapshots())
    meta_files = sorted(os.listdir(t.meta_dir))
    stats = t.rewrite_manifests()
    assert stats["manifests_before"] == stats["manifests_after"] == 3
    assert len(t.snapshots()) == n_snaps
    assert sorted(os.listdir(t.meta_dir)) == meta_files
