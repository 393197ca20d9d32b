"""remove_orphan_files — the Iceberg maintenance procedure for crash
debris: files under the table location that no snapshot references.
Pins the referenced-set protection (committed data, manifests, version
log, staged branch work), the mtime in-flight guard, and dry_run."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gx_spark.iceberg import IcebergLiteTable  # noqa: E402
from tests.conftest import spark  # noqa: F401,E402

FUTURE_MS = 4102444800000  # 2100-01-01: every file is "old enough"


@pytest.fixture()
def table(spark, tmp_path):
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    t = IcebergLiteTable.create(str(tmp_path / "t"), base.schema)
    t.append(base.coalesce(2))
    return t


def _plant(t, rel, content=b"debris"):
    p = os.path.join(t.location, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(content)
    return p


def test_clean_table_has_no_orphans(spark, table):
    assert table.remove_orphan_files(older_than_ms=FUTURE_MS) == []
    assert table.read(spark).count() == 10


def test_crash_debris_is_reclaimed_and_committed_files_survive(spark, table):
    stray_data = _plant(table, "data/snap-999999/part-crashed.parquet")
    stray_tmp = _plant(table, "metadata/manifest-999999-0.avro")
    removed = table.remove_orphan_files(older_than_ms=FUTURE_MS)
    assert set(removed) == {stray_data, stray_tmp}
    assert not os.path.exists(stray_data)
    # the empty crashed-snapshot dir is swept too
    assert not os.path.exists(os.path.dirname(stray_data))
    # committed data intact and readable
    assert table.read(spark).count() == 10
    # version log and hint never count as orphans
    assert os.path.exists(os.path.join(table.meta_dir, "version-hint.text"))


def test_dry_run_lists_without_deleting(spark, table):
    stray = _plant(table, "data/snap-999999/part-crashed.parquet")
    listed = table.remove_orphan_files(older_than_ms=FUTURE_MS, dry_run=True)
    assert listed == [stray]
    assert os.path.exists(stray)


def test_mtime_guard_protects_in_flight_writes(spark, table):
    # a concurrent writer's fresh file: with the cutoff below every mtime
    # nothing is eligible
    stray = _plant(table, "data/snap-999999/part-inflight.parquet")
    assert table.remove_orphan_files(older_than_ms=0) == []
    assert os.path.exists(stray)


def test_staged_branch_work_is_protected(spark, table):
    extra = spark.createDataFrame([(20, 200)], "k long, v long")
    table.append(extra, branch="audit")
    removed = table.remove_orphan_files(older_than_ms=FUTURE_MS)
    assert removed == []
    assert table.read(spark, ref="audit").count() == 11
    assert table.read(spark).count() == 10


def test_orphans_from_every_subdir_and_sorted_output(spark, table):
    a = _plant(table, "data/snap-999999/x=1/part-a.parquet")
    b = _plant(table, "data/snap-999998/part-b.parquet")
    removed = table.remove_orphan_files(older_than_ms=FUTURE_MS)
    assert removed == sorted([a, b])


def test_symlinked_table_location_is_not_destroyed(spark, table, tmp_path):
    # open the SAME table through a symlink alias: manifests store the
    # real paths, the walk sees alias paths — realpath normalization must
    # keep every committed file recognized as referenced
    alias = str(tmp_path / "alias")
    os.symlink(table.location, alias)
    t2 = IcebergLiteTable(alias)
    assert t2.remove_orphan_files(older_than_ms=FUTURE_MS) == []
    assert t2.read(spark).count() == 10
    assert table.read(spark).count() == 10


def test_dry_run_never_raises_on_alias_mismatch(spark, table):
    # even if the refusal rail WOULD fire, dry_run is a pure listing and
    # must return rather than raise (the diagnostic path)
    stray = _plant(table, "data/snap-999999/part-crashed.parquet")
    listed = table.remove_orphan_files(older_than_ms=FUTURE_MS,
                                       dry_run=True)
    assert listed == [stray]


def test_expire_reclaims_through_symlink_alias(spark, table, tmp_path):
    # expire via an alias open must reclaim exactly what the real-path
    # open would (realpath-normalized referenced set + location prefix)
    table.rewrite_data_files(spark, target_files=1)
    alias = str(tmp_path / "alias2")
    os.symlink(table.location, alias)
    t2 = IcebergLiteTable(alias)
    stats = t2.expire_snapshots(keep_last=1)
    assert stats["expired_snapshots"] >= 1
    assert stats["deleted_data_files"] >= 1
    assert t2.read(spark).count() == 10
