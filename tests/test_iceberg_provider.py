"""North-rule integration: checkpointed, resumable validation over an
Iceberg-lite table with REAL Iceberg snapshot ids + partition lineage, plus
incremental (validate-only-appended-data) runs and the Iceberg results sink."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationSuite  # noqa: E402
from gx_spark.checkpoint import CheckpointRunner  # noqa: E402
from gx_spark.iceberg import IcebergLiteTable  # noqa: E402
from gx_spark.table_provider import IcebergLiteTableProvider  # noqa: E402

from tests.conftest import spark  # noqa: F401,E402


def _mini_suite():
    return (
        ExpectationSuite("ice")
        .add("expect_column_values_to_not_be_null", column="clip_id")
        .add("expect_column_values_to_be_between",
             column="score", min_value=0.0, max_value=1e6)
    )


def _clips(spark, start, n, mod=4):
    rows = [(f"clip_{i:05d}", i % mod, float(i)) for i in range(start, start + n)]
    return spark.createDataFrame(rows, "clip_id string, shard int, score double")


@pytest.fixture()
def ice_table(spark, tmp_path):
    loc = str(tmp_path / "clips")
    df = _clips(spark, 0, 48)
    t = IcebergLiteTable.create(loc, df.schema, partition_by=["shard"])
    t.append(df.repartition(4, "shard"))
    return t


def test_provider_snapshot_and_partitions_are_metadata_only(spark, ice_table):
    prov = IcebergLiteTableProvider(ice_table.location)
    assert prov.snapshot_id() == str(ice_table.current_snapshot_id())
    parts = prov.partitions(spark)  # no Spark job: manifest-driven
    assert [p.partition_id for p in parts] == [0, 1, 2, 3]
    assert parts[2].predicate == "shard = 2"


def test_checkpoint_resume_on_iceberg_snapshot(spark, ice_table, tmp_path):
    out = str(tmp_path / "out")
    mk = lambda: CheckpointRunner(
        spark, _mini_suite(), IcebergLiteTableProvider(ice_table.location),
        out, EngineOptions(unexpected_index_column_names=("clip_id",)))
    r1 = mk().run(max_partitions=2)
    assert len(r1.validated_partitions) == 2
    # the lineage key in the manifest is the true Iceberg snapshot id
    assert r1.snapshot_id == str(ice_table.current_snapshot_id())
    r2 = mk().run()
    assert sorted(r1.validated_partitions + r2.validated_partitions) == [0, 1, 2, 3]
    assert sorted(r2.skipped_partitions) == sorted(r1.validated_partitions)
    res = mk().results()
    assert res.count() == 2 * 4  # 2 expectations x 4 partitions
    assert set(r.snapshot_id for r in res.select("snapshot_id").distinct().collect()) \
        == {int(ice_table.current_snapshot_id())}


def test_append_triggers_new_lineage_and_incremental_run(spark, ice_table, tmp_path):
    out = str(tmp_path / "out")
    s1 = ice_table.current_snapshot_id()
    full = CheckpointRunner(
        spark, _mini_suite(), IcebergLiteTableProvider(ice_table.location), out)
    full.run()

    # table grows by an append -> new snapshot
    s2 = ice_table.refresh().append(_clips(spark, 48, 16).repartition(2, "shard"))
    assert s2 != s1

    # incremental provider: validate ONLY the files added after s1
    inc_prov = IcebergLiteTableProvider(ice_table.location, incremental_from=s1)
    assert inc_prov.snapshot_id() == f"{s2}-inc-{s1}"
    assert inc_prov.load(spark).count() == 16
    r = CheckpointRunner(spark, _mini_suite(), inc_prov, out).run()
    assert len(r.validated_partitions) == 4  # new files land in all 4 shards
    assert r.all_success

    # results store carries BOTH lineages
    res = full.results()
    lineages = {r.snapshot_id for r in res.select("snapshot_id").distinct().collect()}
    assert lineages == {str(s1), f"{s2}-inc-{s1}"}


def test_publish_results_to_iceberg_sink(spark, ice_table, tmp_path):
    out = str(tmp_path / "out")
    runner = CheckpointRunner(
        spark, _mini_suite(), IcebergLiteTableProvider(ice_table.location), out)
    runner.run()
    sink_loc = str(tmp_path / "_validation_results_ice")
    sid = runner.publish(sink_loc)
    sink = IcebergLiteTable(sink_loc)
    assert sink.current_snapshot_id() == sid
    got = sink.read(spark)
    assert got.count() == runner.results().count()
    # a second publish is a second snapshot (append lineage, per north rule)
    sid2 = runner.publish(sink_loc)
    assert sid2 != sid
    assert sink.refresh().read(spark, snapshot_id=sid).count() * 2 \
        == sink.read(spark).count()
