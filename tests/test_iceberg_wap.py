"""Iceberg-lite round 5: branch commits, fast_forward, and the
write-audit-publish validation gate.

Semantics under test come from the published Iceberg spec and the
`system.fast_forward` procedure: a branch commit advances only its ref
(main's current-snapshot-id and snapshot-log never see staged work), and
fast-forward requires the target's head to be an ancestor of the source's
head — divergence raises instead of merging.  The WAP gate
(gx_spark/wap.py) composes those with the validation engine: stage →
audit exactly the staged rows → publish (pure metadata) or reject
(tagged for debugging, reclaimable by expire_snapshots)."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gx_spark import ExpectationSuite, validate_and_publish  # noqa: E402
from gx_spark.iceberg import IcebergLiteTable  # noqa: E402
from tests.conftest import spark  # noqa: F401,E402


@pytest.fixture()
def table(spark, tmp_path):
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("v"))
    t = IcebergLiteTable.create(str(tmp_path / "t"), base.schema)
    t.append(base.coalesce(2))
    return t


def _batch(spark, lo, n=10, v_mult=10.0):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"), (F.col("id") * F.lit(v_mult)).alias("v"))


GATE = (ExpectationSuite("gate")
        .add("expect_column_values_to_not_be_null", column="k")
        .add("expect_column_values_to_be_between", column="v", min_value=0))


# ---------------------------------------------------------------------------
# branch commits
# ---------------------------------------------------------------------------

def test_branch_append_leaves_main_untouched(spark, table):
    base_snap = table.current_snapshot_id()
    table.append(_batch(spark, 100).coalesce(1), branch="audit")
    assert table.current_snapshot_id() == base_snap
    assert table.read(spark).count() == 10
    assert table.read(spark, ref="audit").count() == 20
    # staged snapshot is NOT in the snapshot-log (main lineage)
    logged = {x["snapshot-id"] for x in table.metadata["snapshot-log"]}
    staged = table.refs["audit"]["snapshot-id"]
    assert staged not in logged


def test_branch_commits_stack(spark, table):
    table.append(_batch(spark, 100).coalesce(1), branch="audit")
    table.append(_batch(spark, 200).coalesce(1), branch="audit")
    assert table.read(spark, ref="audit").count() == 30
    assert table.read(spark).count() == 10


def test_branch_forks_from_empty_table(spark, tmp_path):
    base = _batch(spark, 0)
    t = IcebergLiteTable.create(str(tmp_path / "e"), base.schema)
    t.append(base.coalesce(1), branch="audit")
    assert t.current_snapshot_id() is None
    assert t.read(spark).count() == 0
    assert t.read(spark, ref="audit").count() == 10
    t.fast_forward("main", "audit")
    assert t.read(spark).count() == 10


def test_branch_commit_rejects_tag_name(spark, table):
    table.create_tag("pinned")
    with pytest.raises(ValueError, match="tag"):
        table.append(_batch(spark, 100).coalesce(1), branch="pinned")


# ---------------------------------------------------------------------------
# fast_forward
# ---------------------------------------------------------------------------

def test_fast_forward_publishes_staged_history(spark, table):
    table.append(_batch(spark, 100).coalesce(1), branch="audit")
    s2 = table.append(_batch(spark, 200).coalesce(1), branch="audit")
    head = table.fast_forward("main", "audit")
    assert head == s2 == table.current_snapshot_id()
    assert table.read(spark).count() == 30
    # both staged snapshots joined the log, in commit order
    log = [x["snapshot-id"] for x in table.metadata["snapshot-log"]]
    assert log[-1] == s2 and len(log) == 3
    # time travel works through the published path
    assert table.read(spark, snapshot_id=log[1]).count() == 20


def test_fast_forward_diverged_raises(spark, table):
    table.append(_batch(spark, 100).coalesce(1), branch="audit")
    table.append(_batch(spark, 900).coalesce(1))  # main advances
    with pytest.raises(ValueError, match="not an ancestor"):
        table.fast_forward("main", "audit")


def test_fast_forward_branch_to_branch(spark, table):
    table.append(_batch(spark, 100).coalesce(1), branch="dev")
    table.create_branch("release")  # at main head
    table.fast_forward("release", "dev")
    assert (table.refs["release"]["snapshot-id"]
            == table.refs["dev"]["snapshot-id"])
    assert table.read(spark, ref="release").count() == 20


def test_fast_forward_from_tag_raises(spark, table):
    table.create_tag("v1")
    with pytest.raises(ValueError, match="tag"):
        table.fast_forward("main", "v1")


# ---------------------------------------------------------------------------
# expire_snapshots protection for staged history
# ---------------------------------------------------------------------------

def test_expire_keeps_unpublished_branch_ancestors(spark, table):
    table.append(_batch(spark, 100).coalesce(1), branch="audit")
    table.append(_batch(spark, 200).coalesce(1), branch="audit")
    table.append(_batch(spark, 900).coalesce(1))  # main work
    table.expire_snapshots(keep_last=1)
    # the whole staged chain survives and still reads
    assert table.read(spark, ref="audit").count() == 30


# ---------------------------------------------------------------------------
# the WAP gate
# ---------------------------------------------------------------------------

def test_wap_good_batch_publishes(spark, table):
    r = validate_and_publish(spark, table, _batch(spark, 100).coalesce(1),
                             GATE)
    assert r.published and r.bundle.success
    assert table.read(spark).count() == 20
    assert "audit" not in table.refs
    assert table.current_snapshot_id() == r.snapshot_id


def test_wap_bad_batch_rejected_and_tagged(spark, table):
    bad = _batch(spark, 100, v_mult=-1.0).coalesce(1)
    r = validate_and_publish(spark, table, bad, GATE)
    assert not r.published and not r.bundle.success
    # main never saw the batch
    assert table.read(spark).count() == 10
    assert "audit" not in table.refs
    # the rejected stage is preserved under a tag for debugging
    assert r.rejected_tag in table.refs
    assert table.read(spark, ref=r.rejected_tag).count() == 20
    # and the failing expectation is identifiable in the bundle
    fails = [x for x in r.bundle.suite_result.results if not x.success]
    assert [x.expectation_config.expectation_type for x in fails] == [
        "expect_column_values_to_be_between"]


def test_wap_audits_only_the_staged_rows(spark, table):
    # the pre-existing table rows would FAIL this suite; the gate must
    # validate only the staged slice, so a clean batch still publishes
    strict = (ExpectationSuite("strict")
              .add("expect_column_values_to_be_between", column="k",
                   min_value=100))
    r = validate_and_publish(spark, table,
                             _batch(spark, 100).coalesce(1), strict)
    assert r.published
    assert table.read(spark).count() == 20


def test_wap_rejected_without_keep(spark, table):
    bad = _batch(spark, 100, v_mult=-1.0).coalesce(1)
    r = validate_and_publish(spark, table, bad, GATE, keep_rejected=False)
    assert not r.published and r.rejected_tag is None
    assert len(table.refs) == 1  # only main
    # maintenance reclaims the rejected stage's files
    stats = table.expire_snapshots(keep_last=1)
    assert stats["deleted_data_files"] >= 1
    assert table.read(spark).count() == 10


def test_wap_inflight_branch_raises(spark, table):
    table.append(_batch(spark, 500).coalesce(1), branch="audit")
    with pytest.raises(ValueError, match="in flight"):
        validate_and_publish(spark, table, _batch(spark, 100).coalesce(1),
                             GATE)


def test_wap_operation_id_replay_is_noop(spark, table):
    good = _batch(spark, 100).coalesce(1)
    r1 = validate_and_publish(spark, table, good, GATE,
                              operation_id="batch-42")
    assert r1.published
    n = table.read(spark).count()
    log_len = len(table.metadata["snapshot-log"])
    r2 = validate_and_publish(spark, table, good, GATE,
                              operation_id="batch-42")
    assert r2.published and r2.snapshot_id == r1.snapshot_id
    assert table.read(spark).count() == n
    assert len(table.metadata["snapshot-log"]) == log_len


def test_wap_operation_id_replay_of_rejected_batch(spark, table):
    bad = _batch(spark, 100, v_mult=-1.0).coalesce(1)
    r1 = validate_and_publish(spark, table, bad, GATE,
                              operation_id="batch-43")
    assert not r1.published
    r2 = validate_and_publish(spark, table, bad, GATE,
                              operation_id="batch-43")
    assert not r2.published and r2.snapshot_id == r1.snapshot_id
    assert r2.rejected_tag == r1.rejected_tag
    assert table.read(spark).count() == 10


def test_wap_crash_resume_between_stage_and_publish(spark, table):
    # simulate a crash AFTER the stage committed but before the audit:
    # the branch is left behind with our operation_id on its head
    good = _batch(spark, 100).coalesce(1)
    table.append(good, branch="audit", operation_id="op-7")
    r = validate_and_publish(spark, table, good, GATE, operation_id="op-7")
    assert r.published
    # resumed from the existing stage: no double append
    assert table.read(spark).count() == 20
    assert "audit" not in table.refs


def test_wap_foreign_inflight_branch_still_raises(spark, table):
    table.append(_batch(spark, 500).coalesce(1), branch="audit",
                 operation_id="someone-else")
    with pytest.raises(ValueError, match="in flight"):
        validate_and_publish(spark, table, _batch(spark, 100).coalesce(1),
                             GATE, operation_id="op-8")


# ---------------------------------------------------------------------------
# merge_into on a branch (WAP-gated CDC)
# ---------------------------------------------------------------------------

def test_merge_on_branch_then_publish(spark, table):
    # upsert staged on a branch: k 0..4 re-valued, k 100..104 inserted
    src = spark.range(5).select(
        F.col("id").alias("k"), F.lit(999.0).alias("v")).unionByName(
        spark.range(100, 105).select(
            F.col("id").alias("k"), F.lit(1.0).alias("v")))
    table.merge_into(spark, src.coalesce(1), on=["k"], branch="audit")
    # main untouched; branch shows the merged image
    assert table.read(spark).count() == 10
    merged = {r["k"]: r["v"] for r in table.read(spark, ref="audit").collect()}
    assert len(merged) == 15
    assert all(merged[k] == 999.0 for k in range(5))
    assert all(merged[k] == 1.0 for k in range(100, 105))
    assert merged[7] == 70.0
    table.fast_forward("main", "audit")
    assert table.read(spark).count() == 15


def test_merge_update_only_resolves_against_branch_head(spark, table):
    # stage an insert of k=100 on the branch, then an update-only merge of
    # k in {100, 200}: 100 matches the BRANCH head (not main), 200 matches
    # nothing -> exactly one row updated, none inserted
    table.append(_batch(spark, 100, n=1).coalesce(1), branch="audit")
    src = spark.createDataFrame([(100, -1.0), (200, -2.0)], "k long, v double")
    table.merge_into(spark, src.coalesce(1), on=["k"],
                     when_matched="update", when_not_matched="none",
                     branch="audit")
    merged = {r["k"]: r["v"] for r in table.read(spark, ref="audit").collect()}
    assert merged[100] == -1.0 and 200 not in merged
    assert table.read(spark).count() == 10


def test_upsert_never_scans_target(spark, table, monkeypatch):
    # the classic update/insert merge must be pure source-sized work: a
    # target scan would make continuous CDC O(table) per batch.  Pin it by
    # making read() explode.
    def boom(*a, **k):
        raise AssertionError("merge upsert scanned the target")
    monkeypatch.setattr(table, "read", boom)
    src = spark.createDataFrame([(3, -1.0), (300, -3.0)], "k long, v double")
    table.merge_into(spark, src.coalesce(1), on=["k"])
    monkeypatch.undo()
    merged = {r["k"]: r["v"] for r in table.read(spark).collect()}
    assert merged[3] == -1.0 and merged[300] == -3.0 and len(merged) == 11


# ---------------------------------------------------------------------------
# rollback_to_snapshot (undo a bad publish)
# ---------------------------------------------------------------------------

def test_rollback_to_snapshot(spark, table):
    s1 = table.current_snapshot_id()
    table.append(_batch(spark, 100).coalesce(1))
    assert table.read(spark).count() == 20
    table.rollback_to_snapshot(s1)
    assert table.current_snapshot_id() == s1
    assert table.read(spark).count() == 10
    # history is append-only: the rollback is a new log event
    assert table.metadata["snapshot-log"][-1]["snapshot-id"] == s1
    # the rolled-past snapshot is orphaned; maintenance reclaims it
    stats = table.expire_snapshots(keep_last=5)
    assert stats["expired_snapshots"] == 1
    assert stats["deleted_data_files"] >= 1
    assert table.read(spark).count() == 10
    # new work forks cleanly from the restored state
    table.append(_batch(spark, 200).coalesce(1))
    assert table.read(spark).count() == 20


def test_rollback_rejects_non_ancestor(spark, table):
    table.append(_batch(spark, 100).coalesce(1), branch="side")
    staged = table.refs["side"]["snapshot-id"]
    with pytest.raises(ValueError, match="ancestor"):
        table.rollback_to_snapshot(staged)
    with pytest.raises(ValueError, match="unknown"):
        table.rollback_to_snapshot(12345)


def test_main_commit_after_staged_only_table(spark, tmp_path):
    # regression: append to MAIN when the only existing snapshots are
    # staged branch commits used to crash resolving prev manifests
    base = _batch(spark, 0)
    t = IcebergLiteTable.create(str(tmp_path / "so"), base.schema)
    t.append(base.coalesce(1), branch="audit")
    t.append(_batch(spark, 100).coalesce(1))  # main commit, empty head
    assert t.read(spark).count() == 10
    assert t.read(spark, ref="audit").count() == 10


def test_wap_rejected_resume_is_idempotent(spark, table):
    # crash between create_tag and drop_ref: the replay must not crash
    # on the already-existing deterministic tag
    bad = _batch(spark, 100, v_mult=-1.0).coalesce(1)
    t_append = table.append(bad, branch="audit", operation_id="op-9")
    table.create_tag(f"rejected-{t_append}", t_append)  # simulate partial
    r = validate_and_publish(spark, table, bad, GATE, operation_id="op-9")
    assert not r.published and r.rejected_tag == f"rejected-{t_append}"
    assert "audit" not in table.refs
    assert table.read(spark).count() == 10
