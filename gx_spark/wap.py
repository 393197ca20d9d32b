"""Write-audit-publish (WAP) ingestion gate: stage a batch on an Iceberg
branch, AUDIT it with an expectation suite, and publish to main only if the
suite passes.

This is the pattern the upstream library documents as its flagship
"validate new data before it lands" workflow (GE checkpoints gating a
pipeline step) re-expressed on Iceberg's branch/fast-forward primitives
[GE: checkpoint/checkpoint.py#Checkpoint.run — the action-driven ingest
gate; Iceberg spec: branches + `system.fast_forward`]:

  1. STAGE  — append the batch to an audit branch.  Main's
     current-snapshot-id and snapshot-log never see it; concurrent readers
     keep seeing the last published state.
  2. AUDIT  — run the suite over EXACTLY the staged files (the incremental
     slice of the staged snapshot), not a re-read of the whole table, so
     the gate costs one batch-sized validation at any table size.
  3. PUBLISH — on success, fast-forward main to the staged head (pure
     metadata, O(1) in data size) and drop the audit branch.  On failure,
     the staged snapshot is preserved under a `rejected-<snapshot-id>` TAG
     (protected from expire_snapshots) for debugging, or dropped entirely
     with keep_rejected=False — then the next expire_snapshots reclaims
     its files.

At 10^12-row scale every step is bounded by the BATCH, not the table:
the append is batch-sized, the audit validates batch-sized input, and the
publish moves one pointer.  A concurrent writer that advances main between
stage and publish makes the fast-forward raise (fast-forward-only
guarantee) — the caller re-stages, which is Iceberg's documented WAP retry
semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any


@dataclass
class WapResult:
    """Outcome of one validate_and_publish call."""
    published: bool
    snapshot_id: int
    bundle: Any                      # ValidationBundle from the audit step
    rejected_tag: str | None = None  # tag holding the failed stage, if kept


def validate_and_publish(spark, table, df, suite, options=None,
                         audit_branch: str = "audit",
                         keep_rejected: bool = True,
                         now_ms: int | None = None,
                         operation_id: str | None = None) -> WapResult:
    """Stage `df` on `audit_branch`, validate the staged rows with
    `suite`, and fast-forward main iff the suite passes.

    The audit branch is transient: created at main's head for the stage,
    dropped after publish or rejection, so repeated calls are independent
    gates.  operation_id gives the stage the same idempotent-replay
    contract as append() — a retried batch that already staged+published
    is a no-op.

    Returns WapResult(published, snapshot_id, bundle, rejected_tag)."""
    from .executor import validate

    refs = table.refs
    resumed = False
    if audit_branch in refs:
        # crash recovery: if the leftover branch head is OUR stage (same
        # operation_id), resume the audit from it instead of re-appending
        # — the gate stays exactly-once across a crash between stage and
        # publish.  Anyone else's branch is a hard error.
        head = refs[audit_branch]["snapshot-id"]
        snap = next(s for s in table.metadata["snapshots"]
                    if s["snapshot-id"] == head)
        if (operation_id is not None
                and snap.get("summary", {}).get("operation-id")
                == operation_id):
            sid, parent = head, snap.get("parent-snapshot-id")
            resumed = True
        else:
            raise ValueError(
                f"audit branch {audit_branch!r} already exists — a "
                "previous gate is in flight or was left behind; drop it "
                "or use another name")
    if not resumed:
        parent = table.current_snapshot_id()
        sid = table.append(df, branch=audit_branch, now_ms=now_ms,
                           operation_id=operation_id)
    if (not resumed and operation_id is not None
            and audit_branch not in (table.metadata.get("refs") or {})):
        # append was an idempotent no-op (operation_id replay): the
        # earlier gate already completed.  Published iff the staged
        # snapshot is reachable from main; a rejected replay reports its
        # surviving tag.  No re-validation — the verdict already landed.
        by_id = {s["snapshot-id"]: s for s in table.metadata["snapshots"]}
        cur = table.current_snapshot_id()
        while cur is not None and cur != sid:
            cur = by_id.get(cur, {}).get("parent-snapshot-id")
        tag = f"rejected-{sid}"
        kept = tag if tag in (table.metadata.get("refs") or {}) else None
        return WapResult(cur == sid, sid, None, kept)
    staged = (table.read(spark, snapshot_id=sid,
                         added_after_snapshot_id=parent)
              if parent is not None
              else table.read(spark, snapshot_id=sid))
    bundle = validate(spark, staged, suite, options)
    if bundle.success:
        table.fast_forward("main", audit_branch)
        table.drop_ref(audit_branch)
        return WapResult(True, sid, bundle)
    rejected_tag = None
    if keep_rejected:
        rejected_tag = f"rejected-{sid}"
        # idempotent under crash recovery: a resumed rejection may have
        # already created this (deterministically named) tag before dying
        # between create_tag and drop_ref — re-raising there would
        # crash-loop a replayed micro-batch forever
        if rejected_tag not in table.refs:
            table.create_tag(rejected_tag, sid)
    table.drop_ref(audit_branch)
    return WapResult(False, sid, bundle, rejected_tag)
