"""Key-salting utilities for skewed groupBys and large-large joins.

The north rule (BASELINE.json `north_star`) names "skew handled by
key-salted groupBy and AQE" as a required scale behavior.  This module is
the explicit salting half; the AQE half is configuration
(`spark.sql.adaptive.enabled` + `spark.sql.adaptive.skewJoin.enabled`,
set in `session_defaults()` below and applied by gx_spark.run / bench).

When salting is — and is not — needed
-------------------------------------
Catalyst already executes every algebraic aggregate (count/sum/min/max/
avg, and all the sketch aggregates we use) as partial (map-side combine)
+ final stages: a hot key emits ONE row per map task regardless of its
row count, so `groupBy(k).count()` does not skew and must NOT be salted
(salting it just adds a second shuffle).  Salting pays off exactly where
the map side cannot reduce:

1. holistic per-key aggregates — `collect_list`/`collect_set` state is
   proportional to the key's row count, so one hot key = one OOM task.
   `salted_groupby_collect` splits the key across `buckets` salt shards,
   collects per shard, then merges the (already-deduplicated, bounded)
   shard arrays.
2. shuffled joins with skewed keys — sort-merge/shuffled-hash routes all
   rows of a hot key to one task.  AQE's skew-join split handles inner
   joins at runtime; `salted_join` is the static fallback that also
   covers left_semi / left_anti (which AQE's OptimizeSkewedJoin rewrites
   only partially across Spark versions) and any plan where AQE is off.

`salted_join` replicates the RIGHT side `buckets`× (explode of a literal
salt array — map-side, no shuffle of its own beyond the join's) and
assigns each LEFT row a deterministic salt `pmod(xxhash64(key, uid), B)`.
Every right key exists under every salt value, so matching on
(key, salt) is exactly matching on (key): inner / left / left_semi /
left_anti semantics are preserved bit-for-bit (proved by
tests/test_skew.py against the unsalted plans and by the
`referential_salted_custkey` DuckDB oracle).  Right-side blowup is
`buckets * |right|` rows — use for large-LEFT/medium-RIGHT skew where
the right side is too big to broadcast but `buckets`× its size still
shuffles comfortably; size `buckets` ≈ (hot-key rows) / (target task
rows).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__gx_salt"

#: AQE knobs the engine expects on a real cluster (bench.py / run.py set
#: them; tests inherit conftest's session).  Documented here so operators
#: that rely on runtime skew-join splitting cite one place.
AQE_SKEW_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def session_defaults(builder):
    """Apply the AQE skew configs to a SparkSession.Builder."""
    for k, v in AQE_SKEW_CONFS.items():
        builder = builder.config(k, v)
    return builder


#: Measured binary-scan tuning (BENCH/BASELINE.md: 254 s -> 5.5 s on the
#: multi-MB-byte[]-row scan probe).  Small columnar batches keep a 32-row
#: slice of multi-MB binary rows resident instead of 4096 of them; vectored
#: parquet IO is a pessimization for huge cells; modest Arrow batches bound
#: the per-python-worker transfer.  These tax NARROW scans (~10% on TPC-H
#: columns), so they are applied only when the table being validated
#: actually carries a BinaryType column.  Batch sizes are sized to keep
#: batch BYTES modest for ~60 KB clip rows (re-measured round 5: 32/256
#: beat the round-4 128/1024 by ~17% at local[4] steady state — interleaved
#: A/B on the 240k-clip table).
BINARY_SCAN_CONFS: dict[str, str] = {
    "spark.sql.parquet.columnarReaderBatchSize": "32",
    "spark.hadoop.parquet.hadoop.vectored.io.enabled": "false",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
}

#: Paired JVM flag: byte[]-heavy scans thrash G1's region accounting;
#: ParallelGC measured far better on this workload.  Only effective at JVM
#: launch — builder.config when the session is being created here, or
#: spark.{driver,executor}.extraJavaOptions on a real spark-submit.
BINARY_SCAN_JVM_OPTS = "-XX:+UseParallelGC"


def binary_scan_session_defaults(builder):
    """Apply BINARY_SCAN_CONFS + the GC flag to a SparkSession.Builder
    (before the JVM exists).  The GC flag is APPENDED to any
    driver.extraJavaOptions already set on the builder — overwriting
    would silently drop user JVM flags (heap size, tmpdir, GC logging)
    configured upstream."""
    for k, v in BINARY_SCAN_CONFS.items():
        builder = builder.config(k, v)
    existing = getattr(builder, "_options", {}).get(
        "spark.driver.extraJavaOptions", "")
    if BINARY_SCAN_JVM_OPTS in existing.split():
        opts = existing
    else:
        opts = f"{existing} {BINARY_SCAN_JVM_OPTS}".strip()
    return builder.config("spark.driver.extraJavaOptions", opts)


def apply_binary_scan_confs(spark) -> list[str]:
    """Set the runtime-settable subset on an EXISTING session (the
    hadoop/SQL confs take effect per-query; the GC flag cannot be changed
    post-launch).  Returns the keys applied."""
    applied = []
    for k, v in BINARY_SCAN_CONFS.items():
        try:
            spark.conf.set(k, v)
            applied.append(k)
        except Exception:  # noqa: BLE001 — statically-locked conf on some builds
            pass
    return applied


def _salt_expr(keys: Sequence[str], buckets: int) -> Column:
    # xxhash64 over the key columns plus a per-row uid spreads a hot key
    # uniformly over the salt domain; deterministic given partitioning is
    # not required (the salt never leaves the query).
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
        F.lit(buckets),
    ).cast("int")


def salted_groupby_collect(
    df: DataFrame,
    keys: Sequence[str],
    collect_cols: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage `groupBy(keys).agg(collect_set(c))` that bounds per-task
    state under key skew.

    ``collect_cols`` maps input column -> output alias.  Stage 1 groups by
    (keys, salt) and collect_set's per shard (each shard holds at most the
    key's rows / buckets, and at most the column's distinct count after
    set-dedup); stage 2 merges shard arrays with flatten+array_distinct —
    an algebraic agg over pre-bounded arrays, so the final task for a hot
    key sees `buckets` arrays, not the key's raw rows.

    Equivalent to the unsalted plan up to array order (tests sort_array
    both sides).
    """
    keys = list(keys)
    stage1 = df.withColumn(_SALT, _salt_expr(keys, buckets)).groupBy(
        *keys, _SALT
    ).agg(
        *[F.collect_set(c).alias(a) for c, a in collect_cols.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[
            F.array_distinct(F.flatten(F.collect_list(a))).alias(a)
            for a in collect_cols.values()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe shuffled join on equality keys ``on``.

    Left rows get `salt = pmod(xxhash64(keys, uid), buckets)`; the right
    side is replicated once per salt value (posexplode of a literal
    array).  Joining on keys+salt splits each hot left key across
    ``buckets`` tasks while preserving exact join semantics for
    inner / left / left_semi / left_anti (every right key is present
    under every salt).

    Right/full-outer are rejected: replicating the right side would
    duplicate its unmatched rows.
    """
    how_l = how.lower().replace("outer", "").strip("_") or "inner"
    if how_l in ("right", "full"):
        raise ValueError(f"salted_join does not support how={how!r} "
                         "(right-side rows are replicated)")
    on = [on] if isinstance(on, str) else list(on)
    lefts = left.withColumn(_SALT, _salt_expr(on, buckets))
    rights = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = lefts.join(rights, on=on + [_SALT], how=how)
    # inner/left keep both sides' columns; semi/anti keep only the left's
    return out.drop(_SALT)


def salted_anti_keys(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Distinct fact keys absent from the dimension, skew-safe at both ends.

    Step 1 — `fact.select(k).distinct()`: distinct IS an algebraic
    aggregate (partial+final), so a hot FK value collapses map-side; the
    shuffle moves one row per (key, map task).  This alone removes the
    left-side skew a raw row-level anti-join would have.
    Step 2 — the distinct key sets can still be large-large (10^9 keys vs
    10^9 dim pks), so the anti-join itself goes through `salted_join`
    left_anti, which also shards any residual hash-partition hotspots.

    Returns a DataFrame with the single column ``fact_col`` (distinct
    missing keys).
    """
    fk = fact.select(F.col(fact_col)).where(F.col(fact_col).isNotNull()).distinct()
    pk = dim.select(F.col(dim_col).alias(fact_col)).distinct()
    return salted_join(fk, pk, on=fact_col, how="left_anti", buckets=buckets)
