"""Table providers: snapshot identity + partition discovery.

The north rule targets Iceberg tables (snapshot-id + partition lineage):

- IcebergLiteTableProvider — the primary north-rule provider: real Iceberg
  v2 on-disk layout via gx_spark/iceberg.py (pure Python, no runtime jar).
  snapshot_id() is the table's actual current snapshot id; partitions()
  is manifest-driven (metadata-only, no Spark job); incremental mode
  validates only files appended after a given snapshot.
- ParquetDirTableProvider / FileTableProvider — plain file directories;
  snapshot_id is a content hash of the file listing (name, size, mtime),
  partitions come from a partition column's distinct values.
- IcebergTableProvider — catalog tables on real clusters with the runtime
  jar: `spark.table(name)`, snapshot-id from current_snapshot, partition
  predicates from the partitions metadata table.  Raises cleanly when the
  runtime is absent (it is absent in-sandbox, SURVEY.md §0).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PartitionRef:
    partition_id: int
    predicate: str  # SQL predicate selecting this partition


class TableProvider:
    def load(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def snapshot_id(self) -> str:
        raise NotImplementedError

    def partitions(self, spark: SparkSession) -> list[PartitionRef]:
        raise NotImplementedError


_READER_FORMATS = ("parquet", "csv", "json", "orc", "delta", "text", "avro")


def read_batch(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: str | None = None,
    **reader_options: Any,
) -> DataFrame:
    """Path-batch convenience (ref: sparkdf_execution_engine.py
    #get_batch_data_and_markers — BatchSpec reader_method + reader_options):
    `read_batch(spark, "x.csv", "csv", header=True, inferSchema=True)`.
    Options pass straight through to the DataFrameReader, so predicate
    pushdown / partition pruning behave exactly as with spark.read.

    format='avro' routes through gx_spark/avro_source.py (this Spark
    distribution ships no spark-avro datasource jar): schema from one
    header read, per-task stdlib OCF decode via mapInPandas."""
    if format == "avro":
        from .avro_source import read_avro

        if schema is not None or reader_options:
            # the stdlib route has no DataFrameReader behind it — refusing
            # is better than silently ignoring a caller's schema/options
            raise ValueError(
                "format='avro' takes no schema/reader options (stdlib OCF "
                "route; the schema comes from the file header)")
        return read_avro(spark, path)
    if format not in _READER_FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {_READER_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    return reader.format(format).load(path)


class FileTableProvider(TableProvider):
    """Any spark.read format as a checkpointable table (csv/json/orc/parquet
    + reader options); snapshot identity is the file-listing content hash."""

    def __init__(
        self,
        path: str,
        format: str = "parquet",
        partition_column: str = "part_id",
        schema: str | None = None,
        **reader_options: Any,
    ) -> None:
        self.path = path
        self.format = format
        self.partition_column = partition_column
        self.schema = schema
        self.reader_options = reader_options

    def load(self, spark: SparkSession) -> DataFrame:
        return read_batch(spark, self.path, self.format, self.schema,
                          **self.reader_options)

    def snapshot_id(self) -> str:
        """Content hash of the manifest listing — changes iff files change
        (the parquet-world stand-in for an Iceberg snapshot id)."""
        entries = []
        if os.path.isdir(self.path):
            for root, _, files in os.walk(self.path):
                for fn in sorted(files):
                    if fn.startswith(("_", ".")):
                        continue
                    p = os.path.join(root, fn)
                    st = os.stat(p)
                    entries.append(f"{os.path.relpath(p, self.path)}:{st.st_size}:{int(st.st_mtime)}")
        else:
            st = os.stat(self.path)
            entries.append(f"{self.path}:{st.st_size}:{int(st.st_mtime)}")
        return hashlib.md5("\n".join(entries).encode()).hexdigest()[:16]

    def partitions(self, spark: SparkSession) -> list[PartitionRef]:
        col = self.partition_column
        values = [
            r[col]
            for r in self.load(spark).select(col).distinct().orderBy(col).collect()
        ]
        return [PartitionRef(int(v), f"{col} = {v}") for v in values]


class ParquetDirTableProvider(FileTableProvider):
    """Parquet-directory table (the original provider; kept as a named
    subclass of the generalized FileTableProvider)."""

    def __init__(self, path: str, partition_column: str = "part_id") -> None:
        super().__init__(path, format="parquet", partition_column=partition_column)


class IcebergLiteTableProvider(TableProvider):
    """Checkpointable provider over a gx_spark Iceberg-lite table
    (gx_spark/iceberg.py — the real Iceberg v2 on-disk layout, pure Python,
    no runtime jar needed).

    This is the provider the north rule describes: `snapshot_id()` is the
    table's ACTUAL current Iceberg snapshot id, and `partitions()` comes
    from the manifests — METADATA-ONLY, no Spark job, no data I/O (unlike
    FileTableProvider's distinct() scan).  The snapshot is pinned at
    construction so load()/snapshot_id()/partitions() stay consistent even
    if a writer commits mid-run; `incremental_from=<snapshot_id>` restricts
    the run to files appended after that snapshot (validate-only-new-data,
    the steady-state mode for a 10^12-row table that grows by appends).

    CheckpointRunner's `df.filter(partition predicate)` prunes hive
    partition dirs in the Spark scan, matching the manifest-level pruning
    plan_files() would produce."""

    def __init__(self, location: str, snapshot_id: int | None = None,
                 incremental_from: int | None = None) -> None:
        from .iceberg import IcebergLiteTable

        self.table = IcebergLiteTable(location)
        self._pinned = (snapshot_id if snapshot_id is not None
                        else self.table.current_snapshot_id())
        self.incremental_from = incremental_from

    def load(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark, snapshot_id=self._pinned,
                               added_after_snapshot_id=self.incremental_from)

    def snapshot_id(self) -> str:
        if self._pinned is None:
            raise ValueError("table has no snapshots yet")
        if self.incremental_from is not None:
            # distinct lineage key for an incremental slice
            return f"{self._pinned}-inc-{self.incremental_from}"
        return str(self._pinned)

    def partitions(self, spark: SparkSession) -> list[PartitionRef]:
        """Disjoint, covering partition slices keyed by the CURRENT
        default spec.  Fast path (every planned file was written under
        the default spec): tuples come straight from the manifests —
        metadata-only, no Spark job.  A spec-evolved table's old-era
        files carry other specs' tuples, so their current-spec values
        are derived from the data with ONE bounded distinct over the
        transform expressions (cardinality = partition count, not rows).
        Predicates are expressed over SOURCE columns (transform SQL for
        bucket/truncate/time fields), so they slice the loaded DataFrame
        no matter which era a row's file belongs to."""
        from .iceberg import transform_sql

        fields = self.table.partition_fields
        if not fields:
            return [PartitionRef(0, "1 = 1")]
        files = self.table.plan_files(
            snapshot_id=self._pinned,
            added_after_snapshot_id=self.incremental_from)
        pnames = [p["name"] for p in fields]
        default_sid = self.table.metadata["default-spec-id"]
        if all(f.spec_id == default_sid for f in files):
            tuples = {tuple(f.partition.get(c) for c in pnames)
                      for f in files}
        else:
            from .iceberg import transform_expr

            exprs = [
                transform_expr(p["transform"], p["source_name"],
                               p["source_type"]).alias(p["name"])
                for p in fields]
            tuples = {tuple(r[c] for c in pnames)
                      for r in self.load(spark).select(*exprs)
                      .distinct().collect()}
        sqls = [transform_sql(p["transform"], p["source_name"],
                              p["source_type"]) for p in fields]

        def lit(v):
            import datetime as _dt

            if isinstance(v, bool):
                return "TRUE" if v else "FALSE"
            if isinstance(v, str):
                escaped = v.replace("'", "''")
                return f"'{escaped}'"
            if isinstance(v, _dt.datetime):
                return f"timestamp'{v.isoformat(sep=' ')}'"
            if isinstance(v, _dt.date):
                return f"date'{v.isoformat()}'"
            return str(v)

        # identity fields keep bare-column predicates (readable lineage,
        # unchanged from the pre-transform provider); derived fields wrap
        wrapped = [sql if p["transform"] == "identity" else f"({sql})"
                   for sql, p in zip(sqls, fields)]
        refs = []
        ordered = sorted(tuples, key=lambda k: tuple(str(x) for x in k))
        for i, key in enumerate(ordered):
            pred = " AND ".join(
                f"{sql} IS NULL" if v is None else f"{sql} = {lit(v)}"
                for sql, v in zip(wrapped, key))
            pid = (key[0] if len(key) == 1 and isinstance(key[0], int)
                   and not isinstance(key[0], bool) else i)
            refs.append(PartitionRef(int(pid), pred))
        return refs


class IcebergTableProvider(TableProvider):
    """Catalog-Iceberg path for real clusters with the runtime jar (not
    loadable in-sandbox, SURVEY.md §0) — for jar-less use see
    IcebergLiteTableProvider above, which speaks the same on-disk format."""

    def __init__(self, table_name: str) -> None:
        self.table_name = table_name

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.table_name)

    def snapshot_id(self) -> str:
        raise NotImplementedError(
            "Iceberg runtime absent in-sandbox; on a real cluster: "
            "SELECT snapshot_id FROM <table>.snapshots ORDER BY committed_at DESC LIMIT 1"
        )

    def partitions(self, spark: SparkSession) -> list[PartitionRef]:
        raise NotImplementedError(
            "on a real cluster: read the <table>.partitions metadata table"
        )
