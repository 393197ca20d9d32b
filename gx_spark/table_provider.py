"""Table providers: snapshot identity + partition discovery.

The north rule targets Iceberg tables (snapshot-id + partition lineage); the
sandbox has no Iceberg runtime jar (SURVEY.md §0), so the abstraction is a
small interface with:

- ParquetDirTableProvider — parquet directory; snapshot_id is a content hash
  of the file listing (name, size, mtime), partitions come from a partition
  column's distinct values (pruned scans via parquet row-group stats /
  partition pruning when the directory is hive-partitioned).
- IcebergTableProvider — drop-in for real clusters: `spark.table(name)`,
  snapshot-id from the table's current_snapshot, partition predicates from
  the partitions metadata table.  Raises cleanly when the runtime is absent.
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


_READER_FORMATS = ("parquet", "csv", "json", "orc", "delta", "text")


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
    pushdown / partition pruning behave exactly as with spark.read."""
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


class IcebergTableProvider(TableProvider):
    """Iceberg path for real clusters (not loadable in-sandbox: no
    iceberg-spark-runtime jar, SURVEY.md §0)."""

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
