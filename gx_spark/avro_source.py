"""Distributed Avro batch source built on the pure-stdlib OCF codec.

This sandbox's Spark distribution ships avro-core jars but NOT the
`spark-avro` datasource module, so `spark.read.format("avro")` is
unavailable — yet Avro directories are a standard batch input for the
upstream library's Spark engine [GE: execution_engine/
sparkdf_execution_engine.py#get_batch_data_and_markers — reader_method
passes through to any registered DataFrameReader format].  This module
restores the capability Spark-first:

  file list (driver, metadata-only) -> one header read for the schema ->
  a `path string` DataFrame repartitioned to the file count ->
  `mapInPandas` where EACH TASK decodes its own files with
  gx_spark/avro_ocf.py (stdlib zlib/struct — no driver data path, no
  collect).  Parallelism unit = the file, exactly spark-avro's model; at
  10^12-row scale the work distributes with the file count and the driver
  touches one header.

Schema mapping follows the Avro 1.11 spec: primitives, fixed/enum,
arrays, maps, nested records, nullable unions (["null", X]), and the
date / timestamp-millis / timestamp-micros logical types.
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .avro_ocf import read_ocf


def _is_nullable_union(sch: Any) -> bool:
    return (isinstance(sch, list) and len(sch) == 2
            and "null" in [s if isinstance(s, str) else s.get("type")
                           for s in sch])


def _union_value_branch(sch: list) -> Any:
    for s in sch:
        if not (s == "null" or (isinstance(s, dict)
                                and s.get("type") == "null")):
            return s
    return "null"


def avro_to_spark_type(sch: Any) -> T.DataType:
    """Avro schema (parsed JSON) -> Spark DataType (spec §schemas)."""
    if isinstance(sch, list):                      # union
        if _is_nullable_union(sch):
            return avro_to_spark_type(_union_value_branch(sch))
        raise ValueError(f"avro: unsupported non-nullable union {sch!r}")
    if isinstance(sch, str):
        prim = {
            "boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "bytes": T.BinaryType(),
            "string": T.StringType(), "null": T.NullType(),
        }
        if sch in prim:
            return prim[sch]
        raise ValueError(f"avro: unsupported type {sch!r}")
    t = sch.get("type")
    lt = sch.get("logicalType")
    if lt == "date" and t == "int":
        return T.DateType()
    if lt in ("timestamp-millis", "timestamp-micros") and t == "long":
        return T.TimestampType()
    if t == "fixed":
        return T.BinaryType()
    if t == "enum":
        return T.StringType()
    if t == "array":
        return T.ArrayType(avro_to_spark_type(sch["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(sch["values"]))
    if t == "record":
        return T.StructType([
            T.StructField(f["name"], avro_to_spark_type(f["type"]),
                          nullable=True)
            for f in sch["fields"]])
    if isinstance(t, (str, list, dict)) and lt is None:
        return avro_to_spark_type(t)               # wrapped primitive
    raise ValueError(f"avro: unsupported schema {sch!r}")


def _logical_converter(sch: Any):
    """Returns a python-value converter for one field (or None)."""
    if isinstance(sch, list) and _is_nullable_union(sch):
        inner = _logical_converter(_union_value_branch(sch))
        if inner is None:
            return None
        return lambda v: None if v is None else inner(v)
    if isinstance(sch, dict):
        lt, t = sch.get("logicalType"), sch.get("type")
        if lt == "date" and t == "int":
            epoch = datetime.date(1970, 1, 1)
            return lambda v: epoch + datetime.timedelta(days=v)
        if lt == "timestamp-millis" and t == "long":
            return lambda v: datetime.datetime.utcfromtimestamp(v / 1e3)
        if lt == "timestamp-micros" and t == "long":
            return lambda v: datetime.datetime.utcfromtimestamp(v / 1e6)
    return None


def _avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith(".avro"):
                out.append(os.path.join(root, n))
    if not out:
        raise FileNotFoundError(f"no .avro files under {path}")
    return sorted(out)


def read_avro(spark: SparkSession, path: str,
              n_partitions: int | None = None) -> DataFrame:
    """Read an Avro OCF file or directory as a DataFrame, decoding
    DISTRIBUTED: each task handles its own files via the stdlib codec.
    The driver reads one header for the schema; rows never pass through
    the driver."""
    import pandas as pd

    files = _avro_files(path)
    avro_schema, _head = _read_header_schema(files[0])
    if not (isinstance(avro_schema, dict)
            and avro_schema.get("type") == "record"):
        raise ValueError("avro: top-level schema must be a record")
    spark_schema = avro_to_spark_type(avro_schema)
    fields = [(f["name"], _logical_converter(f["type"]))
              for f in avro_schema["fields"]]
    names = [n for n, _c in fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for p in b["path"]:
                _sch, records = read_ocf(p)
                cols: dict[str, list] = {n: [] for n in names}
                for r in records:
                    for n, conv in fields:
                        v = r.get(n)
                        cols[n].append(
                            conv(v) if (conv is not None and v is not None)
                            else v)
                yield pd.DataFrame(cols, columns=names)

    n_parts = n_partitions or min(
        len(files), spark.sparkContext.defaultParallelism)
    paths = spark.createDataFrame([(f,) for f in files], "path string")
    return paths.repartition(n_parts).mapInPandas(decode, spark_schema)


def _read_header_schema(path: str) -> tuple[Any, bytes]:
    """Read ONLY the OCF header (magic + metadata map + sync) — O(header)
    bytes, not the whole file; the schema probe for a 10^12-row table must
    not decode a data block."""
    import io
    import json

    from .avro_ocf import MAGIC, decode_value

    with open(path, "rb") as f:
        head = f.read(1 << 20)
    if head[:4] != MAGIC:
        raise ValueError(f"avro: bad magic in {path}")
    buf = io.BytesIO(head[4:])
    meta = decode_value(buf, {"type": "map", "values": "bytes"})
    sync = buf.read(16)
    return json.loads(meta["avro.schema"].decode()), sync
