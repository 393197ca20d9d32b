"""Batch splitters and samplers (ref: great_expectations/execution_engine/
split_and_sample/{sparkdf_data_splitter.py#SparkDataSplitter,
sparkdf_data_sampler.py#SparkDataSampler}).

Splitters carve one table into batch slices (at scale these become Iceberg
partition predicates → partition pruning); samplers sub-sample a batch.
All pure DataFrame ops — predicates push down to the scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# splitters: df + params -> filtered df for ONE batch
# ---------------------------------------------------------------------------


def split_on_year(df: DataFrame, column: str, year: int) -> DataFrame:
    return df.filter(F.year(F.col(column)) == year)


def split_on_year_and_month(df: DataFrame, column: str, year: int, month: int) -> DataFrame:
    c = F.col(column)
    return df.filter((F.year(c) == year) & (F.month(c) == month))


def split_on_year_and_month_and_day(
    df: DataFrame, column: str, year: int, month: int, day: int
) -> DataFrame:
    c = F.col(column)
    return df.filter(
        (F.year(c) == year) & (F.month(c) == month) & (F.dayofmonth(c) == day)
    )


def split_on_column_value(df: DataFrame, column: str, value: Any) -> DataFrame:
    return df.filter(F.col(column) == F.lit(value))


def split_on_divided_integer(df: DataFrame, column: str, divisor: int, group: int) -> DataFrame:
    return df.filter(F.floor(F.col(column) / divisor) == group)


def split_on_mod_integer(df: DataFrame, column: str, mod: int, value: int) -> DataFrame:
    return df.filter(F.pmod(F.col(column), F.lit(mod)) == value)


def split_on_hashed_column(df: DataFrame, column: str, num_buckets: int, bucket: int) -> DataFrame:
    """Deterministic hash bucketing (xxhash64 — stable across runs, unlike
    F.hash across Spark versions only within a version)."""
    return df.filter(F.pmod(F.xxhash64(F.col(column)), F.lit(num_buckets)) == bucket)


def split_on_multi_column_values(df: DataFrame, values: dict[str, Any]) -> DataFrame:
    out = df
    for c, v in values.items():
        out = out.filter(F.col(c) == F.lit(v))
    return out


def split_values(df: DataFrame, column: str) -> list[Any]:
    """Discover the batch identifiers a column-value split produces."""
    return [r[column] for r in df.select(column).distinct().orderBy(column).collect()]


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def sample_using_limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def sample_using_random(df: DataFrame, p: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=p, seed=seed)


def sample_using_mod(df: DataFrame, column: str, mod: int, value: int) -> DataFrame:
    return df.filter(F.pmod(F.col(column), F.lit(mod)) == value)


def sample_using_a_list(df: DataFrame, column: str, value_list: list[Any]) -> DataFrame:
    return df.filter(F.col(column).isin(value_list))


def sample_using_hash(
    df: DataFrame, column: str, hash_digits: int = 1, matches: str = "0", seed: int = 0
) -> DataFrame:
    """Keep rows whose hash suffix matches (ref sampler hashes md5 hex)."""
    h = F.md5(F.concat(F.col(column).cast("string"), F.lit(str(seed))))
    return df.filter(F.substring(h, -hash_digits, hash_digits) == matches)
