"""Suite planner: deduplicated metric plan → fused physical plan.

Re-creates the reference's two optimizer mechanisms (SURVEY.md §4.1–4.2) at
plan-build time, in Spark-native form:

1. **Metric deduplication** (ref: validator/validation_graph.py +
   core/id_dict.py#IDDict.to_id): every metric is keyed by a canonical id of
   (metric_name, domain, value kwargs); expectations sharing a metric get the
   same plan node.

2. **Aggregate bundling** (ref: sparkdf_execution_engine.py
   #resolve_metric_bundle): ALL bundleable aggregates of the whole suite —
   across every row_condition domain — are fused into ONE `df.agg(...)`.
   Row-condition domains are folded into each aggregate as
   `F.xxx(F.when(domain, col))` so a suite with many domains still costs a
   single scan.  Catalyst executes this as one partial (per-partition) +
   final (merge) HashAggregate pair — the DataFrame-level equivalent of a
   `treeAggregate` sketch merge.

Stages:
  stage1   — fused aggregate pass (one Spark job, no `bytes` column)
  stage2   — aggregates depending on stage1 values (z-scores), fused likewise
  data     — metrics that need their own shape (groupBy value_counts,
             duplicate detection, table joins); each its own job
  violations — one map-only pass building violation rows for ALL map
             expectations at once (violations.py)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .model import EngineOptions, metric_id


@dataclass(frozen=True)
class MetricRef:
    key: str


class MetricBag:
    """Resolved metric values keyed by metric id."""

    def __init__(self) -> None:
        self._values: dict[str, Any] = {}

    def put(self, key: str, value: Any) -> None:
        self._values[key] = value

    def __getitem__(self, ref: "MetricRef | str") -> Any:
        key = ref.key if isinstance(ref, MetricRef) else ref
        return self._values[key]

    def get(self, ref: "MetricRef | str", default: Any = None) -> Any:
        key = ref.key if isinstance(ref, MetricRef) else ref
        return self._values.get(key, default)


@dataclass
class ViolationSpec:
    """One map-expectation's contribution to the fused violations pass."""

    exp_index: int
    exp_type: str
    column: str
    # () -> Column (boolean: row is unexpected, already includes domain+null
    # guards).  Deferred so stage1/stage2-dependent conditions (z-score) can
    # close over resolved metric values.
    condition: Callable[[MetricBag], Column]
    # value expression for the observed (offending) value
    observed: Callable[[MetricBag], Column]


class MetricContext:
    """Collects deduplicated metric requests while planning a suite."""

    def __init__(
        self,
        df: DataFrame,
        options: EngineOptions,
        tables: dict[str, DataFrame] | None = None,
    ) -> None:
        self.df = df
        self.options = options
        self.tables = tables or {}
        self.schema = df.schema
        self.columns = set(df.columns)
        # stage1: key -> Column builder
        self._stage1: dict[str, Callable[[], Column]] = {}
        # observe: aggregates computed as Observation metrics ON the fused
        # violations pass (free-riding its scan).  Used for denominators of
        # expensive map conditions (audio) so the stage-1 agg never reads
        # the binary column at all.
        self._observe: dict[str, Callable[[], Column]] = {}
        # stage2: key -> builder taking resolved stage1 bag
        self._stage2: dict[str, Callable[[MetricBag], Column]] = {}
        # data metrics: key -> fn(df) -> value
        self._data: dict[str, Callable[[DataFrame], Any]] = {}
        self.violations: list[ViolationSpec] = []
        self._domains: dict[str, Column | None] = {}
        # derived columns (e.g. the audio-flags struct from the pandas UDF):
        # added to the projection of BOTH the fused agg pass and the fused
        # violations pass, so expensive per-row work (binary decode) happens
        # exactly once per pass, map-side, and never enters a shuffle.
        self.derived: dict[str, Column] = {}

    # ---- domain handling -------------------------------------------------

    def domain(self, row_condition: str | None) -> tuple[str, Column | None]:
        """Return (domain_key, filter Column|None) for a row_condition SQL
        string.  Catalyst parses the SQL verbatim (condition_parser="spark",
        ref: sparkdf_execution_engine.py#get_domain_records)."""
        key = row_condition or ""
        if key not in self._domains:
            self._domains[key] = F.expr(row_condition) if row_condition else None
        return key, self._domains[key]

    @staticmethod
    def guard(dom: Column | None, cond: Column) -> Column:
        return cond if dom is None else (dom & cond)

    # ---- metric registration (deduplicated) ------------------------------

    def agg(self, name: str, domain_key: str, value_kwargs: Any, builder: Callable[[], Column]) -> MetricRef:
        key = metric_id(name, domain_key, value_kwargs)
        if key not in self._stage1:
            self._stage1[key] = builder
        return MetricRef(key)

    def observe_metric(self, name: str, domain_key: str, value_kwargs: Any, builder: Callable[[], Column]) -> MetricRef:
        key = metric_id("obs", name, domain_key, value_kwargs)
        if key not in self._observe:
            self._observe[key] = builder
        return MetricRef(key)

    def agg2(self, name: str, domain_key: str, value_kwargs: Any, builder: Callable[[MetricBag], Column]) -> MetricRef:
        key = metric_id("s2", name, domain_key, value_kwargs)
        if key not in self._stage2:
            self._stage2[key] = builder
        return MetricRef(key)

    def data(self, name: str, domain_key: str, value_kwargs: Any, fn: Callable[[DataFrame], Any]) -> MetricRef:
        key = metric_id("data", name, domain_key, value_kwargs)
        if key not in self._data:
            self._data[key] = fn
        return MetricRef(key)

    def add_violation(self, spec: ViolationSpec) -> None:
        if self.options.collect_violations:
            self.violations.append(spec)

    def derived_column(self, name: str, col: Column) -> None:
        if name not in self.derived:
            self.derived[name] = col

    def base_df(self) -> DataFrame:
        df = self.df
        for name, col in self.derived.items():
            df = df.withColumn(name, col)
        return df

    # ---- common shared metrics ------------------------------------------

    def element_count(self, domain_key: str, dom: Column | None) -> MetricRef:
        if dom is None:
            return self.agg("table.row_count", "", None, lambda: F.count(F.lit(1)))
        return self.agg(
            "table.row_count",
            domain_key,
            None,
            lambda: F.coalesce(F.sum(F.when(dom, 1).otherwise(0)), F.lit(0)),
        )

    def nonnull_count(self, column: str, domain_key: str, dom: Column | None) -> MetricRef:
        cond = self.guard(dom, F.col(column).isNotNull())
        return self.agg(
            "column_values.nonnull.count",
            domain_key,
            column,
            lambda: F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)),
        )

    def unexpected_count(
        self,
        metric_name: str,
        column_key: Any,
        domain_key: str,
        value_kwargs: Any,
        cond: Column,
    ) -> MetricRef:
        """Bundleable `sum(when(unexpected, 1))` — the Spark-native form of the
        reference's `_spark_map_condition_unexpected_count_aggregate_fn`."""
        return self.agg(
            f"{metric_name}.unexpected_count",
            domain_key,
            [column_key, value_kwargs],
            lambda: F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)),
        )

    # ---- execution -------------------------------------------------------

    def resolve(self, bag: MetricBag) -> None:
        """Run the physical plan: fused stage1 agg, fused stage2 agg, then
        per-metric data jobs."""
        base = self.base_df()
        if self._stage1:
            exprs = [b().alias(k) for k, b in self._stage1.items()]
            row = base.agg(*exprs).collect()[0]
            for k in self._stage1:
                bag.put(k, row[k])
        if self._stage2:
            exprs = [b(bag).alias(k) for k, b in self._stage2.items()]
            row = base.agg(*exprs).collect()[0]
            for k in self._stage2:
                bag.put(k, row[k])
        for k, fn in self._data.items():
            bag.put(k, fn(self.df))

    @property
    def has_stage1(self) -> bool:
        return bool(self._stage1)
