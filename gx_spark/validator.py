"""Interactive Validator: `validator.expect_*(...)` dispatch (ref:
great_expectations/validator/validator.py#Validator.__getattr__ — the
reference's primary interactive entry point, SURVEY.md §3.1).

Each call plans+executes a single-expectation suite eagerly and returns the
EVR; the accumulated configurations can be exported as a suite for batch
runs.  Evaluation parameters: kwargs values of the form
{"$PARAMETER": "<name>"} resolve from the validator's parameter dict (ref:
core/evaluation_parameters.py — URN indirection reduced to a lookup; the
stored-metrics table plays the URN store's role at scale)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .executor import ValidationRun
from .model import (
    EngineOptions,
    ExpectationConfiguration,
    ExpectationSuite,
    ExpectationValidationResult,
)
from .registry import list_expectations


def resolve_evaluation_parameters(
    kwargs: dict[str, Any], params: dict[str, Any], metric_store=None
) -> dict[str, Any]:
    """{"$PARAMETER": name} resolves from the parameter dict; a name of the
    form urn:gx:metric:<table>:<column>:<metric>[:<run_id>] resolves from the
    persistent MetricStore instead (the reference's URN indirection, ref:
    core/evaluation_parameters.py — a stored profiling run becomes the drift
    baseline for later validation runs)."""
    out = {}
    for k, v in kwargs.items():
        if isinstance(v, dict) and set(v.keys()) == {"$PARAMETER"}:
            name = v["$PARAMETER"]
            if isinstance(name, str) and name.startswith("urn:gx:metric:"):
                if metric_store is None:
                    raise KeyError(
                        f"{name!r} needs a MetricStore (pass metric_store=)"
                    )
                out[k] = metric_store.resolve_urn(name)
            elif name in params:
                out[k] = params[name]
            else:
                raise KeyError(f"evaluation parameter {name!r} not provided")
        else:
            out[k] = v
    return out


class Validator:
    def __init__(
        self,
        spark: SparkSession,
        df: DataFrame,
        options: EngineOptions | None = None,
        tables: dict[str, DataFrame] | None = None,
        evaluation_parameters: dict[str, Any] | None = None,
        suite_name: str = "interactive",
        metric_store=None,
    ) -> None:
        self.spark = spark
        self.df = df
        self.options = options or EngineOptions()
        self.tables = tables or {}
        self.evaluation_parameters = dict(evaluation_parameters or {})
        self.suite_name = suite_name
        self.metric_store = metric_store
        self._configs: list[ExpectationConfiguration] = []

    def head(self, n: int = 5) -> list[dict[str, Any]]:
        """table.head metric (ref: table_metrics/table_head.py): first n rows
        as dicts — a driver-side limit, never a full collect."""
        return [r.asDict(recursive=True) for r in self.df.limit(n).collect()]

    def __getattr__(self, name: str) -> Any:
        if not name.startswith("expect_"):
            raise AttributeError(name)
        if name not in list_expectations():
            raise AttributeError(f"unknown expectation_type: {name!r}")

        def call(**kwargs: Any) -> ExpectationValidationResult:
            resolved = resolve_evaluation_parameters(
                kwargs, self.evaluation_parameters, self.metric_store
            )
            cfg = ExpectationConfiguration(name, resolved)
            self._configs.append(cfg)
            suite = ExpectationSuite(self.suite_name, [cfg])
            bundle = ValidationRun(
                self.spark, suite, self.options, self.tables
            ).validate(self.df)
            return bundle.suite_result.results[0]

        return call

    def get_expectation_suite(self) -> ExpectationSuite:
        return ExpectationSuite(self.suite_name, list(self._configs))


class SparkDFDataset(Validator):
    """Legacy V2 wrapper: `SparkDFDataset(df).expect_column_values_to_not_be_null("c")`
    (ref: dataset/sparkdf_dataset.py#SparkDFDataset + MetaSparkDFDataset,
    SURVEY.md §3.3).

    V2 parity points: construction from a bare DataFrame, the positional
    column argument, and `.validate()` re-running every accumulated
    expectation.  The execution economics differ deliberately: upstream V2
    ran 2-3 uncoordinated jobs per expectation; here each eager call is one
    fused single-expectation run, and `.validate()` re-runs the WHOLE
    accumulated suite as one fused pass (V2-vs-V3 job collapse is the
    reference's own argument for bundling)."""

    def __init__(self, df: DataFrame, **kwargs: Any) -> None:
        super().__init__(df.sparkSession, df, suite_name="default", **kwargs)

    def __getattr__(self, name: str) -> Any:
        call = super().__getattr__(name)  # AttributeError for non-expect_*

        def v2call(*args: Any, **kwargs: Any) -> ExpectationValidationResult:
            if args:
                first = ("column_A" if "_pair_" in name
                         else "column_list" if ("multicolumn" in name
                                                or "compound" in name
                                                or "select_column" in name)
                         else "column")
                kwargs[first] = args[0]
                rest = args[1:]
                if rest and "_pair_" in name:
                    kwargs["column_B"] = rest[0]
                    rest = rest[1:]
                elif rest and name == "expect_column_values_to_be_in_set":
                    kwargs["value_set"] = rest[0]
                    rest = rest[1:]
                elif rest and name.endswith("_to_match_regex") or rest and name.endswith("_to_not_match_regex"):
                    kwargs["regex"] = rest[0]
                    rest = rest[1:]
                elif len(rest) >= 2 and "_to_be_between" in name:
                    kwargs["min_value"], kwargs["max_value"] = rest[0], rest[1]
                    rest = rest[2:]
                if rest:
                    raise TypeError(
                        f"{name}: pass remaining arguments as keywords "
                        f"(unconsumed positional args: {rest!r})"
                    )
            return call(**kwargs)

        return v2call

    def validate(self):
        """Re-run every accumulated expectation as ONE fused suite pass and
        return the SuiteValidationResult (ref: DataAsset.validate)."""
        suite = self.get_expectation_suite()
        bundle = ValidationRun(
            self.spark, suite, self.options, self.tables
        ).validate(self.df)
        return bundle.suite_result
