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
