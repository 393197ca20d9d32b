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


def resolve_evaluation_parameters(kwargs: dict[str, Any], params: dict[str, Any]) -> dict[str, Any]:
    out = {}
    for k, v in kwargs.items():
        if isinstance(v, dict) and set(v.keys()) == {"$PARAMETER"}:
            name = v["$PARAMETER"]
            if name not in params:
                raise KeyError(f"evaluation parameter {name!r} not provided")
            out[k] = params[name]
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
    ) -> None:
        self.spark = spark
        self.df = df
        self.options = options or EngineOptions()
        self.tables = tables or {}
        self.evaluation_parameters = dict(evaluation_parameters or {})
        self.suite_name = suite_name
        self._configs: list[ExpectationConfiguration] = []

    def __getattr__(self, name: str) -> Any:
        if not name.startswith("expect_"):
            raise AttributeError(name)
        if name not in list_expectations():
            raise AttributeError(f"unknown expectation_type: {name!r}")

        def call(**kwargs: Any) -> ExpectationValidationResult:
            resolved = resolve_evaluation_parameters(kwargs, self.evaluation_parameters)
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
