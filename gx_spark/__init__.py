"""gx-spark: a from-scratch PySpark-native expectation/validation engine.

Public API:

    from gx_spark import ExpectationSuite, EngineOptions, validate

    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="transcript", mostly=0.99
    )
    bundle = validate(spark, df, suite)
    bundle.success, bundle.suite_result.results, bundle.violations
"""

from .model import (
    EngineOptions,
    ExpectationConfiguration,
    ExpectationSuite,
    ExpectationValidationResult,
    SuiteValidationResult,
)
from .executor import ValidationBundle, ValidationRun, validate
from .profile import (
    MetricStore,
    Profiler,
    build_categorical_partition_object,
    build_continuous_partition_object,
    suggest_suite,
)
from .diagnostics import run_diagnostics, run_diagnostics_all
from .registry import list_expectations, load_plugins, register_expectation
from .validator import SparkDFDataset, Validator
from .wap import WapResult, validate_and_publish

__all__ = [
    "MetricStore",
    "Profiler",
    "suggest_suite",
    "SparkDFDataset",
    "Validator",
    "build_categorical_partition_object",
    "build_continuous_partition_object",
    "EngineOptions",
    "ExpectationConfiguration",
    "ExpectationSuite",
    "ExpectationValidationResult",
    "SuiteValidationResult",
    "ValidationBundle",
    "ValidationRun",
    "validate",
    "list_expectations",
    "load_plugins",
    "register_expectation",
    "run_diagnostics",
    "run_diagnostics_all",
    "WapResult",
    "validate_and_publish",
]

__version__ = "0.1.0"
