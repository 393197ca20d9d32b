"""Core data model: expectation configurations, suites, and validation results.

Re-creates the semantics of the reference's declarative model
(ref: great_expectations/core/expectation_configuration.py#ExpectationConfiguration,
great_expectations/core/expectation_validation_result.py#ExpectationValidationResult,
great_expectations/core/expectation_suite.py#ExpectationSuite) as plain frozen
dataclasses.  Nothing here touches Spark — this is the JSON-serializable
declarative layer.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any

RESULT_FORMATS = ("BOOLEAN_ONLY", "BASIC", "SUMMARY", "COMPLETE")


def canonical_json(obj: Any) -> str:
    """Deterministic JSON used for metric identity (ref: core/id_dict.py#IDDict.to_id)."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), default=str)


def metric_id(*parts: Any) -> str:
    return hashlib.md5(canonical_json(list(parts)).encode()).hexdigest()[:16]


@dataclass(frozen=True)
class ExpectationConfiguration:
    """One declarative assertion: type + kwargs.

    Common kwargs shared across expectation types (mirroring the reference):
      column / column_A / column_B / column_list : domain columns
      mostly          : float in (0,1]; success if fraction of non-null rows
                        passing the condition >= mostly
      row_condition   : SQL string pre-filter on the batch (Catalyst-parsed)
      result_format   : BOOLEAN_ONLY | BASIC | SUMMARY | COMPLETE
      catch_exceptions: bool — planner/runtime errors become exception EVRs
    """

    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": self.kwargs,
            "meta": self.meta,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationConfiguration":
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs", {})),
            meta=dict(d.get("meta", {})),
        )


@dataclass
class ExpectationSuite:
    name: str
    expectations: list[ExpectationConfiguration] = field(default_factory=list)
    meta: dict[str, Any] = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> "ExpectationSuite":
        self.expectations.append(ExpectationConfiguration(expectation_type, kwargs))
        return self

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "expectations": [e.to_dict() for e in self.expectations],
            "meta": self.meta,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationSuite":
        return cls(
            name=d["name"],
            expectations=[
                ExpectationConfiguration.from_dict(e) for e in d.get("expectations", [])
            ],
            meta=dict(d.get("meta", {})),
        )


@dataclass
class ExpectationValidationResult:
    """Per-expectation result (EVR).  Field semantics follow the reference's
    result schema (SURVEY.md Appendix A)."""

    success: bool
    expectation_config: ExpectationConfiguration
    result: dict[str, Any] = field(default_factory=dict)
    exception_info: dict[str, Any] = field(
        default_factory=lambda: {
            "raised_exception": False,
            "exception_message": None,
            "exception_traceback": None,
        }
    )
    meta: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "success": self.success,
            "expectation_config": self.expectation_config.to_dict(),
            "result": self.result,
            "exception_info": self.exception_info,
            "meta": self.meta,
        }


@dataclass
class SuiteValidationResult:
    """Suite roll-up (ref: ExpectationSuiteValidationResult)."""

    success: bool
    results: list[ExpectationValidationResult]
    suite_name: str
    run_id: str
    statistics: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_results(
        cls,
        results: list[ExpectationValidationResult],
        suite_name: str,
        run_id: str,
        meta: dict[str, Any] | None = None,
    ) -> "SuiteValidationResult":
        evaluated = len(results)
        successful = sum(1 for r in results if r.success)
        return cls(
            success=successful == evaluated,
            results=results,
            suite_name=suite_name,
            run_id=run_id,
            statistics={
                "evaluated_expectations": evaluated,
                "successful_expectations": successful,
                "unsuccessful_expectations": evaluated - successful,
                "success_percent": (100.0 * successful / evaluated) if evaluated else None,
            },
            meta=dict(meta or {}),
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "success": self.success,
            "results": [r.to_dict() for r in self.results],
            "suite_name": self.suite_name,
            "run_id": self.run_id,
            "statistics": self.statistics,
            "meta": self.meta,
        }


@dataclass(frozen=True)
class EngineOptions:
    """Engine-level knobs.

    mode: "exact" reproduces the reference's fixture-exact observed values;
          "sketch" switches cardinality/quantile/frequency metrics to
          mergeable sketch aggregates (HLL / KLL / CMS) for 10^12-row scale.
    """

    mode: str = "exact"  # "exact" | "sketch"
    result_format: str = "BASIC"
    # Persist (MEMORY_AND_DISK) the fused violations DataFrame for the
    # duration of the run so expensive map conditions (audio decode) are
    # evaluated exactly once per RUN, not once per downstream action
    # (unexpected-lists job, _violations write, count).  Callers release it
    # via ValidationBundle.unpersist().
    persist_violations: bool = True
    partial_unexpected_count: int = 20
    unexpected_index_column_names: tuple[str, ...] = ()
    collect_violations: bool = True
    hll_lgk: int = 12
    quantile_accuracy: int = 10000
    cms_eps: float = 0.001
    cms_confidence: float = 0.99
    cms_seed: int = 42
    # KS quantile-grid resolution (parameterized KS test): the statistic is
    # estimated from an m-point percentile_approx grid folded into the fused
    # agg, error <= 1/m + sketch accuracy (stat_tests.py)
    ks_resolution: int = 1024
    bootstrap_seed: int = 42
