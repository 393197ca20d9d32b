"""Expectation registry (ref: great_expectations/expectations/registry.py).

Expectation handlers register under their snake_case type name.  A handler is
any object with:

    plan(ctx: MetricContext, cfg: ExpectationConfiguration, index: int)
        -> Callable[[MetricBag], ExpectationValidationResult]

i.e. it contributes metrics to the shared (deduplicated) plan and returns a
finalizer run after metric resolution.  Custom expectations plug in the same
way (SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, object] = {}


def register_expectation(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY[name] = cls()
        return cls

    return deco


def get_expectation(name: str) -> object:
    if name not in _REGISTRY:
        raise KeyError(f"unknown expectation_type: {name!r}")
    return _REGISTRY[name]


def list_expectations() -> list[str]:
    return sorted(_REGISTRY)
