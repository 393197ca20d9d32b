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

from typing import Callable, Iterable

_REGISTRY: dict[str, object] = {}


def register_expectation(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY[name] = cls()
        return cls

    return deco


def load_plugins(specs: Iterable[str] | str = (),
                 entry_point_group: str = "gx_spark.plugins") -> list[str]:
    """Import custom-expectation plugins so suite JSON referencing them
    resolves (ref: GE's `plugins/` directory + contrib packages).

    `specs` — comma-separated string or iterable; each item is either
      * a dotted module path (`my_pkg.my_expectations`), imported normally;
      * a path to a `.py` file, imported under a synthetic module name; or
      * a directory, whose top-level `*.py` files are each imported
        (GE's plugins-dir convention — importing runs the
        @register_expectation decorators).
    Installed-package entry points in `entry_point_group` (contrib
    convention) are loaded as well.  Returns the module names imported;
    raises ImportError with the offending spec on failure."""
    import importlib
    import importlib.metadata as _md
    import importlib.util as _util
    import os

    if isinstance(specs, str):
        specs = [s for s in specs.split(",") if s.strip()]
    loaded: list[str] = []

    def _load_file(path: str) -> None:
        mod_name = "gx_plugin_" + os.path.splitext(
            os.path.basename(path))[0]
        spec = _util.spec_from_file_location(mod_name, path)
        if spec is None or spec.loader is None:
            raise ImportError(f"cannot load plugin file {path!r}")
        mod = _util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        loaded.append(mod_name)

    for raw in specs:
        s = raw.strip()
        if os.path.isdir(s):
            for fn in sorted(os.listdir(s)):
                if fn.endswith(".py") and not fn.startswith("_"):
                    _load_file(os.path.join(s, fn))
        elif s.endswith(".py") or os.path.isfile(s):
            _load_file(s)
        else:
            importlib.import_module(s)
            loaded.append(s)
    try:
        eps = _md.entry_points(group=entry_point_group)
    except TypeError:  # older importlib.metadata select API
        eps = _md.entry_points().get(entry_point_group, [])  # type: ignore
    for ep in eps:
        ep.load()
        loaded.append(f"{entry_point_group}:{ep.name}")
    return loaded


def get_expectation(name: str) -> object:
    if name not in _REGISTRY:
        raise KeyError(f"unknown expectation_type: {name!r}")
    return _REGISTRY[name]


def list_expectations() -> list[str]:
    return sorted(_REGISTRY)
