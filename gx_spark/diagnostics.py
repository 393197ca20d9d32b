"""Expectation self-check harness (ref: GE expectations/expectation.py
`run_diagnostics` + the gallery `examples` convention).

Upstream, every Expectation class can carry `examples` — small inline
datasets plus test cases ("in"/"out") — and `run_diagnostics()` executes
them against each execution engine, producing a maturity checklist.  This
engine has one execution engine (Catalyst), so the harness is leaner but
serves the same two users:

* custom-expectation AUTHORS get an immediate self-test: register a
  handler, attach `examples`, call `run_diagnostics(spark, name)`;
* the GALLERY role: `run_diagnostics_all(spark)` sweeps every registered
  type and reports which are example-covered and healthy.

Example shape (a direct translation of the public GE gallery schema):

    examples = [{
        "data": {"a": [1, 2, None]},            # column -> values
        "schema": "a int",                       # optional explicit DDL
        "tests": [
            {"title": "positive",
             "exact_match_out": False,
             "in": {"column": "a", "mostly": 0.5},   # expectation kwargs
             "out": {"success": True}},              # expected EVR fields
        ],
    }]

Supported `out` keys: `success` (required), `observed_value`,
`unexpected_count` — compared exactly (floats to 9 places).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from .model import EngineOptions, ExpectationSuite
from .registry import _REGISTRY, get_expectation


# Central gallery for built-ins (GE keeps examples on each class; four
# classes carry them as the authoring pattern, the rest live here so the
# handler files stay lean).  Handler-attached `examples` win.
GALLERY_EXAMPLES: dict[str, list[dict]] = {
    "expect_column_values_to_be_null": [{
        "data": {"a": [None, None, 3]}, "schema": "a int",
        "tests": [{"title": "non-null fails", "in": {"column": "a"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_not_be_in_set": [{
        "data": {"c": ["A", "B"]}, "schema": "c string",
        "tests": [{"title": "forbidden member flagged",
                   "in": {"column": "c", "value_set": ["B"]},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_match_regex": [{
        "data": {"s": ["ab1", "ab2", "xx"]}, "schema": "s string",
        "tests": [{"title": "one mismatch",
                   "in": {"column": "s", "regex": "^ab\\d$"},
                   "out": {"success": False, "unexpected_count": 1}},
                  {"title": "mostly passes",
                   "in": {"column": "s", "regex": "^ab\\d$", "mostly": 0.6},
                   "out": {"success": True}}]}],
    "expect_column_values_to_not_match_regex": [{
        "data": {"s": ["ok", "bad7"]}, "schema": "s string",
        "tests": [{"title": "digit suffix flagged",
                   "in": {"column": "s", "regex": "\\d"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_value_lengths_to_be_between": [{
        "data": {"s": ["a", "abcd", "abcdefgh"]}, "schema": "s string",
        "tests": [{"title": "bounds inclusive",
                   "in": {"column": "s", "min_value": 1, "max_value": 8},
                   "out": {"success": True, "unexpected_count": 0}},
                  {"title": "short value flagged",
                   "in": {"column": "s", "min_value": 2, "max_value": 8},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_value_lengths_to_equal": [{
        "data": {"s": ["ab", "cd", "xyz"]}, "schema": "s string",
        "tests": [{"title": "one wrong length",
                   "in": {"column": "s", "value": 2},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_be_json_parseable": [{
        "data": {"j": ['{"a": 1}', "[2, 3]", "{nope"]},
        "schema": "j string",
        "tests": [{"title": "malformed json flagged",
                   "in": {"column": "j"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_column_values_to_be_unique": [{
        "data": {"k": [1, 2, 2, 3]}, "schema": "k int",
        "tests": [{"title": "both members of a dup group count",
                   "in": {"column": "k"},
                   "out": {"success": False, "unexpected_count": 2}}]}],
    "expect_column_median_to_be_between": [{
        "data": {"v": [1.0, 2.0, 9.0]}, "schema": "v double",
        "tests": [{"title": "median observed",
                   "in": {"column": "v", "min_value": 2, "max_value": 2},
                   "out": {"success": True, "observed_value": 2.0}}]}],
    "expect_column_stdev_to_be_between": [{
        "data": {"v": [2.0, 4.0, 6.0]}, "schema": "v double",
        "tests": [{"title": "sample stdev (ddof=1) observed",
                   "in": {"column": "v", "min_value": 1.9, "max_value": 2.1},
                   "out": {"success": True, "observed_value": 2.0}}]}],
    "expect_column_min_to_be_between": [{
        "data": {"v": [5.0, 7.0]}, "schema": "v double",
        "tests": [{"title": "min observed",
                   "in": {"column": "v", "min_value": 4, "max_value": 6},
                   "out": {"success": True, "observed_value": 5.0}}]}],
    "expect_column_max_to_be_between": [{
        "data": {"v": [5.0, 7.0]}, "schema": "v double",
        "tests": [{"title": "out-of-band max fails",
                   "in": {"column": "v", "min_value": 1, "max_value": 6},
                   "out": {"success": False, "observed_value": 7.0}}]}],
    "expect_column_sum_to_be_between": [{
        "data": {"v": [1, 2, 3]}, "schema": "v int",
        "tests": [{"title": "sum observed",
                   "in": {"column": "v", "min_value": 6, "max_value": 6},
                   "out": {"success": True, "observed_value": 6.0}}]}],
    "expect_column_unique_value_count_to_be_between": [{
        "data": {"c": ["x", "x", "y", None]}, "schema": "c string",
        "tests": [{"title": "nulls excluded from distinct count",
                   "in": {"column": "c", "min_value": 2, "max_value": 2},
                   "out": {"success": True, "observed_value": 2}}]}],
    "expect_column_distinct_values_to_contain_set": [{
        "data": {"c": ["x", "y", "z"]}, "schema": "c string",
        "tests": [{"title": "missing required member fails",
                   "in": {"column": "c", "value_set": ["x", "w"]},
                   "out": {"success": False}}]}],
    "expect_table_row_count_to_be_between": [{
        "data": {"a": [1, 2, 3]}, "schema": "a int",
        "tests": [{"title": "count observed",
                   "in": {"min_value": 3, "max_value": 3},
                   "out": {"success": True, "observed_value": 3}}]}],
    "expect_table_row_count_to_equal": [{
        "data": {"a": [1, 2, 3]}, "schema": "a int",
        "tests": [{"title": "wrong expected count fails",
                   "in": {"value": 4},
                   "out": {"success": False, "observed_value": 3}}]}],
    "expect_column_pair_values_a_to_be_greater_than_b": [{
        "data": {"a": [5, 1], "b": [2, 4]}, "schema": "a int, b int",
        "tests": [{"title": "one inverted pair",
                   "in": {"column_A": "a", "column_B": "b"},
                   "out": {"success": False, "unexpected_count": 1}}]}],
    "expect_multicolumn_sum_to_equal": [{
        "data": {"a": [4, 2], "b": [6, 7]}, "schema": "a int, b int",
        "tests": [{"title": "one row off-total",
                   "in": {"column_list": ["a", "b"], "sum_total": 10},
                   "out": {"success": False, "unexpected_count": 1}}]}],
}


def _build_df(spark: SparkSession, data: dict, schema: str | None):
    cols = list(data)
    n = max((len(v) for v in data.values()), default=0)
    rows = [tuple(data[c][i] if i < len(data[c]) else None for c in cols)
            for i in range(n)]
    if schema:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows, cols)


def _check(title: str, passed: bool, details: str = "") -> dict:
    return {"check": title, "passed": bool(passed), "details": details}


def run_diagnostics(spark: SparkSession, expectation_type: str) -> dict:
    """Execute one expectation's registration/protocol/examples checklist.

    Returns {"expectation_type", "checklist": [{check, passed, details}],
    "examples_run", "examples_passed", "success"} — `success` means every
    applicable check passed (an expectation with no examples can still be
    'registered + protocol ok' but reports the missing-examples check as
    failed, mirroring the gallery's maturity gating)."""
    from .executor import validate

    checklist: list[dict] = []
    handler = None
    try:
        handler = get_expectation(expectation_type)
        checklist.append(_check("registered", True))
    except KeyError:
        checklist.append(_check("registered", False, "not in registry"))
    if handler is not None:
        checklist.append(_check(
            "plan protocol", callable(getattr(handler, "plan", None)),
            "handler.plan(ctx, cfg, index) missing or not callable"))
        import inspect

        # inspect.getdoc inherits: a handler documented by its base
        # protocol class (ColumnMapExpectation etc.) counts as documented
        doc = (inspect.getdoc(type(handler)) or "").strip()
        checklist.append(_check("docstring", bool(doc)))
    examples = list(getattr(handler, "examples", None)
                    or GALLERY_EXAMPLES.get(expectation_type) or [])
    checklist.append(_check(
        "examples provided", bool(examples),
        "" if examples else "attach `examples` to the handler class"))

    run = passed = 0
    for ei, ex in enumerate(examples):
        try:
            df = _build_df(spark, ex.get("data", {}), ex.get("schema"))
        except Exception as e:  # noqa: BLE001 — reported, not raised
            checklist.append(_check(f"example[{ei}] data builds", False,
                                    repr(e)))
            continue
        for t in ex.get("tests", []):
            run += 1
            title = f"example[{ei}] test {t.get('title', run)!r}"
            try:
                suite = ExpectationSuite(f"diag_{expectation_type}").add(
                    expectation_type, **t.get("in", {}))
                bundle = validate(
                    spark, df, suite,
                    EngineOptions(collect_violations=False))
                evr = bundle.suite_result.results[0]
            except Exception as e:  # noqa: BLE001
                checklist.append(_check(title, False, f"raised {e!r}"))
                continue
            want, got_details = t.get("out", {}), []
            ok = True
            if bool(evr.success) != bool(want.get("success", True)):
                ok = False
                got_details.append(f"success={evr.success}")
            for key in ("observed_value", "unexpected_count"):
                if key in want:
                    got = evr.result.get(key)
                    exp = want[key]
                    same = (round(float(got), 9) == round(float(exp), 9)
                            if isinstance(exp, (int, float))
                            and isinstance(got, (int, float))
                            else got == exp)
                    if not same:
                        ok = False
                        got_details.append(f"{key}={got!r} want {exp!r}")
            passed += ok
            checklist.append(_check(title, ok, "; ".join(got_details)))
    return {
        "expectation_type": expectation_type,
        "checklist": checklist,
        "examples_run": run,
        "examples_passed": passed,
        "success": all(c["passed"] for c in checklist),
    }


def run_diagnostics_all(spark: SparkSession) -> list[dict]:
    """Gallery sweep: diagnostics for every registered expectation type,
    sorted by name.  Types without examples report success=False on the
    examples check only — the summary separates 'healthy, example-covered'
    from 'registered but unexercised'."""
    return [run_diagnostics(spark, name) for name in sorted(_REGISTRY)]
