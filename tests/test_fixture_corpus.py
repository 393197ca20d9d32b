"""GE-format JSON fixture corpus runner (SURVEY.md §5.1).

Mirrors the reference's cross-backend corpus semantics
(ref: tests/test_definitions/test_expectations_v3_api.py +
great_expectations/self_check/util.py#check_json_test_result):
one JSON file per expectation under tests/fixtures/, each with datasets
(data + spark schema) and tests (in/out).  `out` keys are subset-matched
(exact_match_out is not used by our authored corpus).  List-valued outputs
compare order-insensitively; floats with isclose.

An `_id` row-number column is auto-added to every dataset so
`unexpected_index_list` assertions work on Spark (the reference requires
`unexpected_index_column_names` on Spark too)."""

from __future__ import annotations

import glob
import json
import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import EngineOptions, ExpectationConfiguration, ExpectationSuite  # noqa: E402

FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")

_TYPE_MAP = {
    "IntegerType": "int",
    "LongType": "long",
    "DoubleType": "double",
    "FloatType": "float",
    "StringType": "string",
    "BooleanType": "boolean",
    "TimestampType": "timestamp",
    "DateType": "date",
}


def _cases():
    cases = []
    for path in sorted(glob.glob(f"{FIXTURE_DIR}/*.json")):
        with open(path) as f:
            spec = json.load(f)
        etype = spec["expectation_type"]
        for di, ds in enumerate(spec["datasets"]):
            for t in ds["tests"]:
                cases.append(
                    pytest.param(
                        etype, ds, t,
                        id=f"{os.path.basename(path)[:-5]}-d{di}-{t['title']}",
                    )
                )
    return cases


def _build_df(spark, ds):
    data = dict(ds["data"])
    n = len(next(iter(data.values())))
    if "_id" not in data:
        data["_id"] = list(range(n))
    schema_map = dict(ds["schemas"]["spark"])
    schema_map.setdefault("_id", "IntegerType")
    cols = list(data.keys())
    ddl = ", ".join(f"`{c}` {_TYPE_MAP[schema_map[c]]}" for c in cols)
    rows = [tuple(data[c][i] for c in cols) for i in range(n)]
    return spark.createDataFrame(rows, ddl)


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _cmp_value(key, got, want):
    if isinstance(want, list) and isinstance(got, list):
        return sorted(map(lambda x: json.dumps(_norm(x), sort_keys=True, default=str), got)) == \
            sorted(map(lambda x: json.dumps(_norm(x), sort_keys=True, default=str), want))
    if isinstance(want, float) and isinstance(got, (int, float)):
        return math.isclose(float(got), want, rel_tol=1e-7, abs_tol=1e-9)
    if isinstance(want, dict) and isinstance(got, dict):
        return all(_cmp_value(k, got.get(k), w) for k, w in want.items())
    return got == want


@pytest.mark.parametrize("etype,ds,t", _cases())
def test_fixture(spark, etype, ds, t):
    df = _build_df(spark, ds)
    cfg = ExpectationConfiguration(etype, dict(t["in"]))
    suite = ExpectationSuite("fixture", [cfg])
    options = EngineOptions(
        result_format="COMPLETE", unexpected_index_column_names=("_id",)
    )
    from gx_spark import validate

    bundle = validate(spark, df, suite, options)
    evr = bundle.suite_result.results[0]
    out = t["out"]
    if evr.exception_info.get("raised_exception") and not out.get("_expect_exception"):
        pytest.fail(f"unexpected exception: {evr.exception_info['exception_message']}")
    full = {"success": evr.success, **evr.result}
    for key, want in out.items():
        if key.startswith("_"):
            continue
        got = full.get(key)
        assert _cmp_value(key, got, want), (
            f"{key}: got={got!r} want={want!r}\nfull={json.dumps(full, default=str)[:800]}"
        )
