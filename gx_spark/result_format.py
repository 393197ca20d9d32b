"""`mostly` / null-denominator arithmetic and result-dict assembly.

This is the single most fixture-sensitive logic in the engine
(ref: great_expectations/expectations/expectation.py#ColumnMapExpectation._validate
and #_format_map_output).  Semantics reproduced exactly:

- For column-map expectations the denominator is the NON-NULL count of the
  target column (null rows are excluded from the domain), EXCEPT
  `expect_column_values_to_not_be_null`, which is evaluated over all rows
  (element_count denominator).
- success = unexpected_count == 0, or with mostly=m:
  (denominator - unexpected_count) / denominator >= m.
  Empty denominator → vacuous success (True).
- unexpected_percent (modern semantics) == unexpected_percent_nonmissing
  = 100 * unexpected_count / nonnull_count;
  unexpected_percent_total = 100 * unexpected_count / element_count.
"""

from __future__ import annotations

from typing import Any


def mostly_success(denominator: int, unexpected_count: int, mostly: float | None) -> bool:
    if denominator == 0:
        return True
    if mostly is None:
        return unexpected_count == 0
    return (denominator - unexpected_count) / denominator >= mostly


def build_map_result(
    *,
    element_count: int,
    nonnull_count: int,
    unexpected_count: int,
    result_format: str,
    denominator: str = "nonnull",  # "nonnull" | "all"
    partial_unexpected_list: list[Any] | None = None,
    partial_unexpected_index_list: list[Any] | None = None,
    partial_unexpected_counts: list[dict[str, Any]] | None = None,
    unexpected_list: list[Any] | None = None,
    unexpected_index_list: list[Any] | None = None,
    unexpected_index_query: str | None = None,
) -> dict[str, Any]:
    """Assemble the tiered result dict for a map-type expectation."""
    if result_format == "BOOLEAN_ONLY":
        return {}
    missing_count = element_count - nonnull_count
    denom = element_count if denominator == "all" else nonnull_count

    def pct(num: int, den: int) -> float | None:
        return (100.0 * num / den) if den else None

    result: dict[str, Any] = {
        "element_count": element_count,
        "missing_count": missing_count,
        "missing_percent": pct(missing_count, element_count),
        "unexpected_count": unexpected_count,
        "unexpected_percent": pct(unexpected_count, denom),
        "unexpected_percent_nonmissing": pct(unexpected_count, denom),
        "unexpected_percent_total": pct(unexpected_count, element_count),
        "partial_unexpected_list": partial_unexpected_list or [],
    }
    if result_format in ("SUMMARY", "COMPLETE"):
        result["partial_unexpected_index_list"] = partial_unexpected_index_list or []
        result["partial_unexpected_counts"] = partial_unexpected_counts or []
    if result_format == "COMPLETE":
        result["unexpected_list"] = unexpected_list if unexpected_list is not None else []
        result["unexpected_index_list"] = (
            unexpected_index_list if unexpected_index_list is not None else []
        )
        if unexpected_index_query is not None:
            # GE parity (SURVEY Appendix A): a query string that re-derives
            # the unexpected rows from the batch.  Spark-engine form matches
            # the reference's: df.filter(F.expr(<condition sql>)).
            result["unexpected_index_query"] = unexpected_index_query
    return result


def between_success(
    observed: Any,
    min_value: Any = None,
    max_value: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
) -> bool:
    """Bounds check shared by every *_to_be_between aggregate expectation.

    Open-ended bounds (None) always pass on that side; a None observed value
    (empty domain) fails unless both bounds are open.
    """
    if observed is None:
        return min_value is None and max_value is None
    ok = True
    if min_value is not None:
        ok = ok and (observed > min_value if strict_min else observed >= min_value)
    if max_value is not None:
        ok = ok and (observed < max_value if strict_max else observed <= max_value)
    return bool(ok)
