"""Aggregation-function registry with piper semantics.

Mirrors the reference registry (piper/src/pipeline/aggregation/mod.rs:78-104).
The reference implements each as a row-at-a-time accumulator; here each is a
Spark aggregate expression, so partial (map-side) + final aggregation and
spill come for free.  Documented deltas (SURVEY.md §2.3):

- ``avg``/``mean`` counts null rows in the denominator (aggregation/sum.rs:
  51-92) → sum/count(*) instead of F.avg;
- ``every``/``any`` treat null as false (all_any.rs) → coalesce first;
- ``array_agg`` keeps nulls in the reference, Spark collect_list drops them —
  the common (non-null) case matches; the delta is documented here rather
  than worked around with the struct-wrap trick.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _count(*args) -> Column:
    return F.count(F.lit(1))


def _count_if(cond) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def _distinct_count(*cols) -> Column:
    return F.countDistinct(*cols)


def _avg(x) -> Column:
    # piper denominator counts nulls (sum.rs:67-79).  NB: the reference also
    # TRUNCATES integer-column avg (Long sum / Long count via DivideOperator,
    # math_op.rs:197); a Column builder can't see input types, so the typed
    # DSL path (dsl.py summarize) appends .cast("long") — direct callers with
    # integer columns wanting exact reference parity should do the same.
    return F.sum(x) / F.count(F.lit(1))


def _every(b) -> Column:
    return F.bool_and(F.coalesce(b, F.lit(False)))


def _any(b) -> Column:
    return F.bool_or(F.coalesce(b, F.lit(False)))


def _first(x, ignore_null=None) -> Column:
    ign = bool(ignore_null) if not isinstance(ignore_null, Column) else False
    return F.first(x, ignorenulls=ign)


def _last(x, ignore_null=None) -> Column:
    ign = bool(ignore_null) if not isinstance(ignore_null, Column) else False
    return F.last(x, ignorenulls=ign)


def _array_agg_if(x, cond) -> Column:
    return F.collect_list(F.when(cond, x))


_AGG_REGISTRY: dict[str, object] = {
    "count": _count,
    "count_if": _count_if,
    "distinct_count": _distinct_count,
    "sum": F.sum,
    "avg": _avg,
    "mean": _avg,
    "min": F.min,
    "least": F.min,
    "max": F.max,
    "greatest": F.max,
    # piper argument order is (key, value): min_by(a, b) = value of b at the
    # minimum a (aggregation/min_max.rs:109-274).  Spark/DuckDB min_by(x, y)
    # is the REVERSE (x at minimum y), so swap.
    "min_by": lambda a, b: F.min_by(b, a),
    "max_by": lambda a, b: F.max_by(b, a),
    "every": _every,
    "any": _any,
    "some": _any,
    "first": _first,
    "first_value": _first,
    "last": _last,
    "last_value": _last,
    "array_agg": F.collect_list,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
    "array_agg_if": _array_agg_if,
}


def agg_fn(name: str):
    key = name.lower()
    if key not in _AGG_REGISTRY:
        raise KeyError(f"unknown aggregation function '{name}'")
    return _AGG_REGISTRY[key]


def agg_names() -> list[str]:
    return sorted(_AGG_REGISTRY)
