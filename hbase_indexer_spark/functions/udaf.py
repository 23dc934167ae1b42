"""U7 — custom aggregate functions (UDAF extension point).

The reference has no UDAF surface (SURVEY.md §2.9 U7: N/A), but its
extension-point pattern (register-by-name, configure, use from config —
``ByteArrayValueMappers.java:128-142``) extends naturally to aggregates.
We expose Arrow-batched ``pandas_udf`` GROUPED_AGG functions behind the
same registry-by-name convention as the value mappers (U1) and pipeline
stages (U4).

Scale shape: GROUPED_AGG UDAFs are *not* map-side combinable — Spark
shuffles all rows of a group to one executor before the Python agg runs.
That is acceptable for bounded groups (here: per-event-type medians over
numeric samples) and the honest cost of exact rank statistics; for
combinable statistics prefer built-in aggregates, and for huge groups use
``percentile_approx`` (t-digest, partial-aggregable) instead.  Both paths
are provided so callers choose per-query.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGGREGATES: dict[str, Callable[..., Column]] = {}


def register_aggregate(name: str, fn: Callable[..., Column]) -> None:
    """Register a named aggregate: ``fn(col) -> Column`` (U1-style
    register-by-name, for use from engine config)."""
    _AGGREGATES[name] = fn


def get_aggregate(name: str) -> Callable[..., Column]:
    if name not in _AGGREGATES:
        raise KeyError(
            f"unknown aggregate {name!r}; registered: {sorted(_AGGREGATES)}"
        )
    return _AGGREGATES[name]


@F.pandas_udf("double")
def _median_udaf(v: pd.Series) -> float:
    # pandas interpolates the even-count midpoint as (a+b)/2 — the same
    # arithmetic DuckDB's median() uses, so doubles match bit-for-bit
    return float(v.median())


@F.pandas_udf("double")
def _geometric_mean_udaf(v: pd.Series) -> float:
    import numpy as np

    x = v[v > 0]
    if not len(x):
        return float("nan")
    return float(np.exp(np.log(x.astype("float64")).mean()))


def median(col) -> Column:
    """Exact median via Arrow GROUPED_AGG (whole group to one worker)."""
    return _median_udaf(col)


def geometric_mean(col) -> Column:
    """Geometric mean of the positive values via Arrow GROUPED_AGG."""
    return _geometric_mean_udaf(col)


register_aggregate("median", median)
register_aggregate("geometric_mean", geometric_mean)


def event_value_stats(events: DataFrame) -> DataFrame:
    """Per-event-type value statistics: built-in (partial-aggregable, JVM)
    aggregates and the registered Python UDAF each run in their own
    aggregation (Spark disallows mixing GROUPED_AGG UDFs with JVM
    aggregates in one ``agg``), then the per-group results — one row per
    event type, tiny — broadcast-join back together."""
    med = get_aggregate("median")
    jvm = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    py = events.groupBy("event_type").agg(
        med(F.col("value")).alias("median_value")
    )
    return jvm.join(F.broadcast(py), "event_type").orderBy("event_type")
