"""Beyond-equi-join operators Spark lacks natively: as-of join and
interval (range) join — expressed as compositions of built-in DataFrame
ops so Catalyst/Tungsten still run the hot path (no Python, no UDFs).

Reference analog: none (the reference's only join is the stream-static
point lookup, `Indexer.java:236-264`); these are the temporal/banded
lookups a training-data/event pipeline needs.

Scale design:

- **as-of join** = union-tag + partitioned sort + ``last(ignorenulls)``
  running window.  ONE shuffle on the join key, a per-partition sort, and
  a single pass — never the naive range-join (which explodes to
  |left|x|right| per key before picking the max).  Hot keys: salt the key
  with a coarse time bucket if one key dominates (same discipline as
  operators/skew.py).
- **interval join** = grid bucketing: intervals explode to the fixed-width
  grid cells they cover, points hash to their cell, equi-join on the cell,
  then the exact residual predicate.  Shuffle volume is
  O(points + intervals x cells_per_interval), never a cross join; Catalyst
  sees a plain equi-join so AQE/broadcast still apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              payload: list[str], suffix: str = "_r") -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key group
    (backward, inclusive — DuckDB/pandas ``ASOF JOIN`` semantics).  Left
    rows with no prior right row keep NULL payloads.

    Right rows with duplicate (key, ts) are pre-deduped deterministically
    (max over the payload tuple) so results never depend on partitioning.
    """
    l_cols = left.columns
    pay_out = [p + suffix for p in payload]

    r_dedup = (
        right.groupBy(*on, F.col(right_ts).alias("_ts"))
        .agg(F.max(F.struct(*payload)).alias("_p"))
        .select(*on, "_ts", *[F.col(f"_p.{p}").alias(p + suffix) for p in payload])
    )
    l_tagged = left.select(
        *l_cols, F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        *[F.lit(None).cast(r_dedup.schema[p].dataType).alias(p) for p in pay_out],
    )
    r_tagged = r_dedup.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c) for c in l_cols],
        "_ts", F.lit(0).alias("_side"), *pay_out,
    )
    w = (Window.partitionBy(*on).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = l_tagged.unionByName(r_tagged).select(
        *l_cols, "_side",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in pay_out],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, lo_col: str, hi_col: str,
                  grid: float) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (intervals may overlap; each match produces a
    row).  ``grid`` is the bucketing width — choose it near the median
    interval width so most intervals explode to O(1) cells.

    Both sides gain a ``_cell`` key; the join is a plain equi-join on it
    plus the exact residual range predicate.
    """
    cell = lambda c: F.floor(c / F.lit(grid)).cast("long")  # noqa: E731
    pts = points.withColumn("_cell", cell(F.col(point_col)))
    ivs = intervals.withColumn(
        "_cell",
        F.explode(F.sequence(cell(F.col(lo_col)),
                             cell(F.col(hi_col) - F.lit(1e-9)))),
    )
    out_cols = [c for c in points.columns] + \
               [c for c in intervals.columns if c not in points.columns]
    return (
        pts.join(ivs, "_cell")
        .filter((F.col(point_col) >= F.col(lo_col))
                & (F.col(point_col) < F.col(hi_col)))
        .select(*out_cols)
    )
