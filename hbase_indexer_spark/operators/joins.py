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
              payload: list[str], suffix: str = "_r",
              direction: str = "backward",
              tolerance=None) -> DataFrame:
    """For every left row, attach the payload of ONE right row in the
    same ``on`` key group chosen by ``direction`` — the full pandas
    ``merge_asof`` surface:

    - ``backward`` (default): greatest ``right_ts`` <= ``left_ts``
      (inclusive — DuckDB/pandas ASOF semantics);
    - ``forward``: smallest ``right_ts`` >= ``left_ts``;
    - ``nearest``: whichever of the two is closer by |Δts|; exact ties
      prefer the backward match (documented tie-break).

    ``tolerance`` (same units as the ts columns, which must be numeric
    when it or ``nearest`` is used): matches farther than the tolerance
    are nulled out, keeping left-join semantics.  Left rows with no
    admissible right row keep NULL payloads.

    Right rows with duplicate (key, ts) are pre-deduped deterministically
    (max over the payload tuple) so results never depend on partitioning.

    Scale: still ONE shuffle on the join key — each direction is a
    running ``last(ignorenulls)`` over the union-tagged stream (the
    forward pass is the same window sorted descending); ``nearest``
    costs one extra per-partition sort, never an extra exchange or a
    range join."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction {direction!r}: use "
                         "backward | forward | nearest")
    l_cols = left.columns
    pay_out = [p + suffix for p in payload]

    r_dedup = (
        right.groupBy(*on, F.col(right_ts).alias("_ts"))
        .agg(F.max(F.struct(*payload)).alias("_p"))
        .select(*on, "_ts", *[F.col(f"_p.{p}").alias(p + suffix) for p in payload])
    )
    mts_t = r_dedup.schema["_ts"].dataType
    l_tagged = left.select(
        *l_cols, F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        *[F.lit(None).cast(r_dedup.schema[p].dataType).alias(p) for p in pay_out],
        F.lit(None).cast(mts_t).alias("_mts"),
    )
    r_tagged = r_dedup.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c) for c in l_cols],
        "_ts", F.lit(0).alias("_side"), *pay_out,
        F.col("_ts").alias("_mts"),
    )
    uni = l_tagged.unionByName(r_tagged)

    def spec(backward: bool):
        # at equal ts the right row (side 0) must precede the left row
        # in scan order for inclusivity — true in both sort directions
        # with _side ascending
        order = [F.col("_ts").asc(), F.col("_side").asc()] if backward \
            else [F.col("_ts").desc(), F.col("_side").asc()]
        return (Window.partitionBy(*on).orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    def filled(tag: str, backward: bool):
        w = spec(backward)
        cols = [F.last(p, ignorenulls=True).over(w).alias(f"{p}__{tag}")
                for p in pay_out]
        cols.append(F.last("_mts", ignorenulls=True).over(w)
                    .alias(f"_mts__{tag}"))
        return cols

    if direction == "nearest":
        fill_cols = filled("b", True) + filled("f", False)
    else:
        fill_cols = filled("d", direction == "backward")
    st = uni.select(*l_cols, "_ts", "_side", *fill_cols) \
            .filter(F.col("_side") == 1)

    def admissible(tag: str):
        ok = F.col(f"_mts__{tag}").isNotNull()
        if tolerance is not None:
            ok = ok & (F.abs(F.col("_ts") - F.col(f"_mts__{tag}"))
                       <= F.lit(tolerance))
        return ok

    if direction == "nearest":
        db = F.abs(F.col("_ts") - F.col("_mts__b"))
        df_ = F.abs(F.col("_ts") - F.col("_mts__f"))
        use_b = admissible("b") & (
            ~admissible("f") | (db <= df_))  # tie -> backward
        out = [
            F.when(use_b, F.col(f"{p}__b"))
            .when(admissible("f"), F.col(f"{p}__f")).alias(p)
            for p in pay_out
        ]
    else:
        out = [F.when(admissible("d"), F.col(f"{p}__d")).alias(p)
               for p in pay_out]
    return st.select(*l_cols, *out)


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_lo: str, l_hi: str, r_lo: str, r_hi: str,
                          grid: int) -> DataFrame:
    """Interval x interval OVERLAP join: every (left, right) pair of
    half-open intervals with ``l_lo < r_hi AND r_lo < l_hi`` produces
    exactly ONE output row — the other classic range-join shape next to
    :func:`interval_join`'s point-in-interval.

    Bounds must be integral (e.g. epoch micros via ``ts_micros``; any
    sign — cell assignment uses true floor division via ``pmod``, so
    pre-epoch/negative bounds grid correctly instead of silently
    mis-bucketing under ``div``'s truncate-toward-zero, r8 ADVICE);
    ``grid`` is the cell width in the same units — pick it near the
    median interval length so each interval covers O(1) cells.
    Column names must not collide across the two sides (alias first).

    Scale: both sides explode to the grid cells they cover and meet in a
    plain EQUI-join on the cell — Catalyst sees a shuffle/broadcast hash
    join, never a BNLJ range join.  A pair overlapping in several shared
    cells is emitted once WITHOUT a distinct: only the first shared cell
    ``max(cell(l_lo), cell(r_lo))`` keeps the match (the standard
    dedup-free spatial-join trick — no second shuffle)."""
    g = int(grid)
    if g <= 0:
        raise ValueError("grid must be a positive integer")

    def fdiv(expr: str) -> str:
        # exact integer FLOOR division: pmod is non-negative, so the
        # numerator is an exact multiple of g and `div` can't truncate
        # in the wrong direction for negative bounds
        return f"((({expr}) - pmod(({expr}), {g})) div {g})"

    def cells(df: DataFrame, lo: str, hi: str) -> DataFrame:
        # half-open [lo, hi): last covered cell is floor((hi-1)/g);
        # empty or inverted intervals cover no cells and silently drop
        return df.filter(F.col(lo) < F.col(hi)).withColumn(
            "_cell", F.explode(F.sequence(
                F.expr(fdiv(lo)), F.expr(fdiv(f"{hi} - 1")))))

    l_c = cells(left, l_lo, l_hi)
    r_c = cells(right, r_lo, r_hi)
    first_shared = F.greatest(F.expr(fdiv(l_lo)), F.expr(fdiv(r_lo)))
    return (l_c.join(r_c, "_cell")
            .filter((F.col(l_lo) < F.col(r_hi))
                    & (F.col(r_lo) < F.col(l_hi))
                    & (F.col("_cell") == first_shared))
            .drop("_cell"))


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
