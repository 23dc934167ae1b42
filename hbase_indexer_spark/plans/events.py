"""Event-product analytics: funnels and retention cohorts.

The batch-scan surface (`plans/analytics.py`) covers the TPC-H-shaped
warehouse queries; this module adds the event-stream product analytics
every change-capture consumer ends up writing: ordered-step conversion
funnels and cohort retention grids.  Timestamps go through
``functions/timeutil`` (dtype-aware micros) so the DuckDB oracles are
bit-exact on the TIMESTAMP_NTZ parquet (see timeutil module docstring).

Scale notes: both operators reduce the event table to per-user
aggregates in ONE combinable pass (conditional min / min per user), so
the only full-width shuffle is keyed by user_id; the funnel/cohort
grids themselves are tiny (steps, weeks²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_US = 7 * 86_400 * 1_000_000


def event_funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered-step conversion funnel: a user reaches step ``k`` when
    every step ``1..k`` occurred and each step's FIRST occurrence is
    strictly after the previous step's first occurrence (the standard
    strictly-ordered funnel — re-ordered events don't count).

    Returns one row per step: ``(step_idx, step, n_users, pct_of_first)``
    with ``pct_of_first`` an integer percent of step-1 reachers.

    Scale: one conditional-min aggregation per user (combinable), then
    per-user depth arithmetic (map) and a steps-sized count — the event
    table is scanned once and shuffled once (by user)."""
    from hbase_indexer_spark.functions.timeutil import ts_micros

    us = ts_micros(events)
    mins = events.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == s, us)).alias(f"t{i}")
        for i, s in enumerate(steps)
    ])
    # depth = largest k with t0 < t1 < ... < t(k-1) all present; the WHEN
    # chain is built deepest-first so the deepest satisfied level wins
    conds = [F.col("t0").isNotNull()]
    for i in range(1, len(steps)):
        conds.append(conds[-1] & F.col(f"t{i}").isNotNull()
                     & (F.col(f"t{i}") > F.col(f"t{i - 1}")))
    # wrap ascending: the LAST wrap (deepest step) becomes the outermost
    # WHEN, so the deepest satisfied level wins
    d = F.lit(0)
    for i in range(len(steps)):
        d = F.when(conds[i], F.lit(i + 1)).otherwise(d)
    depths = mins.select(d.alias("depth"))
    counts = depths.groupBy("depth").agg(F.count(F.lit(1)).alias("n"))
    # users at depth >= k reach step k: suffix-sum the tiny depth table
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step_idx int, step string")
    reached = (
        steps_df.join(counts, counts.depth >= steps_df.step_idx, "left")
        .groupBy("step_idx", "step")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_users"))
    )
    first = reached.filter(F.col("step_idx") == 1) \
        .select(F.col("n_users").alias("n_first"))
    return (
        reached.crossJoin(F.broadcast(first))
        .select(
            "step_idx", "step", "n_users",
            F.when(F.col("n_first") > 0,
                   F.expr("(100 * n_users) div n_first"))
            .alias("pct_of_first"),
        )
    )


def event_funnel_sql(steps: list[str]) -> str:
    us = "epoch_us(ts)"
    # SQL-escape step names by '' doubling — an apostrophe in an
    # event_type must not truncate the literal
    steps = [s.replace("'", "''") for s in steps]
    mins = ", ".join(
        f"min(CASE WHEN event_type = '{s}' THEN {us} END) AS t{i}"
        for i, s in enumerate(steps))
    conds = ["t0 IS NOT NULL"]
    for i in range(1, len(steps)):
        conds.append(conds[-1] + f" AND t{i} IS NOT NULL"
                     f" AND t{i} > t{i - 1}")
    whens = " ".join(
        f"WHEN {conds[i]} THEN {i + 1}"
        for i in reversed(range(len(steps))))
    steps_values = ", ".join(
        f"({i + 1}, '{s}')" for i, s in enumerate(steps))
    return f"""
        WITH mins AS (
            SELECT user_id, {mins} FROM events GROUP BY user_id
        ),
        depths AS (
            SELECT CASE {whens} ELSE 0 END AS depth FROM mins
        ),
        counts AS (SELECT depth, count(*) AS n FROM depths GROUP BY depth),
        steps(step_idx, step) AS (VALUES {steps_values}),
        reached AS (
            SELECT s.step_idx, s.step,
                   CAST(coalesce(sum(c.n), 0) AS BIGINT) AS n_users
            FROM steps s LEFT JOIN counts c ON c.depth >= s.step_idx
            GROUP BY s.step_idx, s.step
        )
        SELECT r.step_idx, r.step, r.n_users,
               CAST(CASE WHEN f.n_first > 0
                    THEN (100 * r.n_users) // f.n_first END
                   AS BIGINT) AS pct_of_first
        FROM reached r
        CROSS JOIN (SELECT n_users AS n_first FROM reached
                    WHERE step_idx = 1) f
    """


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention grid: users grouped by first-seen week; for each
    later week offset, how many of that cohort were active.  The table
    behind every retention curve.

    Returns ``(cohort_week, week_offset, n_users)``.

    Scale: first-seen is one combinable min per user; activity is a
    per-(user, week) distinct (combinable); the grid join is keyed by
    user_id — the grid itself is weeks² rows."""
    from hbase_indexer_spark.functions.timeutil import ts_micros

    us = ts_micros(events)
    # floor division (matches DuckDB //), not truncation: for pre-1970
    # events _us is negative and `div` would round toward zero, shifting
    # the week bucket up by one vs the oracle.
    week = F.expr(
        f"(_us div {WEEK_US})"
        f" - (CASE WHEN _us < 0 AND _us % {WEEK_US} != 0"
        f"     THEN 1 ELSE 0 END)")
    weeks = events.select("user_id", us.alias("_us")) \
        .select("user_id", week.alias("week")).distinct()
    first = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(first, "user_id")
        .groupBy("cohort_week",
                 (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def retention_cohorts_sql() -> str:
    us = "epoch_us(ts)"
    return f"""
        WITH weeks AS (
            SELECT DISTINCT user_id, ({us}) // {WEEK_US} AS week
            FROM events
        ),
        first AS (
            SELECT user_id, min(week) AS cohort_week
            FROM weeks GROUP BY user_id
        )
        SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
               count(*) AS n_users
        FROM weeks w JOIN first f USING (user_id)
        GROUP BY 1, 2
    """


def json_key_profile(events: DataFrame, json_col: str = "props") -> DataFrame:
    """Per-key profile of a semi-structured JSON payload column — the
    data-quality report that decides whether a props key is promotable
    to a real column: for every key appearing anywhere in the corpus,
    how many rows carry it, its coverage in ppm of all rows, and how
    many distinct (stringified) values it takes.

    Returns ``(key, n_present, present_ppm, n_distinct_values)`` —
    keys sorted by the caller.  Contract: FLAT JSON objects (scalar
    values); rows with NULL / unparseable payloads count toward the
    denominator but contribute no keys (both engines drop them the
    same way).

    Scale: one ``from_json -> map -> explode`` pass (map-side, no
    Python) into ONE combinable count + count(distinct) aggregation
    keyed by (key) — the profile is keys-sized. The total-rows scalar
    joins back as the allowlisted 1x1 broadcast. At 100 TB the payload
    column is scanned once; nothing driver-side."""
    kv = events.select(
        F.explode(F.from_json(F.col(json_col), "map<string,string>"))
        .alias("key", "val"))
    total = events.agg(F.count(F.lit(1)).alias("n_rows"))
    prof = kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.countDistinct("val").alias("n_distinct_values"))
    return prof.crossJoin(F.broadcast(total)).select(
        "key",
        "n_present",
        F.expr("(1000000 * n_present) div n_rows").alias("present_ppm"),
        "n_distinct_values",
    )


def json_key_profile_sql(json_col: str = "props",
                         table: str = "events") -> str:
    return f"""
        WITH ok AS (
            -- Spark's from_json silently NULLs malformed / non-object
            -- payloads; DuckDB's json_keys throws — pre-filter to the
            -- same surviving set
            SELECT {json_col} FROM {table}
            WHERE {json_col} IS NOT NULL
              AND json_valid({json_col})
              AND json_type({json_col}) = 'OBJECT'
        ),
        kv AS (
            SELECT k.key AS key,
                   json_extract_string({json_col}, '$.' || k.key) AS val
            FROM ok, UNNEST(json_keys({json_col})) AS k(key)
        ),
        total AS (SELECT count(*) AS n_rows FROM {table})
        SELECT kv.key,
               CAST(count(*) AS BIGINT) AS n_present,
               CAST((1000000 * count(*)) // t.n_rows AS BIGINT)
                   AS present_ppm,
               CAST(count(DISTINCT kv.val) AS BIGINT)
                   AS n_distinct_values
        FROM kv CROSS JOIN total t
        GROUP BY kv.key, t.n_rows
    """


# ---------------------------------------------------------------------------
# Gap-filled time buckets + last-observation-carried-forward (r8)
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000


def gapfill_locf(events: DataFrame, group_col: str = "event_type",
                 ts_col: str = "ts", value_col: str = "value",
                 min_value: float = 0.0) -> DataFrame:
    """Gap-filled daily rollup with LOCF — the hypertable
    ``time_bucket_gapfill + locf`` analog (TimescaleDB/InfluxDB surface)
    re-expressed as three DataFrame ops: bucket, grid, window-fill.

    Per ``(group, day)`` the gauge is the day's max ``value`` in integer
    cents (``floor(value * 100)`` — IEEE multiply + floor agree
    cross-engine) over events with ``value >= min_value`` (a pushed
    scan predicate; raise it to thin dense streams into gauges with
    real gaps); days inside the GLOBAL [min_day, max_day] span with no
    observation appear with the PREVIOUS observed gauge
    (last-observation-carried-forward) and ``is_gap = 1``; days before
    a group's first observation stay NULL (nothing to carry).

    Returns ``(group, day, gauge_cents, is_gap)``.

    Scale: one combinable (group, day) aggregate over the events; the
    grid is (groups x days)-sized — aggregate-scale, built from a
    1-row min/max broadcast, never a re-scan; the LOCF fill is ONE
    ``last(ignorenulls)`` window partitioned by group (parallel across
    groups, no global sort).  At 100 TB the events pass stays the only
    full-width stage."""
    from hbase_indexer_spark.functions.timeutil import ts_micros

    daily = (events.filter(F.col(value_col) >= min_value)
             .withColumn("_us", ts_micros(events, ts_col))
             .withColumn("_day", F.expr(f"_us div {DAY_US}"))
             .groupBy(F.col(group_col).alias("grp"), "_day")
             .agg(F.max(F.floor(F.col(value_col) * 100)).cast("long")
                  .alias("gauge_cents")))
    bounds = daily.agg(F.min("_day").alias("lo"), F.max("_day").alias("hi"))
    grid = (daily.select("grp").distinct()
            .crossJoin(F.broadcast(bounds))
            .select("grp", F.explode(F.sequence("lo", "hi")).alias("_day")))
    from pyspark.sql.window import Window

    w = (Window.partitionBy("grp").orderBy("_day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (grid.join(daily, ["grp", "_day"], "left")
              .withColumn("is_gap",
                          F.col("gauge_cents").isNull().cast("int"))
              .withColumn("fill",
                          F.last("gauge_cents", ignorenulls=True).over(w)))
    return (filled.select(
        F.col("grp").alias(group_col),
        F.col("_day").cast("long").alias("day"),
        F.col("fill").alias("gauge_cents"), "is_gap")
        .orderBy(group_col, "day"))


def gapfill_locf_sql(group_col: str = "event_type",
                     value_col: str = "value",
                     table: str = "events",
                     min_value: float = 0.0) -> str:
    return f"""
        WITH daily AS (
            SELECT {group_col} AS grp, epoch_us(ts) // {DAY_US} AS day,
                   CAST(max(floor({value_col} * 100)) AS BIGINT)
                       AS gauge_cents
            FROM {table}
            WHERE {value_col} >= {min_value}
            GROUP BY 1, 2
        ),
        bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        grid AS (
            -- scalar generate_series (list) + unnest: the table-function
            -- form cannot take lateral column parameters in DuckDB
            SELECT g.grp, unnest(generate_series(b.lo, b.hi)) AS day
            FROM (SELECT DISTINCT grp FROM daily) g, bounds b
        )
        SELECT grid.grp AS {group_col},
               CAST(grid.day AS BIGINT) AS day,
               last_value(d.gauge_cents IGNORE NULLS) OVER (
                   PARTITION BY grid.grp ORDER BY grid.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS gauge_cents,
               CAST(CASE WHEN d.gauge_cents IS NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS is_gap
        FROM grid LEFT JOIN daily d
          ON grid.grp = d.grp AND grid.day = d.day
        ORDER BY {group_col}, day
    """


# ---------------------------------------------------------------------------
# Position-based multi-touch attribution (r8)
# ---------------------------------------------------------------------------

def attribution_position(events: DataFrame, touch_type: str = "click",
                         convert_type: str = "purchase",
                         window_days: int = 7) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — the product
    analytics standard next to last-touch (which the as-of join
    covers): for every conversion, the touches in the prior
    ``window_days`` split credit 40% first / 40% last / 20% shared by
    the middles (1 touch -> 100%, 2 -> 50/50).

    Returns per conversion: ``(purchase_id, user_id, n_touches,
    first_touch_id, last_touch_id, mid_credit_ppm)`` — ppm integers so
    the split is exact cross-engine (``200000 div (n-2)``); conversions
    with no touch in the window keep NULL touch ids and 0 ppm.

    Scale: ONE equi-join on user_id with the bounded time-range
    residual (per-user touches x conversions, never a global range
    join) and ONE combinable per-conversion aggregate; first/last ride
    arg-min/arg-max structs, no window sort."""
    from hbase_indexer_spark.functions.timeutil import ts_micros

    win_us = window_days * DAY_US
    base = events.select("event_id", "user_id", "event_type",
                         ts_micros(events, "ts").alias("_us"))
    conv = (base.filter(F.col("event_type") == convert_type)
            .select(F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("c_user"),
                    F.col("_us").alias("c_us")))
    touch = (base.filter(F.col("event_type") == touch_type)
             .select(F.col("user_id").alias("t_user"),
                     F.col("event_id").alias("touch_id"),
                     F.col("_us").alias("t_us")))
    j = conv.join(
        touch,
        (F.col("c_user") == F.col("t_user"))
        & (F.col("t_us") < F.col("c_us"))
        & (F.col("t_us") >= F.col("c_us") - win_us))
    agg = (j.groupBy("purchase_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_touches"),
                F.min(F.struct("t_us", "touch_id")).alias("_first"),
                F.max(F.struct("t_us", "touch_id")).alias("_last")))
    out = (conv.join(agg, "purchase_id", "left")
           .select(
               "purchase_id", F.col("c_user").alias("user_id"),
               F.coalesce("n_touches", F.lit(0)).cast("long")
               .alias("n_touches"),
               F.col("_first.touch_id").alias("first_touch_id"),
               F.col("_last.touch_id").alias("last_touch_id"),
               F.when(F.col("n_touches") >= 3,
                      F.expr("200000 div (n_touches - 2)"))
               .otherwise(F.lit(0)).cast("long").alias("mid_credit_ppm")))
    return out.orderBy("purchase_id")


def attribution_position_sql(touch_type: str = "click",
                             convert_type: str = "purchase",
                             window_days: int = 7,
                             table: str = "events") -> str:
    win_us = window_days * DAY_US
    return f"""
        WITH conv AS (
            SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS c_us
            FROM {table} WHERE event_type = '{convert_type}'
        ),
        touch AS (
            SELECT user_id, event_id AS touch_id, epoch_us(ts) AS t_us
            FROM {table} WHERE event_type = '{touch_type}'
        ),
        j AS (
            SELECT c.purchase_id, t.touch_id, t.t_us
            FROM conv c JOIN touch t
              ON c.user_id = t.user_id
             AND t.t_us < c.c_us AND t.t_us >= c.c_us - {win_us}
        ),
        agg AS (
            SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_touches,
                   min(t_us) AS ft, max(t_us) AS lt
            FROM j GROUP BY purchase_id
        ),
        -- tie-break pinned to Spark's struct-min/max: smallest id among
        -- the earliest touches, largest id among the latest
        ids AS (
            SELECT a.purchase_id, a.n_touches,
                   min(CASE WHEN j.t_us = a.ft THEN j.touch_id END)
                       AS first_touch_id,
                   max(CASE WHEN j.t_us = a.lt THEN j.touch_id END)
                       AS last_touch_id
            FROM agg a JOIN j ON a.purchase_id = j.purchase_id
            GROUP BY a.purchase_id, a.n_touches
        )
        SELECT c.purchase_id, c.user_id,
               CAST(coalesce(i.n_touches, 0) AS BIGINT) AS n_touches,
               i.first_touch_id, i.last_touch_id,
               CAST(CASE WHEN i.n_touches >= 3
                    THEN 200000 // (i.n_touches - 2) ELSE 0 END
                    AS BIGINT) AS mid_credit_ppm
        FROM conv c LEFT JOIN ids i ON c.purchase_id = i.purchase_id
        ORDER BY c.purchase_id
    """
