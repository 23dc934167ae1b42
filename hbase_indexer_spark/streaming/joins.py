"""Stream-stream interval join: watermarked trigger→outcome attribution.

The batch engine already has the as-of and interval joins
(`operators/joins.py`); this is the *streaming* counterpart — two live
event streams joined on a key within a bounded event-time window, the
Structured-Streaming feature that turns "click then purchase within an
hour" into a continuously-emitted table.

Semantics (inner join):

- a match is ``(trigger, outcome)`` with the same join key and
  ``trigger.ts <= outcome.ts <= trigger.ts + max_delay``;
- each side carries ``withWatermark(ts, watermark)``: the engine keeps a
  trigger in state only until the watermark passes ``ts + max_delay``
  (and an outcome until ``ts``), so state is bounded by
  ``rate x (watermark + max_delay)`` — NOT by stream length, which is
  what makes the operator run forever at 100 TB/day;
- input later than the watermark is dropped (the documented trade:
  bounded state for bounded lateness).  Delivered in event-time order —
  the file-drop staging the gate query uses — nothing is ever late, so
  the stream result is bit-equal to the batch interval join, which is
  exactly what the DuckDB oracle replays.

Scale: per micro-batch the join is a keyed state lookup (hash exchange
on the join key on both sides); state size is rate-bounded per above.
The time-range predicate rides the same keyed exchange — no extra
shuffle, no Python.

Reference analog: none for stream-stream (the reference joins a stream
to a TABLE, `plans/incremental.py` / SURVEY §2.5 J1); this extends the
same event-stream surface per SURVEY §2.8 T7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_indexer_spark.functions.timeutil import ts_micros, ts_timestamp

__all__ = ["stream_attribution_join", "stream_attribution_join_sql"]


def stream_attribution_join(events: DataFrame, trigger_type: str,
                            outcome_type: str, *, user_col: str = "user_id",
                            ts_col: str = "ts", id_col: str = "event_id",
                            type_col: str = "event_type",
                            max_delay: str = "1 hour",
                            watermark: str = "2 hours") -> DataFrame:
    """Join ``trigger_type`` events to ``outcome_type`` events of the same
    user within ``max_delay``, as a streaming (or batch — the plan is the
    same shape) inner join.

    Returns ``(user_id, trigger_id, outcome_id, trigger_ts_us,
    outcome_ts_us, delay_us)`` — epoch-microsecond columns so the output
    is engine-independent (events.ts is TIMESTAMP(NANOS) parquet, read
    as timestamp_ntz; see functions/timeutil.py).

    Works on both a streaming and a batch ``events`` frame: the filters
    split one source into the two sides (a supported self-join), each
    side gets its own watermark, and the join condition is key equality
    plus the event-time range — the shape Structured Streaming's state
    cleanup requires."""
    # watermarks require TIMESTAMP (not NTZ): normalize through timeutil —
    # the session tz is pinned UTC, so naive-as-UTC matches the oracle's
    # epoch_us exactly
    event_ts = ts_timestamp(events, ts_col)
    trig = (events.filter(F.col(type_col) == trigger_type)
            .select(F.col(user_col).alias("_t_user"),
                    F.col(id_col).alias("trigger_id"),
                    event_ts.alias("_t_ts")))
    out = (events.filter(F.col(type_col) == outcome_type)
           .select(F.col(user_col).alias("_o_user"),
                   F.col(id_col).alias("outcome_id"),
                   event_ts.alias("_o_ts")))
    if trig.isStreaming:
        trig = trig.withWatermark("_t_ts", watermark)
        out = out.withWatermark("_o_ts", watermark)
    joined = trig.join(
        out,
        (F.col("_t_user") == F.col("_o_user"))
        & (F.col("_o_ts") >= F.col("_t_ts"))
        & (F.col("_o_ts") <= F.col("_t_ts") + F.expr(f"INTERVAL {max_delay}")),
        "inner")
    t_us = ts_micros(joined, "_t_ts")
    o_us = ts_micros(joined, "_o_ts")
    return joined.select(
        F.col("_t_user").alias("user_id"),
        "trigger_id", "outcome_id",
        t_us.alias("trigger_ts_us"),
        o_us.alias("outcome_ts_us"),
        (o_us - t_us).alias("delay_us"),
    )


def stream_attribution_join_sql(trigger_type: str, outcome_type: str,
                                max_delay_sql: str = "1 HOUR",
                                table: str = "events") -> str:
    """DuckDB mirror: the batch interval join the in-order stream result
    is bit-equal to (naive-as-UTC epoch_us, same range predicate)."""
    return f"""
        SELECT t.user_id,
               t.event_id AS trigger_id,
               o.event_id AS outcome_id,
               epoch_us(t.ts) AS trigger_ts_us,
               epoch_us(o.ts) AS outcome_ts_us,
               epoch_us(o.ts) - epoch_us(t.ts) AS delay_us
        FROM {table} t
        JOIN {table} o
          ON t.user_id = o.user_id
         AND o.ts >= t.ts
         AND o.ts <= t.ts + INTERVAL {max_delay_sql}
        WHERE t.event_type = '{trigger_type}'
          AND o.event_type = '{outcome_type}'
    """
