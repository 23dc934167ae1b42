"""Session windows over the event stream (SURVEY §2.8 T7 extension).

The reference has no stateful streaming operators; this is one of the
beyond-reference training-pipeline extensions (the canonical "custom
stateful operator" shape the prompt's §2.8 T7 row points at).  Two forms
with identical semantics:

- ``sessionize``: the batch closed form — one window pass (lag -> gap flag
  -> running sum = session number) + one aggregation.  Fully
  SQL-expressible, so it carries the DuckDB oracle for both forms.
- ``sessionize_stream``: the streaming form — ``applyInPandasWithState``
  keyed by user, one open session per key carried across micro-batches.
  A session is emitted when a later event (or a flush sentinel) proves its
  gap closed.  At-least-once replays are absorbed by the downstream MERGE
  (sessions are keyed by (user_id, session_start)).

Scale shape: state is O(active users) x one small struct — far below the
raw-event footprint; the shuffle is one hash partition by user_id, and the
batch form's window + groupBy reuse the same single shuffle (Catalyst
plans one Exchange for both).

Ties: both engines order by ``(ts_ms, event_id)`` when the event_id
column is present (``event_times`` projects it), with an explicit ROWS
frame on the running sum — under a total order the two engines cannot
diverge on tied timestamps (DuckDB's default RANGE frame would sum
across tie peers where Spark's ROWS frame goes row-by-row).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas-UDF type hints resolve via module globals)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

DEFAULT_GAP_MS = 12 * 3600 * 1000  # driver events average ~3 events/session

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", LongType()),
    StructField("session_end", LongType()),
    StructField("n_events", LongType()),
    StructField("n_purchases", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("session_start", LongType()),
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
    StructField("n_purchases", LongType()),
])

FLUSH_EVENT_TYPE = "__flush__"


def event_times(events: DataFrame) -> DataFrame:
    """Project the driver's events table to the sessionization input.
    Epoch-ms derivation is dtype-aware (``functions/timeutil.ts_millis``)
    and matches DuckDB's ``epoch_ms(ts)`` exactly (integer floor)."""
    from hbase_indexer_spark.functions.timeutil import ts_millis

    return events.select(
        "user_id",
        ts_millis(events).alias("ts_ms"),
        "event_type",
        "event_id",  # tie-break column — see the module docstring
    )


def sessionize(events: DataFrame, gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """Batch closed form: per-user sessions split at inactivity > gap_ms.

    One Exchange total: the lag window, the session-number running sum and
    the final groupBy all hash-partition by user_id, so Catalyst reuses a
    single shuffle.
    """
    # (ts_ms, event_id) is a total order -> deterministic lag/sum even on
    # tied timestamps; frames without event_id keep plain ts_ms order
    order_cols = ["ts_ms"] + (["event_id"] if "event_id" in events.columns
                              else [])
    w = Window.partitionBy("user_id").orderBy(*order_cols)
    prev = F.lag("ts_ms").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts_ms") - prev) > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = events.withColumn("_new", new_sess).withColumn(
        "_sess", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return (
        numbered.groupBy("user_id", "_sess")
        .agg(
            F.min("ts_ms").alias("session_start"),
            F.max("ts_ms").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .alias("n_purchases"),
        )
        .select("user_id", "session_start", "session_end",
                "n_events", "n_purchases")
    )


def sessionize_sql(gap_ms: int = DEFAULT_GAP_MS) -> str:
    """DuckDB oracle for sessionize(event_times(events))."""
    return f"""
        WITH e AS (
            SELECT user_id, epoch_ms(ts) AS ts_ms, event_type, event_id
            FROM events
        ), flagged AS (
            SELECT user_id, ts_ms, event_type, event_id,
                   CASE WHEN lag(ts_ms) OVER w IS NULL
                          OR ts_ms - lag(ts_ms) OVER w > {gap_ms}
                        THEN 1 ELSE 0 END AS new_sess
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        ), numbered AS (
            SELECT user_id, ts_ms, event_type,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts_ms, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM flagged
        )
        SELECT user_id, min(ts_ms) AS session_start, max(ts_ms) AS session_end,
               count(*) AS n_events,
               count(*) FILTER (event_type = 'purchase') AS n_purchases
        FROM numbered GROUP BY user_id, sess
    """


def _sessionize_group(key, pdf_iter, state: GroupState, gap_ms: int):
    """Per-user state transition: fold this batch's events (sorted by ts)
    into the open session; yield every session whose closing gap is proven
    by a later event or a flush sentinel."""
    if state.exists:
        start, last, n, np_ = state.get
    else:
        start = last = None
        n = np_ = 0
    out = []
    # concatenate BEFORE sorting: a large group arrives as several Arrow
    # chunks and events in chunk 2 can precede events in chunk 1 — a
    # per-chunk sort would fold them out of time order, splitting real
    # sessions.  Memory is the group's batch rows (already the operator's
    # working set).
    import pandas as _pd

    chunks = [c for c in pdf_iter if len(c)]
    pdf = (_pd.concat(chunks, ignore_index=True) if chunks
           else _pd.DataFrame(columns=["ts_ms", "event_type"]))
    sort_cols = ["ts_ms"] + (["event_id"] if "event_id" in pdf.columns
                             else [])
    pdf = pdf.sort_values(sort_cols)
    for ts, etype in zip(pdf["ts_ms"], pdf["event_type"]):
        ts = int(ts)
        flush = etype == FLUSH_EVENT_TYPE
        gap_over = last is not None and ts - last > gap_ms
        if (flush or gap_over) and start is not None:
            out.append((int(key[0]), start, last, n, np_))
            start = None
            n = np_ = 0
        if flush:
            continue
        if start is None:
            start = ts
        last = ts
        n += 1
        np_ += int(etype == "purchase")
    if start is None:
        state.remove()
    else:
        state.update((start, last, n, np_))
    yield _pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end",
                      "n_events", "n_purchases"])


def sessionize_stream(events: DataFrame,
                      gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """Streaming form over a streaming DataFrame of
    ``(user_id, ts_ms, event_type)``: one open-session state struct per
    user, emitted when closed.  Pair with a flush sentinel (ts beyond every
    real event, ``event_type = FLUSH_EVENT_TYPE``) to drain open sessions
    deterministically in bounded replays; unbounded deployments use the
    gap itself (the next event closes the previous session).
    """

    def fn(key, it, state):
        yield from _sessionize_group(key, it, state, gap_ms)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
