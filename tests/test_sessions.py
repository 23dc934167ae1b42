"""Session-window operator: batch closed form vs applyInPandasWithState
streaming form (SURVEY §2.8 T7 extension)."""

import os

from hbase_indexer_spark.streaming.sessions import (
    FLUSH_EVENT_TYPE,
    sessionize,
    sessionize_stream,
)

EVENT_DDL = "user_id long, ts_ms long, event_type string"

# two users, gap=100: u1 -> [0,10] and [1000,1010]; u2 -> [5] and [2000,2005]
EVENTS = [
    (1, 0, "click"), (1, 10, "purchase"), (2, 5, "view"),
    (1, 1000, "click"), (2, 2000, "purchase"), (2, 2005, "click"),
    (1, 1010, "view"),
]
GAP = 100


def test_batch_sessionize(spark):
    out = sessionize(spark.createDataFrame(EVENTS, EVENT_DDL), gap_ms=GAP)
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        (1, 0, 10, 2, 1), (1, 1000, 1010, 2, 0),
        (2, 5, 5, 1, 0), (2, 2000, 2005, 2, 1),
    }


def test_stream_sessionize_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sess_events")
    os.makedirs(src)
    # chunks split mid-session to force cross-micro-batch state carry
    chunks = [EVENTS[:3], EVENTS[3:6], EVENTS[6:],
              [(1, 10**9, FLUSH_EVENT_TYPE), (2, 10**9, FLUSH_EVENT_TYPE)]]
    for i, rows in enumerate(chunks):
        df = spark.createDataFrame(rows, EVENT_DDL)
        stage = str(tmp_path / f"_stage{i}")
        df.coalesce(1).write.parquet(stage)
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                os.rename(os.path.join(stage, f),
                          os.path.join(src, f"c{i}.parquet"))

    stream = (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_ms=GAP)
        .writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("sess_out").collect()}
    want = {tuple(r) for r in sessionize(
        spark.createDataFrame(EVENTS, EVENT_DDL), gap_ms=GAP).collect()}
    assert got == want


def test_sessionize_tied_timestamps_match_oracle(spark):
    """Tied per-user timestamps: the (ts_ms, event_id) total order plus
    the explicit ROWS frame keep Spark and DuckDB session numbering
    identical (DuckDB's default RANGE frame would sum across tie peers)."""
    import duckdb

    from hbase_indexer_spark.streaming.sessions import (
        sessionize,
        sessionize_sql,
    )

    # user 1: three events at the SAME ts, then one past the gap
    rows = [
        (1, 1000, "view", 10),
        (1, 1000, "purchase", 11),
        (1, 1000, "view", 12),
        (1, 1000 + 7_200_001, "view", 13),
        (2, 5000, "purchase", 20),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, event_id long")
    got = sorted(map(tuple, sessionize(df, gap_ms=7_200_000).collect()))
    con = duckdb.connect()
    con.execute("""CREATE VIEW events AS
        SELECT user_id, make_timestamp(CAST(ts_ms AS BIGINT) * 1000) AS ts,
               event_type, event_id
        FROM (VALUES {}) t(user_id, ts_ms, event_type, event_id)
    """.format(", ".join(str(r) for r in rows)))
    ora = sorted(tuple(int(x) if not isinstance(x, str) else x for x in r)
                 for r in con.execute(sessionize_sql(7_200_000)).fetchall())
    assert got == ora
    # the three tied events are ONE session with 1 purchase
    assert (1, 1000, 1000, 3, 1) in got
