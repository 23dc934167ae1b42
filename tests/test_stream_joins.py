"""Stream-stream interval join: batch equivalence on in-order delivery,
and the watermark actually dropping late input (the bounded-state trade)."""

import datetime as dt

from hbase_indexer_spark.streaming.joins import stream_attribution_join

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, minutes, user, etype):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype)


def _run_stream(spark, tmp_path, chunks):
    src = tmp_path / "chunks"
    src.mkdir()
    for i, rows in enumerate(chunks):
        (spark.createDataFrame(rows, SCHEMA).coalesce(1)
         .write.parquet(str(tmp_path / f"stage{i}")))
        pq = next((tmp_path / f"stage{i}").glob("*.parquet"))
        pq.rename(src / f"chunk{i}.parquet")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    joined = stream_attribution_join(stream, "click", "purchase",
                                     max_delay="1 hour",
                                     watermark="2 hours")
    q = (joined.writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return {(r["trigger_id"], r["outcome_id"], r["delay_us"])
            for r in spark.read.parquet(str(tmp_path / "sink")).collect()}


def test_stream_equals_batch_on_in_order_delivery(spark, tmp_path):
    rows = [
        _ev(1, 0, 7, "click"), _ev(2, 30, 7, "purchase"),   # match, 30m
        _ev(3, 40, 7, "click"), _ev(4, 95, 7, "purchase"),  # match to 3 (55m)
        _ev(5, 50, 8, "click"), _ev(6, 200, 8, "purchase"),  # too late (150m)
        _ev(7, 60, 9, "purchase"),                           # no click user 9
        _ev(8, 300, 7, "click"),                             # no purchase after
    ]
    rows.sort(key=lambda r: r[1])
    thirds = [rows[:3], rows[3:6], rows[6:]]
    got = _run_stream(spark, tmp_path, thirds)
    batch = stream_attribution_join(
        spark.createDataFrame(rows, SCHEMA), "click", "purchase",
        max_delay="1 hour", watermark="2 hours")
    want = {(r["trigger_id"], r["outcome_id"], r["delay_us"])
            for r in batch.collect()}
    assert got == want
    assert got == {(1, 2, 30 * 60 * 1_000_000),
                   (3, 4, 55 * 60 * 1_000_000)}


def test_late_input_after_state_cleanup_emits_nothing(spark, tmp_path):
    """The bounded-state guarantee: once the watermark has passed a
    trigger's window AND the subsequent batch has run state cleanup, an
    arbitrarily-late matching outcome produces NO result.  (Spark's
    guarantee is one-sided — cleanup may lag a batch, so the late row
    goes in a batch of its own after the watermark-advancing one.)"""
    advance = [_ev(1, 0, 7, "click"),
               # push event time (and BOTH sides' watermarks — the query
               # watermark is the min across them) far forward
               _ev(2, 8 * 24 * 60, 8, "click"),
               _ev(5, 8 * 24 * 60 + 5, 99, "purchase")]  # no matching click
    fresh = [_ev(4, 8 * 24 * 60 + 30, 8, "purchase")]  # match for click 2
    late = [_ev(3, 10, 7, "purchase")]  # in-window for click 1, 8 days late
    got = _run_stream(spark, tmp_path, [advance, fresh, late])
    # click 2 -> purchase 4 survives; click 1's state was evicted before
    # the late purchase 3 arrived, so (1, 3) never emits
    assert got == {(2, 4, 30 * 60 * 1_000_000)}


def test_batch_plan_has_no_python_and_single_exchange_pair(spark):
    rows = [_ev(1, 0, 7, "click"), _ev(2, 30, 7, "purchase")]
    df = stream_attribution_join(
        spark.createDataFrame(rows, SCHEMA), "click", "purchase")
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
