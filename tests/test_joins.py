"""as-of join and interval join semantics (operators/joins.py)."""

from pyspark.sql import functions as F

from hbase_indexer_spark.operators.joins import asof_join, interval_join


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 11, "c")], "k int, t int, v string")
    out = {(r["k"], r["t"]): r["v_r"]
           for r in asof_join(left, right, ["k"], "t", "t", ["v"]).collect()}
    assert out == {
        (1, 10): "a",   # inclusive: right at exactly t matches
        (1, 20): "b",   # most recent prior, not first
        (1, 5): None,   # nothing before -> NULL
        (2, 10): None,  # right exists only after
    }


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 9, "x"), (1, 9, "z"), (1, 9, "y")], "k int, t int, v string")
    rows = asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
    assert [r["v_r"] for r in rows] == ["z"]  # max payload tuple wins


def test_asof_multiple_payload_columns(spark):
    left = spark.createDataFrame([(1, 10), (1, 30)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 8, 100, 1.5), (1, 20, 200, 2.5)], "k int, t int, a int, b double")
    out = {r["t"]: (r["a_r"], r["b_r"])
           for r in asof_join(left, right, ["k"], "t", "t", ["a", "b"]).collect()}
    assert out == {10: (100, 1.5), 30: (200, 2.5)}


def test_interval_join_overlapping_bands(spark):
    pts = spark.createDataFrame([(1, 0.0), (2, 49.9), (3, 50.0), (4, 120.0)],
                                "id int, v double")
    ivs = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 130.0), ("wide", 0.0, 130.0)],
        "band string, lo double, hi double")
    out = sorted((r["id"], r["band"]) for r in
                 interval_join(pts, ivs, "v", "lo", "hi", grid=25.0).collect())
    assert out == [(1, "a"), (1, "wide"), (2, "a"), (2, "wide"),
                   (3, "b"), (3, "wide"), (4, "b"), (4, "wide")]


def test_interval_join_no_match_dropped(spark):
    pts = spark.createDataFrame([(1, 999.0)], "id int, v double")
    ivs = spark.createDataFrame([("a", 0.0, 10.0)], "band string, lo double, hi double")
    assert interval_join(pts, ivs, "v", "lo", "hi", grid=10.0).count() == 0


def test_interval_join_plan_is_equi_join(spark):
    # the grid trick must surface as an equi-join to Catalyst (broadcastable),
    # not a nested-loop range join
    pts = spark.createDataFrame([(1, 5.0)], "id int, v double")
    ivs = spark.createDataFrame([("a", 0.0, 10.0)], "band string, lo double, hi double")
    plan = interval_join(pts, F.broadcast(ivs), "v", "lo", "hi", grid=10.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
