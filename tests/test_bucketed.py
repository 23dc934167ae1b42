"""Bucket-co-located joins: answer unchanged by layout, and the plan
property the layout exists for — ZERO exchanges (and no sorts) in the
fact-fact join."""

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from hbase_indexer_spark.operators.bucketed import (
    bucketed_revenue_by_priority,
    write_bucketed_table,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed_table(li, "t_bkt_li", "l_orderkey",
                         path=str(tmp_path / "li"))
    write_bucketed_table(o, "t_bkt_o", "o_orderkey",
                         path=str(tmp_path / "o"))
    yield li, o
    spark.sql("DROP TABLE IF EXISTS t_bkt_li")
    spark.sql("DROP TABLE IF EXISTS t_bkt_o")


def test_layout_does_not_change_the_answer(spark, bucketed_pair):
    li, o = bucketed_pair
    got = bucketed_revenue_by_priority(spark, "t_bkt_li", "t_bkt_o").collect()
    want = (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"))
            .orderBy("o_orderpriority").collect())
    assert [(r["o_orderpriority"], r["n_lines"]) for r in got] == \
           [(r["o_orderpriority"], r["n_lines"]) for r in want]


def test_bucketed_join_has_zero_exchanges(spark, bucketed_pair):
    """With broadcast disabled (so AQE can't sidestep the comparison),
    the same-bucketed equi-join is an SMJ with NO Exchange — the
    raw-parquet join shuffles both sides.  (Spark 3+ re-sorts within
    buckets regardless of sortBy unless the legacy
    bucketedTableScan.outputOrdering conf is set: the sort is per-bucket
    and spill-free, the exchange was the scale cost.)"""
    li, o = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bkt = (spark.table("t_bkt_li")
               .join(spark.table("t_bkt_o"),
                     F.col("l_orderkey") == F.col("o_orderkey"))
               .select("l_orderkey", "o_orderpriority"))
        raw = (li.join(o, li.l_orderkey == o.o_orderkey)
               .select("l_orderkey", "o_orderpriority"))
        bkt_plan, raw_plan = _plan(bkt), _plan(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in bkt_plan
    assert "Exchange" not in bkt_plan, bkt_plan
    assert "Exchange" in raw_plan  # the shuffle bucketing removes
