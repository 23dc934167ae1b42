"""U7 — custom aggregate (UDAF) extension point."""

import math

import pytest


def test_median_matches_exact(spark):
    from hbase_indexer_spark.functions import udaf

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 10.0), ("b", 4.0), ("b", 6.0)],
        "k string, v double",
    )
    got = {r["k"]: r["m"] for r in
           df.groupBy("k").agg(udaf.median("v").alias("m")).collect()}
    # odd count -> middle element; even count -> midpoint interpolation
    assert got == {"a": 2.0, "b": 5.0}


def test_geometric_mean(spark):
    from hbase_indexer_spark.functions import udaf

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", -1.0), ("b", 5.0)], "k string, v double"
    )
    got = {r["k"]: r["m"] for r in
           df.groupBy("k").agg(udaf.geometric_mean("v").alias("m")).collect()}
    assert got["a"] == pytest.approx(4.0)      # sqrt(2*8)
    assert got["b"] == pytest.approx(5.0)      # non-positive values excluded


def test_registry_by_name(spark):
    from hbase_indexer_spark.functions.udaf import get_aggregate, register_aggregate
    from pyspark.sql import functions as F

    with pytest.raises(KeyError):
        get_aggregate("nope")

    register_aggregate("total", lambda c: F.sum(c))
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    [row] = df.groupBy("k").agg(get_aggregate("total")("v").alias("t")).collect()
    assert row["t"] == 3.0


def test_event_value_stats_shape(spark, sf_dir):
    from hbase_indexer_spark.functions.udaf import event_value_stats

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = event_value_stats(e).collect()
    assert rows and all(
        r["n"] > 0 and math.isfinite(r["median_value"]) for r in rows
    )
