"""Salting primitives must be algebraically invisible: salted plans return
exactly the unsalted results (operators/skew.py)."""

from pyspark.sql import functions as F

from hbase_indexer_spark.operators.skew import (
    row_salt,
    salted_join,
    salted_two_phase_agg,
)

import pytest


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    ).cache()


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(100).select(
        F.when(F.col("id") == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("k"),
        (F.col("id") * 10).alias("w"),
    ).cache()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_matches_plain(skewed, dim):
    plain = skewed.join(dim, "k")
    salted = salted_join(skewed, dim, ["k"], n_salt=8)
    assert _rows(salted.select("k", "v", "w")) == _rows(plain.select("k", "v", "w"))


def test_salted_left_join_matches_plain(skewed, dim):
    # left join: unmatched left rows must survive exactly once
    plain = skewed.join(dim, "k", "left")
    salted = salted_join(skewed, dim, ["k"], n_salt=8, how="left")
    assert _rows(salted.select("k", "v", "w")) == _rows(plain.select("k", "v", "w"))


def test_salted_agg_matches_plain(skewed):
    plain = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    salted = salted_two_phase_agg(
        skewed, ["k"],
        [("*", "count", "cnt"), ("v", "sum", "sv"),
         ("v", "min", "mn"), ("v", "max", "mx")],
        n_salt=8,
    )
    assert _rows(salted) == _rows(plain)


def test_salt_is_deterministic(skewed):
    a = skewed.withColumn("s", row_salt(skewed, 8))
    b = skewed.withColumn("s", row_salt(skewed, 8))
    assert _rows(a) == _rows(b)


def test_salt_spreads_hot_key(skewed):
    n = (
        skewed.filter(F.col("k") == "hot")
        .withColumn("s", row_salt(skewed, 8))
        .select("s").distinct().count()
    )
    assert n == 8  # the whale actually lands on all salt partitions


def test_unsupported_join_and_agg_raise(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_two_phase_agg(skewed, ["k"], [("v", "avg", "a")])
