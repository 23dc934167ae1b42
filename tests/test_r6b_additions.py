"""Unit pins for the r6b operators: exact quantiles (incl. the NULL-drop
contract both engines must share) and HLL overlap algebra."""

from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.corpus_stats import (
    exact_group_quantiles,
    hll_overlap,
)


def test_exact_quantiles_known_values_and_null_drop(spark):
    rows = ([("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
            + [("a", None), ("b", 100), ("b", None)])
    df = spark.createDataFrame(rows, "g string, x long")
    got = {(r["g"], r["q"]): (r["value"], r["n"])
           for r in exact_group_quantiles(df, "g", "x").collect()}
    # type-1/disc: value at rank ceil(q*n/100); NULLs excluded from n
    assert got[("a", 50)] == (5, 10)   # ceil(0.5*10)=5 -> 5th value
    assert got[("a", 90)] == (9, 10)
    assert got[("a", 99)] == (10, 10)  # ceil(9.9)=10 -> max
    assert got[("b", 50)] == (100, 1)
    assert got[("b", 99)] == (100, 1)


def test_exact_quantiles_duplicate_values(spark):
    rows = [("g", v) for v in [1, 1, 1, 1, 9]]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["q"]: r["value"]
           for r in exact_group_quantiles(df, "g", "x").collect()}
    assert got[50] == 1   # rank 3 of [1,1,1,1,9]
    assert got[90] == 9   # rank ceil(4.5)=5


def test_hll_overlap_exact_side_and_bounds(spark):
    # segments: A={1..40}, B={21..60} -> true overlap 20; C disjoint
    rows = ([("A", k) for k in range(1, 41)]
            + [("B", k) for k in range(21, 61)]
            + [("C", k) for k in range(1000, 1010)])
    df = spark.createDataFrame(rows, "seg string, k long")
    out = {(r["seg_a"], r["seg_b"]): r
           for r in hll_overlap(df, F.col("k"), "seg").collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")]["true_overlap"] == 20
    assert out[("A", "C")]["true_overlap"] == 0
    for r in out.values():
        assert r["est_overlap"] >= 0  # inclusion-exclusion clamped
    # the sketch should not claim MORE overlap for the disjoint pair
    # than for the genuinely overlapping one (64-register HLL is noisy
    # on tiny sets, so only the ordering is asserted)
    assert (out[("A", "B")]["est_overlap"]
            >= out[("A", "C")]["est_overlap"])
