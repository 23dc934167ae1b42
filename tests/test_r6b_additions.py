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


def test_maintain_grouped_sums_matches_recompute(spark, tmp_path):
    """Group-moving updates retract from the OLD group; groups drained to
    zero rows disappear; the maintained aggregate is bit-equal to
    re-aggregating the new view."""
    from hbase_indexer_spark.plans.ivm import maintain_grouped_sums
    from hbase_indexer_spark.sinks.index_store import IndexStore, change_feed

    store = IndexStore(str(tmp_path / "s"), key="id")
    v0 = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 20), (3, "y", 30), (4, "z", 40)],
        "id long, g string, v long")
    store.overwrite(v0, spark)
    agg0 = (v0.groupBy("g").agg(F.sum("v").alias("sum_v"),
                                F.count(F.lit(1)).cast("long")
                                .alias("n_rows")))
    # move 3 from y->x (value change too), delete 4 (drains z), insert 5
    store.merge(
        spark,
        adds=spark.createDataFrame([(3, "x", 31), (5, "w", 50)],
                                   "id long, g string, v long"),
        delete_ids=spark.createDataFrame([(4,)], "id long"))
    feed = change_feed(store, spark, include_old=True)
    got = sorted(tuple(r) for r in maintain_grouped_sums(
        agg0, feed, ["g"], {"sum_v": "v"}).collect())
    want = sorted(tuple(r) for r in store.read(spark).groupBy("g").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).cast("long").alias("n_rows")).collect())
    assert got == want
    assert ("z", 40, 1) not in got  # drained group dropped


def test_maintain_grouped_sums_randomized_against_recompute(spark, tmp_path):
    """Seeded random base + random changeset (inserts, deletes, updates
    incl. group moves): maintained aggregate == direct re-aggregation."""
    import random

    from hbase_indexer_spark.plans.ivm import maintain_grouped_sums
    from hbase_indexer_spark.sinks.index_store import IndexStore, change_feed

    rng = random.Random(1406)
    groups = ["g0", "g1", "g2", "g3"]
    v0 = [(i, rng.choice(groups), rng.randint(-50, 50)) for i in range(80)]
    store = IndexStore(str(tmp_path / "s"), key="id")
    base = spark.createDataFrame(v0, "id long, g string, v long")
    store.overwrite(base, spark)
    agg0 = base.groupBy("g").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).cast("long").alias("n_rows"))
    upd = [(i, rng.choice(groups), rng.randint(-50, 50))
           for i in rng.sample(range(80), 25)]
    ins = [(i, rng.choice(groups), rng.randint(-50, 50))
           for i in range(100, 115)]
    del_ids = [(i,) for i in rng.sample(range(80), 20)
               if i not in {u[0] for u in upd}]
    store.merge(spark,
                adds=spark.createDataFrame(upd + ins,
                                           "id long, g string, v long"),
                delete_ids=spark.createDataFrame(del_ids, "id long"))
    feed = change_feed(store, spark, include_old=True)
    got = sorted(tuple(r) for r in maintain_grouped_sums(
        agg0, feed, ["g"], {"sum_v": "v"}).collect())
    want = sorted(tuple(r) for r in store.read(spark).groupBy("g").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).cast("long").alias("n_rows")).collect())
    assert got == want
