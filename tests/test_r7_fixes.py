"""Pins for the r7 defect fixes (driver ADVICE r6 + VERDICT r6 #4):

- change_feed must emit the TO-side post-image even when an update sets
  a column to NULL (the old coalesce leaked the stale value, permanently
  diverging replicas and breaking IVM);
- apply_change_feed must accept an include_old=True feed on a strict
  replica (the _old_* retraction columns are state, not payload);
- maintain_grouped_sums(null_counts=True) must match re-aggregation on
  all-NULL groups (SUM over an all-NULL group is NULL, not 0);
- MaintainedAggregate must refuse to double-apply a feed version range
  (the at-most-once cursor the sketch stores already carry);
- z-order helpers must raise on helper-column collisions instead of
  silently replacing user data;
- the bucketed store's strict drift check must come from the persisted
  manifest schema (deterministic on mixed-schema stores), order-insensitive.
"""

import json

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.sinks.index_store import (
    IndexStore,
    apply_change_feed,
    change_feed,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_change_feed_update_to_null_emits_null_post_image(spark, tmp_path):
    store = IndexStore(str(tmp_path / "s"), key="id")
    store.overwrite(_df(spark, [(1, "a", 10), (2, "b", 20)],
                        "id long, v string, x long"), spark)
    # update sets v -> NULL on id=1 (x unchanged); id=2 untouched
    store.merge(spark, adds=_df(spark, [(1, None, 10)],
                                "id long, v string, x long"))
    feed = change_feed(store, spark)
    rows = {r["id"]: (r["v"], r["x"], r["_change_type"])
            for r in feed.collect()}
    assert rows == {1: (None, 10, "update")}  # post-image v is NULL


def test_change_feed_null_update_replicates_and_converges(spark, tmp_path):
    up = IndexStore(str(tmp_path / "up"), key="id")
    down = IndexStore(str(tmp_path / "down"), key="id")
    v0 = _df(spark, [(1, "a"), (2, "b")], "id long, v string")
    up.overwrite(v0, spark)
    down.overwrite(v0, spark)
    up.merge(spark, adds=_df(spark, [(1, None)], "id long, v string"))
    apply_change_feed(change_feed(up, spark), down, spark)
    want = sorted((r["id"], r["v"]) for r in up.read(spark).collect())
    got = sorted((r["id"], r["v"]) for r in down.read(spark).collect())
    assert got == want == [(1, None), (2, "b")]
    # converged: the down-vs-up diff is empty on the next feed
    down.merge(spark, adds=up.read(spark))
    assert change_feed(down, spark).count() == 0


def test_apply_change_feed_strips_old_columns_on_strict_replica(
        spark, tmp_path):
    up = IndexStore(str(tmp_path / "up"), key="id")
    down = IndexStore(str(tmp_path / "down"), key="id")
    v0 = _df(spark, [(1, 5), (2, 6)], "id long, x long")
    up.overwrite(v0, spark)
    down.overwrite(v0, spark)
    up.merge(spark, adds=_df(spark, [(1, 7), (3, 8)], "id long, x long"))
    feed = change_feed(up, spark, include_old=True)
    assert any(c.startswith("_old_") for c in feed.columns)
    apply_change_feed(feed, down, spark)  # strict replica: must not drift
    got = down.read(spark)
    assert sorted(got.columns) == ["id", "x"]
    assert sorted(tuple(r) for r in got.collect()) == [(1, 7), (2, 6), (3, 8)]


def _recompute(df, group, sums, count_col="n_rows"):
    return (df.groupBy(group)
            .agg(*[F.sum(s).alias(d) for d, s in sums.items()],
                 F.count(F.lit(1)).alias(count_col)))


def test_ivm_null_counts_matches_recompute_on_all_null_group(
        spark, tmp_path):
    from hbase_indexer_spark.plans.ivm import maintain_grouped_sums

    store = IndexStore(str(tmp_path / "s"), key="id")
    base = _df(spark, [(1, "g1", 10), (2, "g1", None), (3, "g2", 5),
                       (4, "g3", None), (5, "g3", None)],
               "id long, g string, x long")
    store.overwrite(base, spark)
    # start aggregate WITH per-column non-null counters
    agg0 = (base.groupBy("g")
            .agg(F.sum("x").alias("sum_x"),
                 F.count("x").alias("_nn_sum_x"),
                 F.count(F.lit(1)).alias("n_rows")))
    # update: g1's only non-NULL value goes NULL; g3 gains one value
    store.merge(spark, adds=_df(
        spark, [(1, "g1", None), (4, "g3", 7)], "id long, g string, x long"))
    feed = change_feed(store, spark, include_old=True)
    got = sorted(
        (r["g"], r["sum_x"], r["n_rows"])
        for r in maintain_grouped_sums(
            agg0, feed, ["g"], {"sum_x": "x"}, null_counts=True)
        .select("g", "sum_x", "n_rows").collect())
    want = sorted(
        (r["g"], r["sum_x"], r["n_rows"])
        for r in _recompute(store.read(spark), "g", {"sum_x": "x"})
        .collect())
    assert got == want
    assert ("g1", None, 2) in got  # all-NULL group reads NULL, not 0


def test_minmax_maintenance_survives_extreme_retraction(spark, tmp_path):
    """The sorted-index reduction: deleting a group's min AND max must
    re-derive the runner-ups from the maintained multiset — the exact
    case scalar min/max state cannot repair."""
    from hbase_indexer_spark.plans.ivm import (
        maintain_value_counts,
        minmax_from_counts,
    )

    store = IndexStore(str(tmp_path / "s"), key="id")
    base = _df(spark, [(1, "g", 5), (2, "g", 1), (3, "g", 9),
                       (4, "g", 5), (5, "h", 2)],
               "id long, g string, x long")
    store.overwrite(base, spark)
    counts0 = base.groupBy("g", "x").agg(F.count(F.lit(1)).alias("n"))
    # delete g's min (id=2) and max (id=3); duplicate value 5 survives
    store.merge(spark, delete_ids=_df(spark, [(2,), (3,)], "id long"))
    feed = change_feed(store, spark, include_old=True)
    counts1 = maintain_value_counts(counts0, feed, ["g"], "x")
    got = sorted(tuple(r) for r in
                 minmax_from_counts(counts1, ["g"], "x").collect())
    assert got == [("g", 5, 5, 2), ("h", 2, 2, 1)]
    # fully-retracted values leave the multiset (no ghost rows)
    assert counts1.filter(F.col("x").isin(1, 9)).count() == 0


def test_minmax_maintenance_randomized_equals_recompute(spark, tmp_path):
    from hbase_indexer_spark.plans.ivm import (
        maintain_value_counts,
        minmax_from_counts,
    )
    import random

    rng = random.Random(77)
    rows = [(i, f"g{rng.randrange(4)}", rng.randrange(10))
            for i in range(60)]
    base = _df(spark, rows, "id long, g string, x long")
    store = IndexStore(str(tmp_path / "s"), key="id")
    store.overwrite(base, spark)
    counts0 = base.groupBy("g", "x").agg(F.count(F.lit(1)).alias("n"))
    upd = [(i, f"g{rng.randrange(4)}", rng.randrange(10))
           for i in range(60) if rng.random() < 0.4]
    ins = [(100 + i, f"g{rng.randrange(4)}", rng.randrange(10))
           for i in range(15)]
    dels = [(i,) for i in range(60) if rng.random() < 0.3]
    store.merge(spark,
                adds=_df(spark, upd + ins, "id long, g string, x long"),
                delete_ids=_df(spark, dels, "id long"))
    feed = change_feed(store, spark, include_old=True)
    counts1 = maintain_value_counts(counts0, feed, ["g"], "x")
    got = sorted(tuple(r) for r in
                 minmax_from_counts(counts1, ["g"], "x").collect())
    want = sorted(tuple(r) for r in store.read(spark).groupBy("g").agg(
        F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.count(F.lit(1)).cast("long").alias("n_rows")).collect())
    assert got == want


def test_maintained_aggregate_replay_guard(spark, tmp_path):
    from hbase_indexer_spark.plans.ivm import MaintainedAggregate

    src = IndexStore(str(tmp_path / "src"), key="id", retain=3)
    src.overwrite(_df(spark, [(1, "g1", 10), (2, "g2", 20)],
                      "id long, g string, x long"), spark)
    view = MaintainedAggregate(str(tmp_path / "view"), ["g"],
                               {"sum_x": "x"})
    view.init(spark, src)
    assert view.applied_version() == src.current_version()

    src.merge(spark, adds=_df(spark, [(1, "g1", 15), (3, "g1", 5)],
                              "id long, g string, x long"))
    assert view.advance(spark, src) is True
    # the guard: the SAME version range is never applied twice
    assert view.advance(spark, src) is False
    assert view.advance(spark, src, to_version=src.current_version()) is False
    got = sorted(tuple(r) for r in view.read(spark)
                 .select("g", "sum_x", "n_rows").collect())
    want = sorted(tuple(r) for r in
                  _recompute(src.read(spark), "g", {"sum_x": "x"}).collect())
    assert got == want == [("g1", 20, 2), ("g2", 20, 1)]


def test_maintained_aggregate_advances_across_multiple_versions(
        spark, tmp_path):
    from hbase_indexer_spark.plans.ivm import MaintainedAggregate

    src = IndexStore(str(tmp_path / "src"), key="id", retain=5)
    src.overwrite(_df(spark, [(1, "g", 1)], "id long, g string, x long"),
                  spark)
    view = MaintainedAggregate(str(tmp_path / "view"), ["g"], {"sum_x": "x"})
    view.init(spark, src)
    # two merges before one advance: the feed spans BOTH versions
    src.merge(spark, adds=_df(spark, [(2, "g", 2)],
                              "id long, g string, x long"))
    src.merge(spark, adds=_df(spark, [(3, "g", 4)],
                              "id long, g string, x long"))
    assert view.advance(spark, src) is True
    [r] = view.read(spark).select("sum_x", "n_rows").collect()
    assert (r["sum_x"], r["n_rows"]) == (7, 3)


def test_maintained_aggregate_raises_when_cursor_expired(spark, tmp_path):
    from hbase_indexer_spark.plans.ivm import MaintainedAggregate

    src = IndexStore(str(tmp_path / "src"), key="id", retain=1)
    src.overwrite(_df(spark, [(1, "g", 1)], "id long, g string, x long"),
                  spark)
    view = MaintainedAggregate(str(tmp_path / "view"), ["g"], {"sum_x": "x"})
    view.init(spark, src)
    src.merge(spark, adds=_df(spark, [(2, "g", 2)],
                              "id long, g string, x long"))
    # retain=1 dropped the cursor version: the feed cannot be rebuilt
    with pytest.raises(ValueError, match="no longer retained"):
        view.advance(spark, src)


def test_bpe_train_matches_pure_python_model(spark):
    """6 rounds of distributed BPE == the textbook greedy algorithm
    (randomized corpus, same lowercase [a-z0-9]+ pre-tokenize, same
    (count desc, left, right) tie-break, same left-to-right
    non-overlapping merge)."""
    import random
    import re
    from collections import Counter

    from hbase_indexer_spark.pipeline.corpus_stats import bpe_train

    rng = random.Random(41)
    vocab = ["low", "lower", "lowest", "new", "newer", "wide", "widest",
             "aaaa", "aaab", "banana", "bandana"]
    texts = [" ".join(rng.choices(vocab, k=rng.randrange(3, 12)))
             for _ in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [(r["round"], r["left"], r["right"], r["n_occ"])
           for r in bpe_train(df, n_merges=6).collect()]

    words = Counter(w for t in texts
                    for w in re.findall(r"[a-z0-9]+", t.lower()))
    syms = {w: list(w) for w in words}
    want = []
    for rnd in range(1, 7):
        pc: Counter = Counter()
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        (l, r), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want.append((rnd, l, r, n))
        for w, ss in syms.items():
            out = []
            for x in ss:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    assert got == want


def test_asof_directions_tolerance_and_tie_break(spark):
    """merge_asof surface pins: forward picks the next row, nearest
    prefers backward on an exact tie, tolerance nulls far matches while
    keeping left-join semantics."""
    from hbase_indexer_spark.operators.joins import asof_join

    left = _df(spark, [(1, 100), (1, 205), (2, 50)],
               "k long, lts long")
    right = _df(spark, [(1, 90, 9), (1, 110, 11), (1, 300, 30)],
                "k long, rts long, pid long")
    fwd = {(r["k"], r["lts"]): r["pid_m"] for r in asof_join(
        left, right, ["k"], "lts", "rts", ["pid"], suffix="_m",
        direction="forward").collect()}
    assert fwd == {(1, 100): 11, (1, 205): 30, (2, 50): None}
    # nearest: lts=100 ties 90 vs 110 at |10| -> backward (9);
    # lts=205 -> 110 (|95|) beats 300 (|95|)? exact tie -> backward (11)
    near = {(r["k"], r["lts"]): r["pid_m"] for r in asof_join(
        left, right, ["k"], "lts", "rts", ["pid"], suffix="_m",
        direction="nearest").collect()}
    assert near == {(1, 100): 9, (1, 205): 11, (2, 50): None}
    # tolerance 15: lts=205 has no match within 15 either way
    tol = {(r["k"], r["lts"]): r["pid_m"] for r in asof_join(
        left, right, ["k"], "lts", "rts", ["pid"], suffix="_m",
        direction="nearest", tolerance=15).collect()}
    assert tol == {(1, 100): 9, (1, 205): None, (2, 50): None}
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "lts", "rts", ["pid"],
                  direction="sideways")


def test_global_rank_matches_single_partition_window(spark):
    """Two-phase distributed ranking == the naive single-partition
    row_number, including ties broken by the trailing order column and
    values that straddle range-partition boundaries."""
    import random

    from hbase_indexer_spark.pipeline.dedup import global_rank

    rng = random.Random(5)
    rows = [(i, f"k{rng.randrange(7)}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    got = {(r["k"], r["doc_id"]): r["rank"]
           for r in global_rank(df, ["k", "doc_id"], n_parts=8).collect()}
    want = {(k, i): rank + 1
            for rank, (k, i) in enumerate(
                sorted((k, i) for i, k in rows))}
    assert got == want


def test_sorted_neighborhood_finds_prefix_near_dups(spark):
    from hbase_indexer_spark.pipeline.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different content entirely"),
         (4, "zzz unrelated trailing doc")],
        "doc_id long, text string")
    pairs = {(r["x"], r["y"]): r["jaccard_micro"]
             for r in sorted_neighborhood_pairs(docs, window=2).collect()}
    # the two near-dups sort adjacent on their shared 24-char prefix:
    # 7 shared distinct tokens of a 9-token union -> 777777 micro
    assert pairs[(1, 2)] == 1_000_000 * 7 // 9
    # disjoint neighbors score 0, and every pair is within the window
    assert pairs[(3, 1)] == 0
    assert all(0 <= v <= 1_000_000 for v in pairs.values())


def test_bpe_round_plan_shape(spark):
    """The per-round plan (the part that runs 100s-10000s of times at
    tokenizer scale): combinable HashAggregate over the exploded pairs,
    argmax via TakeOrderedAndProject — never a global sort, never
    Python."""
    from hbase_indexer_spark.pipeline.corpus_stats import bpe_pair_counts

    words = spark.createDataFrame(
        [("(l)(o)(w)", 3), ("(n)(e)(w)", 2)], "s string, wf long")
    pairs = bpe_pair_counts(words)
    argmax = pairs.orderBy(F.desc("n_occ"), F.asc("l"), F.asc("r")).limit(1)
    plan = argmax._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_raises_on_helper_column_collision(spark):
    from hbase_indexer_spark.pipeline.layout import zorder_key

    df = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"))
    with pytest.raises(ValueError, match="zkey"):
        zorder_key(df.withColumn("zkey", F.lit(0)), ["a", "b"])
    with pytest.raises(ValueError, match="_lo_a"):
        zorder_key(df.withColumn("_lo_a", F.lit(0)), ["a", "b"])


def test_bucket_store_manifest_schema_drives_drift_check(spark, tmp_path):
    from hbase_indexer_spark.sinks.bucket_store import BucketedIndexStore

    store = BucketedIndexStore(str(tmp_path / "b"), key="id", n_buckets=4)
    store.overwrite(_df(spark, [(1, "a", 1), (2, "b", 2)],
                        "id long, v string, x long"), spark)
    assert store.expected_schema() == [
        ("id", "bigint"), ("v", "string"), ("x", "bigint")]
    # manifest carries it (deterministic — no footer race)
    with open(store._manifest_file(store.current_version())) as f:
        assert json.load(f)["schema"] == [
            ["id", "bigint"], ["v", "string"], ["x", "bigint"]]
    # reordered columns are fine (merge unions by name)...
    store.merge(spark, adds=_df(spark, [("c", 3, 3)],
                                "v string, x long, id long"))
    assert sorted(r["id"] for r in store.read(spark).collect()) == [1, 2, 3]
    # ...but a new column or a changed type fails loudly
    with pytest.raises(ValueError, match="schema drift"):
        store.merge(spark, adds=_df(spark, [(4, "d", 4, 0.5)],
                                    "id long, v string, x long, y double"))
    with pytest.raises(ValueError, match="schema drift"):
        store.merge(spark, adds=_df(spark, [(4, "d", "4")],
                                    "id long, v string, x string"))
