"""Opt-in schema evolution on store MERGE: new columns arrive (old rows
read NULL), old columns go missing (new rows read NULL); by default the
same drift stays a loud error."""

import pytest

from hbase_indexer_spark.sinks.bucket_store import BucketedIndexStore
from hbase_indexer_spark.sinks.index_store import IndexStore


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_default_store_rejects_schema_drift(spark, tmp_path):
    store = IndexStore(str(tmp_path / "s"), key="id")
    store.overwrite(_df(spark, [(1, "a")], "id long, a string"), spark)
    with pytest.raises(Exception, match="NUM_COLUMNS_MISMATCH|UNION"):
        store.merge(spark, adds=_df(spark, [(2, "b", 9)],
                                    "id long, a string, b long"))


def test_evolving_store_widens_and_backfills_null(spark, tmp_path):
    store = IndexStore(str(tmp_path / "s"), key="id", evolve_schema=True)
    store.overwrite(_df(spark, [(1, "a"), (2, "b")], "id long, a string"),
                    spark)
    # batch 1: NEW column b — row 1 keeps NULL b
    store.merge(spark, adds=_df(spark, [(2, "b2", 9)],
                                "id long, a string, b long"))
    # batch 2: column a MISSING — row 3 gets NULL a
    store.merge(spark, adds=_df(spark, [(3, 7)], "id long, b long"))
    got = {r["id"]: (r["a"], r["b"])
           for r in store.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b2", 9), 3: (None, 7)}


def test_evolving_bucket_store_mixed_bucket_schemas(spark, tmp_path):
    """Only touched buckets rewrite: after an evolving merge, untouched
    buckets still hold old-schema files — mergeSchema reads reconcile
    them, and the next touch upgrades them copy-on-write."""
    store = BucketedIndexStore(str(tmp_path / "b"), key="id", n_buckets=4,
                               evolve_schema=True)
    base = _df(spark, [(i, f"d{i}") for i in range(8)], "id long, a string")
    store.overwrite(base)
    store.merge(spark, adds=_df(spark, [(0, "d0x", 42)],
                                "id long, a string, b long"))
    got = {r["id"]: (r["a"], r["b"]) for r in store.read(spark).collect()}
    assert len(got) == 8
    assert got[0] == ("d0x", 42)
    assert all(got[i] == (f"d{i}", None) for i in range(1, 8))
    # second evolving touch on another key still converges
    store.merge(spark, adds=_df(spark, [(5, 55)], "id long, b long"))
    got2 = {r["id"]: (r["a"], r["b"]) for r in store.read(spark).collect()}
    assert got2[5] == (None, 55)
    assert got2[0] == ("d0x", 42)


def test_default_bucket_store_keeps_strict_reads(spark, tmp_path):
    store = BucketedIndexStore(str(tmp_path / "b"), key="id", n_buckets=2)
    store.overwrite(_df(spark, [(1, "a")], "id long, a string"))
    # adds may land in an untouched/empty bucket and never hit a
    # unionByName, so the bucketed store checks schema drift explicitly
    with pytest.raises(ValueError, match="schema drift"):
        store.merge(spark, adds=_df(spark, [(2, "b", 9)],
                                    "id long, a string, b long"))


def test_change_feed_classifies_and_is_idempotent(spark, tmp_path):
    from hbase_indexer_spark.sinks.index_store import change_feed

    store = IndexStore(str(tmp_path / "s"), key="id")
    store.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")],
                        "id long, v string"), spark)
    # update 1, delete 2, insert 4, re-add 3 unchanged (must NOT appear)
    store.merge(spark,
                adds=_df(spark, [(1, "a2"), (3, "c"), (4, "d")],
                         "id long, v string"),
                delete_ids=_df(spark, [(2,)], "id long"))
    feed = {r["id"]: (r["v"], r["_change_type"])
            for r in change_feed(store, spark).collect()}
    assert feed == {1: ("a2", "update"), 2: ("b", "delete"),
                    4: ("d", "insert")}


def test_change_feed_across_evolved_schema(spark, tmp_path):
    from hbase_indexer_spark.sinks.index_store import change_feed

    store = IndexStore(str(tmp_path / "s"), key="id", evolve_schema=True)
    store.overwrite(_df(spark, [(1, "a"), (2, "b")], "id long, v string"),
                    spark)
    store.merge(spark, adds=_df(spark, [(2, "b", 9)],
                                "id long, v string, w long"))
    feed = {r["id"]: (r["v"], r["w"], r["_change_type"])
            for r in change_feed(store, spark).collect()}
    # row 1 gained a NULL w by evolution -> not a content change on the
    # shared columns; only row 2's real update appears
    assert feed == {2: ("b", 9, "update")}


def test_change_feed_needs_two_versions(spark, tmp_path):
    from hbase_indexer_spark.sinks.index_store import change_feed

    store = IndexStore(str(tmp_path / "s"), key="id")
    assert change_feed(store, spark) is None
    store.overwrite(_df(spark, [(1, "a")], "id long, v string"), spark)
    assert change_feed(store, spark) is None


def test_apply_change_feed_replicates_store(spark, tmp_path):
    from hbase_indexer_spark.sinks.index_store import (
        apply_change_feed,
        change_feed,
    )

    up = IndexStore(str(tmp_path / "up"), key="id")
    down = IndexStore(str(tmp_path / "down"), key="id")
    v0 = _df(spark, [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    up.overwrite(v0, spark)
    down.overwrite(v0, spark)  # bootstrapped replica
    up.merge(spark,
             adds=_df(spark, [(1, "a2"), (4, "d")], "id long, v string"),
             delete_ids=_df(spark, [(3,)], "id long"))
    feed = change_feed(up, spark)
    apply_change_feed(feed, down, spark)
    want = sorted(tuple(r) for r in up.read(spark).collect())
    got = sorted(tuple(r) for r in down.read(spark).collect())
    assert got == want == [(1, "a2"), (2, "b"), (4, "d")]
    # re-applying the same feed is a no-op (idempotent merge) and the
    # up-vs-down diff is empty
    apply_change_feed(feed, down, spark)
    got2 = sorted(tuple(r) for r in down.read(spark).collect())
    assert got2 == want
