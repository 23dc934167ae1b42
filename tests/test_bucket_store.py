"""BucketedIndexStore: bucket-granular copy-on-write MERGE semantics,
manifest/GC behavior, and parity with the plain IndexStore."""

import os

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.sinks.bucket_store import BucketedIndexStore


def docs(spark, rows):
    return spark.createDataFrame(rows, "id string, v long")


@pytest.fixture()
def store(tmp_path):
    return BucketedIndexStore(str(tmp_path / "ix"), key="id", n_buckets=4)


def as_dict(df):
    return {r["id"]: r["v"] for r in df.collect()}


def test_overwrite_read_roundtrip(spark, store):
    store.overwrite(docs(spark, [("a", 1), ("b", 2), ("c", 3)]))
    assert as_dict(store.read()) == {"a": 1, "b": 2, "c": 3}
    assert "_b" not in store.read().columns


def test_merge_upsert_and_delete(spark, store):
    store.overwrite(docs(spark, [("a", 1), ("b", 2), ("c", 3)]))
    store.merge(
        adds=docs(spark, [("b", 20), ("d", 4)]),
        delete_ids=spark.createDataFrame([("c",)], "id string"),
    )
    assert as_dict(store.read()) == {"a": 1, "b": 20, "d": 4}


def test_merge_replace_keys(spark, store):
    store.overwrite(docs(spark, [("a", 1), ("b", 2), ("c", 3)]))
    store.merge(
        adds=docs(spark, [("a", 10)]),
        replace_keys=spark.createDataFrame([("a",), ("b",)], "id string"),
    )
    # a replaced, b implicitly deleted, c untouched
    assert as_dict(store.read()) == {"a": 10, "c": 3}


def test_merge_rewrites_only_touched_buckets(spark, store):
    store.overwrite(docs(spark, [(f"k{i}", i) for i in range(40)]))
    before = store._bucket_dirs()
    assert set(before) == {0, 1, 2, 3}
    store.merge(adds=docs(spark, [("k0", 100)]))
    after = store._bucket_dirs()
    touched_bucket = spark.range(1).select(
        store.bucket_of(F.lit("k0")).alias("b")).first()["b"]
    for b in range(4):
        if b == touched_bucket:
            assert after[b] != before[b], "touched bucket must move to the new version"
        else:
            assert after[b] == before[b], "untouched buckets must keep their files"
    got = as_dict(store.read())
    assert got["k0"] == 100 and len(got) == 40


def test_delete_predicates_force_full_rewrite(spark, store):
    store.overwrite(docs(spark, [("a", 1), ("b", 2), ("c", 3)]))
    store.merge(delete_predicates=[F.col("v") >= 2])
    assert as_dict(store.read()) == {"a": 1}


def test_scoped_delete_predicates_prune_buckets(spark, tmp_path):
    """K8 delete-by-query with a known key bound: only the scoped rows'
    buckets are read/rewritten; every other bucket keeps its files."""
    store = BucketedIndexStore(str(tmp_path / "rb"), key="cell_id",
                               n_buckets=8, bucket_field="row_s")
    base = spark.createDataFrame(
        [(f"r{i}-f-q{j}", f"r{i}", i * 10 + j) for i in range(16) for j in range(2)],
        "cell_id string, row_s string, v long",
    )
    store.overwrite(base)
    before = store._bucket_dirs()
    scope = spark.createDataFrame([("r3",)], "rowval string")
    store.merge(delete_predicates=[F.col("row_s").isin(["r3"])],
                delete_scope=scope)
    after = store._bucket_dirs()
    touched = spark.range(1).select(
        store.bucket_of(F.lit("r3")).alias("b")).first()["b"]
    moved = {b for b in after if after[b] != before.get(b)}
    assert moved <= {touched}, f"only r3's bucket may move, got {moved}"
    got = {r["cell_id"] for r in store.read().collect()}
    assert not any(c.startswith("r3-") for c in got)
    assert len(got) == 30  # 16*2 - 2 deleted cells


def test_row_bucketed_delete_ids_carry_bucket_column(spark, tmp_path):
    """delete_ids on a row-bucketed store derive buckets from the
    carried row column; merging without it raises."""
    store = BucketedIndexStore(str(tmp_path / "rb2"), key="cell_id",
                               n_buckets=4, bucket_field="row_s")
    base = spark.createDataFrame(
        [("r1-f-a", "r1", 1), ("r1-f-b", "r1", 2), ("r2-f-a", "r2", 3)],
        "cell_id string, row_s string, v long",
    )
    store.overwrite(base)
    dels = spark.createDataFrame([("r1-f-a", "r1")], "cell_id string, row_s string")
    store.merge(delete_ids=dels)
    assert {r["cell_id"] for r in store.read().collect()} == {"r1-f-b", "r2-f-a"}
    with pytest.raises(ValueError, match="bucket column"):
        store.merge(delete_ids=spark.createDataFrame([("r2-f-a",)],
                                                     "cell_id string"))


def test_gc_drops_unreferenced_versions(spark, store):
    store.overwrite(docs(spark, [("a", 1)]))
    for i in range(4):
        store.merge(adds=docs(spark, [("a", i)]))
    versions = {d for d in os.listdir(store.path) if d.startswith("v=")}
    # every merge rewrites a's bucket; only the last two generations stay
    assert len(versions) <= 2
    assert as_dict(store.read()) == {"a": 3}


def test_first_merge_without_base(spark, store):
    store.merge(adds=docs(spark, [("a", 1)]))
    assert as_dict(store.read()) == {"a": 1}


def test_incremental_bucketed_matches_plain(spark, tmp_path, sf_dir):
    from hbase_indexer_spark.config.indexer_conf import IndexerConf
    from hbase_indexer_spark.plans.incremental import IncrementalIndexer
    from hbase_indexer_spark.sources.fixtures import event_cells

    conf = IndexerConf.from_dict({
        "table": "events",
        "fields": [{"name": "purchase_d", "value": "info:purchase", "type": "double"}],
    })
    ev = event_cells(spark, sf_dir)
    plain = IncrementalIndexer(
        spark, conf, state_path=str(tmp_path / "ps"),
        index_path=str(tmp_path / "pi"),
    ).replay(ev, n_chunks=3)
    bucketed = IncrementalIndexer(
        spark, conf, state_path=str(tmp_path / "bs"),
        index_path=str(tmp_path / "bi"), n_buckets=4,
    ).replay(ev, n_chunks=3)
    a = {r["id"]: r["purchase_d"] for r in plain.collect()}
    b = {r["id"]: r["purchase_d"] for r in bucketed.collect()}
    assert a == b


def test_index_store_time_travel(spark, tmp_path):
    """Retained versions stay readable (go-live keeps the previous
    generation); older ones prune at publish and refuse to read."""
    from hbase_indexer_spark.sinks.index_store import IndexStore

    store = IndexStore(str(tmp_path / "ix"), key="id", retain=3)
    for i in range(4):
        store.merge(spark, adds=spark.createDataFrame(
            [(f"r{i}", i)], "id string, v int"))
    assert store.current_version() == 3
    assert store.versions() == [1, 2, 3]          # v=0 pruned (retain=3)

    assert store.read(spark).count() == 4          # current: r0..r3
    assert store.read(spark, version=1).count() == 2
    assert store.read(spark, version=2).count() == 3
    with pytest.raises(ValueError, match="not retained"):
        store.read(spark, version=0)

    # default retain=2 matches the original keep-previous behavior
    s2 = IndexStore(str(tmp_path / "ix2"), key="id")
    for i in range(3):
        s2.merge(spark, adds=spark.createDataFrame(
            [(f"r{i}", i)], "id string, v int"))
    assert s2.versions() == [1, 2]


def test_dbq_merge_on_empty_manifest(spark, tmp_path):
    """A delete-by-query merge against a store whose current manifest is
    EMPTY (a prior merge deleted every row) must not crash — the dbq is
    a no-op and the accompanying adds still publish."""
    from pyspark.sql import functions as F

    from hbase_indexer_spark.sinks.bucket_store import BucketedIndexStore

    store = BucketedIndexStore(str(tmp_path / "b"), key="id",
                               bucket_field="id", n_buckets=4)
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    store.overwrite(df)
    # delete everything via predicate -> empty manifest published
    store.merge(delete_predicates=[F.lit(True)])
    assert store.read() is None or store.read().count() == 0
    # next dbq merge with adds: previously AssertionError, now publishes
    adds = spark.createDataFrame([(3, "z")], "id long, v string")
    store.merge(adds=adds, delete_predicates=[F.col("v") == "gone"])
    assert {r["id"] for r in store.read().collect()} == {3}


def test_compact_rehomes_buckets_into_one_version(spark, store):
    """r6: after several bucket-granular merges the live manifest spans
    multiple v=N dirs; compact() collapses it to one and GC reclaims."""
    store.overwrite(docs(spark, [("a", 1), ("b", 2), ("c", 3), ("d", 4)]))
    # several touching merges so buckets scatter across versions
    store.merge(adds=docs(spark, [("a", 10)]))
    store.merge(adds=docs(spark, [("b", 20)]))
    dirs_before = {d.split("/", 1)[0] for d in store._bucket_dirs().values()}
    assert len(dirs_before) > 1  # sprawl exists
    sprawl = store.compact(spark)
    assert sprawl == len(dirs_before)
    dirs_after = {d.split("/", 1)[0] for d in store._bucket_dirs().values()}
    assert len(dirs_after) == 1
    # data intact
    assert as_dict(store.read()) == {"a": 10, "b": 20, "c": 3, "d": 4}


def test_plain_store_compact_shrinks_files(spark, tmp_path):
    from hbase_indexer_spark.sinks.index_store import IndexStore

    st = IndexStore(str(tmp_path / "ix"), key="id")
    df = spark.createDataFrame(
        [(str(i), i) for i in range(1000)], "id string, v long"
    ).repartition(16)
    st.overwrite(df, spark)
    v = st.current_version()
    files_before = len([f for f in os.listdir(st._version_dir(v))
                        if f.endswith(".parquet")])
    assert files_before > 1
    files_after = st.compact(spark, n_files=1)
    assert files_after == 1
    rows = {r["id"]: r["v"] for r in st.read(spark).collect()}
    assert len(rows) == 1000 and rows["7"] == 7
    # empty store is a no-op
    empty = IndexStore(str(tmp_path / "empty"), key="id")
    assert empty.compact(spark) == 0
