"""Incremental-pipeline semantics tests — ports of RowBasedIndexerTest.java:76-166
and ColumnBasedIndexerTest.java:70-262 scenario matrices (FIXTURES.md §4)."""

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.config.indexer_conf import IndexerConf
from hbase_indexer_spark.plans.incremental import IncrementalIndexer

EVENT_SCHEMA = (
    "seq long, event_ts long, table string, row string, family string, "
    "qualifier string, ts long, op string, value binary"
)


def ev(seq, row, qualifier, value=None, op="put", family="info", table="t",
       event_ts=None):
    if isinstance(value, str):
        value = value.encode()
    return (seq, event_ts if event_ts is not None else seq, table, row, family,
            qualifier, seq, op, value)


ROW_CONF = {
    "table": "t",
    "fields": [
        {"name": "name_s", "value": "info:name"},
        {"name": "mail_s", "value": "info:mail"},
    ],
}

COL_CONF = {
    "table": "t", "mapping_type": "column",
    "row_field": "row_s", "column_family_field": "cf_s",
    "fields": [{"name": "val", "value": "info:*"}],
}


def run(spark, tmp_path, rows, conf_dict, n_chunks=1, subscription_ts=None):
    conf = IndexerConf.from_dict(conf_dict)
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    ix = IncrementalIndexer(
        spark, conf,
        state_path=str(tmp_path / "state"),
        index_path=str(tmp_path / "index"),
        subscription_ts=subscription_ts,
    )
    return {r["id"]: r.asDict() for r in ix.replay(df, n_chunks=n_chunks).collect()}


def test_put_then_update_row_mode(spark, tmp_path):
    out = run(spark, tmp_path, [
        ev(1, "r1", "name", "alice"),
        ev(2, "r1", "mail", "a@x.com"),
        ev(3, "r1", "name", "alicia"),
    ], ROW_CONF)
    assert out == {"r1": {"id": "r1", "name_s": "alicia", "mail_s": "a@x.com"}}


def test_update_then_delete_row(spark, tmp_path):
    # RowBasedIndexerTest.java:151-166
    out = run(spark, tmp_path, [
        ev(1, "r1", "name", "alice"),
        ev(2, "r1", None, op="delete_row"),
    ], ROW_CONF)
    assert out == {}


def test_delete_then_update_row(spark, tmp_path):
    # RowBasedIndexerTest.java:131-148 — add wins
    out = run(spark, tmp_path, [
        ev(1, "r1", None, op="delete_row"),
        ev(2, "r1", "name", "alice"),
    ], ROW_CONF)
    assert out == {"r1": {"id": "r1", "name_s": "alice", "mail_s": None}}


def test_irrelevant_event_ignored(spark, tmp_path):
    out = run(spark, tmp_path, [ev(1, "r1", "unmapped", "x")], ROW_CONF)
    assert out == {}


def test_subscription_ts_gate(spark, tmp_path):
    # SepConsumer.java:227-228 / IndexerIT.java:547
    out = run(spark, tmp_path, [
        ev(1, "r1", "name", "old", event_ts=100),
        ev(2, "r2", "name", "new", event_ts=200),
    ], ROW_CONF, subscription_ts=150)
    assert list(out) == ["r2"]


def test_multi_chunk_equals_single_chunk(spark, tmp_path):
    rows = [
        ev(1, "r1", "name", "a"),
        ev(2, "r2", "name", "b"),
        ev(3, "r1", None, op="delete_row"),
        ev(4, "r1", "name", "a2"),
        ev(5, "r2", "mail", "b@x.com"),
        ev(6, "r3", "name", "c"),
        ev(7, "r3", None, op="delete_row"),
    ]
    one = run(spark, tmp_path / "one", rows, ROW_CONF, n_chunks=1)
    many = run(spark, tmp_path / "many", rows, ROW_CONF, n_chunks=4)
    assert one == many
    assert set(one) == {"r1", "r2"}
    assert one["r1"]["name_s"] == "a2"


def test_delete_family_masks_only_family(spark, tmp_path):
    conf = {
        "table": "t",
        "fields": [
            {"name": "a", "value": "info:name"},
            {"name": "b", "value": "other:thing"},
        ],
    }
    out = run(spark, tmp_path, [
        ev(1, "r1", "name", "x"),
        ev(2, "r1", "thing", "y", family="other"),
        ev(3, "r1", None, op="delete_family", family="info"),
    ], conf)
    assert out == {"r1": {"id": "r1", "a": None, "b": "y"}}


def test_column_mode_add_and_delete_column(spark, tmp_path):
    # ColumnBasedIndexerTest: per-cell doc; delete_column deletes that id
    out = run(spark, tmp_path, [
        ev(1, "r1", "m1", "hello"),
        ev(2, "r1", "m2", "world"),
        ev(3, "r1", "m1", None, op="delete_column"),
    ], COL_CONF)
    assert set(out) == {"r1-info-m2"}
    assert out["r1-info-m2"]["val"] == "world"
    assert out["r1-info-m2"]["row_s"] == "r1"
    assert out["r1-info-m2"]["cf_s"] == "info"


def test_column_mode_delete_row_by_query(spark, tmp_path):
    # Indexer.java:389-427 — delete-by-query on row field (K8)
    out = run(spark, tmp_path, [
        ev(1, "r1", "m1", "hello"),
        ev(2, "r2", "m1", "keep"),
        ev(3, "r1", None, op="delete_row"),
    ], COL_CONF, n_chunks=3)
    assert set(out) == {"r2-info-m1"}


def test_column_mode_delete_family_by_query(spark, tmp_path):
    conf = dict(COL_CONF)
    conf["fields"] = [{"name": "val", "value": "info:*"}]
    out = run(spark, tmp_path, [
        ev(1, "r1", "m1", "hello", family="info"),
        ev(2, "r1", None, op="delete_family", family="info"),
    ], conf, n_chunks=2)
    assert out == {}


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    """T1: at-least-once delivery -> effective exactly-once.  Structured
    Streaming redelivers the LAST uncommitted micro-batch after a failure;
    reapplying it against the already-updated state/index must be a no-op
    (the MERGE-on-unique-key sink + set-oriented state replace)."""
    conf = IndexerConf.from_dict(ROW_CONF)
    b1 = spark.createDataFrame(
        [ev(1, "r1", "name", "alice"), ev(2, "r2", "name", "bob")],
        EVENT_SCHEMA)
    b2 = spark.createDataFrame(
        [ev(3, "r1", "name", "alicia"), ev(4, "r2", "mail", None,
                                           op="delete_family"),
         ev(5, "r3", "name", "carol")],
        EVENT_SCHEMA)
    ix = IncrementalIndexer(
        spark, conf,
        state_path=str(tmp_path / "state"),
        index_path=str(tmp_path / "index"),
    )
    ix.process_batch(b1)
    ix.process_batch(b2)
    expect = {r["id"]: r.asDict()
              for r in ix.index.read(spark).collect()}
    assert set(expect) == {"r1", "r3"}          # r2 family-deleted
    assert expect["r1"]["name_s"] == "alicia"

    ix.process_batch(b2)                        # redelivery
    again = {r["id"]: r.asDict() for r in ix.index.read(spark).collect()}
    assert again == expect

    ix.process_batch(b2)                        # and again
    assert {r["id"]: r.asDict()
            for r in ix.index.read(spark).collect()} == expect


@pytest.mark.parametrize("n_buckets", [None, 8])
def test_column_mode_large_delete_batch_uses_join_path(spark, tmp_path, n_buckets):
    """K8 at WAL scale: a batch whose distinct delete-by-query scope
    exceeds delete_inlist_max must NOT be collected into IN-list literals —
    the delete set stays distributed (anti-join), on both store kinds, and
    the merged result is identical to the small-batch semantics."""
    conf = IndexerConf.from_dict(COL_CONF)
    n_rows = 40
    puts = [ev(i + 1, f"r{i:03d}", "m1", f"v{i}") for i in range(n_rows)]
    # delete_row for the odd rows, delete_family for rows 0/4/8 (mod 4)
    dels = [ev(n_rows + i + 1, f"r{i:03d}", None, op="delete_row")
            for i in range(n_rows) if i % 2 == 1]
    dels += [ev(2 * n_rows + i + 1, f"r{i:03d}", None, op="delete_family")
             for i in range(n_rows) if i % 4 == 0]
    ix = IncrementalIndexer(
        spark, conf,
        state_path=str(tmp_path / f"state{n_buckets}"),
        index_path=str(tmp_path / f"index{n_buckets}"),
        n_buckets=n_buckets,
        delete_inlist_max=5,          # force the distributed path
    )
    ix.process_batch(spark.createDataFrame(puts, EVENT_SCHEMA))
    ix.process_batch(spark.createDataFrame(dels, EVENT_SCHEMA))
    assert ix.metrics["delete_path"] == "join"
    survivors = {r["id"] for r in ix.index.read(spark).collect()}
    assert survivors == {f"r{i:03d}-info-m1" for i in range(n_rows)
                        if i % 2 == 0 and i % 4 != 0}

    # same batches under the default (IN-list) threshold -> same result
    ix2 = IncrementalIndexer(
        spark, conf,
        state_path=str(tmp_path / f"state2{n_buckets}"),
        index_path=str(tmp_path / f"index2{n_buckets}"),
        n_buckets=n_buckets,
    )
    ix2.process_batch(spark.createDataFrame(puts, EVENT_SCHEMA))
    ix2.process_batch(spark.createDataFrame(dels, EVENT_SCHEMA))
    assert ix2.metrics["delete_path"] == "inlist"
    assert {r["id"] for r in ix2.index.read(spark).collect()} == survivors


def test_delete_inlist_max_exact_boundary(spark, tmp_path):
    """The IN-list/anti-join switch fires at EXACTLY delete_inlist_max
    (r9, VERDICT r8 #9): a delete scope of size == max stays an IN-list
    (<= comparison), size == max + 1 goes distributed — with identical
    merged results either side of the boundary."""
    conf = IndexerConf.from_dict(COL_CONF)
    puts = [ev(i + 1, f"r{i:03d}", "m1", f"v{i}") for i in range(8)]
    dels = [ev(100 + i, f"r{i:03d}", None, op="delete_row")
            for i in range(4)]           # 4 distinct delete rows

    def run(max_, tag):
        ix = IncrementalIndexer(
            spark, conf,
            state_path=str(tmp_path / f"s{tag}"),
            index_path=str(tmp_path / f"i{tag}"),
            delete_inlist_max=max_,
        )
        ix.process_batch(spark.createDataFrame(puts, EVENT_SCHEMA))
        ix.process_batch(spark.createDataFrame(dels, EVENT_SCHEMA))
        return ix, {r["id"] for r in ix.index.read(spark).collect()}

    at, surv_at = run(4, "at")           # scope == max -> IN-list
    assert at.metrics["delete_path"] == "inlist"
    below, surv_below = run(3, "below")  # scope == max + 1 -> anti-join
    assert below.metrics["delete_path"] == "join"
    assert surv_at == surv_below == {
        f"r{i:03d}-info-m1" for i in range(4, 8)}
