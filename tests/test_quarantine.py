"""K1 per-document error isolation — the reference's test matrix
(DirectSolrInputDocumentWriterTest.java) re-expressed for the
quarantine writer:

  testAdd_NormalCase            -> test_add_normal_case
  testAdd_RetryIndividually     -> test_add_bad_doc_isolated
  testAdd_BadRequest            -> test_add_all_bad
  testAdd_IOException /
    SolrExceptionCausedByIO     -> test_add_server_error_propagates
  testDeleteById_NormalCase     -> test_delete_normal_case
  testDeleteById_RetryIndividually -> test_delete_bad_id_isolated
  testDeleteById_IOException    -> test_delete_server_error_propagates
  testDeleteByQuery             -> test_delete_by_query_normal
  (deleteByQuery BAD_REQUEST)   -> test_delete_by_query_malformed_swallowed
plus the Spark-side extras: quarantine content, redelivery idempotence.
"""

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.sinks.quarantine import (
    QuarantiningIndexWriter,
    classify_docs,
)

CHECKS = lambda: {  # noqa: E731 - fresh Columns per writer
    "negative_balance": F.col("bal") >= 0,
    "null_name": F.col("name").isNotNull(),
}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, bal long")


def _writer(spark, tmp_path):
    return QuarantiningIndexWriter(str(tmp_path / "w"), key="id",
                                   checks=CHECKS())


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "id long")


def _index_ids(spark, w):
    df = w.read(spark)
    return sorted(r.id for r in df.collect()) if df is not None else []


def _quarantined(spark, w):
    df = w.read_quarantine(spark)
    if df is None:
        return {}
    return {r.id: r["_error"] for r in df.collect()}


def test_add_normal_case(spark, tmp_path):
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 10), (2, "b", 0)]))
    assert _index_ids(spark, w) == [1, 2]
    assert _quarantined(spark, w) == {}
    assert w.counters["index_adds"] == 2
    assert w.counters["document_add_errors"] == 0


def test_add_bad_doc_isolated(spark, tmp_path):
    """One bad doc must not hold up the rest (retryAddsIndividually);
    the bad doc lands in quarantine with the failed-check reasons."""
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 10), (2, None, -5), (3, "c", 1)]))
    assert _index_ids(spark, w) == [1, 3]
    assert _quarantined(spark, w) == {2: "negative_balance,null_name"}
    assert w.counters["index_adds"] == 2
    assert w.counters["document_add_errors"] == 1


def test_add_all_bad(spark, tmp_path):
    """Every doc bad -> nothing indexed, no exception (testAdd_BadRequest:
    'swallowed and logged' — here: quarantined and counted)."""
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, None, 1), (2, "b", -1)]))
    assert _index_ids(spark, w) == []
    assert _quarantined(spark, w) == {1: "null_name", 2: "negative_balance"}
    assert w.counters["index_adds"] == 0
    assert w.counters["document_add_errors"] == 2


def test_add_server_error_propagates(spark, tmp_path):
    """A publish failure is a SERVER problem: rethrown for whole-batch
    retry, counters unchanged, and the retry (store healthy again)
    converges — the reference's retry-until-healthy loop."""
    w = _writer(spark, tmp_path)
    batch = _docs(spark, [(1, "a", 10), (2, None, 2)])

    real_publish = w.store._publish
    w.store._publish = lambda df, s: (_ for _ in ()).throw(
        OSError("index store unavailable"))
    with pytest.raises(OSError, match="unavailable"):
        w.add(spark, batch)
    assert w.counters["index_adds"] == 0

    w.store._publish = real_publish
    w.add(spark, batch)  # idempotent whole-batch retry
    assert _index_ids(spark, w) == [1]
    assert _quarantined(spark, w) == {2: "null_name"}
    assert w.counters["index_adds"] == 1


def test_delete_normal_case(spark, tmp_path):
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)]))
    w.delete_by_id(spark, _ids(spark, [1, 3]))
    assert _index_ids(spark, w) == [2]
    assert w.counters["index_deletes"] == 2
    assert w.counters["document_delete_errors"] == 0


def test_delete_bad_id_isolated(spark, tmp_path):
    """A bad id (NULL, or failing the id_check) is counted and skipped;
    the good ids still delete (retryDeletesIndividually)."""
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)]))
    ids = spark.createDataFrame([(1,), (None,), (99,)], "id long")
    w.delete_by_id(spark, ids, id_check=F.col("id") < 50)
    assert _index_ids(spark, w) == [2, 3]
    assert w.counters["index_deletes"] == 1
    assert w.counters["document_delete_errors"] == 2


def test_delete_clears_quarantine_too(spark, tmp_path):
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 1), (2, None, 2)]))
    assert _quarantined(spark, w) == {2: "null_name"}
    w.delete_by_id(spark, _ids(spark, [2]))
    assert _quarantined(spark, w) == {}
    assert _index_ids(spark, w) == [1]


def test_delete_server_error_propagates(spark, tmp_path):
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 1), (2, "b", 2)]))
    w.store._publish = lambda df, s: (_ for _ in ()).throw(
        OSError("index store unavailable"))
    with pytest.raises(OSError, match="unavailable"):
        w.delete_by_id(spark, _ids(spark, [1]))


def test_delete_by_query_normal(spark, tmp_path):
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 1), (2, "b", 20), (3, "c", 30)]))
    w.delete_by_query(spark, ["bal > 15"])
    assert _index_ids(spark, w) == [1]
    assert w.counters["document_delete_errors"] == 0


def test_delete_by_query_malformed_swallowed(spark, tmp_path):
    """An unresolvable predicate is the BAD_REQUEST analog: counted,
    swallowed, and the well-formed predicates still apply."""
    w = _writer(spark, tmp_path)
    w.add(spark, _docs(spark, [(1, "a", 1), (2, "b", 20)]))
    w.delete_by_query(spark, ["no_such_column = 7", "bal > 15"])
    assert _index_ids(spark, w) == [1]
    assert w.counters["document_delete_errors"] == 1


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    """T1: the at-least-once redelivery of a mixed batch changes nothing
    — index, quarantine, and the VIEWS' contents all converge (counters
    count attempts, like the reference meters)."""
    w = _writer(spark, tmp_path)
    batch = _docs(spark, [(1, "a", 10), (2, None, 2), (3, "c", -3)])
    w.add(spark, batch)
    before_ix = _index_ids(spark, w)
    before_q = _quarantined(spark, w)
    w.add(spark, batch)
    assert _index_ids(spark, w) == before_ix == [1]
    assert _quarantined(spark, w) == before_q == {
        2: "null_name", 3: "negative_balance"}
    assert w.counters["index_adds"] == 2
    assert w.counters["document_add_errors"] == 4


def test_classify_empty_checks(spark):
    out = classify_docs(_docs(spark, [(1, "a", 1)]), {})
    assert [r["_error"] for r in out.collect()] == [None]


def test_null_predicate_value_is_doc_error(spark, tmp_path):
    """A check that evaluates to NULL on a doc counts as a failure —
    the doc can't be proven good (the BAD_REQUEST analog for
    missing/untyped values)."""
    w = QuarantiningIndexWriter(
        str(tmp_path / "w"), key="id",
        checks={"bal_known_positive": F.col("bal") > 0})
    w.add(spark, spark.createDataFrame(
        [(1, "a", None), (2, "b", 5)], "id long, name string, bal long"))
    assert _index_ids(spark, w) == [2]
    assert _quarantined(spark, w) == {1: "bal_known_positive"}
