"""C4-style cross-document passage dedup (span_dedup).

Pins: first-occurrence-wins keeper rule across documents, within-document
repeated spans, tail spans shorter than the window, full-loss documents
(empty rebuilt text), empty input documents, and that every input doc_id
survives to the output exactly once.
"""

from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.dedup import doc_spans, span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(spark, rows, span=3):
    res = span_dedup(_docs(spark, rows), span=span).orderBy("doc_id").collect()
    return {r["doc_id"]: (r["text"], r["n_spans"], r["n_removed"]) for r in res}


def test_repeated_span_removed_from_later_doc(spark):
    out = _out(spark, [
        (1, "a b c d e f"),          # spans: "a b c", "d e f"
        (2, "a b c x y z"),          # "a b c" repeats -> removed here
    ])
    assert out[1] == ("a b c d e f", 2, 0)
    assert out[2] == ("x y z", 2, 1)


def test_within_document_repeat_keeps_first(spark):
    out = _out(spark, [(7, "a b c a b c q")])   # spans: abc, abc, q
    assert out[7] == ("a b c q", 3, 1)


def test_tail_span_shorter_than_window(spark):
    out = _out(spark, [(1, "a b c d")])          # spans: "a b c", "d"
    assert out[1] == ("a b c d", 2, 0)
    # the short tail "d" is its own span and deduplicates too
    out2 = _out(spark, [(1, "a b c d"), (2, "x y z d")])
    assert out2[2] == ("x y z", 2, 1)


def test_identical_docs_second_empties(spark):
    out = _out(spark, [(1, "a b c"), (2, "a b c")])
    assert out[1] == ("a b c", 1, 0)
    assert out[2] == ("", 1, 1)


def test_empty_doc_survives_with_no_spans(spark):
    out = _out(spark, [(1, ""), (2, "a b c")])
    assert out[1] == ("", 0, 0)
    assert out[2] == ("a b c", 1, 0)


def test_every_doc_id_exactly_once(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = span_dedup(docs, span=10)
    assert res.count() == docs.count()
    assert res.select("doc_id").distinct().count() == docs.count()


def test_doc_spans_positions_are_contiguous(spark):
    sp = doc_spans(_docs(spark, [(1, "a b c d e f g")]), span=2).collect()
    assert [(r["pos"], r["span"]) for r in sorted(sp)] == [
        (0, "a b"), (1, "c d"), (2, "e f"), (3, "g")]


def test_edit_distance_dedup_semantics(spark):
    """Near-identical docs (1 typo in a shared template) pair with their
    true distance; unrelated docs never become candidates; the early-exit
    -1 path drops candidates above max_dist."""
    from hbase_indexer_spark.pipeline.dedup import edit_distance_dedup

    tmpl = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = spark.createDataFrame([
        (1, tmpl),
        (2, tmpl.replace("gamma", "gamla").replace("kappa", "kappu")),  # 2 edits
        (3, "completely different text about other things entirely ok"),
    ], "doc_id long, text string")
    out = {(r["x"], r["y"]): r["lev"]
           for r in edit_distance_dedup(docs, max_dist=10).collect()}
    assert out == {(1, 2): 2}
    # tighten the bound below the true distance: the pair early-exits
    none = edit_distance_dedup(docs, max_dist=1).collect()
    assert none == []
