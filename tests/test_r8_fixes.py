"""r7-ADVICE regression pins (round 8).

- MaintainedAggregate.advance() publishes the aggregate and the cursor
  as two files; a crash BETWEEN them must not double-retract on retry
  (ADVICE r7 medium: ivm.py:266).  The write-ahead intent + recovery
  rolls the cursor forward when the publish landed, and discards the
  intent when it did not.
"""

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.sinks.index_store import IndexStore


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _recompute(base, g, sum_cols):
    aggs = [F.coalesce(F.sum(src), F.lit(0)).alias(dst)
            for dst, src in sum_cols.items()]
    return base.groupBy(g).agg(*aggs, F.count(F.lit(1)).alias("n_rows"))


def _make_view(spark, tmp_path):
    from hbase_indexer_spark.plans.ivm import MaintainedAggregate

    src = IndexStore(str(tmp_path / "src"), key="id", retain=5)
    src.overwrite(_df(spark, [(1, "g1", 10), (2, "g2", 20)],
                      "id long, g string, x long"), spark)
    view = MaintainedAggregate(str(tmp_path / "view"), ["g"], {"sum_x": "x"})
    view.init(spark, src)
    src.merge(spark, adds=_df(spark, [(1, "g1", 15), (3, "g1", 5)],
                              "id long, g string, x long"))
    return src, view


def _assert_converged(spark, src, view):
    got = sorted(tuple(r) for r in view.read(spark)
                 .select("g", "sum_x", "n_rows").collect())
    want = sorted(tuple(r) for r in
                  _recompute(src.read(spark), "g", {"sum_x": "x"}).collect())
    assert got == want == [("g1", 20, 2), ("g2", 20, 1)]
    assert view.applied_version() == src.current_version()


def test_ivm_crash_after_publish_before_cursor(spark, tmp_path):
    """Crash window A: aggregate published, cursor commit lost.  The
    retry must roll the cursor forward from the intent, NOT re-apply
    the feed (the double-retract hole from r7 ADVICE)."""
    src, view = _make_view(spark, tmp_path)

    real_set_cursor = view._set_cursor
    view._set_cursor = lambda v: (_ for _ in ()).throw(
        OSError("simulated crash before cursor commit"))
    with pytest.raises(OSError, match="simulated crash"):
        view.advance(spark, src)
    view._set_cursor = real_set_cursor

    # retry: recovery must detect the landed publish and no-op
    assert view.advance(spark, src) is False
    _assert_converged(spark, src, view)


def test_ivm_crash_after_intent_before_publish(spark, tmp_path):
    """Crash window B: intent written, publish never landed.  The retry
    must discard the intent and apply the feed exactly once."""
    src, view = _make_view(spark, tmp_path)

    real_overwrite = view.store.overwrite
    def boom(df, s):
        raise OSError("simulated crash before publish")
    view.store.overwrite = boom
    with pytest.raises(OSError, match="simulated crash"):
        view.advance(spark, src)
    view.store.overwrite = real_overwrite

    assert view.advance(spark, src) is True
    _assert_converged(spark, src, view)


def test_bpe_train_checkpoint_boundary_is_invisible(spark, monkeypatch):
    """r7 ADVICE (low): bpe_train now re-materializes the symbol table
    every K rounds to bound plan depth.  Forcing the checkpoint to fire
    mid-training (K=2 over 6 rounds) must not change a single merge."""
    from hbase_indexer_spark.pipeline import corpus_stats

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower lowest", "new newer", "banana bandana",
             "low low banana", "wide widest newer"] * 4)],
        "doc_id long, text string")
    want = [tuple(r) for r in corpus_stats.bpe_train(docs, 6).collect()]
    monkeypatch.setattr(corpus_stats, "_BPE_CHECKPOINT_EVERY", 2)
    got = [tuple(r) for r in corpus_stats.bpe_train(docs, 6).collect()]
    assert got == want and len(want) == 6


def test_avro_write_big_longs_and_nulls_roundtrip(spark):
    """r7 ADVICE (low): nullable long columns reach the write UDF as
    float64 (Arrow null promotion), silently corrupting values above
    2^53.  Longs now ride as decimal strings: a 2^60-scale value and a
    NULL in the same column must round-trip bit-exactly."""
    from hbase_indexer_spark.operators.transform import TransformChain

    big = (1 << 60) + 7  # unrepresentable in float64
    df = spark.createDataFrame(
        [(1, big, "a"), (2, None, "b"), (3, -big, None)],
        "id long, v long, s string")
    chain = TransformChain.from_config([
        {"stage": "write_avro_container", "codec": "null",
         "fields": {"id": "long", "v": "long", "s": "string"},
         "into": "body"},
        {"stage": "read_avro_container", "field": "body"},
        {"stage": "extract_avro_paths",
         "paths": {"rt_id": "/id", "rt_v": "/v", "rt_s": "/s"},
         "types": {"rt_id": "long", "rt_v": "long"}},
    ])
    got = sorted((r["rt_id"], r["rt_v"], r["rt_s"])
                 for r in chain(df).collect())
    assert got == [(1, big, "a"), (2, None, "b"), (3, -big, None)]


def test_sorted_neighborhood_null_text_matches_oracle(spark):
    """r7 ADVICE (low): NULL text used to rank NULLS-FIRST in Spark but
    NULLS-LAST in the DuckDB oracle.  With the key coalesced to '' both
    engines must agree on every (x, y, gap, jaccard_micro) row."""
    import duckdb
    import pandas as pd

    from hbase_indexer_spark.pipeline.dedup import (
        sorted_neighborhood_pairs, sorted_neighborhood_sql)

    rows = [(1, "aaa shared prefix text"), (2, None),
            (3, "aaa shared prefix texts"), (4, ""), (5, "zzz tail doc")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 sorted_neighborhood_pairs(docs, window=2).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    want = sorted(map(tuple,
                      con.execute(sorted_neighborhood_sql(window=2))
                      .fetchall()))
    assert got == want


def test_ivm_unexplained_gap_requires_reinit(spark, tmp_path):
    """An agg-store version the cursor cannot account for (no intent)
    must refuse to guess instead of silently double-retracting."""
    src, view = _make_view(spark, tmp_path)
    assert view.advance(spark, src) is True
    # out-of-band aggregate publish with no intent recorded
    view.store.overwrite(view.read(spark), spark)
    with pytest.raises(ValueError, match="re-init required"):
        view.advance(spark, src)
