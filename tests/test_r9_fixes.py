"""r8-ADVICE regression pins (round 9).

- MaintainedAggregate._recover(): a LEGACY (pre-r8) cursor lacking
  ``agg_version`` must consult the write-ahead intent BEFORE adopting
  the current aggregate version — otherwise a crash between publish and
  cursor commit on the first new-code advance() is misread as clean
  state and the retry double-applies the feed (ADVICE r8 medium:
  ivm.py:250).
- dhash_media: NULL payload yields NULL dhash (docstring contract)
  instead of a TypeError in the executor (ADVICE r8 low).
- fd_check: empty input table reports n_violating=0 / fd_holds=1 on
  BOTH engines (Spark sum-over-zero-rows is NULL; coalesce pins it).
- interval_overlap_join: negative bounds grid via true floor division
  (pmod), matching brute-force overlap semantics exactly.
"""

import json

import duckdb
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


def _strip_agg_version(view):
    """Rewrite the cursor file to the legacy (pre-r8) single-field
    format, as an upgraded deployment would find on disk."""
    with open(view._cursor_file) as f:
        cur = json.load(f)
    with open(view._cursor_file, "w") as f:
        json.dump({"applied_to": int(cur["applied_to"])}, f)


def test_ivm_legacy_cursor_crash_after_publish_rolls_forward(
        spark, tmp_path):
    """The r8-ADVICE hole: legacy cursor + crash between publish and
    cursor commit.  Recovery must read the intent and roll FORWARD —
    adopting agg_now first would delete the intent and re-apply the
    feed onto an aggregate that already contains it."""
    src, view = _make_view(spark, tmp_path)

    real_set_cursor = view._set_cursor
    view._set_cursor = lambda v: (_ for _ in ()).throw(
        OSError("simulated crash before cursor commit"))
    with pytest.raises(OSError, match="simulated crash"):
        view.advance(spark, src)
    view._set_cursor = real_set_cursor

    # the interrupted advance left the OLD cursor; rewrite it legacy
    _strip_agg_version(view)
    # retry converges by roll-forward (intent), not by re-applying
    assert view.advance(spark, src) is False
    _assert_converged(spark, src, view)


def test_ivm_legacy_cursor_clean_state_upgrades_in_place(spark, tmp_path):
    """Legacy cursor with NO pending intent: recovery adopts the
    current aggregate version and upgrades the cursor file."""
    src, view = _make_view(spark, tmp_path)
    assert view.advance(spark, src) is True
    _strip_agg_version(view)
    assert view.applied_version() == src.current_version()
    with open(view._cursor_file) as f:
        assert "agg_version" in json.load(f)  # upgraded
    _assert_converged(spark, src, view)


def test_ivm_legacy_cursor_stale_intent_discarded(spark, tmp_path):
    """Legacy cursor + an intent whose agg_version does NOT match the
    store (publish never ran): the intent is discarded and the feed
    applies normally."""
    src, view = _make_view(spark, tmp_path)
    _strip_agg_version(view)
    view._write_intent(to_v=999, agg_v=view.store.current_version() + 7)
    assert view.advance(spark, src) is True
    _assert_converged(spark, src, view)


def test_dhash_null_payload_yields_null(spark):
    from hbase_indexer_spark.pipeline.codecs import png_encode
    from hbase_indexer_spark.pipeline.multimodal import dhash_media

    import numpy as np

    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    df = spark.createDataFrame(
        [(1, bytearray(png_encode(px))), (2, None),
         (3, bytearray(b"not a png"))],
        "doc_id long, payload binary")
    rows = {r.doc_id: r.dhash for r in dhash_media(df).collect()}
    assert rows[2] is None          # NULL payload -> NULL (was TypeError)
    assert rows[3] is None          # non-PNG -> NULL
    assert rows[1] is not None and len(rows[1]) == 16


def test_fd_check_empty_table_matches_oracle(spark, tmp_path):
    from hbase_indexer_spark.pipeline.corpus_stats import (
        fd_check, fd_check_sql)

    empty = spark.createDataFrame([], "a long, b long")
    got = fd_check(empty, [("a", "b")]).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_groups, r.n_violating, r.fd_holds) == (0, 0, 1)

    p = str(tmp_path / "empty.parquet")
    empty.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM parquet_scan('{p}/*.parquet')")
    orc = con.execute(fd_check_sql([("a", "b")], "t")).fetchall()
    assert [(x[2], x[3], x[4]) for x in orc] == [(0, 0, 1)]


def test_interval_overlap_join_negative_bounds(spark):
    from hbase_indexer_spark.operators.joins import interval_overlap_join

    lefts = [(i, lo, lo + w) for i, (lo, w) in enumerate(
        [(-25, 7), (-10, 3), (-3, 6), (0, 5), (4, 9), (-17, 20)])]
    rights = [(100 + i, lo, lo + w) for i, (lo, w) in enumerate(
        [(-30, 12), (-8, 8), (-1, 2), (2, 10), (-20, 40)])]
    want = sorted((l[0], r[0]) for l in lefts for r in rights
                  if l[1] < r[2] and r[1] < l[2])

    ldf = spark.createDataFrame(lefts, "lid long, l_lo long, l_hi long")
    rdf = spark.createDataFrame(rights, "rid long, r_lo long, r_hi long")
    for grid in (3, 7, 50):  # intervals straddle zero at every width
        got = sorted((r.lid, r.rid) for r in interval_overlap_join(
            ldf, rdf, "l_lo", "l_hi", "r_lo", "r_hi", grid).collect())
        assert got == want, f"grid={grid}"
