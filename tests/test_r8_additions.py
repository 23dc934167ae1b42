"""r8 operator pins: interval-overlap join vs naive, prefix-filter
exact recall vs brute force, dHash vs a pure-python recompute, gapfill
LOCF semantics, k-anonymity, OLS trend vs DuckDB regr_slope."""

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


def test_interval_overlap_join_equals_naive(spark):
    """Grid-cell equi-join + first-shared-cell dedup must reproduce the
    naive O(n*m) overlap join exactly — one row per overlapping pair,
    including multi-cell intervals and cell-boundary touches."""
    from hbase_indexer_spark.operators.joins import interval_overlap_join

    rng = random.Random(7)

    def mk(n):
        out = []
        for i in range(n):
            lo = rng.randrange(0, 1000)
            out.append((i, lo, lo + rng.randrange(0, 80)))  # incl. empty
        return out

    ls, rs = mk(60), mk(60)
    # half-open semantics: an EMPTY interval (lo == hi) contains no
    # point, so it overlaps nothing even when it sits inside another
    want = sorted((a, b) for a, alo, ahi in ls for b, blo, bhi in rs
                  if alo < ahi and blo < bhi and alo < bhi and blo < ahi)
    left = spark.createDataFrame(ls, "a long, alo long, ahi long")
    right = spark.createDataFrame(rs, "b long, blo long, bhi long")
    got = sorted((r["a"], r["b"]) for r in interval_overlap_join(
        left, right, "alo", "ahi", "blo", "bhi", grid=16).collect())
    assert got == want  # exact multiset: no misses, no duplicates


def test_interval_overlap_join_rejects_bad_grid(spark):
    from hbase_indexer_spark.operators.joins import interval_overlap_join

    df = spark.range(1).select(F.lit(0).alias("lo"), F.lit(1).alias("hi"))
    with pytest.raises(ValueError, match="grid"):
        interval_overlap_join(df, df, "lo", "hi", "lo", "hi", grid=0)


def test_prefix_filter_exact_recall(spark):
    """The pigeonhole guarantee: prefix filtering finds EVERY pair with
    Jaccard >= t (zero false negatives), and verification keeps exactly
    those — output == brute force, values included."""
    from hbase_indexer_spark.pipeline.dedup import prefix_filter_pairs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.sample(vocab, rng.randrange(3, 12))))
            for i in range(40)]
    t = 600_000

    def jac(a, b):
        sa, sb = set(a.split()), set(b.split())
        inter = len(sa & sb)
        return (1_000_000 * inter) // (len(sa) + len(sb) - inter)

    want = sorted((x, y, jac(tx, ty))
                  for x, tx in docs for y, ty in docs
                  if x < y and jac(tx, ty) >= t)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 prefix_filter_pairs(df, threshold_micro=t).collect())
    assert got == want


def test_dhash_matches_pure_python_and_groups_identicals(spark):
    """dHash through the REAL PNG encode->decode->resample path equals
    a from-scratch recompute on the raw pixels; identical images hash
    identically, a perturbed image does not."""
    import numpy as np

    from hbase_indexer_spark.pipeline.codecs import png_encode
    from hbase_indexer_spark.pipeline.multimodal import dhash_media

    base = (np.arange(5 * 4, dtype=np.uint8).reshape(4, 5) * 13) % 256
    other = base.copy()
    other[1, 2] = (int(other[1, 2]) + 97) % 256
    rows = [(1, bytearray(png_encode(base, 0))),
            (2, bytearray(png_encode(base, 1))),   # same pixels, Sub filter
            (3, bytearray(png_encode(other, 2)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["dhash"] for r in dhash_media(df).collect()}

    def expect(px):
        h, w = px.shape
        val = 0
        for y in range(8):
            for x in range(9 - 1):
                sy, sx0, sx1 = (y * h) // 8, (x * w) // 9, ((x + 1) * w) // 9
                if px[sy, sx0] > px[sy, sx1]:
                    val |= 1 << (y * 8 + x)
        return f"{val:016x}"

    assert got[1] == got[2] == expect(base)
    assert got[3] == expect(other) and got[3] != got[1]


def test_gapfill_locf_semantics(spark):
    """Explicit gaps: carried-forward gauge, is_gap flag, and leading
    NULLs before a group's first observation."""
    from hbase_indexer_spark.plans.events import gapfill_locf

    d0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [("a", d0, 10.0), ("a", d0 + timedelta(days=3), 20.0),
            ("b", d0 + timedelta(days=1), 7.5)]
    events = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double")
    got = {(r["event_type"], r["day"] - 19723):
           (r["gauge_cents"], r["is_gap"])
           for r in gapfill_locf(events).collect()}
    assert got == {
        ("a", 0): (1000, 0), ("a", 1): (1000, 1), ("a", 2): (1000, 1),
        ("a", 3): (2000, 0),
        ("b", 0): (None, 1), ("b", 1): (750, 0), ("b", 2): (750, 1),
        ("b", 3): (750, 1),
    }


def test_k_anonymity_audit_flags_small_groups(spark):
    from hbase_indexer_spark.pipeline.curation import k_anonymity_audit

    rows = [("us", "x")] * 5 + [("us", "y")] * 2 + [("de", None)]
    df = spark.createDataFrame(rows, "country string, seg string")
    got = sorted(tuple(r) for r in
                 k_anonymity_audit(df, ["country", "seg"], k=5).collect())
    assert got == [("de", None, 1, 1_000_000), ("us", "y", 2, 500_000)]


def test_fd_check_holds_and_violations(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import fd_check

    rows = [(1, "a", 10), (2, "a", 10), (3, "b", 20), (4, "b", 21),
            (5, None, 30)]
    df = spark.createDataFrame(rows, "k long, g string, v long")
    got = {(r["det"], r["dep"]): (r["n_groups"], r["n_violating"],
                                  r["fd_holds"])
           for r in fd_check(df, [("k", "g"), ("g", "v"),
                                  ("v", "g")]).collect()}
    # k unique -> k->g holds; g 'b' maps to {20,21} and NULL g maps to
    # one value (a group of its own) -> g->v violated by 'b' only;
    # every v maps to one g -> v->g holds
    assert got == {("k", "g"): (5, 0, 1),
                   ("g", "v"): (3, 1, 0),
                   ("v", "g"): (4, 0, 1)}


def test_attribution_position_split(spark):
    """First/last/middle credit split with pinned tie-breaks and a
    conversion with zero touches in the window."""
    from hbase_indexer_spark.plans.events import attribution_position

    d0 = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # user 1: 4 clicks then purchase -> mids get 200000//2
        (101, d0 - timedelta(days=3), 1, "click"),
        (102, d0 - timedelta(days=2), 1, "click"),
        (103, d0 - timedelta(days=1), 1, "click"),
        (104, d0 - timedelta(hours=1), 1, "click"),
        (110, d0, 1, "purchase"),
        # user 2: one click 8 days before -> outside the 7-day window
        (201, d0 - timedelta(days=8), 2, "click"),
        (210, d0, 2, "purchase"),
        # user 3: two clicks at the SAME timestamp -> tie-break by id
        (301, d0 - timedelta(days=1), 3, "click"),
        (302, d0 - timedelta(days=1), 3, "click"),
        (310, d0, 3, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string")
    got = {r["purchase_id"]:
           (r["n_touches"], r["first_touch_id"], r["last_touch_id"],
            r["mid_credit_ppm"])
           for r in attribution_position(events).collect()}
    assert got == {110: (4, 101, 104, 100_000),
                   210: (0, None, None, 0),
                   310: (2, 301, 302, 0)}


def test_fd_check_rejects_empty_pairs(spark):
    from hbase_indexer_spark.pipeline.corpus_stats import fd_check

    with pytest.raises(ValueError, match="at least one"):
        fd_check(spark.range(1), [])


def test_revenue_trend_matches_duckdb_regr_slope(spark):
    """The integer sufficient-statistics slope equals DuckDB's float
    regr_slope to float precision — same estimator, exact arithmetic."""
    import duckdb

    from hbase_indexer_spark.plans.analytics import revenue_trend

    sf = "/root/testdata/sf0.001"
    got = {r["n_name"]: r["slope_micro"] / 1e6
           for r in revenue_trend(spark, sf).collect()}
    con = duckdb.connect()
    ref = dict(con.execute(f"""
        SELECT n_name, regr_slope(
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT),
                   (year(o_orderdate) - 1990) * 12
                       + month(o_orderdate) - 1)
        FROM '{sf}/orders.parquet'
        JOIN '{sf}/customer.parquet' ON o_custkey = c_custkey
        JOIN '{sf}/nation.parquet' ON c_nationkey = n_nationkey
        GROUP BY n_name
    """).fetchall())
    assert set(got) == set(ref)
    for k in got:
        assert got[k] == pytest.approx(ref[k], rel=1e-6, abs=1e-3)
