"""Incremental cross-snapshot dedup (dedup_against).

Pins: exact hits vs base, near-dup hits vs base, base never screens
itself, new-vs-new duplicates pass through (out of scope by contract),
hot-base-bucket guard drops candidates without breaking exact dedup.
"""

from hbase_indexer_spark.pipeline.dedup import dedup_against


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LONG_B = "one two three four five six seven eight nine ten"


def _out(spark, base, new, **kw):
    res = dedup_against(_df(spark, base), _df(spark, new), **kw).collect()
    return {r["doc_id"]: (r["exact_dup"], r["near_dup"], r["keep"])
            for r in res}


def test_exact_and_near_vs_base(spark):
    near = LONG_A.replace("kappa", "lambda")   # 1 token off: J ~ 7/9 shingles
    out = _out(spark,
               base=[(0, LONG_A), (2, LONG_B)],
               new=[(1, LONG_A), (3, near), (5, "totally different words")])
    assert out[1] == (True, True, False)
    assert out[3][1] and not out[3][0] and not out[3][2]
    assert out[5] == (False, False, True)


def test_new_vs_new_out_of_scope(spark):
    out = _out(spark, base=[(0, LONG_B)], new=[(1, LONG_A), (3, LONG_A)])
    # identical new docs both keep: this operator only screens vs base
    assert out[1] == (False, False, True)
    assert out[3] == (False, False, True)


def test_base_never_screened(spark):
    out = _out(spark, base=[(0, LONG_A), (2, LONG_A)], new=[(1, LONG_B)])
    assert set(out) == {1}


def test_hot_bucket_guard_keeps_exact_path(spark):
    # many identical base docs -> every band bucket is hot; with the guard
    # at 1 the near path loses them, the exact path still flags
    base = [(2 * i, LONG_A) for i in range(6)]
    out = _out(spark, base=base, new=[(1, LONG_A)], max_bucket_size=1)
    assert out[1][0] is True and out[1][2] is False
