"""Z-order layout: key arithmetic, oracle parity of the bucket-stats
audit, and the actual data-skipping property of the written files."""

import glob

import pyarrow.parquet as pq
import pytest

from hbase_indexer_spark.pipeline.layout import (
    zorder_bucket_stats,
    zorder_bucket_stats_sql,
    zorder_key,
    zorder_write,
)


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_pure_python_morton(spark):
    """Full-domain corners + interior points: the Catalyst expression is
    the textbook Morton interleave of the min-max-scaled coordinates."""
    rows = [(0, 0), (0, 1000), (70, 0), (70, 1000), (35, 500), (1, 999)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["zkey"]
           for r in zorder_key(df, ["x", "y"]).collect()}
    mask = (1 << 16) - 1
    for x, y in rows:
        sx = (x - 0) * mask // 70
        sy = (y - 0) * mask // 1000
        assert got[(x, y)] == _morton2(sx, sy), (x, y)


def test_zorder_key_guards(spark):
    df = spark.createDataFrame([(1, 2, 3)], "x long, y long, z long")
    with pytest.raises(ValueError):
        zorder_key(df, ["x"])  # 1-D: just sort
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y", "z"], bits=21)  # 63 bits: sign overflow


def test_zorder_key_constant_column_is_safe(spark):
    """span=0 -> greatest(span,1) keeps the scale defined; the constant
    column contributes zero bits and the key degrades to the other dim."""
    df = spark.createDataFrame([(5, 0), (5, 3)], "x long, y long")
    got = sorted(r["zkey"] for r in zorder_key(df, ["x", "y"]).collect())
    assert got[0] == 0 and got[1] > 0


def test_bucket_stats_match_duckdb_oracle(spark, sf_dir):
    duckdb = pytest.importorskip("duckdb")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = sorted(
        tuple(r) for r in
        zorder_bucket_stats(li, "l_partkey", "l_suppkey").collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS "
                f"SELECT * FROM '{sf_dir}/lineitem.parquet'")
    want = sorted(
        tuple(r) for r in
        con.execute(
            zorder_bucket_stats_sql("l_partkey", "l_suppkey", "lineitem")
        ).fetchall())
    assert got == want


def test_zorder_files_skip_on_both_dims(spark, sf_dir, tmp_path):
    """The point of the layout: per-file parquet min/max stats bound BOTH
    interleaved columns, where a single-column sort leaves the second
    column's per-file range at ~the full domain."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
              .select("l_partkey", "l_suppkey")
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(li, zdir, ["l_partkey", "l_suppkey"], n_files=8)
    (li.repartitionByRange(8, "l_partkey")
       .sortWithinPartitions("l_partkey")
       .write.mode("overwrite").parquet(ldir))

    def mean_range_frac(path: str, col: str) -> float:
        lo = min(r[0] for r in _file_ranges(path, col))
        hi = max(r[1] for r in _file_ranges(path, col))
        dom = hi - lo + 1
        fr = [(mx - mn + 1) / dom for mn, mx in _file_ranges(path, col)]
        return sum(fr) / len(fr)

    def _file_ranges(path: str, col: str):
        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            mn = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            mx = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            out.append((mn, mx))
        return out

    # both dims bounded under z-order; suppkey unbounded under linear
    z_pk, z_sk = (mean_range_frac(zdir, "l_partkey"),
                  mean_range_frac(zdir, "l_suppkey"))
    l_sk = mean_range_frac(ldir, "l_suppkey")
    assert z_pk <= 0.7, z_pk
    assert z_sk <= 0.7, z_sk
    assert l_sk >= 0.9, l_sk
    # and a conjunctive predicate's expected scan volume (range-product
    # proxy) is far smaller under z-order
    assert z_pk * z_sk < 0.5 * l_sk


def test_bucket_stats_high_bits_match_duckdb(spark):
    """bits=30 pushes zkey past 2^53: bucket assignment must stay integer
    `div` (a double division would round and mis-bucket vs the oracle)."""
    duckdb = pytest.importorskip("duckdb")
    rows = [(i * 37 % 1000, i * 91 % 777) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(tuple(r) for r in
                 zorder_bucket_stats(df, "a", "b", bits=30,
                                     n_buckets=32).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        zorder_bucket_stats_sql("a", "b", "t", bits=30,
                                n_buckets=32)).fetchall())
    assert got == want


def test_zorder_key_randomized_against_model(spark):
    """200 seeded-random (x, y) pairs in one frame: the Catalyst key
    equals the pure-Python Morton interleave of the min-max scaling."""
    import random
    rng = random.Random(406)
    rows = [(rng.randint(-500, 10_000), rng.randint(0, 3_000))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["zkey"]
           for r in zorder_key(df, ["x", "y"]).collect()}
    lox, hix = min(r[0] for r in rows), max(r[0] for r in rows)
    loy, hiy = min(r[1] for r in rows), max(r[1] for r in rows)
    mask = (1 << 16) - 1
    for x, y in rows:
        sx = (x - lox) * mask // max(hix - lox, 1)
        sy = (y - loy) * mask // max(hiy - loy, 1)
        assert got[(x, y)] == _morton2(sx, sy), (x, y)
