"""timeutil must mirror DuckDB's epoch_us/epoch_ms exactly — including
pre-1970 timestamps, where BOTH engines truncate toward zero (DuckDB's
epoch_ms is not a floor: epoch_ms('1969-12-31 23:59:59.999999') = 0)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.functions.timeutil import ts_micros, ts_millis

TS_LITERALS = [
    "1969-12-31 23:59:59.999999",   # -1 us: floor vs truncate diverge
    "1969-12-31 23:59:59.000001",
    "1969-07-20 20:17:40.123456",
    "1970-01-01 00:00:00",
    "1970-01-01 00:00:00.000001",
    "2024-05-04 01:02:03.456789",
]


@pytest.fixture(scope="module")
def ts_df(spark):
    rows = " UNION ALL ".join(
        f"SELECT TIMESTAMP_NTZ'{t}' AS ts" for t in TS_LITERALS)
    return spark.sql(rows)


def _duck(expr_fmt):
    con = duckdb.connect()
    out = []
    for t in TS_LITERALS:
        lit = "TIMESTAMP '" + t + "'"
        out.append(con.execute("SELECT " + expr_fmt.format(lit=lit)).fetchone()[0])
    return out


def test_ts_micros_matches_duckdb_epoch_us(ts_df):
    got = [r[0] for r in ts_df.select(ts_micros(ts_df, "ts")).collect()]
    assert got == _duck("epoch_us({lit})")


def test_ts_millis_matches_duckdb_epoch_ms_including_pre_1970(ts_df):
    got = [r[0] for r in ts_df.select(ts_millis(ts_df, "ts")).collect()]
    want = _duck("epoch_ms({lit})")
    assert got == want
    # the discriminating case: DuckDB truncates -1 us to 0 ms (no floor),
    # and Spark's `div` does the same — agreement, not floor, is the spec
    assert want[0] == 0


def test_non_utc_session_raises(ts_df, spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(RuntimeError, match="timeZone"):
            ts_micros(ts_df, "ts")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
