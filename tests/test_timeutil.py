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


# ---------------------------------------------------------------------------
# evaluateTimestamp parity (HBaseIndexingOptionsTest.java:633-666)
# ---------------------------------------------------------------------------

def test_evaluate_timestamp_no_format_is_epoch_long():
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp
    assert evaluate_timestamp("12345", None) == 12345


def test_evaluate_timestamp_no_format_non_parseable_long_raises():
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp
    with pytest.raises(ValueError, match="Invalid timestamp value"):
        evaluate_timestamp("abc", None)


def test_evaluate_timestamp_custom_format():
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp
    # joda parseMillis("2013/10/20 00:39:00") in the reference test,
    # pinned UTC here (documented divergence: JVM-default tz -> UTC)
    assert evaluate_timestamp("2013/10/20 00:39:00",
                              "yyyy/MM/dd HH:mm:ss") == 1382229540000


def test_evaluate_timestamp_invalid_format_raises():
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp
    with pytest.raises(ValueError, match="Invalid timestamp format"):
        evaluate_timestamp("2013/10/20 00:39", "not a timestamp format")


def test_evaluate_timestamp_value_not_matching_format_raises():
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp
    with pytest.raises(ValueError, match="Can't parse timestamp string"):
        evaluate_timestamp("invalid timestamp data", "yyyy/MM/dd HH:mm")


def test_evaluate_timestamp_null_is_null():
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp
    assert evaluate_timestamp(None, None) is None
    assert evaluate_timestamp(None, "yyyy/MM/dd") is None


def test_evaluate_timestamp_millis_and_quoted_literals():
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp
    assert evaluate_timestamp("2013-10-20T00:39:00.123",
                              "yyyy-MM-dd'T'HH:mm:ss.SSS") == 1382229540123


def test_scan_time_range_fmt(spark):
    """S6 with --hbase-timestamp-format: string bounds parse through the
    SimpleDateFormat pattern; [start, end) on epoch-ms cell ts."""
    from hbase_indexer_spark.sources.cells import scan_time_range

    cells = spark.createDataFrame(
        [("t", "r1", "f", "q", 1382229540000, "put", None),
         ("t", "r2", "f", "q", 1382229600000, "put", None),
         ("t", "r3", "f", "q", 1382229660000, "put", None)],
        "table string, row string, family string, qualifier string, "
        "ts long, op string, value binary")
    out = scan_time_range(cells, "2013/10/20 00:39:00",
                          "2013/10/20 00:41:00",
                          ts_format="yyyy/MM/dd HH:mm:ss")
    assert sorted(r["row"] for r in out.collect()) == ["r1", "r2"]
    # int bounds still work unchanged
    assert scan_time_range(cells, 1382229600000, None).count() == 2
