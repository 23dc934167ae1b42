"""Dtype-aware epoch helpers for the driver's events ``ts`` column.

The driver writes ``events.parquet`` with a parquet TIMESTAMP(NANOS)
column.  How that arrives depends on the reader:

- Spark 4 (this environment): ``spark.sql.legacy.parquet.nanosAsLong``
  was REMOVED, so the column reads as ``timestamp_ntz`` (nanos truncated
  to micros, wall-clock).
- Spark 3.x with the legacy conf: a raw nanos ``bigint``.
- DuckDB (the oracle): ``TIMESTAMP`` (micros, naive).

Every engine expression that needs an epoch number must therefore be
dtype-aware, and must agree with DuckDB's ``epoch_us(ts)`` /
``epoch_ms(ts)`` (which treat the naive timestamp as UTC).  These three
helpers are the single place that knows the rule; nothing else in the
repo may touch ``ts`` arithmetic directly.

All arithmetic stays integral (``div``, which truncates toward zero):
epoch-nanos exceeds a double's 53-bit mantissa, so float division is
never used.  Truncation — not floor — is deliberately the rule on both
sides of the epoch: DuckDB's ``epoch_ms`` itself truncates toward zero
(``epoch_ms(TIMESTAMP '1969-12-31 23:59:59.999999')`` = 0, not -1;
verified empirically in tests/test_timeutil.py), so ``div`` is the exact
mirror for pre-1970 timestamps too.

The session timezone must be UTC (hbase_indexer_spark.session.get_spark
pins it; __spark_entry__ re-pins it on driver-built sessions).  These
helpers VERIFY that instead of silently mutating session state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us_sql(df: DataFrame, col: str) -> str:
    """Epoch-microseconds SQL fragment for ``col``, by dtype."""
    dt = dict(df.dtypes).get(col, "")
    if dt.startswith("timestamp"):
        # NTZ -> TIMESTAMP cast interprets the wall-clock in the session
        # timezone; it must be UTC to match DuckDB's naive-as-UTC epoch_us.
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise RuntimeError(
                f"ts arithmetic requires spark.sql.session.timeZone=UTC "
                f"(got {tz!r}); use hbase_indexer_spark.session.get_spark "
                f"or pin the conf at session setup")
        return f"unix_micros(CAST({col} AS TIMESTAMP))"
    # legacy raw int64-nanos reader
    return f"CAST({col} AS BIGINT) div 1000"


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch microseconds (BIGINT) — mirrors DuckDB ``epoch_us(ts)``."""
    return F.expr(_us_sql(df, col))


def ts_millis(df: DataFrame, col: str = "ts") -> Column:
    """Epoch milliseconds (BIGINT, truncating like DuckDB ``epoch_ms(ts)``
    — see the module docstring for the pre-1970 behavior)."""
    return F.expr(f"({_us_sql(df, col)}) div 1000")


def ts_millis_sql(df: DataFrame, col: str = "ts") -> str:
    """Epoch-ms as a raw SQL fragment, for config-driven stages
    (morphline ``sql_expr``) that carry expressions as strings."""
    return f"({_us_sql(df, col)}) div 1000"


def ts_timestamp(df: DataFrame, col: str = "ts") -> Column:
    """The column as a session-tz TIMESTAMP (micros) — mirrors the oracle
    returning ``ts`` directly (the driver's canonicalizer strips tzinfo)."""
    return F.timestamp_micros(ts_micros(df, col))
