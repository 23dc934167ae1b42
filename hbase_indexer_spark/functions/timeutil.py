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


# ---------------------------------------------------------------------------
# Scan time-range bound parsing (--hbase-timestamp-format)
# ---------------------------------------------------------------------------

# Java SimpleDateFormat pattern letters -> strptime, keyed by (letter, max
# run length handled).  The reference accepts any SimpleDateFormat pattern
# (HBaseIndexingOptions.java:533-537); we support the date/time subset a
# scan bound can meaningfully use and reject the rest exactly where
# SimpleDateFormat's constructor would (unknown pattern letter).
_SDF_MAP = {
    "y": {4: "%Y", 2: "%y"},
    "M": {3: "%b", 2: "%m", 1: "%m"},
    "d": {2: "%d", 1: "%d"},
    "H": {2: "%H", 1: "%H"},
    "h": {2: "%I", 1: "%I"},
    "m": {2: "%M", 1: "%M"},
    "s": {2: "%S", 1: "%S"},
    "S": {3: "%f", 2: "%f", 1: "%f"},
    "a": {1: "%p"},
    "E": {4: "%A", 3: "%a"},
    "Z": {1: "%z"},
    "X": {1: "%z"},
}


def _sdf_to_strptime(fmt: str) -> str:
    """Translate a SimpleDateFormat pattern to strptime, raising
    ValueError on pattern letters outside the supported subset (the
    analog of SimpleDateFormat's IllegalArgumentException)."""
    out, i = [], 0
    while i < len(fmt):
        c = fmt[i]
        if c == "'":  # quoted literal, '' = literal quote
            j = fmt.find("'", i + 1)
            if j == i + 1:
                out.append("'")
                i += 2
                continue
            if j < 0:
                raise ValueError(f"Invalid timestamp format: {fmt!r} "
                                 f"(unterminated quote)")
            out.append(fmt[i + 1:j].replace("%", "%%"))
            i = j + 1
            continue
        if c.isalpha():
            run = 1
            while i + run < len(fmt) and fmt[i + run] == c:
                run += 1
            table = _SDF_MAP.get(c)
            directive = None
            if table:
                for n in sorted(table, reverse=True):
                    if run >= n:
                        directive = table[n]
                        break
                if directive is None:
                    directive = table[min(table)]
            if directive is None:
                raise ValueError(
                    f"Invalid timestamp format: illegal pattern "
                    f"character {c!r} in {fmt!r}")
            out.append(directive)
            i += run
            continue
        out.append(c.replace("%", "%%"))
        i += 1
    return "".join(out)


def evaluate_timestamp(ts: str | int | None,
                       fmt: str | None = None) -> int | None:
    """Scan time-range bound -> epoch millis, mirroring the reference's
    ``HBaseIndexingOptions.evaluateTimestamp`` (HBaseIndexingOptions.java:
    522-545; cases pinned against HBaseIndexingOptionsTest.java:633-666):

    - ``None`` -> ``None`` (no bound)
    - no format -> the string must BE an epoch long, else ValueError
    - format given -> parse with the SimpleDateFormat-style pattern and
      return epoch millis, ValueError on a bad format or unparseable
      value (the IllegalStateException analog)

    One deliberate divergence: SimpleDateFormat parses zoneless strings
    in the JVM's default timezone; we pin UTC so a scan bound means the
    same instant on every driver (the repo-wide determinism rule)."""
    import datetime as _dt

    if ts is None:
        return None
    if isinstance(ts, int):
        return ts
    if fmt is None:
        try:
            return int(ts)
        except ValueError:
            raise ValueError(f"Invalid timestamp value: {ts}") from None
    pat = _sdf_to_strptime(fmt)
    try:
        parsed = _dt.datetime.strptime(ts, pat)
    except ValueError as e:
        raise ValueError(f"Can't parse timestamp string {ts!r}: {e}") from None
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=_dt.timezone.utc)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    # exact integral millis (float .timestamp()*1000 can round at µs)
    return (parsed - epoch) // _dt.timedelta(milliseconds=1)
