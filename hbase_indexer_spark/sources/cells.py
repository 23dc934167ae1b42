"""Cell-table sources and scan pushdown (reference §2.1 S4-S8).

The reference scans HBase with rowkey-range / time-range / family pushdown
(HBaseIndexingOptions.java:194-268).  Here the snapshot is any DataFrame in
the canonical cells schema; the helpers below express the same pushdowns as
ordinary filters so Catalyst pushes them into the parquet scan (min/max +
dictionary pruning — check ``PushedFilters`` in .explain()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CELL_SCHEMA = (
    "table string, row string, family string, qualifier string, "
    "ts bigint, op string, value binary"
)


def read_cells(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_range(cells: DataFrame, start_row: str | None = None,
               stop_row: str | None = None) -> DataFrame:
    """S5 — [start, stop) rowkey bounds (Scan.setStartRow/setStopRow,
    HBaseIndexingOptions.java:222-230)."""
    if start_row is not None:
        cells = cells.filter(F.col("row") >= start_row)
    if stop_row is not None:
        cells = cells.filter(F.col("row") < stop_row)
    return cells


def scan_time_range(cells: DataFrame, start_ts: int | str | None = None,
                    end_ts: int | str | None = None,
                    ts_format: str | None = None) -> DataFrame:
    """S6 — cell-timestamp range [start, end) (Scan.setTimeRange,
    HBaseIndexingOptions.java:232-252).

    Bounds may be epoch ints, or strings parsed per ``ts_format`` — the
    ``--hbase-start-time/--hbase-end-time/--hbase-timestamp-format``
    surface (HBaseIndexingOptions.java:320-360 evaluateTimestamp; with no
    format, a string bound must itself be an epoch long)."""
    from hbase_indexer_spark.functions.timeutil import evaluate_timestamp

    start_ts = evaluate_timestamp(start_ts, ts_format)
    end_ts = evaluate_timestamp(end_ts, ts_format)
    if start_ts is not None:
        cells = cells.filter(F.col("ts") >= start_ts)
    if end_ts is not None:
        cells = cells.filter(F.col("ts") < end_ts)
    return cells


def scan_tables(tables: dict[str, DataFrame], table_expr: str) -> DataFrame:
    """S8 — expand a literal or ``regex:`` table expression over a catalog of
    cell tables and union them, tagging rows with the source table
    (HBaseIndexingOptions.java:199-215; SCAN_ATTRIBUTES_TABLE_NAME tagging).
    """
    import re

    if table_expr.startswith("regex:"):
        pat = re.compile(table_expr[len("regex:"):])
        names = [n for n in sorted(tables) if pat.fullmatch(n)]
    else:
        names = [table_expr] if table_expr in tables else []
    if not names:
        raise ValueError(f"no tables match {table_expr!r}")
    dfs = [tables[n].withColumn("table", F.lit(n)) for n in names]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def group_events(cells: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """S3 — group a WAL batch's cells into one SepEvent per (table, row),
    preserving arrival order inside the event (SepConsumer.java:229-264:
    Multimap<rowKey, Cell> -> SepEvent(table, row, cells, payload)).

    ``extra_cols`` (e.g. seq/event_ts) ride along as max-aggregates.
    One partial-aggregable exchange.
    """
    aggs = [
        F.array_sort(
            F.collect_list(F.struct("ts", "family", "qualifier", "op", "value"))
        ).alias("cells")
    ]
    aggs += [F.max(c).alias(c) for c in extra_cols]
    return cells.groupBy("table", "row").agg(*aggs)


def extract_payload(cells: DataFrame, family: str, qualifier: str) -> DataFrame:
    """U5 — side-channel payload: pull the designated cell's bytes as a
    per-row ``payload`` column during capture (PayloadExtractor.java:1-37,
    BasePayloadExtractor.java:1-73; consumed SepConsumer.java:244-253).
    The payload cell is data, not a mapped field — exactly 'just another
    extracted column'."""
    target = F.when(
        (F.col("family") == family) & (F.col("qualifier") == qualifier),
        F.struct("ts", "value"),
    )
    return cells.groupBy("table", "row").agg(
        F.max(target)["value"].alias("payload")
    )
