"""Driver-table -> canonical-cells fixtures (FIXTURES.md §§1-4).

The driver supplies TPC-H-ish parquet tables; these builders derive
HBase-shaped ``cells`` DataFrames from them with *deterministic, SQL-mirrorable*
transformations, so every engine query has a DuckDB oracle phrased over the
raw tables.  The encode step uses the engine's Bytes.toBytes-equivalent
encoders, so an end-to-end query validates encode -> extract -> decode
round-trips.

Fixture mapping (FIXTURES.md):
- user    (ROW mapping, typed fields)  <- customer   (user_indexer.xml analog)
- message (COLUMN mapping, hex/escape) <- orders     (message_indexer.xml analog)
- typed   (full decode matrix)         <- lineitem   (IndexerIT.java:678-721 analog)
- events  (streaming mutations)        <- events     (SepEvent.java:30-50 analog)

Compile cost (r10 #3): each fixture's column expressions — the encode
trees especially — cost ~0.9-2k py4j round trips to build (~0.3s of
single-threaded driver time per call; measured), and every bench/gate run
builds them 2+ times per query.  The expression lists are static per
fixture (unresolved plan fragments, no data), so they are memoized per
SparkContext via functions/colmemo.py, same as the extraction compile.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_indexer_spark.functions import bytes_codec as bc
from hbase_indexer_spark.functions.colmemo import memo

CELL_COLS = ["table", "row", "family", "qualifier", "ts", "op", "value"]


def _path_sig(path: str) -> tuple | None:
    """(mtime_ns, size) of the fixture file/dir — part of the split-probe
    cache key so an in-process rewrite of the same path invalidates it
    (ADVICE r9: the old process-global cache also survived SparkSession
    restarts with different split conf; colmemo scoping fixes that too —
    entries die with the SparkContext)."""
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table, respread to full parallelism when the file
    arrives as fewer splits than cores.

    A real HBase batch scan (S4) yields one split per region, so the engine
    downstream always sees many partitions; the driver's single-file parquet
    (often one row group -> ONE split) would otherwise serialize the whole
    encode/extract stage on one core.  The repartition is the local analog
    of region splits, not something a production deployment would add.

    The ``df.rdd.getNumPartitions()`` probe costs 50-100ms of driver time (a
    full DataFrame->RDD conversion) and depends only on the file set +
    session split config — cached per (SparkContext, path, file signature):
    input METADATA only, no data or results.
    """
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    par = spark.sparkContext.defaultParallelism
    n = memo(("nparts", path, _path_sig(path)),
             lambda: df.rdd.getNumPartitions())
    if n < par:
        df = df.repartition(par)
    return df


def _explode_cells_cols(table: str, row: Column, ts: Column,
                        cells: list[tuple[str, str, Column]]) -> tuple:
    """The two static projection lists of :func:`_explode_cells` — split out
    so fixture builders can memoize them (all arguments are compile-time
    constants per fixture)."""
    entries = F.array(*[
        F.struct(F.lit(fam).alias("family"), F.lit(q).alias("qualifier"),
                 v.alias("value"))
        for fam, q, v in cells
    ])
    first = [row.alias("row"), ts.alias("ts"), F.explode(entries).alias("c")]
    second = [
        F.lit(table).alias("table"),
        F.col("row"),
        F.col("c.family").alias("family"),
        F.col("c.qualifier").alias("qualifier"),
        F.col("ts").cast("long").alias("ts"),
        F.lit("put").alias("op"),
        F.col("c.value").alias("value"),
    ]
    return first, second


def _explode_cells(df: DataFrame, table: str, row: Column, ts: Column,
                   cells: list[tuple[str, str, Column]]) -> DataFrame:
    """Turn one source row into N put-cells: [(family, qualifier, value_bin)]."""
    first, second = _explode_cells_cols(table, row, ts, cells)
    return df.select(*first).select(*second)


def user_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`indexdemo-user` fixture from customer: family `info`, typed cells."""
    c = load(spark, sf_dir, "customer")
    first, second = memo(("fixture_user_cells",), lambda: _explode_cells_cols(
        table="indexdemo-user",
        row=F.col("c_custkey").cast("string"),
        ts=F.lit(1000),
        cells=[
            ("info", "firstname", bc.encode_string(F.col("c_name"))),
            ("info", "lastname", bc.encode_string(F.col("c_mktsegment"))),
            ("info", "age", bc.encode_int(F.col("c_custkey") % 100)),
            ("info", "email", bc.encode_string(F.concat(F.col("c_name"), F.lit("@example.com")))),
            ("info", "acctbal", bc.encode_double(F.col("c_acctbal"))),
            ("info", "nation", bc.encode_int(F.col("c_nationkey"))),
        ],
    ))
    return c.select(*first).select(*second)


def message_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`indexdemo-message` fixture from orders: one cell per message under a
    wildcard family; qualifiers contain hyphens to pin `\\-` escaping."""
    o = load(spark, sf_dir, "orders")
    cols = memo(("fixture_message_cells",), lambda: [
        F.lit("indexdemo-message").alias("table"),
        F.col("o_custkey").cast("string").alias("row"),
        F.lit("content").alias("family"),
        F.concat(F.lit("ord-"), F.col("o_orderkey").cast("string")).alias("qualifier"),
        F.col("o_orderkey").cast("long").alias("ts"),
        F.lit("put").alias("op"),
        bc.encode_string(F.col("o_orderpriority")).alias("value"),
    ])
    return o.select(*cols)


def typed_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode-matrix fixture from lineitem (one qualifier per type),
    including a deliberately wrong-length value (f_badint) to pin the
    drop-on-decode-error contract (ByteArrayValueMappers.java:154-164)."""
    li = load(spark, sf_dir, "lineitem")

    def build() -> tuple:
        # (orderkey, linenumber) alone is NOT unique in the driver data; the
        # 5-part key incl. price-cents is unique at every sf (verified 0.001-0.1)
        row_key = F.concat_ws(
            ":",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
        )
        return _explode_cells_cols(
            table="table1",
            row=row_key,
            ts=F.lit(1000),
            cells=[
                ("family1", "f_long", bc.encode_long(F.col("l_quantity").cast("long"))),
                ("family1", "f_int", bc.encode_int(F.col("l_partkey").cast("int"))),
                ("family1", "f_short", bc.encode_short(F.col("l_linenumber").cast("short"))),
                ("family1", "f_double", bc.encode_double(F.col("l_extendedprice"))),
                ("family1", "f_float", bc.encode_float(F.col("l_discount"))),
                ("family1", "f_boolean", bc.encode_boolean(F.col("l_discount") > 0.04)),
                ("family1", "f_string", bc.encode_string(F.col("l_returnflag"))),
                ("family1", "f_badint", bc.encode_short(F.col("l_linenumber").cast("short"))),
            ],
        )

    first, second = memo(("fixture_typed_cells",), build)
    return li.select(*first).select(*second)


# Event-stream fixture: the driver's `events` table plays the SEP stream.
# CDC mapping: each event mutates the per-user row of table 'events';
# 'error' events are row deletes, everything else puts a per-event-type cell.
EVENT_TABLE = "events"
DELETE_EVENT_TYPE = "error"
PUT_EVENT_TYPES = ("click", "purchase", "signup", "view")


def event_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SepEvent-shaped mutation stream (SepEvent.java:30-50): columns
    (seq, event_ts) + canonical cell columns.  Cell ts = seq (= event_id,
    unique & monotone with arrival order) so last-event-wins (A1) and
    tombstone ordering are deterministic and SQL-mirrorable."""
    from hbase_indexer_spark.functions.timeutil import ts_millis

    e = load(spark, sf_dir, "events")
    # WAL write time in ms, dtype-aware (Spark 4 reads the parquet
    # TIMESTAMP(NANOS) as timestamp_ntz; see functions/timeutil.py) — the
    # dtype is part of the memo key because ts_millis compiles by dtype
    ts_dtype = dict(e.dtypes).get("ts", "")
    cols = memo(("fixture_event_cells", ts_dtype), lambda: [
        F.col("event_id").alias("seq"),
        ts_millis(e).alias("event_ts"),
        F.lit(EVENT_TABLE).alias("table"),
        F.col("user_id").cast("string").alias("row"),
        F.lit("info").alias("family"),
        F.col("event_type").alias("qualifier"),
        F.col("event_id").alias("ts"),
        F.when(F.col("event_type") == DELETE_EVENT_TYPE, "delete_row")
        .otherwise("put")
        .alias("op"),
        F.when(F.col("event_type") == DELETE_EVENT_TYPE, F.lit(None).cast("binary"))
        .otherwise(bc.encode_double(F.col("value")))
        .alias("value"),
    ])
    return e.select(*cols)
