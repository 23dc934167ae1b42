"""Bucket-co-located joins: the shuffle-free fact-fact join.

At 100 TB the single most expensive plan node is the fact-fact shuffle
(lineitem⋈orders moves BOTH tables across the wire every query).  Spark's
answer is **bucketing**: write each table hash-partitioned into N buckets
on the join key (`bucketBy(N, key).sortBy(key)`); the catalog records the
layout, and any equi-join between two tables bucketed the same way reads
bucket i against bucket i directly — the join runs with ZERO exchanges.
(Spark 3+ still re-sorts within buckets unless the legacy
`bucketedTableScan.outputOrdering` conf is set — a per-bucket, spill-free
sort; the exchange was the scale cost.)  The shuffle is paid ONCE at write time
and amortized over every subsequent join, which is exactly how a curated
100 TB fact table should be laid down.

This module is the catalog-table counterpart of
`sinks/bucket_store.py` (which buckets a keyed MERGE store by directory
convention): here the layout is declared to Spark's catalog so CATALYST
removes the exchange, instead of the store removing re-reads.

Contract notes:
- both sides must use the same bucket count and key, or Spark falls
  back to shuffling the mismatched side;
- `spark.sql.sources.bucketing.enabled` is on by default; AQE may still
  pick a broadcast join when one side is tiny (then neither side
  shuffles anyway) — the no-exchange SMJ property is pinned in
  tests/test_bucketed.py with the broadcast threshold disabled;
- bucketed writes go through `saveAsTable` (the catalog must know the
  layout); pass `path` to keep the data in caller-owned scratch.

Reference analog: none directly — the reference shards its OUTPUT index
by document hash (`HashSharder.java`); bucketing applies the same idea
to the engine's own join inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed_table", "bucketed_revenue_by_priority",
           "bucketed_revenue_by_priority_sql"]


def write_bucketed_table(df: DataFrame, name: str, key: str,
                         n_buckets: int = 8, path: str | None = None,
                         sort: bool = True) -> None:
    """Write ``df`` as a catalog parquet table bucketed (and by default
    sorted) by ``key`` — one shuffle now, none on every later join."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # pre-partition on the key so each bucket is ONE file (otherwise every
    # write task emits a file per bucket it touches: tasks x buckets files),
    # and single-file sorted buckets let the join elide its sorts too
    df = df.repartition(n_buckets, F.col(key))
    w = df.write.format("parquet").mode("overwrite")
    if path:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def bucketed_revenue_by_priority(spark: SparkSession, lineitem_table: str,
                                 orders_table: str) -> DataFrame:
    """Order-priority revenue rollup over two same-bucketed tables: the
    lineitem⋈orders equi-join reads bucket-aligned files with no
    exchange — the only shuffle left in the plan is the 5-row priority
    aggregation."""
    li = spark.table(lineitem_table)
    o = spark.table(orders_table)
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    disc_price = dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - dec(F.col("l_discount")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum(dec(F.col("l_quantity"))).cast("double")
                 .alias("sum_qty"),
                 F.sum(disc_price).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines"))
            .orderBy("o_orderpriority"))


def bucketed_revenue_by_priority_sql(lineitem: str = "lineitem",
                                     orders: str = "orders") -> str:
    """DuckDB mirror — the layout changes the PLAN, never the answer, so
    the oracle is the plain join over the raw tables."""
    return f"""
        SELECT o_orderpriority,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM {lineitem}
        JOIN {orders} ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """
