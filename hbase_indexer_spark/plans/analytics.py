"""Analytics over scanned snapshots — the batch-scan surface (S4-S7) driven
through plain declarative DataFrame plans.

The reference's batch path is scan -> extract -> materialize; beyond that it
has no SQL engine.  This module is where our engine exposes the *general*
Spark analytics capability over the same scans, and doubles as the headline
bench suite (filters/aggregations/joins with pushdown + broadcast).

Cross-engine determinism rule (for DuckDB-oracle hash parity): aggregate in
DECIMAL (exact, order-insensitive), cast to DOUBLE only at the end; derived
ratios are double arithmetic on already-exact inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, prec=18, scale=2):
    return col.cast(f"decimal({prec},{scale})")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: single scan, pushed filter, one
    partial+final agg; fully codegen'd, no shuffle besides the final agg."""
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02 00:00:00").cast("timestamp")
    disc_price = _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"), 18, 2))
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: pure scan-filter-agg; every predicate reaches the
    parquet reader (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return li.filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: dim filter -> broadcast-joined fact agg -> top-k.
    customer is tiny vs lineitem: broadcast both dims, single fact shuffle
    for the final group-by."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: multi-way star join; all dims broadcast, fact
    shuffles once for the final aggregation."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface (§2.7 extension): top-3 customers by account
    balance per nation — rank over a partitioned window; the window
    partition key reuses the aggregation shuffle (one exchange)."""
    from pyspark.sql.window import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            "c_nationkey", "c_custkey",
            _dec(F.col("c_acctbal")).cast("double").alias("acctbal"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("c_nationkey", "rnk")
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (§2.6 extension): order-count + revenue rolled
    up over (priority, status) — ROLLUP is one expand + one aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("revenue"),
        )
        .orderBy(F.asc_nulls_first("o_orderpriority"),
                 F.asc_nulls_first("o_orderstatus"))
    )


def promo_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: part dim broadcast against the lineitem fact; one
    conditional aggregate, no fact-side pre-shuffle."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    rev = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.groupBy("p_brand").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.sum(F.when(F.col("p_type").startswith("PROMO"), rev)
              .otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double").alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    ).orderBy("p_brand")


def supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier dim rollup joined to nation (broadcast): per-nation supplier
    count + balance aggregate."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"),
             F.sum(_dec(F.col("s_acctbal"))).cast("double").alias("total_bal"))
        .orderBy("n_name")
    )


ORACLES = {
    "promo_part_revenue": """
        SELECT p_brand,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "supplier_nation_balance": """
        SELECT n_name, count(*) AS n_suppliers,
               CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "top_customers_per_nation": """
        SELECT c_nationkey, c_custkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal, rnk
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rnk
            FROM customer
        ) WHERE rnk <= 3
        ORDER BY c_nationkey, rnk
    """,
    "revenue_rollup": """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "revenue_forecast": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "top_unshipped_orders": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "regional_revenue": """
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
}
