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


def order_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets surface (§2.6 extension): all four grouping
    combinations of (order year, priority) in ONE expand + aggregation —
    no re-scan per grouping set."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .cube("o_year", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("revenue"))
        .orderBy(F.asc_nulls_first("o_year"),
                 F.asc_nulls_first("o_orderpriority"))
    )


def priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS surface (§2.6 extension, the arbitrary-sets sibling
    of CUBE/ROLLUP): exactly {(priority, year), (priority), ()} — note the
    (year) marginal is deliberately absent, which no cube/rollup can
    express — in ONE expand + aggregation; ``grouping_id()`` (``gid``)
    distinguishes a genuinely-NULL key from an aggregated-out column."""
    orders = _t(spark, sf_dir, "orders")
    o = orders.withColumn("o_year", F.year("o_orderdate"))
    return (
        o.groupingSets(
            [["o_orderpriority", "o_year"], ["o_orderpriority"], []],
            "o_orderpriority", "o_year")
        .agg(F.grouping_id().alias("gid"),
             F.count(F.lit(1)).alias("n_orders"),
             F.sum(_dec(F.col("o_totalprice"))).cast("double")
             .alias("revenue"))
        .select("gid", "o_orderpriority", "o_year", "n_orders", "revenue")
        .orderBy("gid", F.asc_nulls_first("o_orderpriority"),
                 F.asc_nulls_first("o_year"))
    )


def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: per-year order counts spread across status columns —
    pivot with an explicit value list compiles to ONE conditional
    aggregation (no extra shuffle vs a plain groupBy)."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_year",
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c.lower()}")
          for c in ("F", "O", "P")],
    ).orderBy("o_year")


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


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: EXISTS → LEFT SEMI join (fact side deduped by the
    semi join itself, no distinct needed), then a tiny agg over orders."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-07-01 00:00:00").cast("timestamp")
    late = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: LEFT OUTER join so zero-order customers survive,
    two-level aggregation (per-customer count, then histogram).  The outer
    join shuffles on custkey; the second agg is tiny (distinct counts)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: HAVING-subquery = aggregate once on the fact, filter
    the aggregate, then join dims onto the (small) surviving key set —
    the fact is scanned once, never re-shuffled for the IN."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("total_qty_d"))
        .filter(F.col("total_qty_d") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            _dec(F.col("o_totalprice")).cast("double").alias("totalprice"),
            F.col("total_qty_d").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


def idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: scalar subquery (avg balance of funded customers,
    broadcast as a 1-row cross join) + LEFT ANTI join (customers with no
    recent orders).  Both the scalar and the anti-side key set stay tiny."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg(_dec(F.col("c_acctbal"), 18, 6)).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(_dec(F.col("c_acctbal"), 18, 6) > F.col("avg_bal"))
        .join(recent.select("o_custkey"), cust.c_custkey == recent.o_custkey,
              "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def priority_shipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: fact→dim join + conditional two-way counts per
    group (high- vs low-priority orders per return flag)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hi_pri = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi_pri, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi_pri, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped (partsupp⇒lineitem adaptation): distinct-count of
    suppliers per (brand, size-class) — COUNT(DISTINCT) expands to a
    two-phase agg; part dim broadcasts onto the fact."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9, 13))
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped decorrelated MIN: per part, the supplier(s) whose
    line price equals the part-wise minimum.  The correlated scalar
    subquery decorrelates into a partial-aggregable groupBy + an equi-join
    back on (partkey, price); part and supplier dims broadcast."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    sup = _t(spark, sf_dir, "supplier")
    pmin = (
        li.groupBy(F.col("l_partkey").alias("mp_partkey"))
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    return (
        li.join(pmin, (li.l_partkey == pmin.mp_partkey)
                & (li.l_extendedprice == pmin.min_price))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_name", "s_acctbal", "min_price")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy("p_partkey", "s_name")
    )


def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: OR-of-conjunctions over a broadcast part join.
    The partkey equi-join stays a single broadcast hash join; the
    disjunctive residual is evaluated post-join, and the per-side
    conjuncts (brand/size, quantity) still push into the scans."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    revenue = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(F.sum(revenue).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: quarterly revenue per supplier, then the
    supplier(s) hitting the global max — the scalar subquery becomes a
    broadcast of a 1-row aggregate onto the revenue view (computed once,
    reused for both sides).  Revenue stays DECIMAL until the final
    projection so the max-equality is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp")
    revenue_expr = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.sum(revenue_expr).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name",
                F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: shipping volume between two nations by year, with
    the nation dim joined twice under different roles (supplier side vs
    customer side).  Both role dims broadcast; the only fact-fact shuffle
    is lineitem⋈orders on orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1, n2 = "NATION_1", "NATION_2"
    sup_n = sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey) \
               .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey) \
                 .select("c_custkey", F.col("n_name").alias("cust_nation"))
    vol = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup_n), li.l_suppkey == sup_n.s_suppkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .filter(((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
                | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1)))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(vol).cast("double").alias("volume"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: one nation's share of PROMO-part revenue delivered
    into an ASIA-customer market, by order year.  share = conditional sum /
    total sum — both aggregated exactly in DECIMAL, divided once in double.
    All dims broadcast; lineitem⋈orders is the single big shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_in_region = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    sup_n = sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey) \
               .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_region), orders.o_custkey == cust_in_region.c_custkey, "left_semi")
        .join(F.broadcast(sup_n), li.l_suppkey == sup_n.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero))
            .cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))
        .orderBy("o_year")
    )


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped (adapted: no partsupp table, so profit is the
    discounted price): per supplier-nation per ship year, over parts whose
    name contains 'widget'.  part/supplier/nation all broadcast; the fact
    is scanned once and shuffles only for the final group-by."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    sup_n = sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey) \
               .select("s_suppkey", "n_name")
    profit = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup_n), li.l_suppkey == sup_n.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("nation", F.desc("o_year"))
    )


def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: revenue lost to returned items per customer for one
    quarter, top 20.  Orders date-filtered before the fact join; customer
    and nation broadcast onto the aggregated result."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    lo = F.lit("1997-07-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-10-01 00:00:00").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(rev).alias("revenue_d"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name",
                _dec(F.col("c_acctbal")).cast("double").alias("acctbal"),
                F.col("revenue_d").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: per-part shipped value, keeping parts above 1.5×
    the average part value — the HAVING scalar subquery becomes a 1-row
    aggregate broadcast cross-joined onto the per-part aggregate (fact
    scanned once, re-aggregated from the grouped result, never re-scanned).
    The avg-based cut (not a fixed fraction of the total) keeps the
    selectivity stable as the part count scales with the data."""
    li = _t(spark, sf_dir, "lineitem")
    val = _dec(F.col("l_extendedprice")) * _dec(F.col("l_quantity"))
    per_part = li.groupBy("l_partkey").agg(F.sum(val).alias("part_value_d"))
    total = per_part.agg(F.sum("part_value_d").alias("total_value_d"),
                         F.count(F.lit(1)).alias("n_parts"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value_d").cast("double") * F.col("n_parts")
                > F.col("total_value_d").cast("double") * 1.5)
        .select("l_partkey", F.col("part_value_d").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: revenue from lines whose quantity is below half the
    part's average quantity.  The correlated AVG decorrelates into a
    per-part (count, sum) aggregate joined back on partkey; the comparison
    `2*qty*cnt < total` is kept in exact DECIMAL/BIGINT arithmetic so both
    engines agree bit-for-bit.  Brand filter broadcasts onto the fact."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec(F.col("l_quantity"))).alias("total_qty"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.ap_partkey)
        .filter(_dec(F.col("l_quantity")) * 2 * F.col("cnt") < F.col("total_qty"))
        .agg((F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
             .alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_lines"))
    )


def excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: suppliers in ASIA nations who shipped more than 50
    units of any bolt-named part during 1997 — nested IN-subqueries become
    a chain of aggregates and LEFT SEMI joins; the supplier table is only
    touched by the final (tiny) key set."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    heavy = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey").distinct()
    )
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped (adapted: late = shipped >60 days after the order
    date, since the testdata has no receipt/commit dates): suppliers who
    were the SOLE late supplier on a finished multi-supplier order.  The
    classic EXISTS / NOT-EXISTS self-join pair collapses into one per-order
    aggregate — distinct suppliers, distinct late suppliers, and the single
    late supplier via a conditional max — one fact shuffle on orderkey
    instead of three self-joins."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("late_supp") == sup.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


_VOL_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2)) * "
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))")

ORACLES = {
    "nation_trade_volume": f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum({_VOL_SQL}) AS DOUBLE) AS volume,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "market_share": f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CASE WHEN n_name = 'NATION_2' THEN {_VOL_SQL}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
               CAST(sum({_VOL_SQL}) AS DOUBLE) AS total_volume,
               CAST(sum(CASE WHEN n_name = 'NATION_2' THEN {_VOL_SQL}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({_VOL_SQL}) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'PROMO'
          AND o_custkey IN (
              SELECT c_custkey FROM customer
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region ON cn.n_regionkey = r_regionkey
              WHERE r_name = 'ASIA')
        GROUP BY 1 ORDER BY 1
    """,
    "product_type_profit": f"""
        SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
               CAST(sum({_VOL_SQL}) AS DOUBLE) AS profit, count(*) AS n_lines
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "returned_item_losses": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
               CAST(sum({_VOL_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "important_part_value": """
        WITH pv AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS part_value_d
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(part_value_d AS DOUBLE) AS part_value
        FROM pv
        WHERE CAST(part_value_d AS DOUBLE) * (SELECT count(*) FROM pv) >
              (SELECT CAST(sum(part_value_d) AS DOUBLE) FROM pv) * 1.5
        ORDER BY part_value DESC, l_partkey
    """,
    "small_quantity_revenue": """
        WITH pp AS (
            SELECT l_partkey AS ap_partkey, count(*) AS cnt,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN pp ON l_partkey = ap_partkey
        WHERE p_brand = 'Brand#13'
          AND CAST(l_quantity AS DECIMAL(18,2)) * 2 * cnt < total_qty
    """,
    "excess_inventory_suppliers": """
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 2
          AND s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE '%bolt%')
                AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY l_suppkey, l_partkey
              HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 50)
        ORDER BY s_suppkey
    """,
    "waiting_suppliers": """
        WITH per_order AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                       THEN l_suppkey END) AS n_late,
                   max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN l_suppkey END) AS late_supp
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait
        FROM per_order JOIN supplier ON late_supp = s_suppkey
        WHERE n_supp >= 2 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 20
    """,
    "top_revenue_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "min_cost_supplier": """
        WITH pmin AS (
            SELECT l_partkey, min(l_extendedprice) AS min_price
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p_partkey, p_name, s_name, s_acctbal, min_price,
               count(*) AS n_lines
        FROM lineitem l
        JOIN pmin ON l.l_partkey = pmin.l_partkey
                 AND l.l_extendedprice = pmin.min_price
        JOIN part ON l.l_partkey = p_partkey
        JOIN supplier ON l.l_suppkey = s_suppkey
        WHERE p_size = 15
        GROUP BY p_partkey, p_name, s_name, s_acctbal, min_price
        ORDER BY p_partkey, s_name
    """,
    "disjunctive_promo_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "order_priority_check": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "customer_order_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
            GROUP BY c_custkey
        ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
               CAST(total_qty_d AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty_d
              FROM lineitem GROUP BY l_orderkey HAVING total_qty_d > 150) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
    "idle_high_balance_customers": """
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(18,6)) >
              (SELECT avg(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer
               WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "priority_shipping_stats": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "part_supplier_variety": """
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (1, 5, 9, 13)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
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
    "order_priority_cube": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY CUBE (year(o_orderdate), o_orderpriority)
        ORDER BY o_year NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "priority_grouping_sets": """
        SELECT GROUPING(o_orderpriority, year(o_orderdate)) AS gid,
               o_orderpriority,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, year(o_orderdate)),
                                (o_orderpriority), ())
        ORDER BY gid, o_orderpriority NULLS FIRST, o_year NULLS FIRST
    """,
    "order_status_pivot": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        FROM orders GROUP BY 1 ORDER BY o_year
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


def revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend: ordinary-least-squares slope of order
    value (cents) over the order's month index, computed from EXACT
    integer sufficient statistics — n, Σx, Σy, Σxy, Σx² fold as BIGINTs
    in one combinable pass, then slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    assembles on aggregate-sized data in DECIMAL(38,0) (the products
    overflow int64 beyond ~sf1).  The slope ships as micro-cents/month
    with truncate-toward-zero sign handling so Spark ``div`` and DuckDB
    ``//`` agree (both sides divide non-negative magnitudes).

    This is the regr_slope surface done order-insensitively: float
    covariance accumulation is summation-order-dependent, integer
    sufficient statistics are not — the same answer on 1 partition or
    10,000.

    Scale: fact scan + two broadcast dim joins + ONE combinable
    aggregate keyed by nation; the OLS assembly touches 25 rows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    x = ((F.year("o_orderdate") - 1990) * 12
         + F.month("o_orderdate") - 1).cast("long")
    y = (_dec(F.col("o_totalprice")) * 100).cast("long")
    pts = (o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(n),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .select("n_name", x.alias("x"), y.alias("y")))
    s = (pts.groupBy("n_name")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sx2")))
    big = "decimal(38,0)"
    num = (F.col("n").cast(big) * F.col("sxy").cast(big)
           - F.col("sx").cast(big) * F.col("sy").cast(big))
    den = (F.col("n").cast(big) * F.col("sx2").cast(big)
           - F.col("sx").cast(big) * F.col("sx").cast(big))
    # a group whose orders all share one month has zero x-variance:
    # the slope is undefined — NULL, not an ANSI divide-by-zero
    slope = F.when(den == 0, F.lit(None)).otherwise(
        F.when(num < 0, -1).otherwise(1).cast(big)
        * F.expr("_absnum div _den"))
    return (s.withColumn("_absnum", F.abs(num) * 1_000_000)
            .withColumn("_den", den)
            .withColumn("slope_micro", slope.cast("long"))
            .select("n_name", F.col("n").cast("long").alias("n_orders"),
                    "slope_micro")
            .orderBy("n_name"))
