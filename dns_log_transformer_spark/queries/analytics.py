"""Batch analytics queries — the SURVEY.md §2.4 capability inventory.

The reference has zero joins/aggs/windows/sorts/set-ops (verified:
/root/reference/app/app.py is the only code file — a record-at-a-time
loop). This module provides that surface with built-in, codegen'd Spark
operators over the TPC-H-ish fixtures, each paired with a DuckDB oracle.

Scale notes (100 TB stance), applied throughout:
- dimension tables (region/nation/supplier/part/customer) are broadcast —
  no shuffle of the fact table for those joins;
- aggregations rely on partial (map-side) aggregation: plain groupBy/agg;
- double aggregates are rounded in BOTH engines: summation order differs
  across partitions, so last-bit floats would never hash-match;
- top-k uses window + filter (no global collect), with total tie-break
  orders so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table


# ---------------------------------------------------------------------------
# Aggregation: full hash-agg with 8 aggregates (partial+final automatic)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan -> filter (pushed to parquet)
    -> hash aggregate. The canonical partial+final agg benchmark."""
    li = table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Filter + global agg: predicate/column pushdown showcase
# ---------------------------------------------------------------------------
@register(
    "q6_revenue_delta",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q6-style: all predicates reach the parquet scan (check
    PushedFilters in .explain); reads only 4 of 11 columns."""
    li = table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join + agg + top-N (fact shuffled once; dims broadcast)
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE)                         AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q3-style: selective dim filter -> broadcast customer into
    orders, shuffle-join lineitem on orderkey, agg, top-10."""
    cust = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust.select("c_custkey")),
                    orders.o_custkey == cust.c_custkey,
                )
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# 6-way star join with broadcast dims
# ---------------------------------------------------------------------------
@register(
    "q5_region_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q5-style 6-way star join. Every dimension is broadcast; the
    only shuffles are fact-fact (orders<->lineitem) and the final agg."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q7-style: cross-nation trade volume by year. The nation dim
    joins twice (aliased) — both broadcast; the theta filter
    (supp_nation <> cust_nation) runs post-join. Revenue is summed in
    DECIMAL: with ~hundreds of large doubles per group the fp sum-order
    divergence between engines exceeds the 2-decimal rounding — decimal
    aggregation is exact and order-independent, so both engines agree
    bit-for-bit (the robust pattern when round() margins get tight)."""
    from dns_log_transformer_spark.operators.text import rebalance_for_fanout

    # every dim side broadcasts, so the whole probe+decimal-agg chain
    # rides the lineitem scan — ONE task on the single-row-group
    # fixture file (r15 profile: ~2.2 s serial). Rebalance the pruned
    # projection; no-op at scale where the scan is already split.
    li = rebalance_for_fanout(
        table(spark, sf, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
            "l_discount",
        )
    )
    orders = table(spark, sf, "orders")
    supp = table(spark, sf, "supplier")
    cust = table(spark, sf, "customer")
    sn = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q10-style: top-20 customers by returned-item revenue."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q12-style conditional aggregation (CASE inside SUM), on the
    fixture's columns (it has no shipmode/receiptdate)."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q14-style: ratio of conditional sums (LIKE predicate on a
    broadcast dim)."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                            * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q15-style: revenue view + scalar MAX subquery selecting the
    top supplier(s). DECIMAL revenue so the MAX comparison is exact in
    both engines (a float equality against an aggregate is exactly the
    place last-ulp divergence would bite)."""
    supp = table(spark, sf, "supplier")
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("m"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total, qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) big ON o_orderkey = big.l_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q18-style: HAVING-filtered aggregate as join input."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey", F.round("_q", 2).alias("qty"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "qty"
        )
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q19-style: disjunctive mixed join/filter predicates — the
    OR-of-ANDs shape optimizers must not mangle."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT)    AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)   AS mon,
           CAST(EXTRACT(day FROM o_orderdate) AS INT)     AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)    AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS BIGINT)                                AS days_since_95,
           strftime(o_orderdate, '%Y-%m')                 AS ym
    FROM orders
    """,
)
def q_date_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time scalar gallery: extract, trunc, interval arithmetic,
    datediff, formatting."""
    orders = table(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.month("o_orderdate").cast("int").alias("mon"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS as left_semi join (no row multiplication, no dedup needed)."""
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = table(spark, sf, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """NOT EXISTS as left_anti join."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Outer join
# ---------------------------------------------------------------------------
@register(
    "q_customer_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_customer_order_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0)."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_full_outer_yearly",
    oracle="""
    WITH o AS (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
                      COUNT(*) AS n_orders
               FROM orders GROUP BY 1),
         l AS (SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
                      COUNT(*) AS n_ships
               FROM lineitem GROUP BY 1)
    SELECT COALESCE(o.yr, l.yr) AS yr,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_ships, 0)  AS n_ships
    FROM o FULL OUTER JOIN l ON o.yr = l.yr
    """,
)
def q_full_outer_yearly(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join of two yearly aggregates (order years vs ship
    years don't fully overlap — both dangling sides survive)."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    o = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr")
    ).agg(F.count("*").alias("n_orders"))
    l = li.groupBy(F.year("l_shipdate").cast("int").alias("o_yr")).agg(
        F.count("*").alias("n_ships")
    )
    return (
        o.join(l, o.yr == l.o_yr, "full_outer")
        .select(
            F.coalesce(o.yr, l.o_yr).alias("yr"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
@register(
    "q_segment_set_ops",
    oracle="""
    WITH building AS (SELECT o_custkey AS custkey FROM orders
                      JOIN customer ON o_custkey = c_custkey
                      WHERE c_mktsegment = 'BUILDING'),
         highval  AS (SELECT o_custkey AS custkey FROM orders
                      WHERE o_totalprice > 200000)
    SELECT 'intersect' AS op, COUNT(*) AS n
      FROM (SELECT DISTINCT custkey FROM building
            INTERSECT SELECT DISTINCT custkey FROM highval)
    UNION ALL
    SELECT 'except', COUNT(*)
      FROM (SELECT DISTINCT custkey FROM building
            EXCEPT SELECT DISTINCT custkey FROM highval)
    UNION ALL
    SELECT 'union', COUNT(*)
      FROM (SELECT custkey FROM building UNION SELECT custkey FROM highval)
    """,
)
def q_segment_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """union / intersect / except over two derived key sets."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    building = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("o_custkey").alias("custkey"))
    )
    highval = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    b, h = building.distinct(), highval.distinct()
    rows = [
        b.intersect(h).agg(F.lit("intersect").alias("op"), F.count("*").alias("n")),
        b.exceptAll(h).distinct().agg(
            F.lit("except").alias("op"), F.count("*").alias("n")
        ),
        b.union(h).distinct().agg(F.lit("union").alias("op"), F.count("*").alias("n")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Window functions: top-k per group, running totals, lag/lead
# ---------------------------------------------------------------------------
@register(
    "q_topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, revenue, rnk FROM (
      SELECT p_brand, p_partkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) DESC,
                        p_partkey) AS rnk
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey)
    WHERE rnk <= 3
    """,
)
def q_topk_parts_per_brand(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 parts by revenue per brand: broadcast-join dim, agg, window
    row_number, filter — the scalable top-k (no global sort)."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rnk")
    )


@register(
    "q_customer_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           ROUND(COALESCE(LAG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0), 2) AS prev_price,
           RANK() OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
    FROM orders
    """,
)
def q_customer_running_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Running sum + lag + rank per customer (total tie-break order)."""
    orders = table(spark, sf, "orders")
    wt = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(wt.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(wt), F.lit(0.0)), 2).alias(
            "prev_price"
        ),
        F.rank().over(wr).alias("price_rank"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------
@register(
    "q_rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS grp,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_order_status(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP with grouping_id — hierarchical subtotals + grand total."""
    orders = table(spark, sf, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("grp"),
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q_cube_returnflag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS grp,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over two dimensions (all 2^2 grouping combinations)."""
    li = table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("grp"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Distinct aggregates + exact percentiles + stddev
# ---------------------------------------------------------------------------
@register(
    "q_distinct_and_percentiles",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)                       AS n_suppliers,
           COUNT(DISTINCT l_partkey)                       AS n_parts,
           ROUND(QUANTILE_CONT(CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                               0.5), 1)                    AS median_cents,
           ROUND(QUANTILE_CONT(CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                               0.95), 1)                   AS p95_cents,
           ROUND(STDDEV_SAMP(l_quantity), 4)               AS sd_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_and_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple exact count-distincts + exact interpolated percentiles
    (Spark `percentile` == DuckDB `quantile_cont`), computed in the
    integer-CENTS domain (PLANS.md rule 5): the even-group median of
    2-decimal prices interpolates to .xx5 dollar values whose decimal
    expansion sits exactly on the ROUND boundary, where Spark's
    exact-BigDecimal HALF_UP and DuckDB's multiply-based rounding can
    disagree by one cent (bit at sf0.001); cents interpolate to exact
    .0/.5 doubles that ROUND(_, 1) never perturbs.

    Shape: each distinct count runs as its own two-phase aggregation
    (groupBy(key, col) then count) and the results join on the tiny
    group key — instead of one agg with N count_distincts, which Catalyst
    plans as an Expand multiplying every input row N+1 times before the
    shuffle. Measured 3x at sf0.1; at warehouse scale the expand's extra
    shuffled rows dominate even more (narrow column scans are cheap,
    shuffled bytes are not)."""
    li = table(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    sup = (
        li.groupBy("l_returnflag", "l_suppkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_suppliers"))
    )
    par = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_parts"))
    )
    # array-form percentile: one aggregation buffer for both targets
    pct = li.groupBy("l_returnflag").agg(
        F.percentile(cents, F.lit([0.5, 0.95])).alias("_pq"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
    ).select(
        "l_returnflag",
        F.round(F.col("_pq")[0], 1).alias("median_cents"),
        F.round(F.col("_pq")[1], 1).alias("p95_cents"),
        "sd_qty",
    )
    return (
        pct.join(sup, "l_returnflag")
        .join(par, "l_returnflag")
        .select(
            "l_returnflag",
            "n_suppliers",
            "n_parts",
            "median_cents",
            "p95_cents",
            "sd_qty",
        )
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------
@register(
    "q_pivot_status_qty",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_O,
           ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot_status_qty(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list — no extra pass
    to discover pivot values, which matters at scale)."""
    li = table(spark, sf, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# Theta/range join condition
# ---------------------------------------------------------------------------
@register(
    "q_ship_within_week",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_fast_lines
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 7 DAY
    GROUP BY o_orderpriority
    """,
)
def q_ship_within_week(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-join + range predicate (band join): the equi key keeps it a
    hash join; the range is a post-join filter Catalyst fuses in."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= orders.o_orderdate)
            & (li.l_shipdate < F.date_add(orders.o_orderdate, 7)),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_fast_lines"))
    )


# ---------------------------------------------------------------------------
# Scalar-function gallery (string/date/conditional coverage)
# ---------------------------------------------------------------------------
@register(
    "q_pure_range_join",
    oracle="""
    SELECT o_orderkey, COUNT(*) AS n_shipped
    FROM orders JOIN lineitem
      ON l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 1 DAY
    WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
    GROUP BY o_orderkey
    """,
)
def q_pure_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Pure range join (NO equi key): lineitems (any order's) shipped
    within a March-1995 order's next-day window. Spark would plan the raw
    predicate as a nested-loop O(n*m); operators/joins.py
    range_join_buckets turns it into a bucketized equi-join + refine (the
    scale path). The oracle is the naive range join, which DuckDB
    executes with IEJoin. (Selective on purpose: a pure range join's
    OUTPUT is inherently |matches|; an unselective window makes any
    algorithm quadratic in output, not a plan problem.)"""
    from dns_log_transformer_spark.operators.joins import range_join_buckets

    day = 86400
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("lo"),
        (F.unix_timestamp("o_orderdate") + day).alias("hi"),
    )
    li = table(spark, sf, "lineitem").select(
        F.unix_timestamp("l_shipdate").alias("x")
    )
    joined = range_join_buckets(li, orders, "x", "lo", "hi", bucket_width=2 * day)
    return joined.groupBy("o_orderkey").agg(F.count("*").alias("n_shipped"))


@register(
    "q_scalar_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                   AS name_upper,
           SUBSTR(c_name, 1, 8)                            AS name_prefix,
           LENGTH(c_name)                                  AS name_len,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0')       AS key_padded,
           CONCAT(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band,
           ROUND(ABS(c_acctbal), 2)                        AS abs_bal,
           ROUND(GREATEST(c_acctbal, 0.0), 2)              AS pos_bal
    FROM customer
    """,
)
def q_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar expression coverage: string (upper/substr/length/lpad/
    concat), conditional (CASE), numeric (abs/greatest/round) — the
    engine's 'F-function' surface beyond the DNS formatters."""
    cust = table(spark, sf, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws(
            ":", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.round(F.abs("c_acctbal"), 2).alias("abs_bal"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("pos_bal"),
    )


# ---------------------------------------------------------------------------
# Event-time bucketing (batch analog of streaming tumbling windows)
# ---------------------------------------------------------------------------
@register(
    "q_event_time_buckets",
    oracle="""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_event_time_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """5-minute tumbling buckets over event time (batch form; the
    streaming form uses F.window + watermark, see streaming/)."""
    ev = table(spark, sf, "events")
    bucket = (F.unix_timestamp("ts") / 300).cast("long") * 300
    return (
        ev.groupBy(bucket.alias("bucket_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# Native event-time windows, batch-executed (the same operators the
# streaming surface uses — F.window / F.session_window run in both modes)
# ---------------------------------------------------------------------------
@register(
    "q_window_native",
    oracle="""
    SELECT time_bucket(INTERVAL 5 MINUTE, ts)                    AS window_start,
           time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_window_native(spark: SparkSession, sf: str) -> DataFrame:
    """F.window tumbling aggregation in batch mode — verifies the exact
    operator the streaming pipeline uses (streaming/windows.py
    tumbling_counts) against SQL time_bucket semantics."""
    from dns_log_transformer_spark.streaming.windows import tumbling_counts

    ev = table(spark, sf, "events")
    return tumbling_counts(ev, window_len="5 minutes")


# q_sliding_native was consolidated into round8.py q_sliding_distinct
# (r10, VERDICT r9 #1): the merged window aggregate carries the sliding
# event count beside the exact/HLL distinct. The streaming operator it
# exercised (streaming/windows.py sliding_counts) keeps its own pytest
# coverage in test_streaming.


@register(
    "q_session_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts)                        AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE   AS session_end,
           COUNT(*)                       AS n_events,
           ROUND(SUM(value), 4)           AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_native(spark: SparkSession, sf: str) -> DataFrame:
    """F.session_window gap-based sessions in batch mode (same operator
    as streaming/windows.py session_stats); the oracle rebuilds identical
    sessions with the lag+cumsum island method — a window at exactly the
    30-min gap starts a new session in both (session end is exclusive)."""
    from dns_log_transformer_spark.streaming.windows import session_stats

    ev = table(spark, sf, "events")
    return session_stats(ev, gap="30 minutes")


# ---------------------------------------------------------------------------
# Grouping sets (explicit, beyond rollup/cube) + approximate distinct
# ---------------------------------------------------------------------------
@register(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS grp,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (an arbitrary set list — not expressible as
    rollup or cube: (a,b), (b), ())."""
    orders = table(spark, sf, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.grouping_id().cast("int").alias("grp"), F.count("*").alias("n"))


@register(
    "q_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE                      AS approx_ok,
           TRUE                      AS merged_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate distinct counting, both engines' idioms in ONE
    registration — r10 consolidation of q_approx_distinct +
    q_hll_sketch_merge (VERDICT r9 #1; the two shells shared the exact
    baseline and the in-bound-flag convention):

    - ``approx_ok``: approx_count_distinct (HyperLogLog++) checked
      against the exact count within its 5% error bound;
    - ``merged_ok``: Datasketches-HLL built as MERGEABLE partials —
      per-(group, shard) sketches via hll_sketch_agg, then
      hll_union_agg across shards, then estimate — the pre-aggregated
      sketch-table pattern (store binary sketches per partition/day,
      merge at query time; distinct-count queries never rescan raw
      data), checked within the same 5% bound.

    Sketch values differ by engine, so the oracle-comparable output is
    the exact count + the two in-bound flags.

    Plan note: count_distinct and approx_count_distinct in ONE
    aggregate makes the distinct rewrite carry the partial HLL sketch
    per (group, custkey) KEY — at rsd=0.02 that is ~410 longs per
    distinct key through the shuffle (~150 MB at sf0.1, unbounded at
    100 TB). HLL is duplicate-insensitive, so dedup first
    (map-side-combined distinct, fixed-width rows), then aggregate: the
    sketch exists only per group x reducer partition. The datasketches
    partials deliberately read the RAW orders (that is the pattern
    being attested: shard-level sketches over unprocessed data), and
    the per-status estimates join the exact side on the tiny status
    key."""
    orders = table(spark, sf, "orders")
    d = orders.select("o_orderstatus", "o_custkey").distinct()
    n_exact = F.count("o_custkey")
    exact = d.groupBy("o_orderstatus").agg(
        n_exact.alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02).cast("double")
                - n_exact.cast("double")
            )
            / n_exact
            <= 0.05
        ).alias("approx_ok"),
    )
    partials = (
        orders.withColumn("_shard", (F.col("o_orderkey") % 8).cast("int"))
        .groupBy("o_orderstatus", "_shard")
        .agg(F.hll_sketch_agg("o_custkey").alias("_sk"))
    )
    merged = partials.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est")
    )
    return exact.join(merged, "o_orderstatus").select(
        "o_orderstatus",
        "n_exact",
        "approx_ok",
        (
            F.abs(F.col("_est").cast("double") - F.col("n_exact").cast("double"))
            / F.col("n_exact")
            <= 0.05
        ).alias("merged_ok"),
    )


# ---------------------------------------------------------------------------
# Sessionization (batch): gap > 30 min starts a new session
# ---------------------------------------------------------------------------
@register(
    "q_sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Classic lag + cumulative-sum sessionization; one shuffle on
    user_id serves both windows and the final agg."""
    ev = table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return sessions.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery, decorrelated the Spark-first way
# ---------------------------------------------------------------------------
@register(
    "q_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_above_customer_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Orders >1.5x their customer's average. The oracle states it as the
    correlated scalar subquery; the engine decorrelates it to one window
    aggregate over a single o_custkey shuffle — the shape that scales
    (per-row re-aggregation never happens)."""
    orders = table(spark, sf, "orders")
    w = W.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
        )
    )


# ---------------------------------------------------------------------------
# The SQL entry point itself (spark.sql over registered views)
# ---------------------------------------------------------------------------
_NATION_REVENUE_SQL = """
    SELECT n_name,
           COUNT(DISTINCT c_custkey)     AS n_customers,
           ROUND(SUM(o_totalprice), 2)   AS total_revenue
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    GROUP BY n_name
"""


@register("q_sql_surface", oracle=_NATION_REVENUE_SQL)
def q_sql_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The engine's SQL surface: the IDENTICAL ANSI text runs through
    spark.sql() and through DuckDB — parser/analyzer parity, not just
    DataFrame parity."""
    for t in ("customer", "nation", "orders"):
        table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_NATION_REVENUE_SQL)


# ---------------------------------------------------------------------------
# Semi-structured: JSON property extraction
# ---------------------------------------------------------------------------
@register(
    "q_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-on-read over the JSON props column (get_json_object —
    the same primitive the DNS pipeline uses via from_json)."""
    ev = table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(k > 50)
        .groupBy("event_type")
        .agg(F.sum(k).alias("k_total"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# As-of join (Spark has no native one — union + window carry-forward)
# ---------------------------------------------------------------------------
@register(
    "q_asof_last_click_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id,
           (SELECT c.event_id FROM events c
             WHERE c.user_id = p.user_id AND c.event_type = 'click'
               AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
             ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_asof_last_click_before_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join, Spark-first: instead of a per-row lookup (the oracle's
    correlated subquery, O(n*m)), tag both sides, sort once within each
    user partition, and carry the last click forward with
    last(ignorenulls) — one shuffle, linear work, scales to any size."""
    ev = table(spark, sf, "events")
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
    ).filter(F.col("event_type").isin("click", "purchase"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)  # strictly-before semantics
    )
    return (
        tagged.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "last_click_id")
    )


@register(
    "q17_small_quantity",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN pa USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < half_avg
    """,
)
def q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q17-style: correlated per-group scalar average, decorrelated
    Spark-first into one aggregate + an equi-join back on the group key
    (never a per-row subquery). The avg comparison is fp-safe here:
    quantities are integer-valued doubles, so group sums — and therefore
    the average — are exact and order-independent in both engines; the
    revenue total is DECIMAL for the same reason (PLANS.md rule 5)."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    pa = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(pa, "l_partkey")
        .join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
            li.l_partkey == F.col("p_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q21_sole_returner",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_sole_returner(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q21-shape (adapted to this schema: 'returned' stands in for
    'late'): the EXISTS / NOT EXISTS pair over the same fact table,
    expressed as left-semi + left-anti self-joins — equi on the order
    key with a residual supplier-inequality condition, so both resolve
    to hash/sort-merge joins, never a per-row subquery or nested loop."""
    li = table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    orders = table(spark, sf, "orders")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    cand = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        cand.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l1.l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q13_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q13-shape: customer order-count distribution. The load-bearing
    subtlety is the ON-clause (not WHERE) predicate on the outer join —
    customers whose only orders are URGENT must still appear with count 0 —
    expressed Spark-first by filtering the right side *before* the left
    join. Two cascaded aggregations; both partial+final, no skew (custkey
    then small-domain count)."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q22_idle_balances",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS total,
             COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) * cnt > total
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q22-shape: above-average balances among customers with no
    URGENT orders. The scalar AVG subquery is decorrelated as a 1-row
    (SUM, COUNT) aggregate broadcast-cross-joined in, and the comparison
    is division-free (bal * cnt > total, DECIMAL x BIGINT -> DECIMAL) so
    both engines compare exact values — AVG itself would come back as
    DOUBLE in DuckDB but DECIMAL in Spark (PLANS.md rule 5). NOT EXISTS
    is a left-anti join on the filtered orders side."""
    cust = table(spark, sf, "customer").withColumn(
        "bal_dec", F.col("c_acctbal").cast("decimal(18,6)")
    )
    orders = table(spark, sf, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("bal_dec").alias("total"), F.count("*").alias("cnt")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(pos))
        .filter(F.col("bal_dec") * F.col("cnt") > F.col("total"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("bal_dec"), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH rows_q4 AS (
      SELECT l_partkey, l_suppkey,
             (2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 100
              + CAST(ROUND(l_quantity) AS BIGINT))
             // (2 * CAST(ROUND(l_quantity) AS BIGINT)) AS cost_q4
      FROM lineitem),
    ps AS (
      SELECT l_partkey, l_suppkey, MIN(cost_q4) AS ps_cost_q4
      FROM rows_q4 GROUP BY l_partkey, l_suppkey),
    mc AS (SELECT l_partkey, MIN(ps_cost_q4) AS min_cost
           FROM ps GROUP BY l_partkey)
    SELECT p_partkey, s_name, n_name,
           CAST(ps_cost_q4 AS BIGINT) AS supply_cost_q4
    FROM ps JOIN mc USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE ps_cost_q4 = min_cost AND p_size = 10
    ORDER BY p_partkey, s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q2-shape: cheapest supplier per part (partsupp derived from
    lineitem as MIN(unit price) per part-supplier pair — the fixture set
    has no partsupp table). The correlated MIN subquery is decorrelated
    into a per-part window MIN; ties keep all rows in both engines.

    Exact-integer unit cost (PLANS.md rule 5, found by the sf0.1 parity
    sweep): price/quantity quotients land on 4-decimal .5 boundaries
    (89.11625 at sf0.1) where the engines' double ROUND disagrees by a
    ulp-visible digit — the cost is instead quantized per ROW with
    integer round-half-up ((2*cents*100 + q) div (2q), exact on both
    engines) and MIN runs over integers; rounding is monotone, so
    min-of-rounded equals rounded-min, and the min-cost tie compare is
    integer-exact.

    Round-6 plan rewrite (oracle-hash-preserving): (a) the selective
    ``p_size = 10`` part filter is pushed BELOW the aggregate as a
    broadcast semi-join on the lineitem scan — the per-part min is
    computed WITHIN each part, so pruning parts first cannot change it,
    and the heavy (partkey, suppkey) aggregation now sees ~1/50 of the
    rows; (b) the min-cost comparison is a window MIN over the (already
    partkey-clustered) aggregate instead of a second aggregate + self
    join — the old plan computed the aggregate TWICE (once per join
    side). One lineitem scan, one agg shuffle, one window over the same
    key, broadcast dims."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    part10 = part.filter(F.col("p_size") == 10)
    li10 = li.join(
        F.broadcast(part10.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    cost_q4 = F.expr(
        "(2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 100"
        " + CAST(ROUND(l_quantity) AS BIGINT))"
        " div (2 * CAST(ROUND(l_quantity) AS BIGINT))"
    )
    ps = li10.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cost_q4).alias("ps_cost_q4")
    )
    w = W.partitionBy("l_partkey")
    keep = ps.withColumn("min_cost", F.min("ps_cost_q4").over(w)).filter(
        F.col("ps_cost_q4") == F.col("min_cost")
    )
    return (
        keep.join(
            F.broadcast(part10), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.col("ps_cost_q4").cast("bigint").alias("supply_cost_q4"),
        )
        .orderBy("p_partkey", "s_name")
    )


@register(
    "q16_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q16-shape: distinct supplier count per (brand, size) with a
    NOT IN exclusion list. NOT IN is a left-anti join (s_suppkey is
    non-null, so the NULL-semantics trap of NOT IN doesn't bite); the
    exclusion side is tiny and broadcast. DISTINCT pairs first (one
    shuffle), then count-distinct aggregates (Spark plans the standard
    two-phase distinct expand)."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    supp = table(spark, sf, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = supp.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(
            F.broadcast(part.filter(F.col("p_brand") != "Brand#1")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6)))
               AS part_value
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT SUM(part_value) AS total FROM pv)
    SELECT l_partkey,
           CAST(ROUND(part_value, 2) AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE part_value * 1250 > total
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q11-shape: parts whose inventory value exceeds a fraction of
    the global total (HAVING vs a global scalar subquery). The global
    total is a 1-row aggregate broadcast in; the 0.08% threshold is
    expressed division-free (value * 1250 > total) so the DECIMAL
    comparison is exact in both engines. Per-row cast to DECIMAL before
    SUM keeps the aggregate order-independent (PLANS.md rule 5)."""
    li = table(spark, sf, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                "decimal(18,6)"
            )
        ).alias("part_value")
    )
    tot = pv.agg(F.sum("part_value").alias("total"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("part_value") * 1250 > F.col("total"))
        .select(
            "l_partkey",
            F.round("part_value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q20_heavy_shippers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY l_partkey, l_suppkey)
    SELECT s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM ps
      WHERE qty > 50
        AND l_partkey IN
          (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'))
    ORDER BY s_name
    """,
)
def q20_heavy_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q20-shape: nested IN subqueries — suppliers who shipped more
    than a threshold of any red part in 1995. Both IN levels become
    left-semi joins (part-filter semi into the aggregated pair table,
    then the pair table semi into supplier), so the plan is two hash
    semi-joins over one aggregation; quantity sums are integer-valued
    doubles (exact, order-independent)."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    supp = table(spark, sf, "supplier")
    ps = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    heavy = ps.filter(F.col("qty") > 50).join(
        F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    return (
        supp.join(
            heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name")
        .orderBy("s_name")
    )


@register(
    "q_profile_columns",
    oracle="""
    SELECT 'l_orderkey' AS col_name,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_str,
           CAST(MAX(l_orderkey) AS VARCHAR) AS max_str
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity',
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
           CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag',
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
           CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate',
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
           CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
    FROM lineitem
    """,
)
def q_profile_columns(spark: SparkSession, sf: str) -> DataFrame:
    """Data-profiling pass over four lineitem columns of four different
    types (bigint, double, string, timestamp) — null counts, exact
    cardinality, stringified min/max. Per-column pruned scans, no
    multi-distinct Expand (operators/profile.py)."""
    from dns_log_transformer_spark.operators.profile import profile_columns

    li = table(spark, sf, "lineitem")
    return profile_columns(
        li, ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    )


@register(
    "q_variant_props",
    oracle="""
    SELECT event_type,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_variant_props(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured props via Spark 4's VariantType: try_parse_json
    once into a variant column (a single binary-encoded parse, unlike
    repeated get_json_object calls), then typed variant_get extraction.
    The parse is materialized as its own projection so downstream
    references hit the variant attribute, not a re-parse (PLANS.md
    rule 1), and the input is rebalanced before the parse — the variant
    encoder is heavy per row and a compact scan would serialize it
    (PLANS.md rule 7; 4.1s -> 1.1s at sf0.1)."""
    from dns_log_transformer_spark.operators.text import rebalance_for_fanout

    ev = table(spark, sf, "events")
    v = rebalance_for_fanout(ev.select("event_type", "props")).select(
        "event_type", F.try_parse_json("props").alias("pv")
    )
    k = F.variant_get("pv", "$.k", "long")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.count("k").cast("long").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS v,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA')
    SELECT o_year,
           CAST(ROUND(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN v
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q8-shape: one nation's share of a region's purchase volume
    per year — the conditional-share ratio over a 6-way join. Volumes
    accumulate as per-row-cast DECIMAL (exact, order-independent); the
    final share divides the two exact totals as doubles, identically in
    both engines (PLANS.md rule 5). Dims broadcast; the two fact joins
    shuffle on their keys."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("v"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("v")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("v").cast("double"),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(
             l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
             AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN ps USING (l_partkey, l_suppkey)
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gizmo%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q9-shape: profit per supplier nation per year over a 5-way
    join, with supplycost derived from lineitem (no partsupp in the
    fixture schema — min unit price per part-supplier pair, the q2
    derivation). Per-row profit is cast to DECIMAL before summing (the
    raw doubles are bit-identical in both engines: same multiply/
    subtract on the same inputs), so the aggregate is exact and
    order-independent (PLANS.md rule 5).

    Round-6 plan rewrite (oracle-hash-preserving, the q2 recipe): the
    selective p_name filter is pushed BELOW the supplycost aggregate as
    a broadcast semi-join on the lineitem scan — the per-(part,
    supplier) min is computed within each part, so pruning parts first
    cannot change it, and both the aggregate and the fact side now see
    only matching parts' rows. 1.20s -> 0.57s warm at sf0.1."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    orders = table(spark, sf, "orders")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    gizmo = part.filter(F.col("p_name").like("%gizmo%"))
    li_g = li.join(
        F.broadcast(gizmo.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    ps = li_g.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li_g.join(ps, ["l_partkey", "l_suppkey"])
        .join(
            F.broadcast(gizmo),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("pr"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.round(F.sum("pr"), 2).cast("double").alias("profit"))
        .orderBy("n_name", F.col("o_year").desc())
    )


@register(
    "q_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT distinct counts via bitmap aggregation — the scale-out
    alternative to COUNT DISTINCT: values fold into fixed-size bitmap
    buckets (bitmap_bit_position within bitmap_bucket_number), so the
    shuffle carries one bitmap per (group, bucket) instead of every
    distinct value, and multi-column distincts need no Expand
    row-multiplication. Two ordinary partial+final aggregations; result
    bit-for-bit equals the oracle's COUNT(DISTINCT ...)."""
    li = table(spark, sf, "lineitem")

    def bitmap_distinct(col: str, out: str):
        return (
            li.groupBy(
                "l_returnflag", F.bitmap_bucket_number(F.col(col)).alias("_b")
            )
            .agg(
                F.bitmap_construct_agg(F.bitmap_bit_position(F.col(col))).alias(
                    "_bm"
                )
            )
            .groupBy("l_returnflag")
            .agg(F.sum(F.bitmap_count("_bm")).cast("long").alias(out))
        )

    supp = bitmap_distinct("l_suppkey", "n_suppliers")
    part = bitmap_distinct("l_partkey", "n_parts")
    return supp.join(part, "l_returnflag").orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Ordered-event funnel: view -> click -> purchase, strictly in sequence
# ---------------------------------------------------------------------------
@register(
    "q_event_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view')     AS t1,
             list(ts) FILTER (WHERE event_type = 'click')    AS clicks,
             list(ts) FILTER (WHERE event_type = 'purchase') AS purch
      FROM events GROUP BY user_id),
    s1 AS (
      SELECT user_id, t1, purch,
             list_min(list_filter(clicks, x -> x > t1)) AS t2
      FROM per_user),
    s2 AS (
      SELECT user_id, t1, t2,
             list_min(list_filter(purch, x -> x > t2)) AS t3
      FROM s1),
    sums AS (
      SELECT CAST(COUNT(t1) AS BIGINT) AS n1,
             CAST(COUNT(t2) AS BIGINT) AS n2,
             CAST(COUNT(t3) AS BIGINT) AS n3
      FROM s2)
    SELECT 1 AS step_no, 'view' AS step, n1 AS n_users FROM sums
    UNION ALL
    SELECT 2, 'click_after_view', n2 FROM sums
    UNION ALL
    SELECT 3, 'purchase_after_click', n3 FROM sums
    """,
)
def q_event_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Sequenced conversion funnel: users whose first view precedes a
    click that precedes a purchase (strict event-time order, not mere
    per-type existence).

    Shape at scale: ONE shuffle (groupBy user_id) collects each user's
    click/purchase timestamps; the step chase (first view, first click
    after it, first purchase after that) is per-row array work inside
    the same stage — no window function, no self-join per step, and the
    per-user arrays are bounded by individual activity, not corpus
    size. The final step-count agg reduces to a single row."""
    events = table(spark, sf, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("_clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("_purch"),
    )
    chased = per_user.withColumn(
        "t2", F.array_min(F.filter("_clicks", lambda x: x > F.col("t1")))
    ).withColumn(
        "t3", F.array_min(F.filter("_purch", lambda x: x > F.col("t2")))
    )
    sums = chased.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return sums.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("step_no"),
                    F.lit("view").alias("step"),
                    F.col("n1").alias("n_users"),
                ),
                F.struct(
                    F.lit(2).alias("step_no"),
                    F.lit("click_after_view").alias("step"),
                    F.col("n2").alias("n_users"),
                ),
                F.struct(
                    F.lit(3).alias("step_no"),
                    F.lit("purchase_after_click").alias("step"),
                    F.col("n3").alias("n_users"),
                ),
            )
        ).alias("s")
    ).select("s.step_no", "s.step", "s.n_users")


# ---------------------------------------------------------------------------
# argmax/argmin aggregates: max_by/min_by with a deterministic tiebreak
# ---------------------------------------------------------------------------
@register(
    "q_argmax_orders",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000
                   + o_orderkey) AS top_custkey,
           arg_min(o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000
                   + o_orderkey) AS bottom_custkey,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_argmax_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Who placed each priority class's priciest (and cheapest) order —
    max_by/min_by argmax aggregates, which replace the join-back-on-max
    idiom with ONE partial+final aggregation (no second shuffle, no
    max-value join).

    max_by ties are engine-order nondeterministic, so the ordering key
    is made unique: cents * 1e10 + o_orderkey. Collision-free while
    o_orderkey < 10^10 (TPC-H o_orderkey <= 6e6*SF, so sf <= ~1600) and
    overflow-free: cents <= ~6e7, so the packed key tops out near
    6e17 < 2^63 — exact int64 arithmetic on both engines."""
    orders = table(spark, sf, "orders")
    rank_key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * 10_000_000_000
        + F.col("o_orderkey")
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_custkey", rank_key).alias("top_custkey"),
            F.min_by("o_custkey", rank_key).alias("bottom_custkey"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Range-frame rolling window: per-user trailing-hour activity
# ---------------------------------------------------------------------------
@register(
    "q_rolling_hour",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_id, user_id, ts_sec,
           CAST(SUM(cents) OVER w AS BIGINT)  AS hour_cents,
           CAST(COUNT(*) OVER w AS BIGINT)    AS n_hour
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_hour(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-one-hour event value and count per user at every event —
    a RANGE-frame window (value-based frame bounds, not row counts), the
    time-series primitive row-frame windows can't express when events
    are irregularly spaced.

    One shuffle on user_id; the frame scan is per-partition sorted work.
    Monetary values fold as exact integer cents so the rolling sum is
    combine-order-independent (PLANS.md rule 5); tied timestamps are
    all-in-frame on both engines by RANGE semantics."""
    events = table(spark, sf, "events")
    ev = events.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_sec"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.sum("cents").over(w).cast("long").alias("hour_cents"),
        F.count("*").over(w).cast("long").alias("n_hour"),
    )


# ---------------------------------------------------------------------------
# Time-axis gap fill + forward fill: dense 5-minute buckets
# ---------------------------------------------------------------------------
@register(
    "q_gapfill_buckets",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(floor(epoch(ts)) / 300) AS BIGINT) AS bucket,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    actual AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(MAX(cents) AS BIGINT) AS max_cents
      FROM b GROUP BY bucket),
    span AS (SELECT MIN(bucket) AS mn, MAX(bucket) AS mx FROM actual),
    axis AS (SELECT unnest(range(mn, mx + 1)) AS bucket FROM span)
    SELECT a.bucket,
           CAST(COALESCE(ac.n_events, 0) AS BIGINT) AS n_events,
           last_value(ac.max_cents IGNORE NULLS) OVER (
             ORDER BY a.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_max_cents
    FROM axis a LEFT JOIN actual ac ON ac.bucket = a.bucket
    """,
)
def q_gapfill_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Dense 5-minute time axis with zero-filled counts and
    forward-filled last observation — the gap-fill / LOCF primitive of
    time-series stores, built from sequence()+explode and
    last(ignorenulls).

    Scale note: the global-order window here runs over the GENERATED
    AXIS, whose cardinality is time-span / bucket-width — bounded by
    elapsed time, not data volume (per-key gap-fill would partition the
    window by that key). The raw events reduce map-side into per-bucket
    rows before ever meeting the axis."""
    events = table(spark, sf, "events")
    b = events.select(
        F.floor(F.col("ts").cast("long") / 300).cast("long").alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    actual = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("cents").cast("long").alias("max_cents"),
    )
    span = actual.agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    axis = span.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("bucket")
    )
    joined = axis.join(actual, "bucket", "left")
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return joined.select(
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.last("max_cents", ignorenulls=True).over(w).alias("filled_max_cents"),
    )


# ---------------------------------------------------------------------------
# Approximate percentiles (GK sketch) attested within rank-error bounds
# ---------------------------------------------------------------------------
@register(
    "q_approx_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                               0.5), 1)  AS median_exact_cents,
           ROUND(QUANTILE_CONT(CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                               0.95), 1) AS p95_exact_cents,
           TRUE AS median_ok,
           TRUE AS p95_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_approx_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch — mergeable, bounded
    memory) checked against the exact interpolated percentile within its
    rank-error guarantee: with accuracy a, the returned value's rank is
    within n/a of the target, so it must lie between the exact
    (q - 1/a) and (q + 1/a) quantiles. Sketch internals differ by
    engine, so the oracle-comparable output is the exact value + the
    in-bounds flag — the q_approx_distinct pattern. Percentiles run in
    the integer-CENTS domain (PLANS.md rule 5): even-group dollar
    medians land on .xx5 ROUND boundaries where the engines' rounding
    algorithms disagree by a cent (bit at sf0.001); cents interpolate
    to exact .0/.5 doubles.

    The sketch is the 100 TB path: exact QUANTILE_CONT buffers every
    group value for a sort; GK folds partial sketches map-side and
    shuffles fixed-size summaries."""
    from dns_log_transformer_spark.operators.text import rebalance_for_fanout

    # the exact-percentile buffers built in the partial aggregation are
    # the expensive side; a single-row-group fixture scan serializes
    # them behind one task (r15 profile: ~4 s executor time, <=7 tasks).
    # rebalance the 2-column projection — no-op when the scan is split.
    li = rebalance_for_fanout(
        table(spark, sf, "lineitem").select("l_returnflag", "l_extendedprice")
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    acc = 100  # rank error <= 1% of each group
    eps = 1.0 / acc
    # ONE exact-percentile aggregate evaluating all six targets and ONE
    # GK sketch evaluating both — array-form percentile() shares a
    # single aggregation buffer per group where six scalar calls would
    # each build (and codegen) their own, measured 10x cheaper cold.
    # Bound targets derive from acc so tightening the sketch keeps the
    # attestation window in lockstep.
    exact6 = F.percentile(
        cents,
        F.lit([max(0.5 - eps, 0.0), 0.5, min(0.5 + eps, 1.0),
               max(0.95 - eps, 0.0), 0.95, min(0.95 + eps, 1.0)]),
    )
    approx2 = F.percentile_approx(cents, F.lit([0.5, 0.95]), F.lit(acc))
    agg = li.groupBy("l_returnflag").agg(
        exact6.alias("_ex"), approx2.alias("_ap")
    )
    ex = lambda i: F.col("_ex")[i]  # noqa: E731
    ap = lambda i: F.col("_ap")[i]  # noqa: E731
    return agg.select(
        "l_returnflag",
        F.round(ex(1), 1).alias("median_exact_cents"),
        F.round(ex(4), 1).alias("p95_exact_cents"),
        ((ap(0) >= ex(0)) & (ap(0) <= ex(2))).alias("median_ok"),
        ((ap(1) >= ex(3)) & (ap(1) <= ex(5))).alias("p95_ok"),
    )


# ---------------------------------------------------------------------------
# Global rank without the single-task window (zipWithIndex machinery)
# ---------------------------------------------------------------------------
@register(
    "q_global_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           l_extendedprice, l_quantity,
           CAST(ROW_NUMBER() OVER (
             ORDER BY l_extendedprice DESC, l_orderkey, l_partkey,
                      l_suppkey, l_linenumber, l_quantity) AS BIGINT)
             AS global_rank
    FROM lineitem
    """,
)
def q_global_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Global 1-based price rank over the full fact table — the oracle
    states it as the obvious `ROW_NUMBER() OVER (ORDER BY ...)`, whose
    Spark plan funnels every row through ONE task; the engine computes
    it with the parallel zipWithIndex machinery instead
    (`operators/corpus.py global_rank`): range-partitioned sort,
    per-partition positions, O(num_partitions) offset map. The ordering
    key includes a unique tiebreak so both engines assign every rank
    deterministically."""
    from dns_log_transformer_spark.operators.corpus import global_rank

    li = table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        "l_quantity",
    )
    return global_rank(
        li,
        [
            F.desc("l_extendedprice"),
            F.asc("l_orderkey"),
            F.asc("l_partkey"),
            F.asc("l_suppkey"),
            F.asc("l_linenumber"),
            F.asc("l_quantity"),
        ],
        rank_col="global_rank",
    )


# ---------------------------------------------------------------------------
# q_hll_sketch_merge was consolidated into q_approx_distinct (r10,
# VERDICT r9 #1): the merged registration carries both the HLL++
# approx_count_distinct check and the datasketches partial-sketch
# build/union/estimate check against one exact baseline.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Unpivot (melt): wide measure columns -> long (measure, value) rows
# ---------------------------------------------------------------------------
@register(
    "q_unpivot_measures",
    oracle="""
    WITH long AS (
      SELECT measure, val FROM (
        UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
                        l_tax
                 FROM lineitem)
        ON l_quantity, l_discount, l_tax INTO NAME measure VALUE val))
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n_vals,
           ROUND(MIN(val), 4) AS min_val,
           ROUND(MAX(val), 4) AS max_val,
           ROUND(CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS sum_val
    FROM long GROUP BY measure
    """,
)
def q_unpivot_measures(spark: SparkSession, sf: str) -> DataFrame:
    """Wide-to-long reshaping via unpivot/melt (the Expand operator —
    each input row emits one row per measure, no shuffle until the
    aggregate), with per-measure stats. Sums fold as exact DECIMAL so
    combine order can't diverge from the oracle (PLANS.md rule 5).

    r16 note: the r15 rebalance_for_fanout keep was REVERTED here
    (byte-identical to the attested e3de281 source) — its win existed
    only in filtered cold A/Bs and washed out in every quiet full
    bench (0.62-0.75 s with vs 0.637 s base), the same evidence class
    whose three other keeps batch 5 reverted (VERDICT r15 #4)."""
    li = table(spark, sf, "lineitem")
    long = li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return long.groupBy("measure").agg(
        F.count("*").cast("long").alias("n_vals"),
        F.round(F.min("val"), 4).alias("min_val"),
        F.round(F.max("val"), 4).alias("max_val"),
        F.round(
            F.sum(F.col("val").cast("decimal(18,6)")).cast("double"), 4
        ).alias("sum_val"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4): ENGINE-PORTABLE SQL — the oracle IS the query
# ---------------------------------------------------------------------------
_RECURSIVE_MONTHS_SQL = """
    WITH RECURSIVE bounds AS (
      SELECT CAST(MIN(EXTRACT(YEAR FROM o_orderdate)) AS BIGINT) AS mny,
             CAST(MAX(EXTRACT(YEAR FROM o_orderdate)) AS BIGINT) AS mxy,
             CAST(MIN(EXTRACT(YEAR FROM o_orderdate) * 12
                  + EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS mn,
             CAST(MAX(EXTRACT(YEAR FROM o_orderdate) * 12
                  + EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS mx
      FROM orders),
    -- the recursive member references ONLY itself: bounds is read once
    -- by the anchor and carried as columns. (A `FROM years, bounds`
    -- step re-evaluated the full-orders aggregate EVERY iteration —
    -- measured 18.8s at sf0.1; this shape is ~10x cheaper. Recursing
    -- over YEARS keeps the depth ~timespan/12 with a portable
    -- 12-row VALUES cross join supplying the months.)
    years(yr, mxy, mn, mx) AS (
      SELECT mny, mxy, mn, mx FROM bounds
      UNION ALL
      SELECT yr + 1, mxy, mn, mx FROM years WHERE yr < mxy),
    months AS (
      SELECT yr * 12 + m.i AS ym, yr
      FROM years CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6),
                                    (7), (8), (9), (10), (11), (12)) AS m(i)
      WHERE yr * 12 + m.i BETWEEN mn AND mx),
    counts AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
             + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1)
    SELECT m.ym AS ym, m.yr AS yr,
           CAST(COALESCE(c.n_orders, 0) AS BIGINT) AS n_orders
    FROM months m LEFT JOIN counts c ON c.ym = m.ym
"""


@register("q_recursive_months", oracle=_RECURSIVE_MONTHS_SQL)
def q_recursive_months(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4): a data-dependent
    month spine from the min to the max order month with zero-filled
    counts. The SQL text is engine-portable — the oracle string IS the
    executed query, attesting the recursion semantics themselves match.
    Recursion depth = elapsed months (bounded by the calendar, not the
    data volume); the per-month counts reduce map-side before joining
    the spine."""
    table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_MONTHS_SQL)


# ---------------------------------------------------------------------------
# PageRank (fixed-point) over the customer<->supplier trade graph
# ---------------------------------------------------------------------------
_PR_ITERS = 3


def _pr_iter_cte(i: int, prev: str) -> str:
    return f"""
    i{i} AS (
      SELECT n.node,
             CAST(150000 + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT)
               AS pr_rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node,
               SUM(r.pr_rank // d.outdeg) AS inc
        FROM e
        JOIN deg d ON d.src = e.src
        JOIN {prev} r ON r.node = e.src
        GROUP BY e.dst) s ON s.node = n.node)"""


_PAGERANK_ORACLE = (
    """
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
    i0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr_rank FROM nodes),"""
    + ",".join(_pr_iter_cte(i, f"i{i - 1}") for i in range(1, _PR_ITERS + 1))
    + f"""
    SELECT node, pr_rank FROM i{_PR_ITERS}
    """
)


@register("q_pagerank_trade", oracle=_PAGERANK_ORACLE)
def q_pagerank_trade(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-point PageRank (3 iterations, d=0.85) over the undirected
    customer<->supplier trade graph from orders x lineitem — the
    iterative-algorithm-as-joins pattern (operators/graph.py): each
    iteration is two equi-joins plus one exact-int64 aggregation; the
    oracle unrolls the identical integer arithmetic, so the attestation
    covers every iteration bit-for-bit, not just the fixed point."""
    from dns_log_transformer_spark.operators.caching import persist_tracked
    from dns_log_transformer_spark.operators.graph import pagerank_int

    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    # persist the join+distinct ONCE: the reverse-direction union scans
    # e0 twice, and pagerank scans the edge list iters+2 more times —
    # without the cache the expensive half of the lineage re-runs each
    # time (caller-owns-edge-caching, per the operator's contract)
    # nodes ride the 3 iterations as LONGS (customer 2k, supplier 2k+1
    # — disjoint by parity), decoded to the oracle's "c{k}"/"s{k}"
    # labels only in the final projection: every shuffle and join in
    # the iteration loop keys on an int64 instead of a string
    e0 = persist_tracked(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # NOT eagerly materialized: a build-time count() would move the
    # dominant edge-build cost outside any caller's timed action (the
    # (spark, sf) -> DataFrame contract stays lazy; only structurally
    # required actions — zipWithIndex offsets, codebook collects — run
    # at build). Both directions are emitted by ONE explode scan of e0
    # rather than a two-branch union: a union's branches race e0's
    # cache on the first action and can compute partitions twice; a
    # single 1->2 Generate scans the cached edge build exactly once.
    edges = e0.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    pr = pagerank_int(edges, iters=_PR_ITERS)
    return pr.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), F.expr("CAST(node div 2 AS LONG)").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s"), F.expr("CAST(node div 2 AS LONG)").cast("string"))
        )
        .alias("node"),
        "pr_rank",
    )


# ---------------------------------------------------------------------------
# Robust statistics: IQR outlier fences per group
# ---------------------------------------------------------------------------
@register(
    "q_iqr_outliers",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    q AS (
      SELECT o_orderpriority,
             QUANTILE_CONT(cents, 0.25) AS q1,
             QUANTILE_CONT(cents, 0.75) AS q3
      FROM c GROUP BY o_orderpriority)
    SELECT o.o_orderpriority,
           ROUND(q.q1, 2) AS q1_cents,
           ROUND(q.q3, 2) AS q3_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o.cents > q.q3 + 1.5 * (q.q3 - q.q1)
                           OR o.cents < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM c o JOIN q ON q.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority, q.q1, q.q3
    """,
)
def q_iqr_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey-fence outlier counts per priority class — the robust-stats
    screen (quartiles are insensitive to the outliers they detect,
    unlike mean/stddev z-scores). Quartiles run in the integer-CENTS
    domain (PLANS.md rule 5): quarter-fraction interpolants over
    integers are exact .0/.25/.5/.75 doubles, so the fences and the
    ROUND output are boundary-free on both engines (2-decimal dollar
    interpolants land on .xx5 rounding boundaries). Two passes: one
    array-percentile agg for the fences (5 rows, broadcast back), one
    conditional-sum agg for the counts; fence comparisons keep the
    oracle's exact expression shape (q3 + 1.5*(q3-q1), unrounded) so
    boundary rows classify identically."""
    orders = table(spark, sf, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    )
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile("cents", F.lit([0.25, 0.75])).alias("_q")
    ).select(
        "o_orderpriority",
        F.col("_q")[0].alias("_q1"),
        F.col("_q")[1].alias("_q3"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    hi = F.col("_q3") + 1.5 * iqr
    lo = F.col("_q1") - 1.5 * iqr
    joined = orders.join(F.broadcast(q), "o_orderpriority")
    return (
        joined.groupBy("o_orderpriority", "_q1", "_q3")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                (
                    (F.col("cents") > hi) | (F.col("cents") < lo)
                ).cast("long")
            ).cast("long").alias("n_outliers"),
        )
        .select(
            "o_orderpriority",
            F.round(F.col("_q1"), 2).alias("q1_cents"),
            F.round(F.col("_q3"), 2).alias("q3_cents"),
            "n_orders",
            "n_outliers",
        )
    )
