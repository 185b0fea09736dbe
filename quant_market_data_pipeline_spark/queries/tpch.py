"""Classic analytical join/agg queries on the TPC-H-ish star schema.

These exercise the engine's multi-table surface: selective scans with
pushed filters, broadcast dimension joins, shuffled fact joins, grouped
aggregation, and top-k — the shapes that dominate a 100 TB warehouse.
Patterned on TPC-H Q1/Q3/Q5/Q6 but adapted to the driver's column subset
(FIXTURES.md Group B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.functions.exact import (
    fin,
    money,
    money_avg,
    money_sum,
    one_minus,
    one_plus,
    sql_fin,
    sql_money,
    sql_money_avg,
    sql_money_sum,
    sql_one_minus,
    sql_one_plus,
)
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import configure_runtime
from quant_market_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, name, sf_dir)


# Exact decimal forms of the TPC-H money expressions (see functions/exact.py:
# float sums are partition-order-dependent; decimal sums hash-match the
# oracle bit-for-bit).
_DISC_PRICE = f"({sql_money('l_extendedprice')} * {sql_one_minus('l_discount')})"
_CHARGE = f"({_DISC_PRICE} * {sql_one_plus('l_tax')})"


def _disc_price():
    return money("l_extendedprice") * one_minus("l_discount")


def _charge():
    return _disc_price() * one_plus("l_tax")


@register(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_money_sum('l_quantity')} AS sum_qty,
       {sql_money_sum('l_extendedprice')} AS sum_base_price,
       {sql_fin(f'sum({_DISC_PRICE})')} AS sum_disc_price,
       {sql_fin(f'sum({_CHARGE})', 6)} AS sum_charge,
       {sql_money_avg('l_quantity')} AS avg_qty,
       {sql_money_avg('l_extendedprice')} AS avg_price,
       {sql_money_avg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: selective scan + grouped aggregation, map-side "
    "partial agg, 6-group output.",
)
def q_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(_disc_price()).alias("sum_disc_price"),
            # scale 6 = the charge expression's natural scale: the final
            # rescale must be lossless (a lossy one hits half-up vs
            # half-even tie divergence between engines)
            money_sum(_charge(), scale=6).alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            money_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS l_orderkey,
       {sql_fin(f'sum({_DISC_PRICE})')} AS revenue,
       o.o_orderdate AS o_orderdate, o.o_orderpriority AS o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 20
""",
    doc="TPC-H Q3 shape: filtered customer dim broadcast into "
    "orders-lineitem shuffle join, grouped revenue, top-k.",
)
def q_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(_disc_price()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )


@register(
    "regional_revenue",
    oracle=f"""
SELECT r.r_name AS r_name, n.n_name AS n_name,
       {sql_fin(f'sum({_DISC_PRICE})')} AS revenue,
       count(*) AS n_lineitems
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name, n.n_name
""",
    doc="TPC-H Q5 shape: snowflake of broadcast dims (region, nation, "
    "customer) into the fact join chain.",
)
def q_regional(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(dims), o["o_custkey"] == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            money_sum(_disc_price()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .select("r_name", "n_name", "revenue", "n_lineitems")
    )


@register(
    "forecast_revenue_change",
    oracle=f"""
SELECT {sql_fin(f"sum({sql_money('l_extendedprice')} * CAST(l_discount AS DECIMAL(4,2)))")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 25
""",
    doc="TPC-H Q6 shape: all predicates pushed to the parquet scan, "
    "single global aggregate.",
)
def q_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            money_sum(
                money("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)")
            ).alias("revenue")
        )
    )


@register(
    "returned_item_revenue",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {sql_fin(f'sum({_DISC_PRICE})')} AS revenue,
       round(c_acctbal, 6) AS acctbal,
       count(*) AS n_items
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer — selective "
    "fact filters pushed to the scan, shuffled fact-fact join on "
    "orderkey, broadcast customer/nation dims.",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            money_sum(_disc_price()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 6).alias("acctbal"),
            "n_items",
        )
    )


@register(
    "large_volume_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 180
)
SELECT c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 6) AS total_price,
       {sql_money_sum('l_quantity')} AS sum_qty
FROM orders
JOIN big ON big.l_orderkey = o_orderkey
JOIN lineitem ON lineitem.l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
    doc="TPC-H Q18 shape: HAVING-gated aggregate feeding a semi-style "
    "join back to the fact — the two-pass big-order pattern.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 180)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(money_sum("l_quantity").alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 6).alias("total_price"),
            "sum_qty",
        )
    )


@register(
    "brand_supplier_stats",
    oracle=f"""
SELECT p_brand, p_type,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_lineitems,
       {sql_money_avg('p_retailprice')} AS avg_retail
FROM part
JOIN lineitem ON l_partkey = p_partkey
WHERE p_size >= 20
GROUP BY p_brand, p_type
""",
    doc="TPC-H Q16 shape: distinct-supplier counts per brand/type over a "
    "filtered part dim joined to the fact (broadcast dim, distinct agg).",
)
def q_brand_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
            money_avg("p_retailprice").alias("avg_retail"),
        )
    )


@register(
    "nation_trade_volume",
    oracle=f"""
SELECT n_c.n_name AS cust_nation, n_s.n_name AS supp_nation,
       count(*) AS n_lineitems,
       {sql_fin(f'sum({_DISC_PRICE})')} AS volume
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n_c ON n_c.n_nationkey = c_nationkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n_s ON n_s.n_nationkey = s_nationkey
WHERE n_c.n_name <> n_s.n_name
GROUP BY 1, 2
""",
    doc="TPC-H Q7 shape: cross-border trade volume between customer and "
    "supplier nations — the same dimension broadcast twice under "
    "different roles; only the fact-fact orderkey join shuffles.",
)
def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n_c = nation.select(
        F.col("n_nationkey").alias("nk_c"), F.col("n_name").alias("cust_nation")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("nk_s"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n_c), cust["c_nationkey"] == F.col("nk_c"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n_s), supp["s_nationkey"] == F.col("nk_s"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            money_sum(_disc_price()).alias("volume"),
        )
    )


@register(
    "above_avg_orders",
    oracle=f"""
SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS total_price,
       cust_avg
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         {sql_fin(f"sum({sql_money('o_totalprice')}) OVER (PARTITION BY o_custkey)")}
           / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
WHERE o_totalprice > 1.5 * cust_avg
""",
    doc="Correlated-subquery shape (orders above 1.5x their customer's "
    "average) decorrelated into one window pass — no per-row subquery, "
    "no self-join.  The per-customer mean is an exact decimal sum over "
    "the window divided by the window count, so the 1.5x threshold "
    "comparison is engine-deterministic even at exact ties.",
)
def q_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = fin(F.sum(money("o_totalprice")).over(w)) / F.count(
        F.lit(1)
    ).over(w)
    return (
        orders.withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 6).alias("total_price"),
            "cust_avg",
        )
    )


@register(
    "order_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: priority counts for a date window of orders with "
    "at least one lineitem shipped after the order date — semi join with "
    "a cross-table predicate, window filter pushed to the orders scan.",
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == orders["o_orderkey"]) & (
        li["l_shipdate"] > orders["o_orderdate"]
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "cumulative_monthly_revenue",
    oracle=f"""
WITH monthly AS (
  SELECT n_name,
         date_trunc('month', o_orderdate)::TIMESTAMP AS month,
         {sql_money_sum('o_totalprice')} AS revenue
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  WHERE year(o_orderdate) = 1998
  GROUP BY 1, 2
)
SELECT n_name, month, revenue,
       {sql_fin('''sum(CAST(revenue AS DECIMAL(18,4))) OVER (
         PARTITION BY n_name ORDER BY month
         ROWS UNBOUNDED PRECEDING)''')} AS cum_revenue
FROM monthly
""",
    doc="Cumulative (running-total) window over a pre-aggregated monthly "
    "rollup — aggregate first, window the small frame; never window the "
    "raw fact.",
)
def q_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1998
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    monthly = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # revenue is a double holding an exact 4-decimal value; the running
    # total re-enters decimal space so the cumulative sum is exact too.
    return monthly.withColumn(
        "cum_revenue", fin(F.sum(F.col("revenue").cast("decimal(18,4)")).over(w))
    )


@register(
    "promo_revenue_ratio",
    oracle=f"""
SELECT date_trunc('month', l_shipdate)::TIMESTAMP AS ship_month,
       {sql_fin(f"sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,4)) END)")} AS promo_revenue,
       {sql_fin(f'sum({_DISC_PRICE})')} AS total_revenue,
       round(100.0 * {sql_fin(f"sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,4)) END)")}
                   / {sql_fin(f'sum({_DISC_PRICE})')}, 6) AS promo_pct
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
    doc="TPC-H Q14 shape: promotion revenue share per ship month — "
    "conditional decimal aggregate over a broadcast part join; the ratio "
    "is one double division of two exact sums (deterministic), rounded "
    "identically in both engines.",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    total = F.sum(_disc_price())
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            fin(promo).alias("promo_revenue"),
            fin(total).alias("total_revenue"),
            F.round(100.0 * fin(promo) / fin(total), 6).alias("promo_pct"),
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: order-count distribution over a LEFT OUTER "
    "customer-orders join — zero-order customers survive as c_count=0; "
    "two-level integer aggregation, no float anywhere.",
)
def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "top_supplier_revenue",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, {sql_fin(f'sum({_DISC_PRICE})')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    doc="TPC-H Q15 shape: quarterly revenue per supplier, keep the "
    "argmax supplier(s).  The max is taken over the tiny post-aggregate "
    "frame (|suppliers| rows) via a global window, never over the fact; "
    "equality on exact decimal-derived doubles is deterministic.",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        money_sum(_disc_price()).alias("total_revenue")
    )
    best = F.max("total_revenue").over(Window.partitionBy())
    return (
        rev.withColumn("__best", best)
        .filter(F.col("total_revenue") == F.col("__best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "small_qty_avg_revenue",
    oracle=f"""
SELECT p_brand,
       round({sql_fin('sum(CAST(l_extendedprice AS DECIMAL(12,2)))')} / 7.0, 6)
         AS avg_yearly,
       count(*) AS n_items
FROM (
  SELECT p_brand, l_extendedprice, l_quantity,
         {sql_fin('sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (PARTITION BY p_partkey)')}
           / count(*) OVER (PARTITION BY p_partkey) AS avg_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand IN ('Brand#9', 'Brand#13')
)
WHERE l_quantity < 0.5 * avg_qty
GROUP BY p_brand
""",
    doc="TPC-H Q17 shape: revenue impact of small-quantity orders — the "
    "per-part average-quantity correlated subquery decorrelated into one "
    "window over the brand-filtered join (no per-row subquery, no "
    "second scan of the fact).",
)
def q_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#9", "Brand#13")
    )
    w = Window.partitionBy("p_partkey")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    avg_qty = fin(F.sum(money("l_quantity")).over(w)) / F.count(F.lit(1)).over(w)
    return (
        joined.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            F.round(money_sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "nation_year_revenue",
    oracle=f"""
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       {sql_fin(f'sum({_DISC_PRICE})')} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN part ON p_partkey = l_partkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape (adapted: no partsupp table, so revenue stands in "
    "for profit): per supplier-nation per year over a LIKE-filtered part "
    "dim — two broadcast dims on the fact, substring filter evaluated "
    "before the join.",
)
def q_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            money_sum(_disc_price()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "idle_rich_customers",
    oracle=f"""
SELECT c_mktsegment, count(*) AS numcust,
       {sql_money_sum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT {sql_fin("sum(CAST(c_acctbal AS DECIMAL(12,2)))")} / count(*)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
    doc="TPC-H Q22 shape (adapted: mktsegment stands in for the phone "
    "country code): above-average-balance customers with no orders — "
    "exact-decimal global average broadcast as a 1-row frame (no "
    "driver-side collect), anti join against orders.",
)
def q_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((fin(F.sum(money("c_acctbal"))) / F.count(F.lit(1))).alias("__avg"))
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "bracket_revenue",
    oracle=f"""
SELECT {sql_fin(f'sum({_DISC_PRICE})')} AS revenue, count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_type  = 'PROMO'    AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25)
""",
    doc="TPC-H Q19 shape: disjunctive multi-bracket predicate spanning "
    "both join sides — the per-side conjuncts (p_size/p_brand on part, "
    "none liftable on lineitem without losing rows) stay with the "
    "broadcast join; revenue over the OR of three brackets.",
)
def q_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    b3 = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(20, 50)
        & (F.col("l_quantity") >= 25)
    )
    return joined.filter(b1 | b2 | b3).agg(
        money_sum(_disc_price()).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "revenue_mom_growth",
    oracle=f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
         {sql_money_sum('o_totalprice')} AS revenue
  FROM orders
  GROUP BY 1
)
SELECT month, revenue,
       round(revenue - lag(revenue) OVER (ORDER BY month), 4) AS mom_delta,
       round(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month), 6) AS mom_pct
FROM monthly
""",
    doc="Month-over-month growth: LAG over the pre-aggregated monthly "
    "rollup (|months| rows — the single-partition window is over the "
    "tiny post-aggregate frame, never the fact).  Deltas of exact "
    "decimal-derived doubles; the pct is one double division, rounded "
    "identically both engines.",
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    w = Window.partitionBy().orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 4).alias("mom_delta"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 6).alias("mom_pct"),
    )


@register(
    "sql_lateral_top2_orders",
    oracle="""
SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
       t.o_orderkey AS o_orderkey,
       round(t.o_totalprice, 6) AS total_price
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice
              FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 2) t
WHERE c.c_custkey <= 200
""",
    doc="SQL-API surface: the whole registry drives Catalyst through the "
    "DataFrame API; this query enters through ``spark.sql`` with temp "
    "views and a correlated LATERAL subquery (top-2 orders per "
    "customer).  Catalyst decorrelates the lateral into the same "
    "window/top-k plan the DataFrame form produces — one optimizer, "
    "two front doors; both scale identically.",
)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("v_customer")
    orders.createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               t.o_orderkey,
               round(t.o_totalprice, 6) AS total_price
        FROM v_customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM v_orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        WHERE c.c_custkey <= 200
        """
    )


@register(
    "market_share_q8",
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       {sql_fin(f"sum(CASE WHEN n2.n_name = 'NATION_2' THEN {_DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,4)) END)")} AS nation_volume,
       {sql_fin(f'sum({_DISC_PRICE})')} AS total_volume,
       round({sql_fin(f"sum(CASE WHEN n2.n_name = 'NATION_2' THEN {_DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,4)) END)")}
             / {sql_fin(f'sum({_DISC_PRICE})')}, 6) AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
GROUP BY 1
""",
    doc="TPC-H Q8 shape (national market share): NATION_2 suppliers' "
    "share of the ASIA-region STANDARD-part market per order year.  One "
    "fact-fact shuffle join (lineitem-orders); part/supplier/customer/"
    "nation/region all broadcast; share = one double division of two "
    "exact conditional decimal sums (promo_revenue_ratio discipline).  "
    "Reference analog: the revenue-attribution rollups of "
    "project/transform_data.py generalized to a dual-dimension-role "
    "join (nation joins twice: customer side and supplier side).",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    fact = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), cust["c_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region["r_regionkey"])
        .join(F.broadcast(n2), supp["s_nationkey"] == F.col("n2_key"))
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", _disc_price()).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    total_vol = F.sum(_disc_price())
    return fact.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        fin(nation_vol).alias("nation_volume"),
        fin(total_vol).alias("total_volume"),
        F.round(fin(nation_vol) / fin(total_vol), 6).alias("mkt_share"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence with lift (parts co-ordered).
# ---------------------------------------------------------------------------
@register(
    "copurchase_lift",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
co AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS n_co
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), pc AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part FROM li GROUP BY 1
), tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT p1, p2, n_co,
       pa.n_part AS n_p1, pb.n_part AS n_p2,
       round(CAST(n_co AS DOUBLE) * n_orders
             / (pa.n_part * pb.n_part), 6) AS lift
FROM co
JOIN pc pa ON pa.l_partkey = p1
JOIN pc pb ON pb.l_partkey = p2
CROSS JOIN tot
WHERE n_co >= 2
""",
    doc="Market-basket analysis over the order->part bipartite graph: "
    "co-purchase counts by self-joining the (orderkey, partkey) edge "
    "list on orderkey, lift = P(a,b)/(P(a)P(b)) from the marginal "
    "part frequencies.  Scale shape: the self-join is keyed on "
    "orderkey, so in-order cart size bounds the per-key quadratic "
    "(TPC-H carts are <= 7 lines; a general pipeline caps cart size "
    "first -- same bound the LSH bucket cap enforces).  The marginals "
    "join back on partkey (uniform), the order total rides in as a "
    "1-row broadcast, and n_co >= 2 cuts the long random tail before "
    "the marginal join, not after.",
)
def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    pc = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    tot = li.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    return (
        co.join(pc.select(F.col("l_partkey").alias("p1"),
                          F.col("n_part").alias("n_p1")), "p1")
        .join(pc.select(F.col("l_partkey").alias("p2"),
                        F.col("n_part").alias("n_p2")), "p2")
        .crossJoin(F.broadcast(tot))
        .select(
            "p1", "p2", "n_co", "n_p1", "n_p2",
            F.round(
                F.col("n_co").cast("double") * F.col("n_orders")
                / (F.col("n_p1") * F.col("n_p2")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Bucketed-layout co-located join (shuffle-free fact-fact join).
# ---------------------------------------------------------------------------
@register(
    "bucketed_join_priority_revenue",
    oracle=f"""
SELECT o_orderpriority,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       {sql_fin(f'sum({_DISC_PRICE})')} AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    doc="The bucketing scale pattern: both fact tables are written "
    "bucketed (and bucket-sorted) on the join key, so the orders-"
    "lineitem join needs NO Exchange at read time -- at 100 TB this is "
    "the difference between re-shuffling the fact table on every "
    "nightly join and doing it once at layout time.  The query writes "
    "both sides with bucketBy(8, orderkey) + sortBy, reads them back "
    "through the catalog, joins bucket-to-bucket, and aggregates "
    "revenue per priority; tests/test_plans.py pins the no-Exchange "
    "plan property.  Results are identical to the plain join (the "
    "oracle runs the unbucketed SQL).",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    base = tempfile.mkdtemp(prefix="qmdps_bucketed_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    for name, df, key in (
        ("qmdps_orders_bkt", orders, "o_orderkey"),
        ("qmdps_lineitem_bkt", li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.format("parquet")
            .mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{base}/{name}")
            .saveAsTable(name)
        )
    o = spark.table("qmdps_orders_bkt")
    l = spark.table("qmdps_lineitem_bkt")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_orderkey").alias("n_orders"),
            fin(F.sum(_disc_price())).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (r10): suppliers who kept orders waiting.  The hardest
# relational shape in the suite — a correlated EXISTS and a correlated
# NOT EXISTS, BOTH self-joining the fact table, under a dimension join.
# The fixture carries no commit/receipt dates, so "late" is adapted to
# l_shipdate > o_orderdate + 60 days (the shape, not the constant, is
# what the query demonstrates); partsupp-dependent Q2/Q11/Q20 are the
# only TPC-H relational shapes the fixture cannot express at all.
# ---------------------------------------------------------------------------
@register(
    "waiting_supplier_q21",
    oracle="""
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, n.n_name, count(*)::BIGINT AS numwait
FROM li l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s.s_name
""",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): for "
    "finished orders, count per supplier the late lineitems where at "
    "least one OTHER supplier participated (EXISTS self-join) but no "
    "other supplier was ALSO late (NOT EXISTS self-join) — the "
    "sole-blame attribution query.  Spark plan: one (orderkey, suppkey, "
    "late) reduction of the fact (the three correlated references all "
    "read THIS frame, localCheckpointed once), EXISTS as a left-semi "
    "and NOT EXISTS as a left-anti join, both equi on l_orderkey with "
    "the suppkey inequality as a residual — hash-partitionable, no "
    "cartesian anywhere; supplier/nation broadcast.  Lateness is "
    "adapted to shipdate > orderdate + 60 days (fixture has no "
    "commit/receipt dates).  At 100 TB: the fact reduces before any "
    "self-join, both self-joins share the orderkey partitioning, and "
    "the output is supplier-dimension-sized.",
)
def q_waiting_supplier_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.session import materialize_corpus

    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return _q21_semi_anti(spark, sf_dir, orders, materialize_corpus)


def _q21_reduced_fact(spark, sf_dir, orders, materialize_corpus):
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    # all correlated references read this reduced frame — truncate once
    return materialize_corpus(li)


def _q21_dim_rollup(spark, sf_dir, sole: DataFrame) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        sole.join(
            F.broadcast(supp), sole["l_suppkey"] == supp["s_suppkey"]
        )
        .join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


def _q21_semi_anti(spark, sf_dir, orders, materialize_corpus) -> DataFrame:
    li = _q21_reduced_fact(spark, sf_dir, orders, materialize_corpus)

    l1 = li.filter(F.col("late"))
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        "late",
    )
    exists_other = (others["o2_orderkey"] == l1["l_orderkey"]) & (
        others["o2_suppkey"] != l1["l_suppkey"]
    )
    blamed = l1.join(others, exists_other, "left_semi")
    late_others = others.filter(F.col("late"))
    not_exists_other_late = (
        late_others["o2_orderkey"] == blamed["l_orderkey"]
    ) & (late_others["o2_suppkey"] != blamed["l_suppkey"])
    sole = blamed.join(late_others, not_exists_other_late, "left_anti")
    return _q21_dim_rollup(spark, sf_dir, sole)


# ---------------------------------------------------------------------------
# Q21 skew-safe variant (r11 stretch probe finding).  The semi/anti
# formulation puts the full per-order lineitem population on the BUILD
# (right) side of both joins — and AQE's OptimizeSkewedJoin can only
# split the LEFT side of a LeftSemi/LeftAnti (splitting the build side
# would change semantics), so a hot orderkey's rows serialize into ONE
# task no matter the config (measured: tools/q21_skew_probe.py, 2M-row
# hot order, zero skew=true markers even with forceOptimizeSkewedJoin).
# The scale-correct formulation turns both correlated predicates into
# per-order AGGREGATES: EXISTS(other supplier) <=> distinct suppliers
# on the order >= 2; NOT EXISTS(other late supplier) <=> the late rows
# name exactly one distinct supplier (l1 itself is late, so "no other"
# = "exactly one").  Distinct-aggregation partially aggregates map-side
# — the hot order's 2M rows collapse to <= n_suppliers pairs per map
# task BEFORE the exchange — and the stats join's build side carries
# ONE row per order, so the skew class is eliminated, not mitigated.
# ---------------------------------------------------------------------------
@register(
    "waiting_supplier_q21_skewsafe",
    oracle="""
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, n.n_name, count(*)::BIGINT AS numwait
FROM li l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s.s_name
""",
    doc="Skew-safe Q21: identical semantics to waiting_supplier_q21 "
    "(the oracle is the same correlated EXISTS/NOT EXISTS SQL), but "
    "the correlated predicates compute as per-order aggregates — "
    "n_supp = countDistinct(suppkey) >= 2 for the EXISTS leg, "
    "n_late_supp = countDistinct(suppkey) over late rows == 1 for the "
    "NOT EXISTS leg (the counted row is itself late, so 'no OTHER "
    "late supplier' is 'exactly one distinct late supplier').  Why it "
    "exists: the semi/anti formulation puts the whole per-order "
    "population on the BUILD side of both joins, and AQE skew "
    "splitting only applies to the LEFT side of LeftSemi/LeftAnti — "
    "measured on a 2M-row hot order (tools/q21_skew_probe.py): zero "
    "skew=true markers even forced, the hot order serializes in one "
    "task.  Here distinct aggregation partially aggregates map-side "
    "(the hot order collapses to <= n_suppliers pairs per map task "
    "before the exchange) and the stats join's build side is one row "
    "per order — the skew class is structurally gone.  At 100 TB this "
    "is the formulation to run; the semi/anti twin stays registered "
    "as the textbook correlated-subquery plan shape.",
)
def q_waiting_supplier_q21_skewsafe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from quant_market_data_pipeline_spark.session import materialize_corpus

    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = _q21_reduced_fact(spark, sf_dir, orders, materialize_corpus)
    stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    l1 = li.filter(F.col("late"))
    sole = l1.join(stats, "l_orderkey").filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return _q21_dim_rollup(spark, sf_dir, sole)
