"""Relational operator families beyond the reference surface.

SURVEY.md §2.3 notes the reference has "no theta, range, as-of, semi,
outer, or interval joins" and §2.4 "no grouping sets / cube / rollup, no
distinct-agg" — a complete engine exposes them anyway (all Catalyst
built-ins; pair research and DQ reporting need them).  Each query pins the
semantics with a DuckDB oracle.

Scale notes per operator are in the individual docstrings; the common
theme: every join here is an equi-join (hash-partitionable) or carries an
equi prefix (the range join), dimension sides are broadcast, and
aggregations are partial-agg friendly (map-side combine before the
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.functions.exact import (
    money,
    money_avg,
    money_sum,
    sql_money,
    sql_money_avg,
    sql_money_sum,
)
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import configure_runtime
from quant_market_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Semi join: orders with at least one heavy lineitem.  Semi joins beat
# join+distinct at scale: the build side stores keys only and each probe
# row emits at most once (no fan-out, no post-dedup shuffle).
# ---------------------------------------------------------------------------
@register(
    "semi_join_heavy_orders",
    oracle="""
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 6) AS total_price
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
""",
    doc="Left-semi join (EXISTS): orders having >= 1 lineitem with "
    "quantity > 45; probe-side rows emit at most once.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    heavy = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return orders.join(
        heavy, orders["o_orderkey"] == heavy["l_orderkey"], "left_semi"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 6).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Full outer join: nation coverage of customers vs suppliers.  Aggregate
# FIRST (tiny per-key frames), then outer-join the aggregates — never
# outer-join the raw fact tables.
# ---------------------------------------------------------------------------
@register(
    "full_outer_nation_coverage",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
           FROM customer GROUP BY 1),
s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
      FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    doc="Full outer join of two pre-aggregated per-nation counts with "
    "coalesce'd keys — aggregate-then-join keeps the outer join tiny.",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = cust.join(supp, cust["nk"] == supp["nk"], "full_outer")
    return joined.select(
        F.coalesce(cust["nk"], supp["nk"]).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# Range join with an equi prefix: events within 3 days after the order,
# by the same user/customer key.  The equi key (user = cust) makes this
# hash-partitionable; the range predicate evaluates post-shuffle, so no
# O(n*m) explosion — the degenerate interval-join pattern.
# ---------------------------------------------------------------------------
@register(
    "range_join_view_purchase",
    oracle="""
SELECT v.event_id AS view_id, count(*) AS n_purchases,
       round(sum(p.value), 6) AS purchased_value
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
GROUP BY 1
""",
    doc="Equi+range join (attribution funnel): purchases by the same user "
    "within 1 hour after each view; the equi prefix (user_id) keeps it "
    "hash-partitionable — the range predicate filters post-shuffle.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    cond = (
        (purchases["user_id"] == views["v_user"])
        & (purchases["ts"] > views["v_ts"])
        & (purchases["ts"] <= views["v_ts"] + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        views.join(purchases, cond)
        .groupBy("view_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 6).alias("purchased_value"),
        )
    )


# ---------------------------------------------------------------------------
# Rollup / cube: hierarchical + full-lattice subtotals in ONE pass.
# Spark expands grouping sets before the partial aggregate, so subtotals
# ride the same single shuffle as the base aggregation.
# ---------------------------------------------------------------------------
@register(
    "rollup_regional_revenue",
    oracle=f"""
SELECT r_name, n_name,
       grouping(r_name) AS g_region, grouping(n_name) AS g_nation,
       {sql_money_sum('o_totalprice')} AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    doc="ROLLUP (region -> nation -> grand total) over the order fact "
    "joined through broadcast dims; GROUPING() flags disambiguate real "
    "NULLs from subtotal rows.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    fact = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return fact.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        money_sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "cube_status_priority",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_priority,
       count(*) AS n_orders,
       {sql_money_avg('o_totalprice')} AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE over (status, priority): all 4 grouping sets in one shuffle.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        money_avg("o_totalprice").alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Pivot: long -> wide with explicit value list (explicit values keep the
# plan static — no extra distinct-values job, mandatory at scale).
# ---------------------------------------------------------------------------
@register(
    "pivot_status_revenue",
    oracle=f"""
SELECT o_orderpriority,
       {sql_money_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")}
         AS rev_f,
       {sql_money_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")}
         AS rev_o,
       {sql_money_sum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")}
         AS rev_p
FROM orders GROUP BY o_orderpriority
""",
    doc="Pivot order status into revenue columns; explicit pivot values "
    "avoid the pre-pass distinct scan.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(money_sum("o_totalprice"))
    )
    return wide.select(
        "o_orderpriority",
        F.col("F").alias("rev_f"),
        F.col("O").alias("rev_o"),
        F.col("P").alias("rev_p"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated, a sort-based aggregate).  At 100 TB
# use approx_percentile for the same shape at sketch cost; the exact form
# is the oracle-checkable semantic anchor.
# ---------------------------------------------------------------------------
@register(
    "percentiles_quantity",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS p50,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90,
       round(quantile_cont(l_quantity, 0.99), 6) AS p99,
       round(min(l_quantity), 6) AS min_qty,
       round(max(l_quantity), 6) AS max_qty
FROM lineitem GROUP BY l_returnflag
""",
    doc="Exact interpolated percentiles (p50/p90/p99) per return flag — "
    "percentile_cont semantics on both engines.",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("l_quantity", F.lit(0.99)), 6).alias("p99"),
        F.round(F.min("l_quantity"), 6).alias("min_qty"),
        F.round(F.max("l_quantity"), 6).alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# Distinct aggregation: Spark rewrites count(DISTINCT x) into a two-phase
# expand+agg — still one logical pass, no driver-side dedup.
# ---------------------------------------------------------------------------
@register(
    "distinct_agg_parts",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    doc="Multi-column distinct aggregation (expand + two-phase agg); the "
    "exact anchor for approx_count_distinct at scale.",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Set operations: EXCEPT / INTERSECT (set semantics, dedup built in).
# ---------------------------------------------------------------------------
@register(
    "except_churned_customers",
    oracle="""
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 2001
""",
    doc="EXCEPT (churn cohort): customers active in 1995 but not in 2001 "
    "(set difference on keys; plans as aggregate + anti join).",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    c95 = orders.filter(yr == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    c01 = orders.filter(yr == 2001).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c95.subtract(c01)  # EXCEPT == set difference w/ dedup


@register(
    "intersect_buyer_event_users",
    oracle="""
SELECT o_custkey AS user_key FROM orders
INTERSECT
SELECT user_id AS user_key FROM events
""",
    doc="INTERSECT: keys present in both the order fact and the event "
    "stream (set semantics).",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    buyers = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_key")
    )
    users = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("user_key")
    )
    return buyers.intersect(users)


# ---------------------------------------------------------------------------
# Extended ranking windows: ntile / percent_rank / cume_dist — single sort
# per partition serves all four functions.
# ---------------------------------------------------------------------------
@register(
    "window_rank_suite",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         round(o_totalprice, 6) AS total_price,
         row_number() OVER w AS rn,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT * FROM ranked WHERE rn <= 50
""",
    doc="Ranking suite (row_number / ntile / percent_rank / cume_dist) "
    "sharing one window sort; deterministic tiebreak on the key.",
)
def q_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("total_price"),
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter(F.col("rn") <= 50)
    )


# ---------------------------------------------------------------------------
# Nested array round-trip: collect_list into array<struct>, then explode —
# the bronze-payload shape (SURVEY §1.1: one JSON doc per symbol with a
# nested bars array; P1/P14 semantics) exercised end-to-end in one query.
# ---------------------------------------------------------------------------
@register(
    "nested_explode_bars",
    oracle="""
WITH nested AS (
  SELECT event_type,
         list({'ts': ts, 'value': value} ORDER BY ts, event_id) AS bars
  FROM events
  WHERE user_id < 50
  GROUP BY event_type
)
SELECT event_type, len(bars) AS n_bars,
       b.ts AS bar_ts, round(b.value, 6) AS bar_value
FROM nested, unnest(bars) AS t(b)
""",
    doc="Nested array<struct> build (collect_list w/ deterministic "
    "sort_array) + size + explode — the raw-JSON bronze shape "
    "(ingest_data.py:80-88, transform_data.py:47-49) as one query.",
)
def q_nested_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    nested = ev.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("bars")
    )
    return nested.select(
        "event_type",
        F.size("bars").alias("n_bars"),
        F.explode("bars").alias("b"),
    ).select(
        "event_type",
        "n_bars",
        F.col("b.ts").alias("bar_ts"),
        F.round(F.col("b.value"), 6).alias("bar_value"),
    )


# ---------------------------------------------------------------------------
# Sketches: the at-scale replacements for exact distinct / percentile.
# No DuckDB oracle — HLL/KLL estimates are engine-specific — so the
# driver records the weaker rows-only check; tests/test_sketches.py
# bounds the estimates against the exact twins instead.
# ---------------------------------------------------------------------------
@register(
    "approx_distinct_users",
    oracle="""
SELECT CAST(ts AS DATE) AS event_date,
       count(DISTINCT user_id) AS exact_users,
       count(DISTINCT event_type) AS exact_types,
       TRUE AS users_within_rsd,
       TRUE AS types_within_rsd,
       count(*) AS n_rows
FROM events
GROUP BY 1
""",
    doc="HyperLogLog++ distinct users/types per event day (rsd=0.01) — "
    "mergeable sketch state, one pass, no expand; the scale path for "
    "distinct_agg_parts.  Hash-checkable: alongside the sketch the query "
    "emits the exact distinct counts plus a within-tolerance boolean "
    "(|approx-exact|/exact <= 5%, generous vs the 1% rsd), so the oracle "
    "verifies the exact counts and TRUE while the sketch still runs.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.approx_count_distinct("event_type", 0.01).alias("approx_types"),
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("event_type").alias("exact_types"),
        F.count(F.lit(1)).alias("n_rows"),
    )

    def within(approx, exact):  # relative error gate, guards exact=0
        return (
            F.abs(F.col(approx) - F.col(exact))
            <= F.greatest(F.lit(1.0), F.col(exact) * F.lit(0.05))
        ).alias(approx.replace("approx", "") .strip("_") + "_within_rsd")

    return agg.select(
        "event_date",
        "exact_users",
        "exact_types",
        within("approx_users", "exact_users"),
        within("approx_types", "exact_types"),
        "n_rows",
    )


@register(
    "approx_percentile_prices",
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
       round(quantile_cont(o_totalprice, 0.9), 2) AS exact_p90,
       round(quantile_cont(o_totalprice, 0.99), 2) AS exact_p99,
       TRUE AS p50_within_tol,
       TRUE AS p90_within_tol,
       TRUE AS p99_within_tol,
       count(*) AS n_rows
FROM orders
GROUP BY o_orderstatus
""",
    doc="approx_percentile (Greenwald-Khanna, accuracy 10000) of order "
    "totals per status — the sketch twin of percentiles_quantity.  "
    "Hash-checkable (same discipline as approx_distinct_users): alongside "
    "the sketch the query emits the exact interpolated percentiles plus a "
    "within-tolerance boolean (|approx-exact| <= max(1, 5%·exact), "
    "generous vs the 1e-4 rank error), so the oracle verifies the exact "
    "values and TRUE while the GK sketch still runs.  Scalar doubles only "
    "— never an array cell (the driver's canonicalizer sorts on cell "
    "values and list cells are unhashable; round-2 harness crash).",
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    qs = F.approx_percentile(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
    )
    ex = F.percentile(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    agg = orders.groupBy("o_orderstatus").agg(
        qs.getItem(0).alias("a50"),
        qs.getItem(1).alias("a90"),
        qs.getItem(2).alias("a99"),
        ex.getItem(0).alias("e50"),
        ex.getItem(1).alias("e90"),
        ex.getItem(2).alias("e99"),
        F.count(F.lit(1)).alias("n_rows"),
    )

    def within(a: str, e: str, out: str):
        return (
            F.abs(F.col(a) - F.col(e))
            <= F.greatest(F.lit(1.0), F.col(e) * F.lit(0.05))
        ).alias(out)

    return agg.select(
        "o_orderstatus",
        F.round("e50", 2).alias("exact_p50"),
        F.round("e90", 2).alias("exact_p90"),
        F.round("e99", 2).alias("exact_p99"),
        within("a50", "e50", "p50_within_tol"),
        within("a90", "e90", "p90_within_tol"),
        within("a99", "e99", "p99_within_tol"),
        "n_rows",
    )


@register(
    "except_all_multiset",
    oracle="""
SELECT o_custkey AS ckey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT ALL
SELECT o_custkey AS ckey FROM orders WHERE year(o_orderdate) = 1997
""",
    doc="EXCEPT ALL (multiset difference): per-customer 1996 order count "
    "minus 1997 count, surviving occurrences kept — bag semantics the "
    "set-based EXCEPT can't express.",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    a = orders.filter(yr == 1996).select(F.col("o_custkey").alias("ckey"))
    b = orders.filter(yr == 1997).select(F.col("o_custkey").alias("ckey"))
    return a.exceptAll(b)


@register(
    "grouping_sets_revenue",
    oracle=f"""
SELECT r_name, n_name,
       grouping(r_name) AS g_region, grouping(n_name) AS g_nation,
       {sql_money_sum('o_totalprice')} AS revenue
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY GROUPING SETS ((r_name), (n_name), ())
""",
    doc="Explicit GROUPING SETS (region-only, nation-only, grand total — "
    "a lattice ROLLUP/CUBE can't express) in one shuffle via SQL on the "
    "joined frame.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    fact = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("r_name", "n_name", "o_totalprice")
    )
    fact.createOrReplaceTempView("__gs_fact")
    return fact.sparkSession.sql(
        f"""
        SELECT r_name, n_name,
               CAST(grouping(r_name) AS INT) AS g_region,
               CAST(grouping(n_name) AS INT) AS g_nation,
               {sql_money_sum('o_totalprice')} AS revenue
        FROM __gs_fact
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


@register(
    "group_concat_types",
    oracle="""
SELECT CAST(ts AS DATE) AS event_date,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_events
FROM events
GROUP BY 1
""",
    doc="LISTAGG/string_agg reporting shape: per-day sorted distinct "
    "symbol list as CSV — deterministic via sort_array(collect_set), "
    "the order-insensitive way to aggregate strings (bare collect_list "
    "concat is partition-order-dependent and would never hash-match).",
)
def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("types_csv"),
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "price_decile_profile",
    oracle="""
WITH bounds AS (
  SELECT quantile_cont(o_totalprice,
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
  FROM orders
), bucketed AS (
  SELECT o_totalprice,
         1 + len(list_filter(bs, b -> o_totalprice > b)) AS decile
  FROM orders, bounds
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       round(avg(o_totalprice), 6) AS avg_price
FROM bucketed GROUP BY decile
""",
    doc="Decile feature profile of order totals WITHOUT a global ntile: "
    "exact interpolated decile boundaries (one percentile aggregate, 9 "
    "doubles) broadcast back over the fact, bucket = 1 + #boundaries "
    "below the price (map-side, no sort), then a 10-group rollup.  This "
    "is the 100 TB substitute for ntile's single-reducer total order — "
    "the only global structure is a 9-element array.  Cross-engine "
    "boundary safety: where the interpolation fraction is 0 both "
    "engines emit the exact data value; otherwise the boundary falls "
    "strictly between two 2-decimal prices, so 1-ulp interpolation "
    "drift cannot flip a comparison.",
)
def q_price_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    qs = [i / 10 for i in range(1, 10)]
    bounds = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in qs])).alias(
            "bs"
        )
    )
    bucketed = orders.crossJoin(F.broadcast(bounds)).select(
        "o_totalprice",
        (
            F.lit(1)
            + F.size(
                F.filter(
                    "bs", lambda b: F.col("o_totalprice") > b
                )
            )
        ).alias("decile"),
    )
    return bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Date-partitioned lake layout + partition-pruned scan.
# ---------------------------------------------------------------------------
@register(
    "partitioned_lake_day_scan",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS value_sum
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
GROUP BY event_type
""",
    doc="The partition-pruning scale pattern: the tick stream is laid "
    "out partitioned by event_date (hive-style directories), and a "
    "one-day query prunes to ONE directory at planning time — at "
    "100 TB this is the difference between scanning a month and "
    "scanning 1/30th of it, before any row is read.  The query writes "
    "the date-partitioned lake to a temp dir, reads it back with an "
    "event_date equality filter, and aggregates per symbol; "
    "tests/test_plans.py pins PartitionFilters reaching the scan with "
    "PushedFilters empty (the predicate is resolved entirely against "
    "the directory tree).  Oracle = same day filter on the flat "
    "table.",
)
def q_partitioned_day_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    base = tempfile.mkdtemp(prefix="qmdps_partlake_")
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", F.to_date("ts").alias("event_date")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(base)
    lake = spark.read.parquet(base)
    return (
        lake.filter(F.col("event_date") == F.lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime pre-filter audit (r9).  THE shuffle-avoidance
# primitive for selective fact-dim joins at 100 TB: a bitmap built from
# the small key set is broadcast and applied MAP-SIDE to the fact scan,
# so rows that cannot join never enter the exchange.  Spark's own
# runtime row-group/bloom filters do this opaquely; this query builds
# one explicitly (seeded-md5 hash family, deterministic in both
# engines) and MEASURES the false-positive rate against exact
# membership next to the (fill-ratio)^k theoretical rate.
# ---------------------------------------------------------------------------
_BF_BITS = 1024
_BF_K = 3
# 63 usable bits per signed-long lane: DuckDB's ``<<`` is
# overflow-checked, so ``1::BIGINT << 63`` (the sign bit) raises
# Out of Range the first time a key hashes to bit 63 of a lane —
# found by the sf0.1 strict run.  ceil(1024/63) = 17 lanes.
_BF_LANE_BITS = 63
_BF_LANES = (_BF_BITS + _BF_LANE_BITS - 1) // _BF_LANE_BITS

def bf_pos_sql(r: str, k: str, bits: int) -> str:
    """DuckDB fragment: seeded-md5 Bloom bit position — ONE hash
    definition shared by the batch 1024-bit audit and the streamed
    filter (stream_bloom_e2e), parameterized only by the filter size
    (the cms_bucket_sql / qh_bin_sql single-source discipline)."""
    return (
        f"('0x' || substr(md5({r}::VARCHAR || '|' || {k}::VARCHAR),"
        f" 1, 15))::BIGINT % {bits}"
    )


def bf_pos_expr(r: int, k, bits: int):
    """Spark twin of bf_pos_sql — the register function of the Bloom
    filter.  A pure per-row map, so per-micro-batch lane partials
    OR-merge to exactly the batch-built filter."""
    from quant_market_data_pipeline_spark.llm.hashing import (
        seeded_md5_long,
    )

    return F.pmod(seeded_md5_long(r, k.cast("string")), F.lit(bits))


_BF_POS_SQL = bf_pos_sql("{r}", "{k}", _BF_BITS)
# interpolate _BF_LANE_BITS (not a literal 63) so editing the constant
# can never desync the oracle's lane math from the engine's (ADVICE r9)
_BF_LANE_EXPRS = ",\n         ".join(
    f"coalesce(bit_or(CASE WHEN pos // {_BF_LANE_BITS} = {lane} THEN "
    f"(1::BIGINT << CAST(pos % {_BF_LANE_BITS} AS INTEGER)) ELSE 0 END), 0)"
    f" AS lane{lane}"
    for lane in range(_BF_LANES)
)
_BF_LANE_LIST = "[" + ", ".join(f"lane{lane}" for lane in range(_BF_LANES)) + "]"
_BF_PASS_SQL = " AND ".join(
    f"((list_extract({_BF_LANE_LIST}, CAST(p{r} // {_BF_LANE_BITS} AS INTEGER) + 1)"
    f" >> CAST(p{r} % {_BF_LANE_BITS} AS INTEGER)) & 1) = 1"
    for r in range(_BF_K)
)
# DuckDB's bit_count returns TINYINT; summing 17 lanes of a filled
# filter overflows 127 (hit at grown sf1.0: 400 member keys -> ~700
# set bits) — widen each term before the addition.
_BF_BITS_SET = " + ".join(
    f"bit_count(lane{lane})::INTEGER" for lane in range(_BF_LANES)
)


@register(
    "bloom_filter_join_audit",
    oracle=f"""
WITH keyset AS (
  SELECT s_suppkey AS k FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
), pos AS (
  SELECT DISTINCT {_BF_POS_SQL.format(r="r.r", k="k")} AS pos
  FROM keyset, unnest([{", ".join(str(r) for r in range(_BF_K))}]) AS r(r)
), bitmap AS (
  SELECT {_BF_LANE_EXPRS}
  FROM pos
), hashed AS (
  SELECT l.l_suppkey AS k,
         {", ".join(_BF_POS_SQL.format(r=r, k="l.l_suppkey") + f" AS p{r}" for r in range(_BF_K))}
  FROM lineitem l
), probed AS (
  SELECT h.k,
         CASE WHEN h.k IN (SELECT k FROM keyset) THEN 1 ELSE 0 END
           AS member,
         CASE WHEN {_BF_PASS_SQL} THEN 1 ELSE 0 END AS bloom_pass
  FROM hashed h CROSS JOIN bitmap
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(member) AS BIGINT) AS n_member,
       CAST(sum(bloom_pass) AS BIGINT) AS n_bloom_pass,
       CAST(sum(bloom_pass * (1 - member)) AS BIGINT) AS n_false_pos,
       CAST(sum(member * (1 - bloom_pass)) AS BIGINT) AS n_false_neg,
       round(CAST(sum(bloom_pass * (1 - member)) AS DOUBLE)
             / NULLIF(count(*) - sum(member), 0), 6) AS fpr_measured,
       round((SELECT CAST(({_BF_BITS_SET}) AS DOUBLE) FROM bitmap)
             / {_BF_BITS}, 6) AS fill_ratio,
       round(power((SELECT CAST(({_BF_BITS_SET}) AS DOUBLE) FROM bitmap)
             / {_BF_BITS}, {_BF_K}), 6) AS fpr_theoretical
FROM probed
""",
    doc=f"Explicit Bloom-filter runtime pre-filter, measured: a "
    f"{_BF_BITS}-bit / {_BF_K}-hash filter (seeded-md5 family, "
    "llm/hashing.py — bit-identical in both engines) is built from one "
    "nation's supplier keys and applied to every lineitem row; output "
    "compares bloom verdicts to exact membership — false negatives "
    "MUST be 0 (the Bloom invariant, pinned by a test) and the "
    "measured false-positive rate sits next to the (fill_ratio)^k "
    "theoretical one.  Scale shape: the filter is ONE broadcast row of "
    f"{_BF_LANES} bigint lanes regardless of fact size, membership "
    "tests are pure map-side bit arithmetic on the scan (no exchange "
    "for the pre-filter), and the only shuffle is the final scalar "
    "rollup.  This is what Spark's runtime filters / DPP do opaquely; "
    "doing it explicitly gives the pipeline a tunable, auditable "
    "semi-join reducer for selective fact-dim joins.",
)
def q_bloom_filter_join_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = _t(spark, sf_dir, "supplier")
    keys = supp.join(
        F.broadcast(nation),
        supp.s_nationkey == nation.n_nationkey,
    ).select(F.col("s_suppkey").alias("k"))

    # shared register function (bf_pos_expr/_sql): ONE definition for
    # this audit and the streaming maintenance (stream_bloom_e2e)
    def positions(k: F.Column) -> list[F.Column]:
        return [bf_pos_expr(r, k, _BF_BITS) for r in range(_BF_K)]

    pos = keys.select(
        F.explode(F.array(*positions(F.col("k")))).alias("pos")
    ).distinct()
    bitmap = pos.select(
        "pos",
        F.floor(F.col("pos") / _BF_LANE_BITS).cast("int").alias("lane"),
        F.expr(f"shiftleft(1L, cast(pos % {_BF_LANE_BITS} as int))").alias("bit"),
    ).agg(
        *[
            F.coalesce(
                F.bit_or(
                    F.when(F.col("lane") == lane, F.col("bit")).otherwise(
                        F.lit(0).cast("long")
                    )
                ),
                F.lit(0).cast("long"),
            ).alias(f"lane{lane}")
            for lane in range(_BF_LANES)
        ]
    )
    fill = bitmap.select(
        (
            sum(F.bit_count(F.col(f"lane{lane}")) for lane in range(_BF_LANES))
            .cast("double")
            / F.lit(float(_BF_BITS))
        ).alias("fill")
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k")
    )
    flagged = li.join(
        F.broadcast(keys.withColumn("member", F.lit(1)).distinct()),
        "k",
        "left",
    )
    probed = flagged.crossJoin(F.broadcast(bitmap))
    for r, p in enumerate(positions(F.col("k"))):
        probed = probed.withColumn(f"p{r}", p)
    lane_of = {
        r: F.element_at(
            F.array(*[F.col(f"lane{lane}") for lane in range(_BF_LANES)]),
            (F.floor(F.col(f"p{r}") / _BF_LANE_BITS) + 1).cast("int"),
        )
        for r in range(_BF_K)
    }
    passes = [
        (
            F.expr(
                f"shiftright(__lane{r}, cast(p{r} % {_BF_LANE_BITS} as int)) & 1"
            )
            == 1
        )
        for r in range(_BF_K)
    ]
    for r in range(_BF_K):
        probed = probed.withColumn(f"__lane{r}", lane_of[r])
    bloom_pass = passes[0]
    for c in passes[1:]:
        bloom_pass = bloom_pass & c
    probed = probed.select(
        F.when(F.col("member").isNotNull(), 1).otherwise(0).alias("member"),
        F.when(bloom_pass, 1).otherwise(0).alias("bloom_pass"),
    )
    agg = probed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("member").cast("bigint").alias("n_member"),
        F.sum("bloom_pass").cast("bigint").alias("n_bloom_pass"),
        F.sum(F.col("bloom_pass") * (1 - F.col("member")))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum(F.col("member") * (1 - F.col("bloom_pass")))
        .cast("bigint")
        .alias("n_false_neg"),
    )
    return agg.crossJoin(F.broadcast(fill)).select(
        "n_rows",
        "n_member",
        "n_bloom_pass",
        "n_false_pos",
        "n_false_neg",
        F.round(
            F.col("n_false_pos").cast("double")
            / F.nullif(
                (F.col("n_rows") - F.col("n_member")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("fpr_measured"),
        F.round("fill", 6).alias("fill_ratio"),
        F.round(F.pow("fill", float(_BF_K)), 6).alias("fpr_theoretical"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count audit (r10).  THE cardinality sketch for
# 100 TB aggregation: one pass, m registers (here 512 longs), mergeable
# across partitions (max is associative+commutative, so partial
# aggregation happens map-side and the exchange carries one register
# set per partition).  Spark ships approx_count_distinct on the same
# algorithm, but its HLL++ internals are not oracle-reproducible; this
# query builds the sketch FROM SCRATCH with a deterministic md5 hash so
# DuckDB computes the byte-identical estimate, and AUDITS it against
# the exact count — the countmin/bloom pattern applied to cardinality.
#
# Determinism discipline: register sums run in INTEGER space — register
# value rho contributes 2^(44-rho) to an exact BIGINT sum (max 512*2^44
# = 2^53, no overflow), so the harmonic mean is order-insensitive;
# bit_length is computed by bit-smear + bit_count (no float log2, whose
# floor can be off-by-one at exact powers in either engine).
# ---------------------------------------------------------------------------
_HLL_P = 9
_HLL_M = 1 << _HLL_P  # 512 registers
_HLL_WBITS = 52 - _HLL_P  # 43-bit rho window from a 52-bit md5 prefix
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# One double literal shared by both engines.  Registers contribute
# 2^(44-rho) to the EXACT integer harmonic sum (empty register: rho=0
# -> 2^44), i.e. sum_int = 2^44 * sum(2^-M[j]); the standard raw
# estimate alpha*m^2 / sum(2^-M[j]) therefore needs alpha*m^2 * 2^44
# in the numerator — 2^(WBITS+1), NOT 2^WBITS (rho ranges 1..44 over a
# 43-bit window: rho = 43 - bitlen(w) + 1).
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_WBITS + 1))
_HLL_LC_GATE = 2.5 * _HLL_M  # raw estimate below this + empty regs -> LC


def _hll_col_sql(col: str) -> str:
    """DuckDB CTE body: HLL estimate + exact count for one column."""
    return f"""(
  WITH h AS (
    SELECT ('0x' || substr(md5(CAST({col} AS STRING)), 1, 13))::BIGINT AS hv
    FROM events
  ), rho AS (
    SELECT hv & {_HLL_M - 1} AS bucket,
           {44} - bit_count({_smear_sql_inline()})::INTEGER AS rho
    FROM (SELECT hv, hv >> {_HLL_P} AS w FROM h)
  ), regs AS (
    SELECT bucket, max(rho) AS rho_max FROM rho GROUP BY bucket
  ), summed AS (
    SELECT sum(1::BIGINT << (44 - rho_max))::BIGINT AS sum_occ,
           count(*)::BIGINT AS n_occ
    FROM regs
  ), est AS (
    SELECT ({_HLL_M} - n_occ)::BIGINT AS zero_registers,
           sum_occ + ({_HLL_M} - n_occ) * (1::BIGINT << 44) AS sum_int
    FROM summed
  ), raw AS (
    SELECT zero_registers,
           {_HLL_NUM!r} / sum_int AS raw_e
    FROM est
  )
  SELECT '{col}' AS col_name,
         (SELECT count(DISTINCT {col})::BIGINT FROM events) AS n_exact,
         CASE WHEN raw_e <= {_HLL_LC_GATE!r} AND zero_registers > 0
              THEN round({float(_HLL_M)!r} * ln({float(_HLL_M)!r} / zero_registers), 4)
              ELSE round(raw_e, 4) END AS hll_estimate,
         zero_registers
  FROM raw
)"""


def _smear_sql_inline() -> str:
    smear = "w"
    for s in (1, 2, 4, 8, 16, 32):
        smear = f"({smear} | ({smear} >> {s}))"
    return smear


def hll_rho_frame(df: DataFrame, col: str, keys: list[str]) -> DataFrame:
    """(keys..., bucket, rho) for every row — the HLL register update
    stream.  Deterministic md5 hash, bit-smear bit_length (no float
    log2); shared by the batch audit and the incremental streaming
    maintenance query (stream_hll_distinct_e2e), whose parity RESTS on
    this being the identical register function."""

    def _bitlen(c):
        v = c
        for s in (1, 2, 4, 8, 16, 32):
            v = v.bitwiseOR(F.shiftrightunsigned(v, s))
        return F.bit_count(v)

    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 13), 16, 10
    ).cast("long")
    return df.select(*keys, h.alias("hv")).select(
        *keys,
        F.col("hv").bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"),
        (
            F.lit(44)
            - _bitlen(F.shiftrightunsigned("hv", _HLL_P)).cast("int")
        ).alias("rho"),
    )


def hll_estimate_from_regs(regs: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., hll_estimate, zero_registers) from merged registers
    (keys..., bucket, rho_max).  The harmonic denominator is an EXACT
    integer sum (rho contributes 2^(44-rho); <= 512*2^44 = 2^53), so
    the estimate is independent of partitioning, merge order and — for
    the streaming consumer — micro-batch boundaries."""
    grouped = regs.groupBy(*keys) if keys else regs.groupBy()
    summed = grouped.agg(
        F.sum(F.expr("shiftleft(1L, 44 - rho_max)"))
        .cast("bigint")
        .alias("sum_occ"),
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
    )
    est = summed.select(
        *keys,
        (F.lit(_HLL_M) - F.col("n_occ"))
        .cast("bigint")
        .alias("zero_registers"),
        (
            F.col("sum_occ")
            + (F.lit(_HLL_M) - F.col("n_occ")) * F.lit(1 << 44).cast("long")
        ).alias("sum_int"),
    ).select(
        *keys,
        "zero_registers",
        (F.lit(_HLL_NUM) / F.col("sum_int")).alias("raw_e"),
    )
    return est.select(
        *keys,
        F.when(
            (F.col("raw_e") <= F.lit(_HLL_LC_GATE))
            & (F.col("zero_registers") > 0),
            F.round(
                F.lit(float(_HLL_M))
                * F.log(F.lit(float(_HLL_M)) / F.col("zero_registers")),
                4,
            ),
        )
        .otherwise(F.round("raw_e", 4))
        .alias("hll_estimate"),
        "zero_registers",
    )



@register(
    "hll_distinct_audit",
    oracle=f"""
SELECT col_name, n_exact, hll_estimate, zero_registers,
       round(abs(hll_estimate - n_exact) / n_exact, 6) AS rel_err
FROM (
  SELECT * FROM {_hll_col_sql("event_id")}
  UNION ALL
  SELECT * FROM {_hll_col_sql("user_id")}
  UNION ALL
  SELECT * FROM {_hll_col_sql("event_type")}
)
ORDER BY col_name
""",
    doc="From-scratch HyperLogLog (p=9, 512 registers) distinct-count "
    "estimates for three cardinality regimes of the events table — "
    "event_id (unique: raw-HLL branch), event_type (tiny: "
    "linear-counting branch at every scale), user_id (scale-dependent: "
    "LC at sf<=0.1 where its cardinality sits under the 2.5*m=1280 "
    "gate, raw-HLL on the grown sf1.0 fixture where it reaches 15,000 "
    "distinct with zero empty registers) — audited against the exact "
    "counts.  "
    "Register maxima aggregate map-side (max is associative), and the "
    "harmonic-mean denominator is an EXACT integer sum (register rho "
    "contributes 2^(44-rho); max 2^53), so the estimate is bit-identical "
    "across engines and partitionings; bit_length uses bit-smear + "
    "bit_count, never float log2.  At 100 TB this is the one-pass "
    "mergeable cardinality path where count(DISTINCT) would shuffle the "
    "full key set.",
)
def q_hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def one(col: str) -> DataFrame:
        rho = hll_rho_frame(ev, col, [])
        regs = rho.groupBy("bucket").agg(F.max("rho").alias("rho_max"))
        est = hll_estimate_from_regs(regs, [])
        exact = ev.agg(
            F.countDistinct(col).cast("bigint").alias("n_exact")
        )
        return est.crossJoin(F.broadcast(exact)).select(
            F.lit(col).alias("col_name"),
            "n_exact",
            "hll_estimate",
            "zero_registers",
        )

    out = one("event_id")
    for c in ("user_id", "event_type"):
        out = out.unionByName(one(c))
    return out.select(
        "col_name",
        "n_exact",
        "hll_estimate",
        "zero_registers",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            6,
        ).alias("rel_err"),
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Histogram quantile sketch audit (r10): completes the from-scratch
# sketch family (Count-Min, Bloom, MinHash, HLL) with the quantile
# member.  A fixed-bin histogram is THE mergeable quantile sketch shape
# at 100 TB: per-partition bin counts partial-aggregate map-side, merge
# by vector addition, and the quantile read-out is a cumsum walk over
# 256 rows — where exact percentile sorts the full column.  Spark ships
# approx_percentile (GK sketch) but its internals are not oracle-
# reproducible; this one is bit-identical in both engines: bin
# assignment is floor((x-lo)/w) on deterministic double ops, counts are
# exact integers, and the interpolated estimate is a fixed sequence of
# correctly-rounded scalar ops.
# ---------------------------------------------------------------------------
_QH_BINS = 256
_QH_QS = (0.5, 0.95, 0.99)


def qh_bin_sql(col: str, lo: str, hi: str) -> str:
    """DuckDB fragment: fixed-edge 256-bin assignment — ONE definition
    shared by the batch audit oracle and the streaming maintenance
    oracle (stream_quantile_e2e), so the two cannot drift apart (the
    stream_hll _smear_sql_inline pattern)."""
    return (
        f"least(CAST(floor(({col} - {lo}) / "
        f"(({hi} - {lo}) / {_QH_BINS})) AS INTEGER), {_QH_BINS - 1})"
    )


def qh_bin_expr(col, lo, hi):
    """Spark twin of qh_bin_sql — the register function of the quantile
    sketch.  Given fixed edges (lo, hi) it is a pure per-row map, so
    per-micro-batch bin counts SUM-merge to exactly the batch histogram
    (addition is associative/commutative; idempotence comes from the
    batch_id-partitioned sink).  Identical expression tree in the batch
    audit and the streaming fold -> identical doubles."""
    width = (hi - lo) / F.lit(_QH_BINS)
    return F.least(
        F.floor((col - lo) / width).cast("int"), F.lit(_QH_BINS - 1)
    )


@register(
    "quantile_histogram_audit",
    oracle=f"""
WITH stats AS (
  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
         count(*)::BIGINT AS n
  FROM lineitem
), binned AS (
  SELECT {qh_bin_sql("l_extendedprice", "s.lo", "s.hi")} AS bin
  FROM lineitem, stats s
), hist AS (
  SELECT bin, count(*)::BIGINT AS cnt FROM binned GROUP BY bin
), cum AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin) AS cum,
         coalesce(sum(cnt) OVER (
           ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_below
  FROM hist
), qs AS (
  SELECT q FROM unnest([{", ".join(str(q) for q in _QH_QS)}]) AS t(q)
), picked AS (
  SELECT q, min(bin) AS bin
  FROM qs, cum, stats s
  WHERE cum >= q * s.n
  GROUP BY q
), est AS (
  SELECT p.q,
         s.lo + ((s.hi - s.lo) / {_QH_BINS}) *
           (p.bin + (p.q * s.n - c.cum_below) / c.cnt) AS h_est
  FROM picked p JOIN cum c ON c.bin = p.bin, stats s
), exact AS (
  -- quantile_cont requires constant parameters: one UNION ALL branch
  -- per audited quantile (DuckDB folds the three scans)
  {" UNION ALL ".join(
      f"SELECT {q} AS q, quantile_cont(l_extendedprice, {q}) AS exact_value FROM lineitem"
      for q in _QH_QS
  )}
)
SELECT e.q, round(x.exact_value, 6) AS exact_value,
       round(e.h_est, 6) AS hist_estimate,
       round(abs(e.h_est - x.exact_value), 6) AS abs_err
FROM est e JOIN exact x USING (q)
ORDER BY e.q
""",
    doc="Fixed-bin (256) histogram quantile sketch vs exact percentile "
    "for P50/P95/P99 of l_extendedprice — the from-scratch mergeable "
    "quantile estimator with its one-sided-resolution error measured, "
    "completing the sketch family next to countmin_heavy_hitters, "
    "bloom_filter_join_audit and hll_distinct_audit.  Bin counts are "
    "exact integers merged by addition (map-side partial agg; the "
    "exchange carries <= 256 rows per partition), the read-out is a "
    "cumsum walk + one interpolation — every float op is a fixed "
    "sequence of correctly-rounded scalars, so both engines emit "
    "identical doubles.  At 100 TB the exact side (full sort) is the "
    "thing you CAN'T run — the audit quantifies what the cheap sketch "
    "gives up.  Resolution guarantee (property-tested): the read-out "
    "lies within one bin width of the rank-ceil(q*n) ORDER STATISTIC; "
    "vs the INTERPOLATED percentile reported here, concentrated data "
    "can add the local gap between adjacent order statistics "
    "(hypothesis found [1.0 x7, 2.0]@q=0.95 where that gap dominates), "
    "which is exactly what abs_err makes visible.",
)
def q_quantile_histogram_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    stats = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(_QH_BINS)
    binned = li.crossJoin(F.broadcast(stats)).select(
        qh_bin_expr(
            F.col("l_extendedprice"), F.col("lo"), F.col("hi")
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.orderBy("bin")
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.coalesce(
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("bigint"),
        ).alias("cum_below"),
    )
    qs = spark.createDataFrame(
        [(q,) for q in _QH_QS], "q double"
    )
    picked = (
        qs.crossJoin(cum)
        .crossJoin(F.broadcast(stats))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    est = (
        picked.join(cum, "bin")
        .crossJoin(F.broadcast(stats))
        .select(
            "q",
            (
                F.col("lo")
                + width
                * (
                    F.col("bin")
                    + (F.col("q") * F.col("n") - F.col("cum_below"))
                    / F.col("cnt")
                )
            ).alias("h_est"),
        )
    )
    # percentile() requires a FOLDABLE percentage: one pass computes all
    # three literals, then the scalar row unpivots to (q, exact_value)
    exact = li.agg(
        *[
            F.expr(f"percentile(l_extendedprice, {q!r})").alias(f"p{i}")
            for i, q in enumerate(_QH_QS)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.col(f"p{i}").alias("exact_value"),
                    )
                    for i, q in enumerate(_QH_QS)
                ]
            )
        ).alias("s")
    ).select("s.q", "s.exact_value")
    return (
        est.join(exact, "q")
        .select(
            "q",
            F.round("exact_value", 6).alias("exact_value"),
            F.round("h_est", 6).alias("hist_estimate"),
            F.round(
                F.abs(F.col("h_est") - F.col("exact_value")), 6
            ).alias("abs_err"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# KMV / theta-sketch set-operation audit (r11): the sketch-family member
# HLL structurally lacks.  HLL registers merge by max, which supports
# UNION only — there is no register algebra for INTERSECTION, so
# "returning customers year over year" (|A ∩ B|) cannot be answered from
# two HLL sketches.  A KMV (k-minimum-values) sketch CAN: keep the k
# smallest hash values of each set; theta = the k-th smallest; the
# retained values below theta are a uniform sample of the set at rate
# theta/2^52, so |A| ~= (k-1)*2^52/theta (the classic unbiased KMV
# estimator), union re-ranks the merged sketches, and intersection
# counts hashes present in BOTH sketches below min(theta_a, theta_b)
# scaled by the same rate — the Apache DataSketches theta-sketch
# construction, rebuilt from scratch on the engine's deterministic
# 52-bit md5 prefix so DuckDB reproduces every estimate bit-for-bit.
# ---------------------------------------------------------------------------
_KMV_K = 64
# (k-1) * 2^52: exact in double (6 significant bits), shared literal
_KMV_NUM = float((_KMV_K - 1) << 52)


def kmv_hv_sql(col: str) -> str:
    """DuckDB fragment: the KMV hash — first 52 bits of md5(col) as
    BIGINT.  ONE definition shared by the batch set-ops audit and the
    streamed maintenance (stream_kmv_e2e), so the two sketches cannot
    drift apart (the cms_bucket / qh_bin / hll register discipline)."""
    return f"('0x' || substr(md5({col}::VARCHAR), 1, 13))::BIGINT"


def kmv_hv_expr(col):
    """Spark twin of kmv_hv_sql."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 13), 16, 10
    ).cast("long")


def _kmv_est_sql(m: str, theta: str) -> str:
    """DuckDB fragment: KMV estimate from sketch size + k-th value.
    n < k means the sketch IS the set (estimate exact by construction —
    property-tested; every fixture year is >= 85 distinct, above k=64,
    so the gated scales all exercise the estimator branch).

    Retained-theta convention (ADVICE r11, pinned here so a refactor
    cannot 'fix' one side only): this sketch RETAINS the k-th order
    statistic (rn <= k, theta = max retained hv), and the intersection
    counts only common hashes STRICTLY below min(theta) — a common hash
    exactly equal to theta_min is dropped.  The textbook theta sketch
    retains strictly-below-theta samples instead; the difference is a
    one-hash estimator bias, and BOTH engines plus the property twin
    (tests/test_r11_props.py) implement the retained-theta form."""
    return (
        f"CASE WHEN {m} < {_KMV_K} THEN ({m})::DOUBLE "
        f"ELSE {_KMV_NUM!r} / ({theta})::DOUBLE END"
    )


def _kmv_est_expr(m, theta):
    """Spark twin of _kmv_est_sql — same branch, same one correctly-
    rounded double division."""
    return F.when(m < _KMV_K, m.cast("double")).otherwise(
        F.lit(_KMV_NUM) / theta.cast("double")
    )


@register(
    "kmv_set_ops_audit",
    oracle=f"""
WITH hv AS (
  SELECT DISTINCT year(o_orderdate)::INTEGER AS y,
         {kmv_hv_sql("o_custkey")} AS hv
  FROM orders
), ranked AS (
  SELECT y, hv FROM (
    SELECT y, hv, row_number() OVER (PARTITION BY y ORDER BY hv) AS rn
    FROM hv) WHERE rn <= {_KMV_K}
), est AS (
  SELECT y, max(hv) AS theta,
         {_kmv_est_sql(f"count(*)", "max(hv)")} AS kmv_est
  FROM ranked GROUP BY y
), pairs AS (
  SELECT ea.y AS year_a, ea.y + 1 AS year_b,
         ea.kmv_est AS kmv_a_raw, eb.kmv_est AS kmv_b_raw,
         least(ea.theta, eb.theta) AS theta_min
  FROM est ea JOIN est eb ON eb.y = ea.y + 1
), u AS (
  SELECT year_a, hv FROM (
    SELECT y AS year_a, hv FROM ranked
    UNION
    SELECT y - 1 AS year_a, hv FROM ranked)
), uest AS (
  SELECT year_a,
         {_kmv_est_sql("count(*)", "max(hv)")} AS kmv_u_raw
  FROM (
    SELECT year_a, hv,
           row_number() OVER (PARTITION BY year_a ORDER BY hv) AS rn
    FROM u) WHERE rn <= {_KMV_K}
  GROUP BY year_a
), common AS (
  SELECT a.y AS year_a, count(*)::BIGINT AS n_common
  FROM ranked a
  JOIN ranked b ON b.y = a.y + 1 AND b.hv = a.hv
  JOIN pairs p ON p.year_a = a.y
  WHERE a.hv < p.theta_min
  GROUP BY 1
), dk AS (
  SELECT DISTINCT year(o_orderdate)::INTEGER AS y, o_custkey AS ck
  FROM orders
), n AS (
  SELECT y, count(*)::BIGINT AS n FROM dk GROUP BY y
), xinter AS (
  SELECT a.y AS year_a, count(*)::BIGINT AS exact_inter
  FROM dk a JOIN dk b ON b.y = a.y + 1 AND b.ck = a.ck
  GROUP BY 1
)
SELECT p.year_a, p.year_b,
       na.n AS exact_a, round(p.kmv_a_raw, 4) AS kmv_a,
       nb.n AS exact_b, round(p.kmv_b_raw, 4) AS kmv_b,
       na.n + nb.n - xi.exact_inter AS exact_union,
       round(u.kmv_u_raw, 4) AS kmv_union,
       xi.exact_inter,
       round((coalesce(c.n_common, 0) * (1::BIGINT << 52))::DOUBLE
             / p.theta_min::DOUBLE, 4) AS kmv_inter,
       round((p.kmv_a_raw + p.kmv_b_raw) - u.kmv_u_raw, 4)
         AS kmv_inter_ie,
       round(abs((coalesce(c.n_common, 0) * (1::BIGINT << 52))::DOUBLE
                 / p.theta_min::DOUBLE - xi.exact_inter::DOUBLE)
             / nullif(xi.exact_inter, 0)::DOUBLE, 4) AS rel_err_inter
FROM pairs p
JOIN n na ON na.y = p.year_a
JOIN n nb ON nb.y = p.year_b
JOIN uest u ON u.year_a = p.year_a
JOIN xinter xi ON xi.year_a = p.year_a
LEFT JOIN common c ON c.year_a = p.year_a
ORDER BY p.year_a
""",
    doc=f"KMV / theta-sketch set operations on year-over-year customer "
    f"sets (k={_KMV_K} minimum 52-bit md5 values per order-year): "
    "per-year cardinality, UNION (re-rank the merged sketches) and — "
    "the operation HLL has no register algebra for — INTERSECTION "
    "(returning customers), both as the theta-sketch sample count "
    "below min(theta_a, theta_b) scaled by 2^52/theta and as the "
    "higher-variance inclusion-exclusion difference shown next to it, "
    "audited against exact distinct-join counts (~78% true overlap at "
    "every fixture scale).  Every estimate is one correctly-rounded "
    "double division of exact integers, so both engines emit identical "
    "bits.  Scale shape: the sketch build is ONE distinct-style "
    "exchange of (year, hash) pairs reduced map-side by partial agg, "
    "then the rank<=k filter runs as WindowGroupLimit partial top-k "
    "BEFORE the final exchange — per year at most k rows leave any map "
    "task; all set operations run on the <=k*years-row sketch "
    "dimension.  At 100 TB only the sketch path runs; the exact "
    "distinct self-join side exists to measure the error (the "
    "countmin/bloom/hll audit discipline).  n<k collapses to the "
    "exact-set branch, covered by the r11 property test.",
)
def q_kmv_set_ops_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.session import materialize_dim

    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"), "o_custkey"
    )
    hv = o.select("y", kmv_hv_expr(F.col("o_custkey")).alias("hv")).distinct()
    wk = Window.partitionBy("y").orderBy("hv")
    # k smallest per year; consumed by est, both union legs and both
    # intersection legs -> materialize the <=k*years-row sketch once
    ranked = materialize_dim(
        hv.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KMV_K)
        .select("y", "hv")
    )
    est = ranked.groupBy("y").agg(
        F.max("hv").alias("theta"),
        _kmv_est_expr(F.count(F.lit(1)), F.max("hv")).alias("kmv_est"),
    )
    pairs = (
        est.alias("ea")
        .join(est.alias("eb"), F.col("eb.y") == F.col("ea.y") + 1)
        .select(
            F.col("ea.y").alias("year_a"),
            (F.col("ea.y") + 1).alias("year_b"),
            F.col("ea.kmv_est").alias("kmv_a_raw"),
            F.col("eb.kmv_est").alias("kmv_b_raw"),
            F.least("ea.theta", "eb.theta").alias("theta_min"),
        )
    )
    u = (
        ranked.select(F.col("y").alias("year_a"), "hv")
        .unionByName(ranked.select((F.col("y") - 1).alias("year_a"), "hv"))
        .distinct()
    )
    wu = Window.partitionBy("year_a").orderBy("hv")
    uest = (
        u.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("year_a")
        .agg(
            _kmv_est_expr(F.count(F.lit(1)), F.max("hv")).alias("kmv_u_raw")
        )
    )
    common = (
        ranked.select(F.col("y").alias("year_a"), "hv")
        .join(
            ranked.select((F.col("y") - 1).alias("year_a"), "hv"),
            ["year_a", "hv"],
        )
        .join(F.broadcast(pairs.select("year_a", "theta_min")), "year_a")
        .filter(F.col("hv") < F.col("theta_min"))
        .groupBy("year_a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    # exact audit side: distinct (year, custkey) feeds per-year counts
    # and the adjacent-year intersection join
    dk = materialize_dim(o.distinct(), partitions=4)
    n = dk.groupBy("y").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    xinter = (
        dk.select(F.col("y").alias("year_a"), "o_custkey")
        .join(
            dk.select((F.col("y") - 1).alias("year_a"), "o_custkey"),
            ["year_a", "o_custkey"],
        )
        .groupBy("year_a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    out = (
        pairs.join(uest, "year_a")
        .join(n.select(F.col("y").alias("year_a"), F.col("n").alias("exact_a")), "year_a")
        .join(
            n.select((F.col("y") - 1).alias("year_a"), F.col("n").alias("exact_b")),
            "year_a",
        )
        .join(xinter, "year_a")
        .join(common, "year_a", "left")
    )
    ki_raw = (
        F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint")
        * F.lit(1 << 52)
    ).cast("double") / F.col("theta_min").cast("double")
    return out.select(
        "year_a",
        "year_b",
        "exact_a",
        F.round("kmv_a_raw", 4).alias("kmv_a"),
        "exact_b",
        F.round("kmv_b_raw", 4).alias("kmv_b"),
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_inter")).alias(
            "exact_union"
        ),
        F.round("kmv_u_raw", 4).alias("kmv_union"),
        "exact_inter",
        F.round(ki_raw, 4).alias("kmv_inter"),
        F.round(
            (F.col("kmv_a_raw") + F.col("kmv_b_raw")) - F.col("kmv_u_raw"),
            4,
        ).alias("kmv_inter_ie"),
        F.round(
            F.abs(ki_raw - F.col("exact_inter").cast("double"))
            / F.when(F.col("exact_inter") > 0, F.col("exact_inter"))
            .otherwise(F.lit(None))
            .cast("double"),
            4,
        ).alias("rel_err_inter"),
    ).orderBy("year_a")
