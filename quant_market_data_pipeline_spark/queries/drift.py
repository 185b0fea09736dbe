"""Distribution-drift, concentration and robust-statistics audits.

The monitoring layer every production pipeline grows next to its ETL:
did this ingest batch's distribution move (KS / PSI), is a segment
dangerously concentrated (HHI), which points are robust outliers (MAD),
how do users actually transition between actions (Markov)?

Common scale rules:
- every statistic reduces the fact table ONCE (a hash-agg on a bounded
  key: (source, length), (period, bucket), supplier, (prev, next));
  all comparison/normalization work happens on the reduced frame, whose
  size is data-independent (dimension x distinct-statistic-values);
- data-derived constants (quantile boundaries, medians, date midpoints)
  are reduced to tiny frames and BROADCAST back — never recomputed per
  row, never collected to the driver;
- the filter-stage rule (COVERAGE.md): any value that feeds a
  comparison (median, MAD, quantile boundary, KS threshold) is rounded
  to a fixed scale on BOTH engines BEFORE the comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import (
    configure_runtime,
    materialize_dim,
)
from quant_market_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift between every pair of sources.
# ---------------------------------------------------------------------------
@register(
    "ks_source_drift",
    oracle="""
WITH counts AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
), grid AS (
  SELECT s.source, l.n_chars
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN (SELECT DISTINCT n_chars FROM documents) l
), ecdf AS (
  SELECT g.source, g.n_chars,
         sum(coalesce(c.cnt, 0)) OVER (
           PARTITION BY g.source ORDER BY g.n_chars) AS cum,
         sum(coalesce(c.cnt, 0)) OVER (PARTITION BY g.source) AS total
  FROM grid g LEFT JOIN counts c
    ON c.source = g.source AND c.n_chars = g.n_chars
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         max(a.total) AS n_a, max(b.total) AS n_b,
         round(max(abs(CAST(a.cum AS DOUBLE) / a.total
                       - CAST(b.cum AS DOUBLE) / b.total)), 6) AS ks_stat
  FROM ecdf a JOIN ecdf b
    ON a.n_chars = b.n_chars AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b, ks_stat,
       ks_stat > round(1.36 * sqrt(CAST(n_a + n_b AS DOUBLE)
                                   / (CAST(n_a AS DOUBLE)
                                      * CAST(n_b AS DOUBLE))), 6) AS drifted
FROM pairs
""",
    doc="Pairwise two-sample Kolmogorov-Smirnov drift over the doc-length "
    "distribution of every source pair: D = max |ECDF_a - ECDF_b|, "
    "flagged against the 95% critical value 1.36*sqrt((n_a+n_b)/(n_a*n_b))."
    "  Scale shape: the corpus reduces ONCE to (source, length) counts; "
    "ECDFs come from a window cumsum over the |sources| x |distinct "
    "lengths| grid (data-independent size), and the pair join runs on "
    "that reduced frame — the 100 TB cost is one fact hash-agg.  Both "
    "D and the threshold are rounded to 6dp before the flag comparison "
    "(filter-stage rule).",
)
def q_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, "documents", sf_dir)
    counts = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # the corpus reduces ONCE to (source, n_chars) counts; materialize so
    # the grid sides and both pair-join legs re-derive from the in-memory
    # dimension frame instead of re-running the corpus scan (6x before).
    # persist-with-lineage, not localCheckpoint: survives executor loss.
    counts = materialize_dim(counts)
    sources = counts.select("source").distinct()
    lens = counts.select("n_chars").distinct()
    grid = lens.crossJoin(F.broadcast(sources))
    joined = grid.join(F.broadcast(counts), ["source", "n_chars"], "left").select(
        "source", "n_chars", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    wcum = Window.partitionBy("source").orderBy("n_chars")
    wtot = Window.partitionBy("source")
    ecdf = joined.select(
        "source",
        "n_chars",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("total"),
    )
    a = ecdf.select(
        F.col("source").alias("source_a"),
        "n_chars",
        F.col("cum").alias("cum_a"),
        F.col("total").alias("tot_a"),
    )
    b = ecdf.select(
        F.col("source").alias("source_b"),
        "n_chars",
        F.col("cum").alias("cum_b"),
        F.col("total").alias("tot_b"),
    )
    pairs = (
        # both legs are the |sources| x |lens| ECDF grid — broadcast,
        # never sort-merge the dimension frame
        F.broadcast(a).join(b, "n_chars")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.max("tot_a").alias("n_a"),
            F.max("tot_b").alias("n_b"),
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_a").cast("double") / F.col("tot_a")
                        - F.col("cum_b").cast("double") / F.col("tot_b")
                    )
                ),
                6,
            ).alias("ks_stat"),
        )
    )
    # doubles in the denominator: at 100 TB per-source counts a BIGINT
    # n_a*n_b product overflows (~3e9 rows each) and flips the flag
    threshold = F.round(
        1.36
        * F.sqrt(
            (F.col("n_a") + F.col("n_b")).cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ),
        6,
    )
    return pairs.select(
        "source_a",
        "source_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "ks_stat",
        (F.col("ks_stat") > threshold).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index of the order-value distribution over time.
# ---------------------------------------------------------------------------
@register(
    "psi_price_drift",
    oracle="""
WITH span AS (
  SELECT min(epoch_ms(o_orderdate)) AS lo, max(epoch_ms(o_orderdate)) AS hi
  FROM orders
), tagged AS (
  SELECT o_totalprice AS price,
         CASE WHEN 2 * epoch_ms(o_orderdate) < lo + hi
              THEN 'base' ELSE 'cur' END AS period
  FROM orders CROSS JOIN span
), bounds AS (
  SELECT list_transform(
           quantile_cont(price, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]),
           q -> round(q, 4)) AS bnds
  FROM tagged WHERE period = 'base'
), bucketed AS (
  SELECT period,
         len(list_filter(bnds, b -> price > b)) AS bucket
  FROM tagged CROSS JOIN bounds
), fracs AS (
  SELECT bucket,
         CAST(count(CASE WHEN period = 'base' THEN 1 END) AS DOUBLE)
           / sum(count(CASE WHEN period = 'base' THEN 1 END)) OVER ()
           AS p_base,
         CAST(count(CASE WHEN period = 'cur' THEN 1 END) AS DOUBLE)
           / sum(count(CASE WHEN period = 'cur' THEN 1 END)) OVER ()
           AS p_cur
  FROM bucketed GROUP BY bucket
), terms AS (
  SELECT bucket, round(p_base, 6) AS p_base, round(p_cur, 6) AS p_cur,
         round((greatest(p_cur, 0.000001) - greatest(p_base, 0.000001))
               * ln(greatest(p_cur, 0.000001)
                    / greatest(p_base, 0.000001)), 6) AS psi_term
  FROM fracs
)
SELECT bucket, p_base, p_cur, psi_term,
       round(sum(psi_term) OVER (), 6) AS psi_total
FROM terms
""",
    doc="Population Stability Index of the order-value distribution: the "
    "fixture's date span splits at its integer-millisecond midpoint "
    "(2*t < lo+hi — pure BIGINT arithmetic, no division drift) into a "
    "baseline and a current period; baseline deciles (exact interpolated "
    "quantiles, rounded 4dp BEFORE bucketing — filter-stage rule) become "
    "the 10 monitoring bins; PSI = sum (p_cur - p_base) * ln(p_cur / "
    "p_base) with the standard 1e-6 floor on empty bins.  Scale shape: "
    "one fact scan tags periods, the 9 boundaries are a 1-row broadcast, "
    "bucket assignment is an in-row array filter, and everything after "
    "the (period, bucket) hash-agg runs on <= 20 rows.  This is the "
    "train/serve skew check run before every model refresh.",
)
def q_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    span = o.agg(
        F.min(F.unix_millis("o_orderdate")).alias("lo"),
        F.max(F.unix_millis("o_orderdate")).alias("hi"),
    )
    tagged = o.crossJoin(F.broadcast(span)).select(
        F.col("o_totalprice").alias("price"),
        F.when(
            2 * F.unix_millis("o_orderdate") < F.col("lo") + F.col("hi"),
            F.lit("base"),
        )
        .otherwise(F.lit("cur"))
        .alias("period"),
    )
    bounds = (
        tagged.filter(F.col("period") == "base")
        .agg(
            F.percentile(
                F.col("price"),
                F.lit([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
            ).alias("raw")
        )
        .select(
            F.transform(F.col("raw"), lambda q: F.round(q, 4)).alias("bnds")
        )
    )
    bucketed = tagged.crossJoin(F.broadcast(bounds)).select(
        "period",
        F.size(
            F.filter(F.col("bnds"), lambda b: F.col("price") > b)
        ).alias("bucket"),
    )
    wall = Window.partitionBy()
    n_base = F.count(F.when(F.col("period") == "base", F.lit(1)))
    n_cur = F.count(F.when(F.col("period") == "cur", F.lit(1)))
    fracs = bucketed.groupBy("bucket").agg(
        (n_base.cast("double") / F.sum(n_base).over(wall)).alias("pb"),
        (n_cur.cast("double") / F.sum(n_cur).over(wall)).alias("pc"),
    )
    pb_f = F.greatest(F.col("pb"), F.lit(0.000001))
    pc_f = F.greatest(F.col("pc"), F.lit(0.000001))
    terms = fracs.select(
        "bucket",
        F.round("pb", 6).alias("p_base"),
        F.round("pc", 6).alias("p_cur"),
        F.round((pc_f - pb_f) * F.log(pc_f / pb_f), 6).alias("psi_term"),
    )
    return terms.select(
        "bucket",
        "p_base",
        "p_cur",
        "psi_term",
        F.round(F.sum("psi_term").over(wall), 6).alias("psi_total"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier-revenue concentration per nation.
# ---------------------------------------------------------------------------
@register(
    "hhi_supplier_concentration",
    oracle="""
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                       * (CAST(1 AS DECIMAL(3,2))
                          - CAST(l.l_discount AS DECIMAL(4,2))))
                   AS DECIMAL(38,4)) AS DOUBLE) AS supp_rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), shares AS (
  SELECT s_nationkey, supp_rev,
         supp_rev / sum(supp_rev) OVER (PARTITION BY s_nationkey) AS share
  FROM rev
)
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       round(10000 * sum(share * share), 4) AS hhi,
       round(max(share), 6) AS top_share
FROM shares
JOIN nation n ON n.n_nationkey = s_nationkey
GROUP BY 1
""",
    doc="Herfindahl-Hirschman concentration of discounted supplier revenue "
    "within each nation (HHI on the 0-10000 scale; >2500 = highly "
    "concentrated) plus the single largest supplier share — the "
    "concentration audit a marketplace / risk desk runs per segment.  "
    "Scale shape: ONE fact hash-agg on (nation, supplier) with exact "
    "decimal revenue sums (q/functions/exact.py discipline), then shares "
    "via a window over supplier-sized nation partitions and a "
    "nation-sized final agg; the supplier and nation dims broadcast.",
)
def q_hhi_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from quant_market_data_pipeline_spark.functions.exact import (
        money,
        one_minus,
    )

    li = _t(spark, "lineitem", sf_dir)
    supp = _t(spark, "supplier", sf_dir)
    nation = _t(spark, "nation", sf_dir)
    rev = (
        li.join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == supp.s_suppkey,
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(money("l_extendedprice") * one_minus("l_discount"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("supp_rev")
        )
    )
    wnat = Window.partitionBy("s_nationkey")
    shares = rev.select(
        "s_nationkey",
        (F.col("supp_rev") / F.sum("supp_rev").over(wnat)).alias("share"),
    )
    return (
        shares.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            shares.s_nationkey == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.round(10000 * F.sum(F.col("share") * F.col("share")), 4).alias(
                "hhi"
            ),
            F.round(F.max("share"), 6).alias("top_share"),
        )
    )


# ---------------------------------------------------------------------------
# Median-absolute-deviation robust outlier audit per symbol.
# ---------------------------------------------------------------------------
@register(
    "mad_outlier_ticks",
    oracle="""
WITH med AS (
  SELECT event_type AS symbol, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type AS symbol, abs(e.value - m.med) AS d, m.med
  FROM events e JOIN med m ON e.event_type = m.symbol
), mad AS (
  SELECT symbol, round(quantile_cont(d, 0.5), 6) AS mad
  FROM dev GROUP BY 1
)
SELECT d.symbol, CAST(count(*) AS BIGINT) AS n_ticks,
       max(d.med) AS median_value, max(m.mad) AS mad,
       CAST(count(CASE WHEN d.d > 5 * m.mad THEN 1 END) AS BIGINT)
         AS n_outliers,
       round(CAST(count(CASE WHEN d.d > 5 * m.mad THEN 1 END) AS DOUBLE)
             / count(*), 6) AS outlier_rate
FROM dev d JOIN mad m ON d.symbol = m.symbol
GROUP BY 1
""",
    doc="Robust outlier audit per symbol: median absolute deviation with "
    "a 5-MAD fence — the fat-tail-safe alternative to z-score gating "
    "(one bad print cannot drag the fence the way it drags a stddev).  "
    "Two exact interpolated medians mean two passes over the ticks "
    "(robust statistics are irreducibly two-pass); each reduces to a "
    "|symbols|-row frame that broadcasts back, so the 100 TB cost is "
    "two scans + two tiny joins, no wide shuffle.  Median and MAD are "
    "rounded to 6dp BEFORE the fence comparison (filter-stage rule).",
)
def q_mad_outlier_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, "events", sf_dir).select(
        F.col("event_type").alias("symbol"), "value"
    )
    med = e.groupBy("symbol").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "symbol").select(
        "symbol", F.abs(F.col("value") - F.col("med")).alias("d"), "med"
    )
    mad = dev.groupBy("symbol").agg(
        F.round(F.percentile("d", F.lit(0.5)), 6).alias("mad")
    )
    out = F.count(F.when(F.col("d") > 5 * F.col("mad"), F.lit(1)))
    return (
        dev.join(F.broadcast(mad), "symbol")
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            out.cast("bigint").alias("n_outliers"),
            F.round(out.cast("double") / F.count(F.lit(1)), 6).alias(
                "outlier_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences.
# ---------------------------------------------------------------------------
@register(
    "event_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY prev_type), 6) AS prob
FROM pairs
""",
    doc="First-order Markov transition matrix of user behavior: "
    "P(next event type | previous event type), from per-user "
    "time-ordered LAG pairs (event_id tiebreak), row-normalized by the "
    "previous-state marginal.  Scale shape: ONE window exchange on "
    "user_id (bounded per-user sequences), then a #types^2-row agg; "
    "the normalizing marginal is a window over the tiny matrix, not a "
    "second scan.  This is the behavioral prior behind next-event "
    "prediction and funnel-anomaly alerting.",
)
def q_event_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wprev = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wprev), 6
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Key-distribution skew audit: Gini coefficient + head shares.
# ---------------------------------------------------------------------------
@register(
    "key_skew_gini",
    oracle="""
WITH counts AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt, l_partkey) AS i,
         row_number() OVER (ORDER BY cnt DESC, l_partkey) AS ri
  FROM counts
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS total_rows,
       round((2.0 * sum(i * cnt) - (count(*) + 1) * sum(cnt))
             / (count(*) * sum(cnt)), 6) AS gini,
       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top1_share,
       round(CAST(sum(CASE WHEN ri <= 10 THEN cnt ELSE 0 END) AS DOUBLE)
             / sum(cnt), 6) AS top10_share
FROM ranked
""",
    doc="Shuffle-key skew audit for the part key: Gini coefficient of "
    "the per-key row-count distribution (0 = uniform, ->1 = one hot "
    "key) plus the top-1/top-10 key shares — the numbers that decide "
    "whether a join/agg on this key needs salting or AQE skew "
    "handling (the diagnostic side of salted_hot_key_stats).  Scale "
    "shape: the fact reduces ONCE to the per-key count table "
    "(vocabulary-sized); the rank windows and the closed-form Gini "
    "(2*sum(i*c) - (n+1)*sum(c)) / (n*sum(c)) run over that reduced "
    "frame with exact integer sums — one double division at the end.",
)
def q_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, "lineitem", sf_dir)
    counts = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wasc = Window.orderBy("cnt", "l_partkey")
    wdesc = Window.orderBy(F.col("cnt").desc(), "l_partkey")
    ranked = counts.select(
        "cnt",
        F.row_number().over(wasc).alias("i"),
        F.row_number().over(wdesc).alias("ri"),
    )
    n = F.count(F.lit(1))
    tot = F.sum("cnt")
    return ranked.agg(
        n.cast("bigint").alias("n_keys"),
        tot.cast("bigint").alias("total_rows"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("cnt")) - (n + 1) * tot)
            / (n * tot),
            6,
        ).alias("gini"),
        F.round(F.max("cnt").cast("double") / tot, 6).alias("top1_share"),
        F.round(
            F.sum(
                F.when(F.col("ri") <= 10, F.col("cnt")).otherwise(0)
            ).cast("double")
            / tot,
            6,
        ).alias("top10_share"),
    )


# ---------------------------------------------------------------------------
# Data-contract audits: freshness, referential integrity, key uniqueness.
# ---------------------------------------------------------------------------
@register(
    "freshness_staleness_audit",
    oracle="""
WITH heads AS (
  SELECT event_type AS symbol, max(ts) AS last_tick,
         CAST(count(*) AS BIGINT) AS n_ticks
  FROM events GROUP BY 1
), ref AS (SELECT max(last_tick) AS wm FROM heads)
SELECT symbol, last_tick, n_ticks,
       (epoch_us(wm) - epoch_us(last_tick)) // 60000000 AS staleness_min,
       (epoch_us(wm) - epoch_us(last_tick)) // 60000000 > 120 AS stale
FROM heads CROSS JOIN ref
""",
    doc="Feed-freshness audit: per symbol, minutes since its last tick "
    "relative to the freshest symbol's watermark (data-derived, so the "
    "check is deterministic and replayable — wall-clock 'now' is not), "
    "flagged past a 2-hour SLA.  This is the first page of every "
    "market-data runbook: a symbol whose feed silently died shows up "
    "as monotonically growing staleness.  One |symbols|-row hash-agg "
    "plus a 1-row broadcast; integer minute arithmetic on both engines.",
)
def q_freshness_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, "events", sf_dir)
    heads = e.groupBy(F.col("event_type").alias("symbol")).agg(
        F.max("ts").alias("last_tick"),
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
    )
    ref = heads.agg(F.max("last_tick").alias("wm"))
    # elapsed FULL minutes from exact integer microseconds on both
    # engines (date_diff counts boundary crossings — off by one vs this)
    stale_min = F.floor(
        (F.unix_micros("wm") - F.unix_micros("last_tick")) / 60000000
    ).cast("bigint")
    return heads.crossJoin(F.broadcast(ref)).select(
        "symbol",
        "last_tick",
        "n_ticks",
        stale_min.alias("staleness_min"),
        (stale_min > 120).alias("stale"),
    )


@register(
    "referential_integrity_audit",
    oracle="""
SELECT 'lineitem->orders' AS fk,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child_rows,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'lineitem->part',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
            AS BIGINT)
""",
    doc="Referential-integrity audit across the star schema's three "
    "foreign keys: orphaned child rows surface as anti-join counts — "
    "the contract check a lake runs per ingest batch because parquet "
    "enforces nothing (the reference relied on Postgres DDL for this; "
    "a lake must assert it analytically).  Each FK costs one anti join "
    "— dimension sides broadcast, the lineitem->orders join shuffles "
    "on the uniform orderkey.",
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, "lineitem", sf_dir)
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    p = _t(spark, "part", sf_dir)

    def _audit(name, child, key, parent, pkey):
        orphans = child.select(key).join(
            parent.select(F.col(pkey).alias(key)), key, "left_anti"
        )
        return child.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
        ).crossJoin(
            F.broadcast(
                orphans.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_orphans")
                )
            )
        )

    return (
        _audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(_audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(_audit("lineitem->part", li, "l_partkey", p, "p_partkey"))
    )


@register(
    "primary_key_audit",
    oracle="""
SELECT 'events.event_id' AS pk,
       CAST((SELECT count(*) FROM events) AS BIGINT) AS n_rows,
       CAST((SELECT count(DISTINCT event_id) FROM events) AS BIGINT)
         AS n_keys,
       CAST((SELECT count(*) FROM (
          SELECT event_id FROM events GROUP BY 1 HAVING count(*) > 1))
            AS BIGINT) AS n_dup_keys
UNION ALL
SELECT 'orders.o_orderkey',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM (
          SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))
            AS BIGINT)
UNION ALL
SELECT 'documents.doc_id',
       CAST((SELECT count(*) FROM documents) AS BIGINT),
       CAST((SELECT count(DISTINCT doc_id) FROM documents) AS BIGINT),
       CAST((SELECT count(*) FROM (
          SELECT doc_id FROM documents GROUP BY 1 HAVING count(*) > 1))
            AS BIGINT)
""",
    doc="Primary-key uniqueness audit (the UNIQUE constraint the "
    "reference declared in Postgres DDL, asserted analytically on the "
    "lake): per declared key, total rows, distinct keys and the number "
    "of violated key values.  One hash-agg per table on its uniform "
    "key; a violation count > 0 is the replay/double-ingest alarm.",
)
def q_primary_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _audit(name, df, key):
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        return per_key.agg(
            F.lit(name).alias("pk"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.count(F.when(F.col("c") > 1, F.lit(1)))
            .cast("bigint")
            .alias("n_dup_keys"),
        )

    return (
        _audit("events.event_id", _t(spark, "events", sf_dir), "event_id")
        .unionByName(
            _audit(
                "orders.o_orderkey", _t(spark, "orders", sf_dir), "o_orderkey"
            )
        )
        .unionByName(
            _audit(
                "documents.doc_id", _t(spark, "documents", sf_dir), "doc_id"
            )
        )
    )


# ---------------------------------------------------------------------------
# Tick-size conformance: are prices on the venue's 0.01 grid?
# ---------------------------------------------------------------------------
@register(
    "tick_size_conformance",
    oracle="""
SELECT event_type AS symbol,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(count(CASE WHEN round(value * 100) != round(value * 100, 6)
                       THEN 1 END) AS BIGINT) AS n_off_grid,
       round(CAST(count(CASE WHEN round(value * 100)
                                  != round(value * 100, 6) THEN 1 END)
                  AS DOUBLE) / count(*), 6) AS off_grid_rate
FROM events WHERE value > 0
GROUP BY 1
""",
    doc="Market-data QA: fraction of prices per symbol that are NOT on "
    "the 0.01 tick grid (value*100 deviates from an integer beyond "
    "double noise) — a nonzero rate means a feed is delivering "
    "mid-point/synthetic prints or a decimal bug upstream.  The "
    "comparison rounds value*100 to 6dp before testing integrality so "
    "binary-representation dust (29.99 * 100 = 2998.9999...) does not "
    "false-positive; both engines evaluate the identical expression.  "
    "One hash-agg on symbol.",
)
def q_tick_size_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, "events", sf_dir).filter(F.col("value") > 0)
    off = F.round(F.col("value") * 100, 0) != F.round(
        F.col("value") * 100, 6
    )
    n_off = F.count(F.when(off, F.lit(1)))
    return e.groupBy(F.col("event_type").alias("symbol")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        n_off.cast("bigint").alias("n_off_grid"),
        F.round(n_off.cast("double") / F.count(F.lit(1)), 6).alias(
            "off_grid_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Pairwise Jensen-Shannon divergence between source length distributions.
# ---------------------------------------------------------------------------
@register(
    "js_divergence_sources",
    oracle="""
WITH binned AS (
  SELECT source, CAST(n_chars // 100 AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
), grid AS (
  SELECT s.source, b.bin
  FROM (SELECT DISTINCT source FROM binned) s
  CROSS JOIN (SELECT DISTINCT bin FROM binned) b
), dist AS (
  SELECT g.source, g.bin,
         CAST(coalesce(c.cnt, 0) AS DOUBLE)
           / sum(coalesce(c.cnt, 0)) OVER (PARTITION BY g.source) AS p
  FROM grid g LEFT JOIN binned c
    ON c.source = g.source AND c.bin = g.bin
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.bin,
         a.p AS pa, b.p AS pb
  FROM dist a JOIN dist b
    ON a.bin = b.bin AND a.source < b.source
)
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_bins,
       round(sum(
         CASE WHEN pa > 0
              THEN 0.5 * pa * ln(2 * pa / (pa + pb)) ELSE 0 END
         + CASE WHEN pb > 0
                THEN 0.5 * pb * ln(2 * pb / (pa + pb)) ELSE 0 END), 6)
         AS js_div,
       round(sum(
         CASE WHEN pa > 0
              THEN 0.5 * pa * ln(2 * pa / (pa + pb)) ELSE 0 END
         + CASE WHEN pb > 0
                THEN 0.5 * pb * ln(2 * pb / (pa + pb)) ELSE 0 END)
         / ln(2), 6) AS js_norm
FROM pairs GROUP BY 1, 2
""",
    doc="Pairwise Jensen-Shannon divergence over 100-char length-bin "
    "distributions of every source pair: JS = KL(P||M)/2 + KL(Q||M)/2 "
    "with M the midpoint — the bounded, symmetric complement to "
    "ks_source_drift (KS sees the worst single point, JS the whole "
    "distribution; 0 = identical, ln2 = disjoint).  Same scale shape as "
    "KS: the corpus reduces ONCE to (source, bin) counts, distributions "
    "normalize on the |sources| x |bins| grid, and the pair join "
    "BROADCASTS that dimension-sized frame (no sort-merge join "
    "anywhere in the plan).  js_norm rescales to [0, 1].",
)
def q_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, "documents", sf_dir)
    binned = d.groupBy(
        "source", (F.col("n_chars") / 100).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # the corpus reduces ONCE: everything below (grid, both pair-join
    # sides) re-derives from this dimension-sized frame, so materialize it
    # — otherwise each consumer re-runs the full corpus scan (6 scans).
    # persist-with-lineage, not localCheckpoint: survives executor loss.
    binned = materialize_dim(binned)
    sources = binned.select("source").distinct()
    bins = binned.select("bin").distinct()
    grid = bins.crossJoin(F.broadcast(sources))
    wtot = Window.partitionBy("source")
    dist = (
        grid.join(F.broadcast(binned), ["source", "bin"], "left")
        .select(
            "source", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
        .withColumn(
            "p", F.col("cnt").cast("double") / F.sum("cnt").over(wtot)
        )
    )
    a = dist.select(
        F.col("source").alias("source_a"), "bin", F.col("p").alias("pa")
    )
    b = dist.select(
        F.col("source").alias("source_b"), "bin", F.col("p").alias("pb")
    )
    half = F.lit(0.5)
    term_a = F.when(
        F.col("pa") > 0,
        half * F.col("pa") * F.log(2 * F.col("pa") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("pb") > 0,
        half * F.col("pb") * F.log(2 * F.col("pb") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0))
    return (
        # both sides are the |sources| x |bins| dimension frame — the
        # pair join must broadcast, never sort-merge the grid
        F.broadcast(a).join(b, "bin")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.round(F.sum(term_a + term_b), 6).alias("js_div"),
            F.round(
                F.sum(term_a + term_b) / F.lit(math.log(2.0)), 6
            ).alias("js_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Brownian-bridge (CUSUM-around-trend) breakpoint statistic on daily counts.
# ---------------------------------------------------------------------------
@register(
    "cusum_count_drift",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS trading_day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), indexed AS (
  SELECT event_type, trading_day, cnt,
         row_number() OVER (
           PARTITION BY event_type ORDER BY trading_day) AS t,
         sum(cnt) OVER (
           PARTITION BY event_type ORDER BY trading_day) AS cum,
         count(*) OVER (PARTITION BY event_type) AS n_days,
         sum(cnt) OVER (PARTITION BY event_type) AS total
  FROM daily
), devs AS (
  SELECT event_type, n_days, total,
         abs(CAST(cum AS DOUBLE) / total - CAST(t AS DOUBLE) / n_days)
           AS dev
  FROM indexed
)
SELECT event_type,
       CAST(max(n_days) AS BIGINT) AS n_days,
       CAST(max(total) AS BIGINT) AS total_events,
       round(max(dev), 6) AS max_dev,
       max(dev) > round(1.36 / sqrt(CAST(max(n_days) AS DOUBLE)), 6)
         AS shifted
FROM devs GROUP BY 1
""",
    doc="Rate-shift detection per event type: the cumulative event share "
    "is compared against the uniform-time trend line and the maximum "
    "absolute bridge deviation max_t |cum_t/total - t/n| is the "
    "non-recursive CUSUM-around-trend statistic (the recursive CUSUM "
    "S_t = max(0, S_{t-1}+x) cannot be expressed as a distributable "
    "window; the bridge form detects the same level shifts and is one "
    "cumsum window).  Flagged against the Kolmogorov-style 1.36/sqrt(n) "
    "heuristic critical value (rounded before comparison, filter-stage "
    "rule).  Plan: one fact hash-agg to (type, day), then windows on "
    "the dimension-sized daily frame.",
)
def q_cusum_count_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("trading_day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wcum = Window.partitionBy("event_type").orderBy("trading_day")
    wtot = Window.partitionBy("event_type")
    indexed = daily.select(
        "event_type",
        F.row_number().over(wcum).alias("t"),
        F.sum("cnt").over(wcum).alias("cum"),
        F.count(F.lit(1)).over(wtot).alias("n_days"),
        F.sum("cnt").over(wtot).alias("total"),
    )
    devs = indexed.select(
        "event_type",
        "n_days",
        "total",
        F.abs(
            F.col("cum").cast("double") / F.col("total")
            - F.col("t").cast("double") / F.col("n_days")
        ).alias("dev"),
    )
    return devs.groupBy("event_type").agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.max("total").cast("bigint").alias("total_events"),
        F.round(F.max("dev"), 6).alias("max_dev"),
        (
            F.max("dev")
            > F.round(1.36 / F.sqrt(F.max("n_days").cast("double")), 6)
        ).alias("shifted"),
    )
