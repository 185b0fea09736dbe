"""Round-8 research layer: execution scheduling, signal evaluation and
portfolio accounting over the tick fact.

Reference parity: the reference pipeline (MashooqRS/quant-market-data-
pipeline) ends at the z-score signal (transform.py:58-91); this module is
part of the mandated research-layer extension — the queries a desk runs
AFTER the signal exists: is return autocorrelation exploitable (Ljung-
Box), how much to bet (Kelly), how to schedule the execution (Almgren-
Chriss), how fast the signal decays (IC horizon), what the strategy costs
to hold (turnover/cost accounting), and how returns co-crash (tail
dependence).

Scale notes common to all queries here: every one reduces the tick fact
to a (symbol, day) dimension frame FIRST (one hash-agg exchange), then
does its math on the dimension — at 100 TB the cost is the fact scan;
the research math is free.  No query joins fact-to-fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.queries.risk import (
    _DAILY_CTE,
    _daily_ohlc,
)
from quant_market_data_pipeline_spark.session import materialize_dim

# daily close log returns, shared by every query below
_RETS_CTE = f"""{_DAILY_CTE},
rets AS (
  SELECT symbol, trading_day,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol
                                         ORDER BY trading_day)) AS r
  FROM daily
), rr AS (SELECT * FROM rets WHERE r IS NOT NULL)"""


def _daily_rets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    w = Window.partitionBy("symbol").orderBy("trading_day")
    return d.select(
        "symbol",
        "trading_day",
        "close",
        (F.log("close") - F.log(F.lag("close").over(w))).alias("r"),
    ).filter(F.col("r").isNotNull())


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test on daily returns (lags 1..5).
# ---------------------------------------------------------------------------
_LB_LAGS = 5


@register(
    "ljung_box_returns",
    oracle=f"""
WITH {_RETS_CTE},
m AS (
  SELECT symbol, avg(r) AS rbar FROM rr GROUP BY symbol
), c AS (
  SELECT rr.symbol, trading_day, r - rbar AS c
  FROM rr JOIN m ON rr.symbol = m.symbol
), l AS (
  SELECT symbol, c,
         {", ".join(f"lag(c, {k}) OVER (PARTITION BY symbol ORDER BY trading_day) AS c{k}" for k in range(1, _LB_LAGS + 1))}
  FROM c
), s AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n, sum(c * c) AS denom,
         {", ".join(f"sum(c * c{k}) AS num{k}" for k in range(1, _LB_LAGS + 1))}
  FROM l GROUP BY symbol
)
SELECT symbol, n AS n_days,
       {", ".join(f"round(num{k} / denom, 6) AS rho_{k}" for k in range(1, _LB_LAGS + 1))},
       round(n * (n + 2) * ({" + ".join(f"(num{k} / denom) * (num{k} / denom) / (n - {k})" for k in range(1, _LB_LAGS + 1))}), 4) AS q_lb
FROM s
""",
    doc="Ljung-Box portmanteau statistic on daily close log returns, "
    "lags 1-5: Q = n(n+2) * sum_k rho_k^2/(n-k), with rho_k the full-"
    "sample-mean autocorrelation (two-pass: per-symbol mean joins back "
    "broadcast, lagged co-products from ONE symbol-keyed window).  The "
    "standard is-there-anything-to-trade test before fitting any serial "
    "model.  Q >> chi2(5) quantile rejects white noise.  Scale: all math on "
    "the (symbol, day) dimension; one fact exchange + one window "
    "exchange.",
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rr feeds the mean aggregate AND the centered series: materialize
    # the dimension frame so the tick fact is scanned ONCE
    rr = materialize_dim(_daily_rets(spark, sf_dir))
    m = rr.groupBy("symbol").agg(F.avg("r").alias("rbar"))
    c = rr.join(F.broadcast(m), "symbol").select(
        "symbol", "trading_day", (F.col("r") - F.col("rbar")).alias("c")
    )
    w = Window.partitionBy("symbol").orderBy("trading_day")
    lagged = c.select(
        "symbol",
        "c",
        *[F.lag("c", k).over(w).alias(f"c{k}") for k in range(1, _LB_LAGS + 1)],
    )
    s = lagged.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("denom"),
        *[
            F.sum(F.col("c") * F.col(f"c{k}")).alias(f"num{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    n = F.col("n").cast("double")
    q = n * (n + 2) * sum(
        (F.col(f"num{k}") / F.col("denom"))
        * (F.col(f"num{k}") / F.col("denom"))
        / (n - k)
        for k in range(1, _LB_LAGS + 1)
    )
    return s.select(
        "symbol",
        F.col("n").alias("n_days"),
        *[
            F.round(F.col(f"num{k}") / F.col("denom"), 6).alias(f"rho_{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
        F.round(q, 4).alias("q_lb"),
    )


# ---------------------------------------------------------------------------
# Kelly criterion sizing from the daily return distribution.
# ---------------------------------------------------------------------------
@register(
    "kelly_sizing_daily",
    oracle=f"""
WITH {_RETS_CTE}
SELECT symbol, CAST(count(*) AS BIGINT) AS n_days,
       round(avg(r) / NULLIF(var_samp(r), 0), 4) AS kelly_continuous,
       round(avg(CASE WHEN r > 0 THEN 1.0 ELSE 0.0 END), 6) AS win_rate,
       round(avg(CASE WHEN r > 0 THEN r END) /
             NULLIF(abs(avg(CASE WHEN r <= 0 THEN r END)), 0), 6)
         AS payoff_ratio,
       round(avg(CASE WHEN r > 0 THEN 1.0 ELSE 0.0 END)
             - (1.0 - avg(CASE WHEN r > 0 THEN 1.0 ELSE 0.0 END))
               / NULLIF(avg(CASE WHEN r > 0 THEN r END) /
                        NULLIF(abs(avg(CASE WHEN r <= 0 THEN r END)), 0), 0),
             6) AS kelly_discrete
FROM rr GROUP BY symbol
""",
    doc="Kelly position sizing per symbol from daily log returns: the "
    "continuous approximation f* = mu/sigma^2 and the discrete win/loss "
    "form f* = p - (1-p)/b with b the payoff ratio avg_win/|avg_loss|.  "
    "One dimension-sized aggregation; every branch NULL-guarded so a "
    "symbol with no losing (or no winning) days yields NULL rather than "
    "a division blow-up.",
)
def q_kelly_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    rr = _daily_rets(spark, sf_dir)
    win = F.avg(F.when(F.col("r") > 0, 1.0).otherwise(0.0))
    avg_win = F.avg(F.when(F.col("r") > 0, F.col("r")))
    avg_loss = F.abs(F.avg(F.when(F.col("r") <= 0, F.col("r"))))
    payoff = avg_win / F.nullif(avg_loss, F.lit(0.0))
    return rr.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.avg("r") / F.nullif(F.var_samp("r"), F.lit(0.0)), 4
        ).alias("kelly_continuous"),
        F.round(win, 6).alias("win_rate"),
        F.round(payoff, 6).alias("payoff_ratio"),
        F.round(
            win - (F.lit(1.0) - win) / F.nullif(payoff, F.lit(0.0)), 6
        ).alias("kelly_discrete"),
    )


# ---------------------------------------------------------------------------
# Almgren-Chriss optimal execution schedule (closed-form sinh trajectory).
# ---------------------------------------------------------------------------
_AC_SHARES = 10_000.0  # parent order size
_AC_BUCKETS = 12  # execution horizon in buckets
_AC_KAPPA_SCALE = 2.0**0.5  # kappa = sigma * sqrt(lambda/eta), lambda/eta=2


@register(
    "almgren_chriss_schedule",
    oracle=f"""
WITH {_RETS_CTE},
vol AS (
  SELECT symbol, stddev_samp(r) * {_AC_KAPPA_SCALE!r} AS kappa
  FROM rr GROUP BY symbol
), grid AS (
  SELECT symbol, kappa, j
  FROM vol CROSS JOIN (SELECT unnest(generate_series(0, {_AC_BUCKETS - 1}))
                       AS j)
), sched AS (
  SELECT symbol, CAST(j AS INTEGER) AS bucket_idx,
         {_AC_SHARES!r} *
           ((exp(kappa * ({_AC_BUCKETS} - j))
             - exp(-kappa * ({_AC_BUCKETS} - j))) / 2) /
           ((exp(kappa * {_AC_BUCKETS}) - exp(-kappa * {_AC_BUCKETS})) / 2)
           AS holdings,
         {_AC_SHARES!r} *
           ((exp(kappa * ({_AC_BUCKETS} - j))
             - exp(-kappa * ({_AC_BUCKETS} - j))) / 2
            - (exp(kappa * ({_AC_BUCKETS} - j - 1))
               - exp(-kappa * ({_AC_BUCKETS} - j - 1))) / 2) /
           ((exp(kappa * {_AC_BUCKETS}) - exp(-kappa * {_AC_BUCKETS})) / 2)
           AS trade
  FROM grid
)
SELECT symbol, bucket_idx, round(holdings, 4) AS holdings,
       round(trade, 4) AS trade
FROM sched
""",
    doc="Almgren-Chriss optimal liquidation schedule per symbol: the "
    "closed-form risk-averse trajectory x_j = X sinh(kappa(T-j))/"
    "sinh(kappa T) with kappa proportional to the symbol's daily return "
    "volatility (lambda/eta = 2) — higher-vol names front-load "
    "execution.  sinh is spelled (exp(x)-exp(-x))/2 IDENTICALLY on both "
    "engines so the only float divergence is 1-ulp exp noise, hidden by "
    "4dp rounding.  Scale: per-symbol sigma is one dimension agg; the "
    "schedule is a broadcast cross join against a 12-row literal grid.",
)
def q_almgren_chriss(spark: SparkSession, sf_dir: str) -> DataFrame:
    rr = _daily_rets(spark, sf_dir)
    vol = rr.groupBy("symbol").agg(
        (F.stddev_samp("r") * _AC_KAPPA_SCALE).alias("kappa")
    )
    spark_ = rr.sparkSession
    grid = spark_.range(_AC_BUCKETS).select(
        F.col("id").cast("integer").alias("bucket_idx")
    )

    def sinh(x):
        return (F.exp(x) - F.exp(-x)) / 2

    k = F.col("kappa")
    j = F.col("bucket_idx").cast("double")
    denom = sinh(k * _AC_BUCKETS)
    holdings = _AC_SHARES * sinh(k * (_AC_BUCKETS - j)) / denom
    trade = (
        _AC_SHARES
        * (sinh(k * (_AC_BUCKETS - j)) - sinh(k * (_AC_BUCKETS - j - 1)))
        / denom
    )
    return (
        vol.crossJoin(F.broadcast(grid))
        .select(
            "symbol",
            "bucket_idx",
            F.round(holdings, 4).alias("holdings"),
            F.round(trade, 4).alias("trade"),
        )
    )


# ---------------------------------------------------------------------------
# Realized skewness / excess kurtosis from explicit central power sums.
# ---------------------------------------------------------------------------
@register(
    "realized_skew_kurtosis",
    oracle=f"""
WITH {_RETS_CTE},
m AS (
  SELECT symbol, avg(r) AS rbar FROM rr GROUP BY symbol
), p AS (
  SELECT rr.symbol,
         CAST(count(*) AS BIGINT) AS n,
         sum((r - rbar) * (r - rbar)) AS m2,
         sum((r - rbar) * (r - rbar) * (r - rbar)) AS m3,
         sum((r - rbar) * (r - rbar) * (r - rbar) * (r - rbar)) AS m4
  FROM rr JOIN m ON rr.symbol = m.symbol
  GROUP BY rr.symbol
)
SELECT symbol, n AS n_days,
       round((m3 / n) / ((m2 / n) ^ 1.5), 6) AS skewness,
       round((m4 / n) / ((m2 / n) * (m2 / n)) - 3.0, 6) AS excess_kurtosis
FROM p
""",
    doc="Realized skewness g1 = m3/m2^1.5 and excess kurtosis g2 = "
    "m4/m2^2 - 3 of daily returns, computed from EXPLICIT central power "
    "sums (two-pass, mean broadcast back) rather than each engine's "
    "skewness()/kurtosis() builtins — the builtins disagree on bias "
    "correction (Spark is population-moment, DuckDB applies the sample "
    "correction), so the portable formulation is the raw moments.  "
    "Fat tails + negative skew here = the crash-risk profile VaR "
    "understates.",
)
def q_realized_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-pass moments: the returns dimension is consumed by the mean
    # aggregate and the centering join — one fact scan via materialize
    rr = materialize_dim(_daily_rets(spark, sf_dir))
    m = rr.groupBy("symbol").agg(F.avg("r").alias("rbar"))
    c = rr.join(F.broadcast(m), "symbol").select(
        "symbol", (F.col("r") - F.col("rbar")).alias("c")
    )
    p = c.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("m2"),
        F.sum(F.col("c") * F.col("c") * F.col("c")).alias("m3"),
        F.sum(F.col("c") * F.col("c") * F.col("c") * F.col("c")).alias("m4"),
    )
    n = F.col("n").cast("double")
    return p.select(
        "symbol",
        F.col("n").alias("n_days"),
        F.round(
            (F.col("m3") / n) / F.pow(F.col("m2") / n, 1.5), 6
        ).alias("skewness"),
        F.round(
            (F.col("m4") / n) / ((F.col("m2") / n) * (F.col("m2") / n))
            - 3.0,
            6,
        ).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality with a Welch t-test vs the rest of the week.
# ---------------------------------------------------------------------------
@register(
    "dow_seasonality_welch",
    oracle=f"""
WITH {_RETS_CTE},
d AS (
  SELECT symbol, EXTRACT(dow FROM trading_day) AS dow, r FROM rr
), g AS (
  SELECT symbol, dow, CAST(count(*) AS BIGINT) AS n_d,
         sum(r) AS s_d, sum(r * r) AS ss_d
  FROM d GROUP BY 1, 2
), tot AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n, sum(r) AS s,
         sum(r * r) AS ss
  FROM d GROUP BY 1
), j AS (
  SELECT g.symbol, CAST(g.dow AS INTEGER) AS dow, n_d, s_d, ss_d,
         n - n_d AS n_c, s - s_d AS s_c, ss - ss_d AS ss_c
  FROM g JOIN tot ON g.symbol = tot.symbol
)
SELECT symbol, dow, n_d AS n_days,
       round(s_d / n_d, 6) AS mean_ret,
       round((s_d / n_d - s_c / n_c) /
             NULLIF(sqrt(((ss_d - s_d * s_d / n_d) / (n_d - 1)) / n_d
                         + ((ss_c - s_c * s_c / n_c) / (n_c - 1)) / n_c),
                    0), 4) AS welch_t
FROM j
WHERE n_d >= 2 AND n_c >= 2
""",
    doc="Day-of-week return seasonality per symbol with a Welch t-stat "
    "of each weekday against the REST of the week.  One trick makes it "
    "a single-pass plan: the complement group's (n, sum, sumsq) are "
    "derived by SUBTRACTION from the per-symbol totals, so there is no "
    "anti-join — one (symbol, dow) agg + one symbol agg joined back "
    "broadcast.  dow convention: 0=Sunday (Spark dayofweek()-1 == "
    "DuckDB EXTRACT(dow)).",
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    rr = _daily_rets(spark, sf_dir)
    # d feeds the per-dow aggregate AND the per-symbol totals: one scan
    d = materialize_dim(
        rr.select(
            "symbol",
            (F.dayofweek("trading_day") - 1).alias("dow"),
            "r",
        )
    )
    g = d.groupBy("symbol", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("r").alias("s_d"),
        F.sum(F.col("r") * F.col("r")).alias("ss_d"),
    )
    tot = d.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").alias("s"),
        F.sum(F.col("r") * F.col("r")).alias("ss"),
    )
    j = g.join(F.broadcast(tot), "symbol").select(
        "symbol",
        F.col("dow").cast("integer").alias("dow"),
        "n_d",
        "s_d",
        "ss_d",
        (F.col("n") - F.col("n_d")).alias("n_c"),
        (F.col("s") - F.col("s_d")).alias("s_c"),
        (F.col("ss") - F.col("ss_d")).alias("ss_c"),
    )
    n_d = F.col("n_d").cast("double")
    n_c = F.col("n_c").cast("double")
    var_d = (F.col("ss_d") - F.col("s_d") * F.col("s_d") / n_d) / (n_d - 1)
    var_c = (F.col("ss_c") - F.col("s_c") * F.col("s_c") / n_c) / (n_c - 1)
    welch = (F.col("s_d") / n_d - F.col("s_c") / n_c) / F.nullif(
        F.sqrt(var_d / n_d + var_c / n_c), F.lit(0.0)
    )
    return (
        j.filter((F.col("n_d") >= 2) & (F.col("n_c") >= 2))
        .select(
            "symbol",
            "dow",
            F.col("n_d").alias("n_days"),
            F.round(F.col("s_d") / n_d, 6).alias("mean_ret"),
            F.round(welch, 4).alias("welch_t"),
        )
    )


# ---------------------------------------------------------------------------
# Information-coefficient decay across forward horizons.
# ---------------------------------------------------------------------------
_IC_HORIZONS = (1, 3, 5)
_IC_UNIVERSE = 5  # the full symbol universe must report, else skip the day


@register(
    "ic_decay_horizons",
    oracle=f"""
WITH {_DAILY_CTE},
lp AS (
  SELECT symbol, trading_day, ln(close) AS lc FROM daily
), sig AS (
  SELECT symbol, trading_day,
         lc - lag(lc, 5) OVER w AS signal,
         {", ".join(f"lead(lc, {h}) OVER w - lc AS f{h}" for h in _IC_HORIZONS)}
  FROM lp
  WINDOW w AS (PARTITION BY symbol ORDER BY trading_day)
), long AS (
  {" UNION ALL ".join(f"SELECT trading_day, {h} AS horizon, signal, f{h} AS fwd FROM sig WHERE signal IS NOT NULL AND f{h} IS NOT NULL" for h in _IC_HORIZONS)}
), daily_ic AS (
  SELECT trading_day, horizon, corr(signal, fwd) AS ic
  FROM long GROUP BY 1, 2
  HAVING count(*) = {_IC_UNIVERSE} AND corr(signal, fwd) IS NOT NULL
)
SELECT CAST(horizon AS INTEGER) AS horizon,
       CAST(count(*) AS BIGINT) AS n_days,
       round(avg(ic), 6) AS mean_ic,
       round(avg(ic) / NULLIF(stddev_samp(ic), 0), 4) AS ic_ir
FROM daily_ic GROUP BY horizon
""",
    doc="Signal half-life measurement: cross-sectional Pearson IC of the "
    "5-day momentum signal against forward returns at horizons 1/3/5 "
    "days, averaged over days (mean IC + IC information ratio).  A "
    "signal whose IC dies by horizon 3 cannot pay for slow execution — "
    "this is the companion number to the Almgren-Chriss schedule.  "
    "Days with an incomplete universe are skipped (count = 5 gate) so "
    "the cross-section is always the same breadth.  One window over "
    "the dimension frame computes signal and ALL horizons' forward "
    "returns; the horizon long-form is an in-row explode, not a "
    "re-scan.",
)
def q_ic_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select(
        "symbol", "trading_day", F.log("close").alias("lc")
    )
    w = Window.partitionBy("symbol").orderBy("trading_day")
    sig = d.select(
        "symbol",
        "trading_day",
        (F.col("lc") - F.lag("lc", 5).over(w)).alias("signal"),
        *[
            (F.lead("lc", h).over(w) - F.col("lc")).alias(f"f{h}")
            for h in _IC_HORIZONS
        ],
    )
    long = sig.select(
        "trading_day",
        "signal",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(h).alias("horizon"), F.col(f"f{h}").alias("fwd")
                    )
                    for h in _IC_HORIZONS
                ]
            )
        ).alias("hf"),
    ).select(
        "trading_day",
        F.col("hf.horizon").alias("horizon"),
        "signal",
        F.col("hf.fwd").alias("fwd"),
    ).filter(F.col("signal").isNotNull() & F.col("fwd").isNotNull())
    daily_ic = (
        long.groupBy("trading_day", "horizon")
        .agg(
            F.count(F.lit(1)).alias("n_sym"),
            F.corr("signal", "fwd").alias("ic"),
        )
        .filter(
            (F.col("n_sym") == _IC_UNIVERSE) & F.col("ic").isNotNull()
        )
    )
    return daily_ic.groupBy(
        F.col("horizon").cast("integer").alias("horizon")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg("ic"), 6).alias("mean_ic"),
        F.round(
            F.avg("ic") / F.nullif(F.stddev_samp("ic"), F.lit(0.0)), 4
        ).alias("ic_ir"),
    )


# ---------------------------------------------------------------------------
# Lower-tail dependence between symbol pairs.
# ---------------------------------------------------------------------------
_TAIL_Q = 0.2


@register(
    "tail_dependence_pairs",
    oracle=f"""
WITH {_RETS_CTE},
pr AS (
  SELECT symbol, trading_day, r,
         percent_rank() OVER (PARTITION BY symbol ORDER BY r, trading_day)
           AS pct
  FROM rr
), flagged AS (
  SELECT symbol, trading_day,
         CASE WHEN pct <= {_TAIL_Q!r} THEN 1.0 ELSE 0.0 END AS lo
  FROM pr
)
SELECT a.symbol AS sym_a, b.symbol AS sym_b,
       CAST(count(*) AS BIGINT) AS n_days,
       round(avg(a.lo * b.lo), 6) AS joint_lo_rate,
       round(avg(a.lo * b.lo) / {_TAIL_Q!r}, 6) AS tail_dependence
FROM flagged a JOIN flagged b
  ON a.trading_day = b.trading_day AND a.symbol < b.symbol
GROUP BY 1, 2
""",
    doc="Lower-tail dependence lambda_L = P(B in worst quintile | A in "
    "worst quintile) for every symbol pair — the co-crash measure "
    "correlation misses (Gaussian copulas have lambda_L = 0).  Tail "
    "membership is percent_rank <= 0.2 with a (r, day) deterministic "
    "ordering so both engines cut identical quintiles.  The pair join "
    "runs on the (symbol, day) DIMENSION frame (materialized once), "
    "never on ticks: |symbols|^2/2 x days rows, trivially bounded.",
)
def q_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    rr = _daily_rets(spark, sf_dir)
    wp = Window.partitionBy("symbol").orderBy("r", "trading_day")
    flagged = rr.select(
        "symbol",
        "trading_day",
        F.when(F.percent_rank().over(wp) <= _TAIL_Q, 1.0)
        .otherwise(0.0)
        .alias("lo"),
    )
    flagged = materialize_dim(flagged, partitions=1)
    a = flagged.select(
        F.col("symbol").alias("sym_a"),
        "trading_day",
        F.col("lo").alias("lo_a"),
    )
    b = flagged.select(
        F.col("symbol").alias("sym_b"),
        "trading_day",
        F.col("lo").alias("lo_b"),
    )
    return (
        a.join(b, "trading_day")
        .filter(F.col("sym_a") < F.col("sym_b"))
        .groupBy("sym_a", "sym_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.avg(F.col("lo_a") * F.col("lo_b")), 6).alias(
                "joint_lo_rate"
            ),
            F.round(
                F.avg(F.col("lo_a") * F.col("lo_b")) / _TAIL_Q, 6
            ).alias("tail_dependence"),
        )
    )


# ---------------------------------------------------------------------------
# Long-short momentum portfolio: turnover and net-of-cost accounting.
# ---------------------------------------------------------------------------
_PT_COST = 0.001  # 10 bps per unit turnover


@register(
    "portfolio_turnover_cost",
    oracle=f"""
WITH {_DAILY_CTE},
lp AS (
  SELECT symbol, trading_day, ln(close) AS lc,
         ln(close) - lag(ln(close)) OVER w AS r,
         ln(close) - lag(ln(close), 5) OVER w AS mom
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY trading_day)
), full_days AS (
  SELECT trading_day FROM lp
  WHERE mom IS NOT NULL AND r IS NOT NULL
  GROUP BY 1 HAVING count(*) = {_IC_UNIVERSE}
), ranked AS (
  SELECT lp.symbol, lp.trading_day, lp.r,
         row_number() OVER (PARTITION BY lp.trading_day
                            ORDER BY mom DESC, lp.symbol) AS rk
  FROM lp JOIN full_days USING (trading_day)
), wts AS (
  SELECT symbol, trading_day, r,
         CASE WHEN rk <= 2 THEN 0.25
              WHEN rk >= {_IC_UNIVERSE - 1} THEN -0.25
              ELSE 0.0 END AS w,
         lag(CASE WHEN rk <= 2 THEN 0.25
                  WHEN rk >= {_IC_UNIVERSE - 1} THEN -0.25
                  ELSE 0.0 END)
           OVER (PARTITION BY symbol ORDER BY trading_day) AS w_prev
  FROM ranked
), per_day AS (
  SELECT trading_day,
         sum(abs(w - coalesce(w_prev, 0.0))) AS turnover,
         sum(coalesce(w_prev, 0.0) * r) AS gross_ret
  FROM wts GROUP BY 1
)
SELECT trading_day,
       round(turnover, 6) AS turnover,
       round(gross_ret, 6) AS gross_ret,
       round(gross_ret - {_PT_COST!r} * turnover, 6) AS net_ret,
       round(sum(gross_ret - {_PT_COST!r} * turnover)
               OVER (ORDER BY trading_day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS cum_net_ret
FROM per_day
""",
    doc="Daily long-short momentum portfolio accounting: rank symbols "
    "by 5-day momentum (deterministic symbol tiebreak), hold +25bp "
    "top-2 / -25bp bottom-2 weights, then charge 10 bps per unit of "
    "one-way turnover |w_t - w_{{t-1}}|.  Returns accrue to YESTERDAY's "
    "weights (no look-ahead).  Days with an incomplete universe are "
    "skipped before ranking so the portfolio is always fully formed.  "
    "The cumulative sum is an ordered running window — identical "
    "accumulation order on both engines, so 6dp-rounded equality is "
    "exact.  Scale: everything after the daily rollup is dimension-"
    "sized; ranking is a day-keyed window over |symbols| rows.",
)
def q_portfolio_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select(
        "symbol", "trading_day", F.log("close").alias("lc")
    )
    w = Window.partitionBy("symbol").orderBy("trading_day")
    # lp feeds the universe gate AND the ranking join: one fact scan
    lp = materialize_dim(
        d.select(
            "symbol",
            "trading_day",
            (F.col("lc") - F.lag("lc").over(w)).alias("r"),
            (F.col("lc") - F.lag("lc", 5).over(w)).alias("mom"),
        )
    )
    full_days = (
        lp.filter(F.col("mom").isNotNull() & F.col("r").isNotNull())
        .groupBy("trading_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == _IC_UNIVERSE)
        .select("trading_day")
    )
    ranked = lp.join(F.broadcast(full_days), "trading_day").select(
        "symbol",
        "trading_day",
        "r",
        F.row_number()
        .over(
            Window.partitionBy("trading_day").orderBy(
                F.col("mom").desc(), "symbol"
            )
        )
        .alias("rk"),
    )
    wexpr = (
        F.when(F.col("rk") <= 2, 0.25)
        .when(F.col("rk") >= _IC_UNIVERSE - 1, -0.25)
        .otherwise(0.0)
    )
    wts = ranked.select(
        "symbol",
        "trading_day",
        "r",
        wexpr.alias("w"),
        F.lag(wexpr).over(w).alias("w_prev"),
    )
    per_day = wts.groupBy("trading_day").agg(
        F.sum(
            F.abs(F.col("w") - F.coalesce(F.col("w_prev"), F.lit(0.0)))
        ).alias("turnover"),
        F.sum(F.coalesce(F.col("w_prev"), F.lit(0.0)) * F.col("r")).alias(
            "gross_ret"
        ),
    )
    net = F.col("gross_ret") - _PT_COST * F.col("turnover")
    wcum = Window.orderBy("trading_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "trading_day",
        F.round("turnover", 6).alias("turnover"),
        F.round("gross_ret", 6).alias("gross_ret"),
        F.round(net, 6).alias("net_ret"),
        F.round(F.sum(net).over(wcum), 6).alias("cum_net_ret"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily return signs.
# ---------------------------------------------------------------------------
@register(
    "runs_test_updown",
    oracle=f"""
WITH {_RETS_CTE},
signed AS (
  SELECT symbol, trading_day,
         CASE WHEN r > 0 THEN 1 ELSE 0 END AS s,
         lag(CASE WHEN r > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY symbol ORDER BY trading_day) AS s_prev
  FROM rr
), agg AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(s) AS BIGINT) AS n_neg,
         CAST(1 + sum(CASE WHEN s_prev IS NOT NULL AND s <> s_prev
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
  FROM signed GROUP BY symbol
)
SELECT symbol, n AS n_days, n_pos, n_neg, n_runs,
       round(1.0 + 2.0 * n_pos * n_neg / n, 4) AS expected_runs,
       round((n_runs - (1.0 + 2.0 * n_pos * n_neg / n)) /
             NULLIF(sqrt((1.0 + 2.0 * n_pos * n_neg / n - 1.0)
                         * (1.0 + 2.0 * n_pos * n_neg / n - 2.0)
                         / (n - 1.0)), 0), 4) AS runs_z
FROM agg
""",
    doc="Wald-Wolfowitz runs test on daily return signs per symbol: "
    "observed up/down runs vs the exchangeability expectation mu = "
    "1 + 2*n_pos*n_neg/n, z = (R - mu)/sqrt((mu-1)(mu-2)/(n-1)).  "
    "z << 0 means fewer, longer runs (trending); z >> 0 means rapid "
    "alternation (mean reversion) — the nonparametric companion to "
    "ljung_box_returns that no distributional assumption can bias.  "
    "One symbol-keyed window (the sign-change lag) + one aggregation.",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    rr = _daily_rets(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("trading_day")
    s = F.when(F.col("r") > 0, 1).otherwise(0)
    signed = rr.select(
        "symbol", "trading_day", s.alias("s"), F.lag(s).over(w).alias("s_prev")
    )
    agg = signed.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n_neg"),
        (
            1
            + F.sum(
                F.when(
                    F.col("s_prev").isNotNull()
                    & (F.col("s") != F.col("s_prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("n_runs"),
    )
    n = F.col("n").cast("double")
    mu = 1.0 + 2.0 * F.col("n_pos") * F.col("n_neg") / n
    sigma = F.sqrt((mu - 1.0) * (mu - 2.0) / (n - 1.0))
    return agg.select(
        "symbol",
        F.col("n").alias("n_days"),
        "n_pos",
        "n_neg",
        "n_runs",
        F.round(mu, 4).alias("expected_runs"),
        F.round(
            (F.col("n_runs") - mu) / F.nullif(sigma, F.lit(0.0)), 4
        ).alias("runs_z"),
    )


# ---------------------------------------------------------------------------
# Tick-clock bars (event-time bars: every K ticks, de Prado ch.2).
# ---------------------------------------------------------------------------
_TICK_BAR_K = 50


@register(
    "tick_clock_bars",
    oracle=f"""
WITH t0 AS (
  SELECT event_type AS symbol, ts, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value > 0
), t AS (
  SELECT *, (rn - 1) // {_TICK_BAR_K} AS bar_idx FROM t0
)
SELECT symbol, CAST(bar_idx AS INTEGER) AS bar_idx,
       CAST(count(*) AS BIGINT) AS n_ticks,
       arg_min(value, rn) AS open,
       max(value) AS high, min(value) AS low,
       arg_max(value, rn) AS close,
       round(date_diff('second', min(ts), max(ts)) / 60.0, 4)
         AS span_minutes
FROM t GROUP BY symbol, bar_idx
""",
    doc="Tick-clock bars: a bar every {K} ticks instead of every N "
    "minutes (the information-driven sampling of Lopez de Prado ch.2 — "
    "bar span SHRINKS when activity spikes, so each bar carries "
    "comparable information).  span_minutes is the direct activity "
    "read-out.  Deterministic: tick order is (ts, event_id) on both "
    "engines, open/close are argmin/argmax over that composite key.  "
    "One symbol-keyed window (the running tick counter) + one hash "
    "agg — the same two exchanges as the time-clock bars."
    .replace("{K}", str(_TICK_BAR_K)),
)
def q_tick_clock_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.queries.risk import _ticks

    t = _ticks(spark, sf_dir).select(
        F.col("event_type").alias("symbol"), "ts", "value", "event_id"
    )
    w = Window.partitionBy("symbol").orderBy("ts", "event_id")
    t = t.withColumn("rn", F.row_number().over(w)).withColumn(
        "bar_idx",
        ((F.col("rn") - 1) / _TICK_BAR_K).cast("integer"),
    )
    return t.groupBy("symbol", "bar_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        F.min_by("value", "rn").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "rn").alias("close"),
        F.round(
            (F.unix_seconds(F.max("ts")) - F.unix_seconds(F.min("ts")))
            / 60.0,
            4,
        ).alias("span_minutes"),
    )


# ---------------------------------------------------------------------------
# Sequential recursions at the Arrow boundary (RECURSIVE-CTE oracles).
# ---------------------------------------------------------------------------
_KF_Q = 1e-5
_KF_R = 1e-3
_KF_Y_SYM = "click"
_KF_X_SYM = "view"
_EWMA_LAM = 0.94
# spelled as ONE Python literal so both engines parse the identical
# double (1 - 0.94 is NOT 0.06 in IEEE754)
_EWMA_ONE_MINUS_LAM = 1.0 - _EWMA_LAM

_KF_GAIN_SQL = (
    f"(pr.p + {_KF_Q!r}) * s.x / "
    f"((pr.p + {_KF_Q!r}) * s.x * s.x + {_KF_R!r})"
)
_KF_GAIN_REC_SQL = (
    f"(r.p + {_KF_Q!r}) * s.x / "
    f"((r.p + {_KF_Q!r}) * s.x * s.x + {_KF_R!r})"
)


@register(
    "kalman_hedge_beta",
    oracle=f"""
WITH RECURSIVE {_DAILY_CTE},
xy AS (
  SELECT a.trading_day, ln(a.close) AS y, ln(b.close) AS x
  FROM daily a JOIN daily b ON a.trading_day = b.trading_day
  WHERE a.symbol = '{_KF_Y_SYM}' AND b.symbol = '{_KF_X_SYM}'
), seq AS (
  SELECT trading_day, x, y,
         row_number() OVER (ORDER BY trading_day) AS rn
  FROM xy
), rec AS (
  SELECT 0 AS rn, CAST(0.0 AS DOUBLE) AS beta, CAST(1.0 AS DOUBLE) AS p
  UNION ALL
  SELECT s.rn,
         r.beta + ({_KF_GAIN_REC_SQL}) * (s.y - r.beta * s.x),
         (1.0 - ({_KF_GAIN_REC_SQL}) * s.x) * (r.p + {_KF_Q!r})
  FROM rec r JOIN seq s ON s.rn = r.rn + 1
)
SELECT '{_KF_Y_SYM}/{_KF_X_SYM}' AS pair_name, s.trading_day,
       round(s.y - pr.beta * s.x, 6) AS innovation,
       round({_KF_GAIN_SQL}, 6) AS gain,
       round(cu.beta, 6) AS beta
FROM seq s
JOIN rec cu ON cu.rn = s.rn
JOIN rec pr ON pr.rn = s.rn - 1
""",
    doc="Time-varying hedge ratio via a scalar-state Kalman filter over "
    f"the {_KF_Y_SYM}/{_KF_X_SYM} daily pair: beta random-walks (state "
    "noise Q=1e-5), y = beta*x + eps (obs noise R=1e-3); gain and "
    "covariance carry the genuine recursion (the gain depends on the "
    "previous OUTPUT, so no window frame can express it).  The adaptive "
    "successor to the flagship's fixed log-spread: innovation is the "
    "dynamically-hedged residual a pairs desk actually trades.  Runs at "
    "the Arrow boundary (operators/sequential.py: applyInPandas over "
    "the DIMENSION-sized aligned-days frame — bounded by calendar, not "
    "volume); the oracle is a DuckDB RECURSIVE CTE performing the "
    "identical IEEE op sequence, so 6dp equality holds with ~10 digits "
    "of margin.",
)
def q_kalman_hedge_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.operators.sequential import (
        kalman_hedge,
    )

    # both pair legs filter the same daily frame: one fact scan
    d = materialize_dim(
        _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    )
    ya = d.filter(F.col("symbol") == _KF_Y_SYM).select(
        "trading_day", F.log("close").alias("y")
    )
    xb = d.filter(F.col("symbol") == _KF_X_SYM).select(
        "trading_day", F.log("close").alias("x")
    )
    aligned = ya.join(xb, "trading_day").select(
        F.lit(f"{_KF_Y_SYM}/{_KF_X_SYM}").alias("pair_name"),
        "trading_day",
        "x",
        "y",
    )
    out = kalman_hedge(aligned, q=_KF_Q, r=_KF_R)
    return out.select(
        "pair_name",
        "trading_day",
        F.round("innovation", 6).alias("innovation"),
        F.round("gain", 6).alias("gain"),
        F.round("beta", 6).alias("beta"),
    )


@register(
    "ewma_vol_riskmetrics",
    oracle=f"""
WITH RECURSIVE {_RETS_CTE},
seq AS (
  SELECT symbol, trading_day, r,
         row_number() OVER (PARTITION BY symbol ORDER BY trading_day) AS rn
  FROM rr
), rec AS (
  SELECT symbol, 1 AS rn, r * r AS v FROM seq WHERE rn = 1
  UNION ALL
  SELECT x.symbol, x.rn + 1,
         {_EWMA_LAM!r} * x.v + {_EWMA_ONE_MINUS_LAM!r} * s.r * s.r
  FROM rec x JOIN seq s ON s.symbol = x.symbol AND s.rn = x.rn + 1
)
SELECT s.symbol, s.trading_day, round(s.r, 6) AS r,
       round(sqrt(rec.v), 6) AS ewma_vol
FROM seq s JOIN rec ON rec.symbol = s.symbol AND rec.rn = s.rn
""",
    doc="RiskMetrics infinite-memory EWMA volatility (lambda = 0.94): "
    "v_t = lam*v_(t-1) + (1-lam)*r_t^2, seeded at r_1^2 — the EXACT "
    "recursion, complementing ewma_bounded's window-expressible K-lag "
    "truncation.  (1-lam) is spelled as ONE Python literal on both "
    "engines (1 - 0.94 != 0.06 in IEEE754).  Arrow-boundary recursion "
    "over the per-symbol daily dimension; DuckDB RECURSIVE CTE twin "
    "with the identical op order.",
)
def q_ewma_vol_riskmetrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.operators.sequential import (
        ewma_variance,
    )

    rr = _daily_rets(spark, sf_dir).select("symbol", "trading_day", "r")
    out = ewma_variance(rr, lam=_EWMA_LAM)
    return out.select(
        "symbol",
        "trading_day",
        F.round("r", 6).alias("r"),
        F.round(F.sqrt("ewma_var"), 6).alias("ewma_vol"),
    )


# ---------------------------------------------------------------------------
# Cornish-Fisher modified VaR (r9).
# ---------------------------------------------------------------------------
# z for the 5% lower tail, shared literal so both engines run the same
# IEEE arithmetic (neither engine exposes an inverse-normal builtin).
# The SQL side must CAST to DOUBLE: DuckDB parses the bare literal as
# DECIMAL(17,16) and decimal-decimal powers overflow the 38-digit scale.
_CF_Z_VAL = -1.6448536269514722
_CF_Z = f"CAST({_CF_Z_VAL} AS DOUBLE)"


@register(
    "cornish_fisher_var",
    oracle=f"""
WITH {_RETS_CTE},
m AS (
  SELECT symbol, avg(r) AS rbar FROM rr GROUP BY symbol
), p AS (
  SELECT rr.symbol,
         CAST(count(*) AS BIGINT) AS n,
         max(rbar) AS rbar,
         sum((r - rbar) * (r - rbar)) AS m2,
         sum((r - rbar) * (r - rbar) * (r - rbar)) AS m3,
         sum((r - rbar) * (r - rbar) * (r - rbar) * (r - rbar)) AS m4
  FROM rr JOIN m ON rr.symbol = m.symbol
  GROUP BY rr.symbol
), g AS (
  SELECT symbol, n, rbar,
         sqrt(m2 / n) AS sigma,
         (m3 / n) / ((m2 / n) ^ 1.5) AS s,
         (m4 / n) / ((m2 / n) * (m2 / n)) - 3.0 AS k
  FROM p
)
SELECT symbol, n AS n_days,
       round(rbar + ({_CF_Z}) * sigma, 6) AS var_gauss,
       round(rbar + (
         ({_CF_Z})
         + (({_CF_Z}) * ({_CF_Z}) - 1.0) * s / 6.0
         + (({_CF_Z}) * ({_CF_Z}) * ({_CF_Z}) - 3.0 * ({_CF_Z})) * k / 24.0
         - (2.0 * ({_CF_Z}) * ({_CF_Z}) * ({_CF_Z}) - 5.0 * ({_CF_Z}))
           * s * s / 36.0
       ) * sigma, 6) AS var_cf,
       round(s, 6) AS skewness, round(k, 6) AS excess_kurtosis
FROM g
""",
    doc="Cornish-Fisher modified 95% VaR per symbol: the Gaussian "
    "quantile adjusted for the return distribution's own skewness and "
    "excess kurtosis (the third/fourth-moment expansion every risk desk "
    "layers over plain parametric VaR — fat left tails push the CF "
    "quantile further out than the Gaussian one).  Moments come from "
    "the same explicit central-power-sum formulation as "
    "realized_skew_kurtosis (engine builtins disagree on bias "
    "correction); the inverse-normal z is a shared literal since "
    "neither engine ships the quantile function.  Scale shape: one "
    "tick->daily rollup exchange, moments on the (symbol, day) "
    "dimension frame, no second fact scan (materialize_dim).  Read "
    "next to var_historical_es: historical vs parametric-adjusted is "
    "the standard model-risk cross-check.",
)
def q_cornish_fisher_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = _CF_Z_VAL
    rr = materialize_dim(_daily_rets(spark, sf_dir))
    m = rr.groupBy("symbol").agg(F.avg("r").alias("rbar"))
    c = rr.join(F.broadcast(m), "symbol").select(
        "symbol", "rbar", (F.col("r") - F.col("rbar")).alias("c")
    )
    p = c.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("rbar").alias("rbar"),
        F.sum(F.col("c") * F.col("c")).alias("m2"),
        F.sum(F.col("c") * F.col("c") * F.col("c")).alias("m3"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") * F.col("c")
        ).alias("m4"),
    )
    n = F.col("n").cast("double")
    sigma = F.sqrt(F.col("m2") / n)
    s = (F.col("m3") / n) / F.pow(F.col("m2") / n, 1.5)
    k = (F.col("m4") / n) / ((F.col("m2") / n) * (F.col("m2") / n)) - 3.0
    z_cf = (
        F.lit(z)
        + (F.lit(z * z) - 1.0) * s / 6.0
        + F.lit(z * z * z - 3.0 * z) * k / 24.0
        - F.lit(2.0 * z * z * z - 5.0 * z) * s * s / 36.0
    )
    return p.select(
        "symbol",
        F.col("n").alias("n_days"),
        F.round(F.col("rbar") + F.lit(z) * sigma, 6).alias("var_gauss"),
        F.round(F.col("rbar") + z_cf * sigma, 6).alias("var_cf"),
        F.round(s, 6).alias("skewness"),
        F.round(k, 6).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# GARCH(1,1) conditional volatility with shipped parameters (r9).
# ---------------------------------------------------------------------------
_G_OMEGA = 2e-6
_G_ALPHA = 0.05
_G_BETA = 0.90
_G_V0 = _G_OMEGA / (1.0 - _G_ALPHA - _G_BETA)


@register(
    "garch_11_vol",
    oracle=f"""
WITH RECURSIVE {_RETS_CTE},
seq AS (
  SELECT symbol, trading_day, r,
         row_number() OVER (PARTITION BY symbol ORDER BY trading_day) AS rn
  FROM rr
), rec AS (
  SELECT symbol, 1 AS rn, CAST({_G_V0!r} AS DOUBLE) AS v, r FROM seq
  WHERE rn = 1
  UNION ALL
  SELECT x.symbol, x.rn + 1,
         {_G_OMEGA!r} + {_G_ALPHA!r} * (x.r * x.r) + {_G_BETA!r} * x.v,
         s.r
  FROM rec x JOIN seq s ON s.symbol = x.symbol AND s.rn = x.rn + 1
)
SELECT s.symbol, s.trading_day, round(s.r, 6) AS r,
       round(sqrt(rec.v), 6) AS garch_vol
FROM seq s JOIN rec ON rec.symbol = s.symbol AND rec.rn = s.rn
""",
    doc="GARCH(1,1) one-step-ahead conditional volatility with FIXED "
    f"parameters (omega={_G_OMEGA}, alpha={_G_ALPHA}, beta={_G_BETA}): "
    "v_t = omega + alpha*r_(t-1)^2 + beta*v_(t-1), seeded at the "
    "long-run variance omega/(1-alpha-beta) — the canonical vol model "
    "between ewma_vol_riskmetrics (alpha+beta=1, no mean reversion) "
    "and rolling stddev (equal weights).  Filtering with shipped "
    "parameters is the production shape (MLE fitting is small-data "
    "offline work); genuine recursion, so it runs at the Arrow "
    "boundary over the per-symbol DAILY dimension frame "
    "(operators/sequential.py garch_variance — calendar-bounded "
    "groups, never raw ticks), with a DuckDB RECURSIVE-CTE twin "
    "carrying (v, r) state in the identical IEEE op order.",
)
def q_garch_11_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.operators.sequential import (
        garch_variance,
    )

    rr = _daily_rets(spark, sf_dir).select("symbol", "trading_day", "r")
    out = garch_variance(
        rr, omega=_G_OMEGA, alpha=_G_ALPHA, beta=_G_BETA
    )
    return out.select(
        "symbol",
        "trading_day",
        F.round("r", 6).alias("r"),
        F.round(F.sqrt("garch_var"), 6).alias("garch_vol"),
    )
