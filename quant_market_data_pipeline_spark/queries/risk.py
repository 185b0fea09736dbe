"""Risk & strategy analytics over the tick stream.

Round-4 extension of the derived-series layer (queries/quant.py): range-
based volatility estimators, risk-adjusted return ratios, return
autocorrelation, cross-sectional momentum, cointegration stage-1 and a
threshold mean-reversion backtest.  The reference stops at the z-score
signal (project/transform_data.py:145-153); a quant user also needs the
evaluation layer that decides whether the signal is tradeable.

Design rules (same as quant.py):
- every series derives from the materialized bar level, never a second
  raw-tick scan;
- window exchanges partition on symbol / pair (low-skew, bounded
  cardinality);
- regression coefficients are rounded to a fixed precision BEFORE being
  fed into downstream series on BOTH engines (the filter-stage rule,
  COVERAGE.md) so float drift cannot compound across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.bars import build_bars
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import (
    configure_runtime,
    materialize_corpus,
    materialize_dim,
)
from quant_market_data_pipeline_spark.sources.tables import load_table


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, "events", sf_dir).filter(F.col("value") > 0)


def _daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC per symbol from positive ticks (arg_min/arg_max by ts)."""
    t = _ticks(spark, sf_dir)
    return (
        t.groupBy(
            F.col("event_type").alias("symbol"),
            F.to_date("ts").alias("trading_day"),
        )
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
        )
    )


_DAILY_CTE = """
daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS trading_day,
         arg_min(value, ts) AS open, max(value) AS high,
         min(value) AS low, arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
)"""

_BARS_CTE = """
bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
)"""


# ---------------------------------------------------------------------------
# Range-based volatility: Garman-Klass and Parkinson daily estimators.
# ---------------------------------------------------------------------------
@register(
    "garman_klass_vol",
    oracle=f"""
WITH {_DAILY_CTE}
SELECT symbol, trading_day,
       round(0.5 * ln(high / low) * ln(high / low)
             - (2 * ln(2) - 1) * ln(close / open) * ln(close / open),
             6) AS gk_var,
       round(ln(high / low) * ln(high / low) / (4 * ln(2)), 6)
         AS parkinson_var
FROM daily
""",
    doc="Range-based daily volatility: Garman-Klass and Parkinson "
    "estimators from the daily OHLC aggregate.  One hash-agg on "
    "(symbol, day) builds OHLC (map-side partials), then the estimators "
    "are scalar expressions — no window, no second scan.  At 100 TB the "
    "whole query is one shuffle on a naturally uniform key.  Reference "
    "analog: the bar-level OHLC the vendor feed supplies "
    "(project/ingest_data.py:33-55), extended to the vol layer.",
)
def q_garman_klass(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir)
    hl = F.log(F.col("high") / F.col("low"))
    co = F.log(F.col("close") / F.col("open"))
    ln2 = float(__import__("math").log(2.0))
    return d.select(
        "symbol",
        "trading_day",
        F.round(0.5 * hl * hl - (2 * ln2 - 1) * co * co, 6).alias("gk_var"),
        F.round(hl * hl / (4 * ln2), 6).alias("parkinson_var"),
    )


# ---------------------------------------------------------------------------
# Risk-adjusted return ratios: Sharpe and Sortino from daily log returns.
# ---------------------------------------------------------------------------
@register(
    "sharpe_sortino_daily",
    oracle=f"""
WITH {_DAILY_CTE},
rets AS (
  SELECT symbol,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol
                                         ORDER BY trading_day)) AS r
  FROM daily
), rr AS (SELECT * FROM rets WHERE r IS NOT NULL)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_days,
       round(avg(r), 6) AS mean_ret,
       round(stddev_samp(r), 6) AS ret_sd,
       round(avg(r) / NULLIF(stddev_samp(r), 0) * sqrt(252), 4)
         AS ann_sharpe,
       round(avg(r) / NULLIF(
               sqrt(sum(CASE WHEN r < 0 THEN r * r ELSE 0 END)
                    / NULLIF(count(*) - 1, 0)), 0) * sqrt(252), 4)
         AS ann_sortino
FROM rr
GROUP BY symbol
""",
    doc="Annualized Sharpe and Sortino per symbol from daily close log "
    "returns.  Daily closes: one (symbol, day) hash-agg; returns: LAG "
    "over one symbol-partitioned window; ratios: one final per-symbol "
    "agg whose partials piggyback on the window exchange.  Downside "
    "deviation uses the sum-of-squared-negative-returns / (n-1) "
    "convention on both engines.",
)
def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    w = Window.partitionBy("symbol").orderBy("trading_day")
    r = (F.log("close") - F.log(F.lag("close").over(w))).alias("r")
    rr = d.select("symbol", r).filter(F.col("r").isNotNull())
    n = F.count(F.lit(1))
    downside = F.sqrt(
        F.sum(F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(0.0))
        / F.nullif((n - 1).cast("double"), F.lit(0.0))
    )
    sqrt252 = 252.0 ** 0.5
    return rr.groupBy("symbol").agg(
        n.cast("bigint").alias("n_days"),
        F.round(F.avg("r"), 6).alias("mean_ret"),
        F.round(F.stddev_samp("r"), 6).alias("ret_sd"),
        F.round(
            F.avg("r") / F.nullif(F.stddev_samp("r"), F.lit(0.0)) * sqrt252, 4
        ).alias("ann_sharpe"),
        F.round(
            F.avg("r") / F.nullif(downside, F.lit(0.0)) * sqrt252, 4
        ).alias("ann_sortino"),
    )


# ---------------------------------------------------------------------------
# Return autocorrelation at lags 1..3 (microstructure signature).
# ---------------------------------------------------------------------------
@register(
    "return_autocorr",
    oracle=f"""
WITH {_BARS_CTE},
rets AS (
  SELECT symbol, bar_ts,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           AS r
  FROM bars
), rr AS (SELECT * FROM rets WHERE r IS NOT NULL),
lagged AS (
  SELECT symbol, r,
         lag(r, 1) OVER (PARTITION BY symbol ORDER BY bar_ts) AS r1,
         lag(r, 2) OVER (PARTITION BY symbol ORDER BY bar_ts) AS r2,
         lag(r, 3) OVER (PARTITION BY symbol ORDER BY bar_ts) AS r3
  FROM rr
)
SELECT symbol,
       round(corr(r, r1), 4) AS ac1,
       round(corr(r, r2), 4) AS ac2,
       round(corr(r, r3), 4) AS ac3
FROM lagged
GROUP BY symbol
""",
    doc="Lag-1..3 autocorrelation of 5-min log returns per symbol — the "
    "mean-reversion / momentum signature test.  All three lags come from "
    "ONE symbol-partitioned window exchange (three LAG columns over the "
    "same sort), then one per-symbol agg computes three corr() pairs.  "
    "No self-join: the lag trick keeps it a single pass.",
)
def q_return_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    bars = build_bars(
        t, key="event_type", ts="ts", price="value", width="5 minutes",
        tiebreak="event_id",
    ).select(F.col("event_type").alias("symbol"), "bar_ts", "close")
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    rr = bars.select(
        "symbol",
        "bar_ts",
        (F.log("close") - F.log(F.lag("close").over(w))).alias("r"),
    ).filter(F.col("r").isNotNull())
    lagged = rr.select(
        "symbol",
        "r",
        F.lag("r", 1).over(w).alias("r1"),
        F.lag("r", 2).over(w).alias("r2"),
        F.lag("r", 3).over(w).alias("r3"),
    )
    return lagged.groupBy("symbol").agg(
        F.round(F.corr("r", "r1"), 4).alias("ac1"),
        F.round(F.corr("r", "r2"), 4).alias("ac2"),
        F.round(F.corr("r", "r3"), 4).alias("ac3"),
    )


# ---------------------------------------------------------------------------
# Cross-sectional momentum: yesterday's winners vs losers, today's spread.
# ---------------------------------------------------------------------------
@register(
    "xsection_momentum_spread",
    oracle=f"""
WITH {_DAILY_CTE},
rets AS (
  SELECT symbol, trading_day,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol
                                         ORDER BY trading_day)) AS r
  FROM daily
), signal AS (
  SELECT symbol, trading_day, r,
         lag(r) OVER (PARTITION BY symbol ORDER BY trading_day) AS r_prev
  FROM rets
), ranked AS (
  SELECT symbol, trading_day, r,
         row_number() OVER (PARTITION BY trading_day
                            ORDER BY r_prev DESC, symbol) AS rk,
         count(*) OVER (PARTITION BY trading_day) AS n_sym
  FROM signal WHERE r_prev IS NOT NULL AND r IS NOT NULL
)
SELECT trading_day, CAST(max(n_sym) AS BIGINT) AS n_symbols,
       round(avg(CASE WHEN rk <= 2 THEN r END), 6) AS winner_ret,
       round(avg(CASE WHEN rk > n_sym - 2 THEN r END), 6) AS loser_ret,
       round(avg(CASE WHEN rk <= 2 THEN r END)
             - avg(CASE WHEN rk > n_sym - 2 THEN r END), 6) AS momentum_spread
FROM ranked
WHERE n_sym >= 4
GROUP BY trading_day
""",
    doc="Cross-sectional momentum: rank symbols each day by YESTERDAY's "
    "return (deterministic tiebreak on symbol), long the top 2 / short "
    "the bottom 2, report today's winner-minus-loser spread.  The "
    "cross-sectional rank is a window over the trading_day partition — "
    "cardinality = universe size per day, so the exchange is tiny "
    "regardless of tick volume; all heavy lifting stays in the daily "
    "rollup.",
)
def q_xsection_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    wsym = Window.partitionBy("symbol").orderBy("trading_day")
    rets = d.select(
        "symbol",
        "trading_day",
        (F.log("close") - F.log(F.lag("close").over(wsym))).alias("r"),
    )
    signal = rets.withColumn("r_prev", F.lag("r").over(wsym)).filter(
        F.col("r_prev").isNotNull() & F.col("r").isNotNull()
    )
    wday = Window.partitionBy("trading_day").orderBy(
        F.col("r_prev").desc(), "symbol"
    )
    ranked = signal.select(
        "trading_day",
        "r",
        F.row_number().over(wday).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("trading_day"))
        .alias("n_sym"),
    ).filter(F.col("n_sym") >= 4)
    win = F.avg(F.when(F.col("rk") <= 2, F.col("r")))
    lose = F.avg(F.when(F.col("rk") > F.col("n_sym") - 2, F.col("r")))
    return ranked.groupBy("trading_day").agg(
        F.max("n_sym").cast("bigint").alias("n_symbols"),
        F.round(win, 6).alias("winner_ret"),
        F.round(lose, 6).alias("loser_ret"),
        F.round(win - lose, 6).alias("momentum_spread"),
    )


# ---------------------------------------------------------------------------
# Engle-Granger stage 1: OLS hedge ratio + residual mean-reversion stats.
# ---------------------------------------------------------------------------
@register(
    "engle_granger_pair",
    oracle=f"""
WITH {_DAILY_CTE},
px AS (SELECT symbol, trading_day, ln(close) AS lp FROM daily),
aligned AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.trading_day,
         a.lp AS x, b.lp AS y
  FROM px a JOIN px b
    ON a.trading_day = b.trading_day AND a.symbol < b.symbol
), fit AS (
  SELECT sym_a, sym_b,
         round(covar_samp(y, x) / NULLIF(var_samp(x), 0), 6) AS beta,
         round(avg(y) - covar_samp(y, x) / NULLIF(var_samp(x), 0) * avg(x),
               6) AS alpha,
         CAST(count(*) AS BIGINT) AS n_days
  FROM aligned GROUP BY 1, 2
), resid AS (
  SELECT al.sym_a, al.sym_b, al.trading_day, f.beta, f.alpha, f.n_days,
         al.y - f.alpha - f.beta * al.x AS e
  FROM aligned al JOIN fit f
    ON al.sym_a = f.sym_a AND al.sym_b = f.sym_b
), lagged AS (
  SELECT sym_a, sym_b, beta, alpha, n_days, e,
         lag(e) OVER (PARTITION BY sym_a, sym_b ORDER BY trading_day)
           AS e_prev
  FROM resid
)
SELECT sym_a, sym_b, any_value(n_days) AS n_days,
       any_value(beta) AS beta, any_value(alpha) AS alpha,
       round(corr(e, e_prev), 4) AS resid_rho1,
       round(avg((e - e_prev) * e_prev) / NULLIF(avg(e_prev * e_prev), 0), 4)
         AS adf_gamma
FROM lagged WHERE e_prev IS NOT NULL
GROUP BY sym_a, sym_b
""",
    doc="Engle-Granger cointegration stage 1 per symbol pair: OLS hedge "
    "ratio beta on aligned daily log closes, then the residual's lag-1 "
    "autocorrelation and the ADF-regression slope gamma from "
    "delta_e = gamma * e_prev (gamma << 0 => mean-reverting spread).  "
    "beta/alpha are rounded to 6dp BEFORE the residual series is formed "
    "on BOTH engines (filter-stage rule) so coefficient float drift "
    "cannot compound into the autocorrelation.  Plan: daily rollup -> "
    "day-key self-join (output is |universe|^2 per day, bounded) -> "
    "per-pair agg -> broadcast fit back -> one pair-partitioned window.",
)
def q_engle_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select(
        "symbol", "trading_day", F.log("close").alias("lp")
    )
    d = materialize_corpus(d)  # both self-join sides
    a = d.select(
        F.col("symbol").alias("sym_a"), "trading_day", F.col("lp").alias("x")
    )
    b = d.select(
        F.col("symbol").alias("sym_b"), "trading_day", F.col("lp").alias("y")
    )
    aligned = a.join(b, "trading_day").filter(F.col("sym_a") < F.col("sym_b"))
    aligned = materialize_corpus(aligned)  # reused below
    beta_raw = F.covar_samp("y", "x") / F.nullif(
        F.var_samp("x"), F.lit(0.0)
    )
    fit = aligned.groupBy("sym_a", "sym_b").agg(
        F.round(beta_raw, 6).alias("beta"),
        F.round(F.avg("y") - beta_raw * F.avg("x"), 6).alias("alpha"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    resid = aligned.join(F.broadcast(fit), ["sym_a", "sym_b"]).withColumn(
        "e", F.col("y") - F.col("alpha") - F.col("beta") * F.col("x")
    )
    w = Window.partitionBy("sym_a", "sym_b").orderBy("trading_day")
    lagged = resid.withColumn("e_prev", F.lag("e").over(w)).filter(
        F.col("e_prev").isNotNull()
    )
    return lagged.groupBy("sym_a", "sym_b").agg(
        F.any_value("n_days").alias("n_days"),
        F.any_value("beta").alias("beta"),
        F.any_value("alpha").alias("alpha"),
        F.round(F.corr("e", "e_prev"), 4).alias("resid_rho1"),
        F.round(
            F.avg((F.col("e") - F.col("e_prev")) * F.col("e_prev"))
            / F.nullif(F.avg(F.col("e_prev") * F.col("e_prev")), F.lit(0.0)),
            4,
        ).alias("adf_gamma"),
    )


# ---------------------------------------------------------------------------
# Threshold mean-reversion backtest on the 5-min z-score.
# ---------------------------------------------------------------------------
@register(
    "meanrev_backtest_5min",
    oracle=f"""
WITH {_BARS_CTE},
stat AS (
  SELECT symbol, bar_ts, close,
         avg(close) OVER w AS ma,
         stddev_samp(close) OVER w AS sd,
         count(*) OVER w AS c
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts
               ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
), sig AS (
  SELECT symbol, bar_ts, close,
         CASE WHEN c >= 30 AND sd > 0
              THEN round((close - ma) / sd, 6) END AS z
  FROM stat
), pos AS (
  SELECT symbol, bar_ts, close,
         CASE WHEN z > 2 THEN -1 WHEN z < -2 THEN 1 ELSE 0 END AS position,
         ln(lead(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           - ln(close) AS next_r
  FROM sig
), pnl AS (
  SELECT symbol, position, next_r, position * next_r AS ret
  FROM pos WHERE next_r IS NOT NULL
)
SELECT symbol,
       CAST(count(CASE WHEN position != 0 THEN 1 END) AS BIGINT)
         AS n_bars_in_position,
       round(sum(ret), 6) AS total_logret,
       round(CAST(count(CASE WHEN position != 0 AND ret > 0 THEN 1 END)
                  AS DOUBLE)
             / NULLIF(count(CASE WHEN position != 0 THEN 1 END), 0), 4)
         AS hit_rate
FROM pnl
GROUP BY symbol
""",
    doc="Evaluation layer for the flagship-style z-score signal: enter "
    "short at z > 2 / long at z < -2 (position formed at bar t, applied "
    "to the t -> t+1 log return via LEAD), report bars-in-position, "
    "total strategy log return and hit rate per symbol.  z is rounded "
    "to 6dp BEFORE thresholding on both engines so a float-drift "
    "boundary flip cannot change a trade.  Everything runs in the ONE "
    "symbol-partitioned window exchange (rolling moments, LEAD) plus a "
    "final per-symbol agg — the same plan shape as the flagship, so "
    "the backtest adds no shuffle a signal scan would not already pay.",
)
def q_meanrev_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    bars = build_bars(
        t, key="event_type", ts="ts", price="value", width="5 minutes",
        tiebreak="event_id",
    ).select(F.col("event_type").alias("symbol"), "bar_ts", "close")
    w = Window.partitionBy("symbol").orderBy("bar_ts").rowsBetween(-59, 0)
    ws = Window.partitionBy("symbol").orderBy("bar_ts")
    ma = F.avg("close").over(w)
    sd = F.stddev_samp("close").over(w)
    c = F.count(F.lit(1)).over(w)
    sig = bars.select(
        "symbol",
        "bar_ts",
        "close",
        F.when(
            (c >= 30) & (sd > 0), F.round((F.col("close") - ma) / sd, 6)
        ).alias("z"),
    )
    pos = sig.select(
        "symbol",
        (
            F.when(F.col("z") > 2, -1)
            .when(F.col("z") < -2, 1)
            .otherwise(0)
        ).alias("position"),
        (F.log(F.lead("close").over(ws)) - F.log("close")).alias("next_r"),
    ).filter(F.col("next_r").isNotNull())
    pnl = pos.withColumn("ret", F.col("position") * F.col("next_r"))
    in_pos = F.count(F.when(F.col("position") != 0, F.lit(1)))
    return pnl.groupBy("symbol").agg(
        in_pos.cast("bigint").alias("n_bars_in_position"),
        F.round(F.sum("ret"), 6).alias("total_logret"),
        F.round(
            F.count(
                F.when((F.col("position") != 0) & (F.col("ret") > 0), F.lit(1))
            ).cast("double")
            / F.nullif(in_pos, F.lit(0)),
            4,
        ).alias("hit_rate"),
    )


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation between symbol pairs.
# ---------------------------------------------------------------------------
@register(
    "lead_lag_xcorr",
    oracle=f"""
WITH {_BARS_CTE},
rets AS (
  SELECT symbol, bar_ts,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           AS r
  FROM bars
), rr AS (
  SELECT symbol, bar_ts, r,
         lag(r) OVER (PARTITION BY symbol ORDER BY bar_ts) AS r_prev
  FROM rets WHERE r IS NOT NULL
), j AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b,
         a.r AS ra, a.r_prev AS ra_prev, b.r AS rb, b.r_prev AS rb_prev
  FROM rr a JOIN rr b ON a.bar_ts = b.bar_ts AND a.symbol < b.symbol
  WHERE a.r_prev IS NOT NULL AND b.r_prev IS NOT NULL
)
SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n_obs,
       round(corr(ra_prev, rb), 4) AS a_leads_b,
       round(corr(rb_prev, ra), 4) AS b_leads_a
FROM j GROUP BY 1, 2
""",
    doc="Lead-lag structure between symbol pairs: corr(r_a(t-1), r_b(t)) "
    "vs corr(r_b(t-1), r_a(t)) — which asset's last bar predicts the "
    "other's next.  The lag columns ride the same symbol-partitioned "
    "window pass as the return build, the alignment is one bar_ts "
    "equi-join (output linear in bars x universe), and rows missing "
    "either lag are dropped explicitly so both engines correlate the "
    "identical row set.",
)
def q_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    bars = build_bars(
        t, key="event_type", ts="ts", price="value", width="5 minutes",
        tiebreak="event_id",
    ).select(F.col("event_type").alias("symbol"), "bar_ts", "close")
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    rr = (
        bars.select(
            "symbol",
            "bar_ts",
            (F.log("close") - F.log(F.lag("close").over(w))).alias("r"),
        )
        .filter(F.col("r").isNotNull())
        .withColumn("r_prev", F.lag("r").over(w))
    )
    rr = materialize_corpus(rr)  # both self-join sides
    a = rr.select(
        F.col("symbol").alias("sym_a"),
        "bar_ts",
        F.col("r").alias("ra"),
        F.col("r_prev").alias("ra_prev"),
    )
    b = rr.select(
        F.col("symbol").alias("sym_b"),
        "bar_ts",
        F.col("r").alias("rb"),
        F.col("r_prev").alias("rb_prev"),
    )
    j = (
        a.join(b, "bar_ts")
        .filter(F.col("sym_a") < F.col("sym_b"))
        .filter(F.col("ra_prev").isNotNull() & F.col("rb_prev").isNotNull())
    )
    return j.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.round(F.corr("ra_prev", "rb"), 4).alias("a_leads_b"),
        F.round(F.corr("rb_prev", "ra"), 4).alias("b_leads_a"),
    )


# ---------------------------------------------------------------------------
# Kyle's lambda: per-day price-impact regression on signed bar volume.
# ---------------------------------------------------------------------------
@register(
    "kyle_lambda_daily",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close, count(*) AS volume
  FROM events WHERE value > 0 GROUP BY 1, 2
), d AS (
  SELECT symbol, CAST(bar_ts AS DATE) AS trading_day, bar_ts, volume,
         close - lag(close) OVER (PARTITION BY symbol, CAST(bar_ts AS DATE)
                                  ORDER BY bar_ts) AS dp
  FROM bars
), s AS (
  SELECT symbol, trading_day, dp,
         volume * CASE WHEN dp > 0 THEN 1 WHEN dp < 0 THEN -1 ELSE 0 END
           AS signed_vol
  FROM d WHERE dp IS NOT NULL
)
SELECT symbol, trading_day, CAST(count(*) AS BIGINT) AS n_bars,
       CASE WHEN var_samp(signed_vol) > 0
            THEN round(covar_samp(dp, signed_vol) / var_samp(signed_vol), 8)
       END AS kyle_lambda
FROM s GROUP BY 1, 2
""",
    doc="Kyle's lambda price-impact proxy per (symbol, day): regress the "
    "5-min close change on tick-rule-signed bar volume — the slope is "
    "the per-unit-flow price move, the microstructure cousin of "
    "amihud_illiquidity.  The day-scoped LAG shares the bar build's "
    "symbol exchange; the regression moments are one (symbol, day) "
    "hash-agg with map-side partials.",
)
def q_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    bars = build_bars(
        t, key="event_type", ts="ts", price="value", width="5 minutes",
        tiebreak="event_id",
    ).select(F.col("event_type").alias("symbol"), "bar_ts", "close", "volume")
    day = F.to_date("bar_ts").alias("trading_day")
    w = Window.partitionBy("symbol", F.to_date("bar_ts")).orderBy("bar_ts")
    d = bars.select(
        "symbol",
        day,
        "volume",
        (F.col("close") - F.lag("close").over(w)).alias("dp"),
    ).filter(F.col("dp").isNotNull())
    s = d.withColumn(
        "signed_vol",
        F.col("volume")
        * F.when(F.col("dp") > 0, 1).when(F.col("dp") < 0, -1).otherwise(0),
    )
    return s.groupBy("symbol", "trading_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bars"),
        F.when(
            F.var_samp("signed_vol") > 0,
            F.round(
                F.covar_samp("dp", "signed_vol") / F.var_samp("signed_vol"), 8
            ),
        ).alias("kyle_lambda"),
    )


# ---------------------------------------------------------------------------
# Historical VaR + expected shortfall from daily log returns.
# ---------------------------------------------------------------------------
@register(
    "var_historical_es",
    oracle="""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS trading_day,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), rets AS (
  SELECT symbol,
         ln(close) - ln(lag(close) OVER (
           PARTITION BY symbol ORDER BY trading_day)) AS r
  FROM daily
), q AS (
  SELECT symbol, round(quantile_cont(r, 0.05), 6) AS var_95
  FROM rets WHERE r IS NOT NULL GROUP BY 1
)
SELECT r.symbol, CAST(count(*) AS BIGINT) AS n_days,
       max(q.var_95) AS var_95,
       round(avg(CASE WHEN r.r <= q.var_95 THEN r.r END), 6) AS es_95
FROM rets r JOIN q ON r.symbol = q.symbol
WHERE r.r IS NOT NULL
GROUP BY 1
""",
    doc="Historical 95% value-at-risk and expected shortfall per symbol "
    "from daily log returns: VaR = the 5th percentile (linear-"
    "interpolated), ES = mean return at or below it.  The per-symbol "
    "quantile frame is symbol-cardinality-sized and BROADCAST back onto "
    "the return series (no second shuffle); the quantile is rounded to "
    "6dp on both engines BEFORE the tail filter (filter-stage rule) so "
    "the ES row set is engine-identical.  Exact interpolated percentile "
    "is a sort-based agg per symbol — at 100 TB of DAILY returns the "
    "series per symbol is years-bounded (~10^4 rows), so exactness is "
    "affordable where it matters and approx_percentile stays the tick-"
    "level tool (approx_percentile_prices).",
)
def q_var_historical_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    daily = t.groupBy(
        F.col("event_type").alias("symbol"),
        F.to_date("ts").alias("trading_day"),
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("close"))
    w = Window.partitionBy("symbol").orderBy("trading_day")
    rets = (
        daily.withColumn(
            "r", F.log("close") - F.log(F.lag("close").over(w))
        )
        .filter(F.col("r").isNotNull())
        .select("symbol", "r")
    )
    # two consumers (quantile cut + ES join-back) — materialize the
    # (symbol, day)-sized return frame so the tick scan runs once.
    # persist-with-lineage, not localCheckpoint: survives executor loss.
    rets = materialize_dim(rets)
    q = rets.groupBy("symbol").agg(
        F.round(F.percentile("r", F.lit(0.05)), 6).alias("var_95")
    )
    return (
        rets.join(F.broadcast(q), "symbol")
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.max("var_95").alias("var_95"),
            F.round(
                F.avg(F.when(F.col("r") <= F.col("var_95"), F.col("r"))), 6
            ).alias("es_95"),
        )
    )


# ---------------------------------------------------------------------------
# Lo-MacKinlay variance-ratio test (random-walk diagnostic).
# ---------------------------------------------------------------------------
@register(
    "variance_ratio_test",
    oracle=f"""
WITH {_DAILY_CTE},
rets AS (
  SELECT symbol,
         ln(close) - ln(lag(close, 1) OVER w) AS r1,
         ln(close) - ln(lag(close, 2) OVER w) AS rk2,
         ln(close) - ln(lag(close, 5) OVER w) AS rk5,
         ln(close) - ln(lag(close, 10) OVER w) AS rk10
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY trading_day)
), stats AS (
  SELECT symbol,
         CAST(count(r1) AS BIGINT) AS n_obs,
         var_samp(r1) AS v1, var_samp(rk2) AS v2,
         var_samp(rk5) AS v5, var_samp(rk10) AS v10
  FROM rets GROUP BY symbol
)
SELECT symbol, k, n_obs,
       round(vr, 6) AS vr,
       round((vr - 1) / sqrt(2.0 * (2 * k - 1) * (k - 1)
                             / (3.0 * k * n_obs)), 4) AS z_stat,
       abs((vr - 1) / sqrt(2.0 * (2 * k - 1) * (k - 1)
                           / (3.0 * k * n_obs))) > 1.96 AS rejects_rw
FROM (
  SELECT symbol, n_obs, t.k,
         CASE t.k WHEN 2 THEN v2 / (2 * v1)
                  WHEN 5 THEN v5 / (5 * v1)
                  ELSE v10 / (10 * v1) END AS vr
  FROM stats CROSS JOIN (VALUES (2), (5), (10)) AS t(k)
)
""",
    doc="Lo-MacKinlay variance-ratio test per symbol at horizons k = "
    "2/5/10 days: VR(k) = Var(r_k) / (k * Var(r_1)) over OVERLAPPING "
    "k-day log returns (r_k = ln C_t - ln C_(t-k), three constant-"
    "offset LAGs over ONE symbol window), with the homoscedastic "
    "z-statistic z = (VR-1)/sqrt(2(2k-1)(k-1)/(3kn)) and the 5%% "
    "random-walk rejection flag.  VR < 1 = mean reversion, > 1 = "
    "momentum — the formal test behind the return_autocorr signature.  "
    "Scale shape: one (symbol, day) hash-agg, one window exchange "
    "carrying all four LAG columns, one per-symbol agg whose partials "
    "ride the window exchange; the horizon grid is an in-row CASE over "
    "a 3-row broadcast.  Variances are ddof=1 on both engines.",
)
def q_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    w = Window.partitionBy("symbol").orderBy("trading_day")
    lc = F.log("close")
    rets = d.select(
        "symbol",
        (lc - F.log(F.lag("close", 1).over(w))).alias("r1"),
        (lc - F.log(F.lag("close", 2).over(w))).alias("rk2"),
        (lc - F.log(F.lag("close", 5).over(w))).alias("rk5"),
        (lc - F.log(F.lag("close", 10).over(w))).alias("rk10"),
    )
    stats = rets.groupBy("symbol").agg(
        F.count("r1").cast("bigint").alias("n_obs"),
        F.var_samp("r1").alias("v1"),
        F.var_samp("rk2").alias("v2"),
        F.var_samp("rk5").alias("v5"),
        F.var_samp("rk10").alias("v10"),
    )
    grid = stats.crossJoin(
        F.broadcast(
            stats.sparkSession.createDataFrame(
                [(2,), (5,), (10,)], "k int"
            )
        )
    )
    vr = (
        F.when(F.col("k") == 2, F.col("v2") / (2 * F.col("v1")))
        .when(F.col("k") == 5, F.col("v5") / (5 * F.col("v1")))
        .otherwise(F.col("v10") / (10 * F.col("v1")))
    )
    se = F.sqrt(
        2.0
        * (2 * F.col("k") - 1)
        * (F.col("k") - 1)
        / (3.0 * F.col("k") * F.col("n_obs"))
    )
    z = (vr - 1) / se
    return grid.select(
        "symbol",
        "k",
        "n_obs",
        F.round(vr, 6).alias("vr"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("rejects_rw"),
    )


# ---------------------------------------------------------------------------
# Yang-Zhang volatility: the drift-independent OHLC estimator.
# ---------------------------------------------------------------------------
@register(
    "yang_zhang_vol",
    oracle=f"""
WITH {_DAILY_CTE},
seq AS (
  SELECT symbol, trading_day, open, high, low, close,
         lag(close) OVER (PARTITION BY symbol ORDER BY trading_day)
           AS prev_close
  FROM daily
), terms AS (
  SELECT symbol,
         ln(open / prev_close) AS r_on,
         ln(close / open) AS r_oc,
         ln(high / open) * ln(high / close)
           + ln(low / open) * ln(low / close) AS rs_term
  FROM seq WHERE prev_close IS NOT NULL
), agg AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n_days,
         var_samp(r_on) AS s2_on,
         var_samp(r_oc) AS s2_oc,
         avg(rs_term) AS s2_rs,
         0.34 / (1.34 + (count(*) + 1.0) / (count(*) - 1.0)) AS k_yz
  FROM terms GROUP BY symbol
)
SELECT symbol, n_days,
       round(s2_on, 8) AS sigma2_overnight,
       round(s2_oc, 8) AS sigma2_openclose,
       round(s2_rs, 8) AS sigma2_rs,
       round(k_yz, 6) AS k_yz,
       round(s2_on + k_yz * s2_oc + (1 - k_yz) * s2_rs, 8) AS yz_var
FROM agg
""",
    doc="Yang-Zhang (2000) volatility per symbol: the minimum-variance "
    "drift-independent combination sigma2_overnight + k*sigma2_openclose "
    "+ (1-k)*sigma2_RS, where the Rogers-Satchell term handles intraday "
    "drift and k = 0.34/(1.34 + (n+1)/(n-1)).  Completes the range-vol "
    "family next to garman_klass_vol (drift-sensitive) by adding the "
    "overnight gap the close-to-close and GK estimators both miss.  "
    "Scale shape: one (symbol, day) hash-agg builds OHLC, ONE window "
    "exchange on the low-skew symbol key carries lag(close), and the "
    "per-symbol moment agg partial-aggregates map-side on the same "
    "partitioning — two exchanges total, no second tick scan.  "
    "Variances ddof=1 on both engines; components rounded only at the "
    "output edge so the combination uses full precision.",
)
def q_yang_zhang_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("trading_day")
    seq = d.withColumn("prev_close", F.lag("close").over(w)).filter(
        F.col("prev_close").isNotNull()
    )
    ho = F.log(F.col("high") / F.col("open"))
    hc = F.log(F.col("high") / F.col("close"))
    lo = F.log(F.col("low") / F.col("open"))
    lc_ = F.log(F.col("low") / F.col("close"))
    terms = seq.select(
        "symbol",
        F.log(F.col("open") / F.col("prev_close")).alias("r_on"),
        F.log(F.col("close") / F.col("open")).alias("r_oc"),
        (ho * hc + lo * lc_).alias("rs_term"),
    )
    n = F.count(F.lit(1))
    k_yz = 0.34 / (1.34 + (n + 1.0) / (n - 1.0))
    agg = terms.groupBy("symbol").agg(
        n.cast("bigint").alias("n_days"),
        F.var_samp("r_on").alias("s2_on"),
        F.var_samp("r_oc").alias("s2_oc"),
        F.avg("rs_term").alias("s2_rs"),
        k_yz.alias("k_raw"),
    )
    return agg.select(
        "symbol",
        "n_days",
        F.round("s2_on", 8).alias("sigma2_overnight"),
        F.round("s2_oc", 8).alias("sigma2_openclose"),
        F.round("s2_rs", 8).alias("sigma2_rs"),
        F.round("k_raw", 6).alias("k_yz"),
        F.round(
            F.col("s2_on")
            + F.col("k_raw") * F.col("s2_oc")
            + (1 - F.col("k_raw")) * F.col("s2_rs"),
            8,
        ).alias("yz_var"),
    )


# ---------------------------------------------------------------------------
# Triple-barrier labeling (Lopez de Prado): ML training labels from paths.
# ---------------------------------------------------------------------------
_TB_HORIZON = 10
_TB_UP = 1.02
_TB_DN = 0.98


@register(
    "triple_barrier_labels",
    oracle=f"""
WITH {_DAILY_CTE},
paths AS (
  SELECT symbol, trading_day, close,
         list(high) OVER w AS fut_high,
         list(low)  OVER w AS fut_low
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY trading_day
               ROWS BETWEEN 1 FOLLOWING AND {_TB_HORIZON} FOLLOWING)
), pos AS (
  SELECT symbol, trading_day, close,
         CAST(coalesce(len(fut_high), 0) AS INTEGER) AS n_future,
         CAST(coalesce(list_position(
           list_transform(fut_high, x -> x >= close * {_TB_UP}), true), 0)
           AS BIGINT) AS up_pos,
         CAST(coalesce(list_position(
           list_transform(fut_low, x -> x <= close * {_TB_DN}), true), 0)
           AS BIGINT) AS dn_pos
  FROM paths
)
SELECT symbol, trading_day, n_future, up_pos, dn_pos,
       CASE WHEN up_pos > 0 AND (dn_pos = 0 OR up_pos < dn_pos) THEN 1
            WHEN dn_pos > 0 AND (up_pos = 0 OR dn_pos < up_pos) THEN -1
            ELSE 0 END AS label,
       CASE WHEN up_pos > 0 AND (dn_pos = 0 OR up_pos < dn_pos) THEN up_pos
            WHEN dn_pos > 0 AND (up_pos = 0 OR dn_pos < up_pos) THEN dn_pos
            END AS t_hit
FROM pos
""",
    doc="Triple-barrier labeling (Lopez de Prado, Advances in Financial "
    "ML ch.3) — the labeling stage a market-ML training pipeline needs: "
    "for each (symbol, day) entry at the close, scan the next "
    f"{_TB_HORIZON} sessions and label +1 if the day-range HIGH touches "
    "the +2% barrier first, -1 if the LOW touches -2% first, 0 on "
    "timeout or a same-day tie (both barriers inside one session are "
    "unordered at daily resolution).  t_hit = sessions until the "
    "deciding touch (NULL on timeout).  Scale shape: one (symbol, day) "
    "hash-agg, then ONE window exchange whose bounded "
    f"ROWS 1..{_TB_HORIZON} FOLLOWING frame collects the future "
    "high/low path — the barrier scan is in-row array logic "
    "(transform + array_position = first-touch index), so no self-join "
    "and no range join; cost is O(rows x horizon) flat, the plan you "
    "want at 100x.  First-touch uses array_position on a boolean "
    "transform, 1-based with 0 = never touched on both engines.",
)
def q_triple_barrier_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("trading_day")
        .rowsBetween(1, _TB_HORIZON)
    )
    paths = d.select(
        "symbol",
        "trading_day",
        "close",
        F.collect_list("high").over(w).alias("fut_high"),
        F.collect_list("low").over(w).alias("fut_low"),
    )
    up_bar = F.col("close") * _TB_UP
    dn_bar = F.col("close") * _TB_DN
    pos = paths.select(
        "symbol",
        "trading_day",
        F.size("fut_high").alias("n_future"),
        F.array_position(
            F.transform("fut_high", lambda x: x >= up_bar), F.lit(True)
        ).alias("up_pos"),
        F.array_position(
            F.transform("fut_low", lambda x: x <= dn_bar), F.lit(True)
        ).alias("dn_pos"),
    )
    up_first = (F.col("up_pos") > 0) & (
        (F.col("dn_pos") == 0) | (F.col("up_pos") < F.col("dn_pos"))
    )
    dn_first = (F.col("dn_pos") > 0) & (
        (F.col("up_pos") == 0) | (F.col("dn_pos") < F.col("up_pos"))
    )
    return pos.select(
        "symbol",
        "trading_day",
        "n_future",
        "up_pos",
        "dn_pos",
        F.when(up_first, F.lit(1))
        .when(dn_first, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("label"),
        F.when(up_first, F.col("up_pos"))
        .when(dn_first, F.col("dn_pos"))
        .alias("t_hit"),
    )


# ---------------------------------------------------------------------------
# Cross-sectional rank information coefficient: signal quality per day.
# ---------------------------------------------------------------------------
@register(
    "signal_rank_ic",
    oracle=f"""
WITH {_DAILY_CTE},
sig AS (
  SELECT symbol, trading_day,
         ln(close) - ln(lag(close, 3) OVER w) AS mom,
         ln(lead(close) OVER w) - ln(close) AS fwd
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY trading_day)
), ranked AS (
  SELECT trading_day,
         row_number() OVER (PARTITION BY trading_day
                            ORDER BY mom, symbol) AS rk_sig,
         row_number() OVER (PARTITION BY trading_day
                            ORDER BY fwd, symbol) AS rk_fwd,
         count(*) OVER (PARTITION BY trading_day) AS n_sym
  FROM sig WHERE mom IS NOT NULL AND fwd IS NOT NULL
)
SELECT trading_day, CAST(max(n_sym) AS BIGINT) AS n_symbols,
       round(corr(rk_sig, rk_fwd), 4) AS rank_ic
FROM ranked WHERE n_sym >= 4 GROUP BY trading_day
""",
    doc="Spearman rank IC of a 3-day momentum signal against next-day "
    "forward returns: each day, rank the universe by signal and by "
    "realized forward return (deterministic symbol tiebreak -> "
    "row_number, identical on both engines), then Pearson-correlate the "
    "two rank vectors — the standard alpha-research signal-quality "
    "series.  Plan shape: both the signal lag and the forward lead run "
    "over ONE symbol-keyed window on the daily frame; the two "
    "cross-sectional ranks and the per-day correlate share one "
    "day-keyed exchange whose cardinality is the universe size — all "
    "heavy lifting stays in the (symbol, day) tick rollup, so the "
    "cross-section never sees tick volume.",
)
def q_signal_rank_ic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    wsym = Window.partitionBy("symbol").orderBy("trading_day")
    sig = d.select(
        "symbol",
        "trading_day",
        (F.log("close") - F.log(F.lag("close", 3).over(wsym))).alias("mom"),
        (F.log(F.lead("close").over(wsym)) - F.log("close")).alias("fwd"),
    ).filter(F.col("mom").isNotNull() & F.col("fwd").isNotNull())
    wm = Window.partitionBy("trading_day").orderBy("mom", "symbol")
    wf = Window.partitionBy("trading_day").orderBy("fwd", "symbol")
    ranked = sig.select(
        "trading_day",
        F.row_number().over(wm).alias("rk_sig"),
        F.row_number().over(wf).alias("rk_fwd"),
        F.count(F.lit(1))
        .over(Window.partitionBy("trading_day"))
        .alias("n_sym"),
    ).filter(F.col("n_sym") >= 4)
    return ranked.groupBy("trading_day").agg(
        F.max("n_sym").cast("bigint").alias("n_symbols"),
        F.round(F.corr("rk_sig", "rk_fwd"), 4).alias("rank_ic"),
    )


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis on daily returns.
# ---------------------------------------------------------------------------
_RS_SIZES = (4, 8, 16)


@register(
    "hurst_rs_exponent",
    oracle=f"""
WITH {_DAILY_CTE},
rets AS (
  SELECT symbol,
         ln(close) - ln(lag(close) OVER w) AS r,
         row_number() OVER w AS rn
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY trading_day)
), blocks AS (
  SELECT symbol, sz, (rn - 2) // sz AS blk,
         (rn - 2) % sz + 1 AS pos, r
  FROM rets CROSS JOIN (SELECT unnest([4, 8, 16]) AS sz)
  WHERE r IS NOT NULL
), dev AS (
  SELECT symbol, sz, blk, r,
         sum(r) OVER (PARTITION BY symbol, sz, blk ORDER BY pos)
           - pos * avg(r) OVER (PARTITION BY symbol, sz, blk) AS z
  FROM blocks
), rs AS (
  SELECT symbol, sz,
         (max(z) - min(z)) / stddev_pop(r) AS rs_val
  FROM dev GROUP BY symbol, sz, blk
  HAVING count(*) = sz AND stddev_pop(r) > 0
), pts AS (
  SELECT symbol, ln(CAST(sz AS DOUBLE)) AS x,
         ln(round(avg(rs_val), 6)) AS y
  FROM rs GROUP BY symbol, sz
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_sizes,
       round((avg(x * y) - avg(x) * avg(y))
             / NULLIF(avg(x * x) - avg(x) * avg(x), 0), 4) AS hurst
FROM pts GROUP BY symbol HAVING count(*) >= 2
""",
    doc="Hurst exponent by rescaled-range analysis: per symbol, daily log "
    "returns are cut into non-overlapping blocks of 4/8/16 sessions; "
    "each complete block contributes R/S = (range of cumulative "
    "mean-deviations) / stddev_pop, and the Hurst estimate is the OLS "
    "slope of ln(mean R/S) on ln(block size) (H=0.5 random walk, >0.5 "
    "trending, <0.5 mean-reverting).  mean R/S is rounded BEFORE the "
    "log-log fit (filter-stage rule) so the slope sees identical "
    "points on both engines; the within-block cumulative sum runs in "
    "deterministic pos order.  Plan shape: the tick fact reduces once "
    "to (symbol, day) OHLC; the 3 block sizes multiply the daily "
    "DIMENSION frame map-side (explode), so the block windows and "
    "the two tiny rollups never touch tick volume again.",
)
def q_hurst_rs_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    wsym = Window.partitionBy("symbol").orderBy("trading_day")
    rets = d.select(
        "symbol",
        (F.log("close") - F.log(F.lag("close").over(wsym))).alias("r"),
        F.row_number().over(wsym).alias("rn"),
    ).filter(F.col("r").isNotNull())
    sz = F.explode(
        F.array(*[F.lit(s) for s in _RS_SIZES])
    ).alias("sz")
    blocks = rets.select(
        "symbol",
        "r",
        "rn",
        sz,
    ).select(
        "symbol",
        "sz",
        ((F.col("rn") - 2) / F.col("sz")).cast("bigint").alias("blk"),
        ((F.col("rn") - 2) % F.col("sz") + 1).alias("pos"),
        "r",
    )
    wblk = Window.partitionBy("symbol", "sz", "blk")
    z = (
        F.sum("r").over(wblk.orderBy("pos"))
        - F.col("pos") * F.avg("r").over(wblk)
    )
    dev = blocks.select("symbol", "sz", "blk", "r", z.alias("z"))
    rs = (
        dev.groupBy("symbol", "sz", "blk")
        .agg(
            ((F.max("z") - F.min("z")) / F.stddev_pop("r")).alias("rs_val"),
            F.count(F.lit(1)).alias("n_obs"),
            F.stddev_pop("r").alias("sd"),
        )
        .filter((F.col("n_obs") == F.col("sz")) & (F.col("sd") > 0))
    )
    pts = (
        rs.groupBy("symbol", "sz")
        .agg(F.round(F.avg("rs_val"), 6).alias("mean_rs"))
        .select(
            "symbol",
            F.log(F.col("sz").cast("double")).alias("x"),
            F.log("mean_rs").alias("y"),
        )
    )
    slope = (
        F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")
    ) / F.nullif(
        F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"), F.lit(0.0)
    )
    return (
        pts.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_sizes"),
            F.round(slope, 4).alias("hurst"),
        )
        .filter(F.col("n_sizes") >= 2)
        .select("symbol", "n_sizes", "hurst")
    )


# ---------------------------------------------------------------------------
# Event study: cumulative abnormal returns after outlier-return days.
# ---------------------------------------------------------------------------
@register(
    "event_study_car",
    oracle=f"""
WITH {_DAILY_CTE},
rets AS (
  SELECT symbol, trading_day,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol
                                         ORDER BY trading_day)) AS r
  FROM daily
), mkt AS (
  SELECT trading_day, avg(r) AS m
  FROM rets WHERE r IS NOT NULL GROUP BY 1
), ab AS (
  SELECT symbol, trading_day, round(rets.r - mkt.m, 6) AS a
  FROM rets JOIN mkt USING (trading_day) WHERE rets.r IS NOT NULL
), thr AS (
  SELECT symbol, round(2 * stddev_samp(a), 6) AS cut
  FROM ab GROUP BY 1
), car AS (
  SELECT ab.symbol, a, cut,
         a + lead(a, 1) OVER w + lead(a, 2) OVER w AS car3
  FROM ab JOIN thr USING (symbol)
  WINDOW w AS (PARTITION BY ab.symbol ORDER BY trading_day)
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_events,
       round(avg(car3), 6) AS mean_car3,
       round(avg(CASE WHEN car3 > 0 THEN 1.0 ELSE 0.0 END), 4) AS win_rate
FROM car WHERE abs(a) > cut AND car3 IS NOT NULL
GROUP BY symbol
""",
    doc="Event-study layer: flag days where a symbol's abnormal return "
    "(daily log return minus the equal-weight market mean) exceeds 2 "
    "sample-sigmas, then measure the 3-session cumulative abnormal "
    "return from the event day — does the shock continue or revert.  "
    "Abnormal returns are rounded BEFORE both the threshold compare "
    "and the CAR sum (filter-stage rule): the event classification is "
    "then an exact compare of identical doubles on both engines — no "
    "boundary flakes from float-order drift in the market mean.  Plan "
    "shape: one tick-fact OHLC rollup; market mean and the 2-sigma "
    "cuts are day-/symbol-sized frames that join back BROADCAST; the "
    "lead window rides the symbol partitioning.",
)
def q_event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    wsym = Window.partitionBy("symbol").orderBy("trading_day")
    # the daily return frame feeds FOUR consumers (market mean, abnormal
    # join, sigma cuts, the lead window) — materialize the dimension-
    # sized reduction once so the tick fact is scanned exactly once
    rets = materialize_dim(
        d.select(
            "symbol",
            "trading_day",
            (F.log("close") - F.log(F.lag("close").over(wsym))).alias("r"),
        ).filter(F.col("r").isNotNull())
    )
    mkt = rets.groupBy("trading_day").agg(F.avg("r").alias("m"))
    ab = rets.join(F.broadcast(mkt), "trading_day").select(
        "symbol",
        "trading_day",
        F.round(F.col("r") - F.col("m"), 6).alias("a"),
    )
    thr = ab.groupBy("symbol").agg(
        F.round(2 * F.stddev_samp("a"), 6).alias("cut")
    )
    car3 = (
        F.col("a")
        + F.lead("a", 1).over(wsym)
        + F.lead("a", 2).over(wsym)
    )
    car = ab.join(F.broadcast(thr), "symbol").select(
        "symbol", "a", "cut", car3.alias("car3")
    )
    return (
        car.filter(
            (F.abs("a") > F.col("cut")) & F.col("car3").isNotNull()
        )
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("car3"), 6).alias("mean_car3"),
            F.round(
                F.avg(F.when(F.col("car3") > 0, 1.0).otherwise(0.0)), 4
            ).alias("win_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Minimum-variance two-asset allocation per symbol pair.
# ---------------------------------------------------------------------------
@register(
    "min_variance_pair_weights",
    oracle=f"""
WITH {_DAILY_CTE},
rets AS (
  SELECT symbol, trading_day,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol
                                         ORDER BY trading_day)) AS r
  FROM daily
), joined AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.r AS ra, b.r AS rb
  FROM rets a JOIN rets b USING (trading_day)
  WHERE a.symbol < b.symbol AND a.r IS NOT NULL AND b.r IS NOT NULL
), mom AS (
  SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n_days,
         round(var_samp(ra), 8) AS va,
         round(var_samp(rb), 8) AS vb,
         round(covar_samp(ra, rb), 8) AS cab
  FROM joined GROUP BY 1, 2
), wts AS (
  SELECT *, round((vb - cab) / NULLIF(va + vb - 2 * cab, 0), 6) AS w_a
  FROM mom
)
SELECT sym_a, sym_b, n_days, va, vb, cab, w_a,
       round(w_a * w_a * va + (1 - w_a) * (1 - w_a) * vb
             + 2 * w_a * (1 - w_a) * cab, 8) AS port_var,
       round(least(va, vb)
             - (w_a * w_a * va + (1 - w_a) * (1 - w_a) * vb
                + 2 * w_a * (1 - w_a) * cab), 8) AS var_reduction
FROM wts
""",
    doc="Markowitz closed form for every symbol pair: the unconstrained "
    "minimum-variance weight w_a = (var_b - cov)/(var_a + var_b - "
    "2 cov), the resulting portfolio variance and the reduction vs the "
    "better single asset.  Moments are rounded to 8dp BEFORE the "
    "weight, and the weight to 6dp BEFORE the portfolio variance "
    "(filter-stage rule twice) — every downstream value is arithmetic "
    "on identical doubles.  Plan shape: the tick fact reduces once to "
    "the materialized daily-return frame; the pair alignment is a "
    "self-join of that DIMENSION frame on trading_day (broadcast, "
    "universe^2 x days rows at most) — tick volume never enters the "
    "quadratic stage.",
)
def q_min_variance_pair_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    wsym = Window.partitionBy("symbol").orderBy("trading_day")
    rets = materialize_dim(
        d.select(
            "symbol",
            "trading_day",
            (F.log("close") - F.log(F.lag("close").over(wsym))).alias("r"),
        ).filter(F.col("r").isNotNull())
    )
    a = rets.select(
        "trading_day",
        F.col("symbol").alias("sym_a"),
        F.col("r").alias("ra"),
    )
    b = rets.select(
        "trading_day",
        F.col("symbol").alias("sym_b"),
        F.col("r").alias("rb"),
    )
    joined = a.join(F.broadcast(b), "trading_day").filter(
        F.col("sym_a") < F.col("sym_b")
    )
    mom = joined.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.var_samp("ra"), 8).alias("va"),
        F.round(F.var_samp("rb"), 8).alias("vb"),
        F.round(F.covar_samp("ra", "rb"), 8).alias("cab"),
    )
    w_a = F.round(
        (F.col("vb") - F.col("cab"))
        / F.nullif(
            F.col("va") + F.col("vb") - 2 * F.col("cab"), F.lit(0.0)
        ),
        6,
    )
    wts = mom.withColumn("w_a", w_a)
    pv = (
        F.col("w_a") * F.col("w_a") * F.col("va")
        + (1 - F.col("w_a")) * (1 - F.col("w_a")) * F.col("vb")
        + 2 * F.col("w_a") * (1 - F.col("w_a")) * F.col("cab")
    )
    return wts.select(
        "sym_a",
        "sym_b",
        "n_days",
        "va",
        "vb",
        "cab",
        "w_a",
        F.round(pv, 8).alias("port_var"),
        F.round(F.least("va", "vb") - pv, 8).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# STL-lite: trend / day-of-week seasonal / residual decomposition.
# ---------------------------------------------------------------------------
@register(
    "stl_decomposition_daily",
    oracle=f"""
WITH {_DAILY_CTE},
lc AS (
  SELECT symbol, trading_day,
         CAST(date_diff('day', DATE '2024-01-01', trading_day) % 7
              AS INTEGER) AS dow,
         ln(close) AS lc
  FROM daily
), tr AS (
  SELECT symbol, trading_day, dow, lc,
         CASE WHEN count(*) OVER w7 = 7
              THEN round(avg(lc) OVER w7, 6) END AS trend
  FROM lc
  WINDOW w7 AS (PARTITION BY symbol ORDER BY trading_day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT symbol, trading_day, dow, trend,
         round(lc - trend, 6) AS detrended,
         CAST(round((lc - trend) * 1e6) AS BIGINT) AS det_u
  FROM tr WHERE trend IS NOT NULL
), seas AS (
  SELECT symbol, trading_day, dow, trend, detrended,
         round(CAST(sum(det_u) OVER wd AS DOUBLE)
               / (count(*) OVER wd * 1e6), 6) AS seasonal
  FROM det
  WINDOW wd AS (PARTITION BY symbol, dow)
)
SELECT symbol, trading_day, dow, trend, detrended, seasonal,
       round(detrended - seasonal, 6) AS residual
FROM seas
""",
    doc="STL-style decomposition of the daily log-close: trend = centered "
    "7-session moving average (complete windows only), day-of-week "
    "seasonal = per-(symbol, dow) mean of the detrended series (dow "
    "anchored to a fixed Monday epoch so both engines bucket "
    "identically), residual = what neither explains.  Each stage is "
    "rounded before the next consumes it (filter-stage rule).  Plan "
    "shape: one (symbol, day) OHLC reduction, then the trend window "
    "AND the (symbol, dow) seasonal window both ride hash(symbol) — "
    "subset clustering — so the whole decomposition adds ONE exchange "
    "beyond the rollup.",
)
def q_stl_decomposition_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    lc = d.select(
        "symbol",
        "trading_day",
        (
            F.datediff("trading_day", F.lit("2024-01-01")) % 7
        ).cast("int").alias("dow"),
        F.log("close").alias("lc"),
    )
    w7 = (
        Window.partitionBy("symbol")
        .orderBy("trading_day")
        .rowsBetween(-3, 3)
    )
    tr = lc.select(
        "symbol",
        "trading_day",
        "dow",
        "lc",
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.round(F.avg("lc").over(w7), 6)
        ).alias("trend"),
    ).filter(F.col("trend").isNotNull())
    det = tr.select(
        "symbol",
        "trading_day",
        "dow",
        "trend",
        F.round(F.col("lc") - F.col("trend"), 6).alias("detrended"),
        # integer micro-units: the seasonal mean of ALREADY-ROUNDED 6dp
        # values lands exactly on .5e-6 rounding boundaries, where
        # engine-order float sums flip the last digit — sum exact int
        # micros instead so both engines divide identical numbers
        F.round((F.col("lc") - F.col("trend")) * 1e6, 0)
        .cast("long")
        .alias("det_u"),
    )
    wdow = Window.partitionBy("symbol", "dow")
    seasonal = F.round(
        F.sum("det_u").over(wdow).cast("double")
        / (F.count(F.lit(1)).over(wdow) * F.lit(1e6)),
        6,
    )
    seas = det.select(
        "symbol",
        "trading_day",
        "dow",
        "trend",
        "detrended",
        seasonal.alias("seasonal"),
    )
    return seas.select(
        "symbol",
        "trading_day",
        "dow",
        "trend",
        "detrended",
        "seasonal",
        F.round(F.col("detrended") - F.col("seasonal"), 6).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Volatility regime transitions: 2-state Markov persistence per symbol.
# ---------------------------------------------------------------------------
@register(
    "vol_regime_transitions",
    oracle=f"""
WITH {_DAILY_CTE},
gk AS (
  SELECT symbol, trading_day,
         round(0.5 * ln(high / low) * ln(high / low)
               - (2 * ln(2) - 1) * ln(close / open) * ln(close / open),
               8) AS v
  FROM daily
), med AS (
  SELECT symbol, median(v) AS m FROM gk GROUP BY symbol
), regimes AS (
  SELECT gk.symbol, trading_day,
         CASE WHEN v > m THEN 1 ELSE 0 END AS hi,
         lag(CASE WHEN v > m THEN 1 ELSE 0 END) OVER (
           PARTITION BY gk.symbol ORDER BY trading_day) AS prev_hi
  FROM gk JOIN med ON med.symbol = gk.symbol
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(count(CASE WHEN prev_hi = 1 AND hi = 1 THEN 1 END) AS BIGINT)
         AS n_hh,
       CAST(count(CASE WHEN prev_hi = 1 AND hi = 0 THEN 1 END) AS BIGINT)
         AS n_hl,
       CAST(count(CASE WHEN prev_hi = 0 AND hi = 1 THEN 1 END) AS BIGINT)
         AS n_lh,
       CAST(count(CASE WHEN prev_hi = 0 AND hi = 0 THEN 1 END) AS BIGINT)
         AS n_ll,
       round(CAST(count(CASE WHEN prev_hi = hi THEN 1 END) AS DOUBLE)
             / count(*), 4) AS persistence
FROM regimes WHERE prev_hi IS NOT NULL
GROUP BY symbol
""",
    doc="Regime-switching diagnostic: classify each (symbol, day) as "
    "HIGH/LOW volatility against the symbol's median Garman-Klass "
    "variance (variance rounded to 8dp first; the median of identical "
    "rounded values interpolates identically on both engines, so the "
    "threshold compare has no float boundary), then count the 2-state "
    "Markov transition cells and the persistence probability "
    "P(stay) — the empirical basis for a vol-targeting overlay.  Plan "
    "shape: one (symbol, day) OHLC reduction; the per-symbol median "
    "is a symbol-sized frame joined back BROADCAST; the transition "
    "lag rides the symbol window and the final rollup "
    "partial-aggregates per symbol.",
)
def q_vol_regime_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    d = _daily_ohlc(spark, sf_dir)
    hl = F.log(F.col("high") / F.col("low"))
    co = F.log(F.col("close") / F.col("open"))
    ln2 = float(math.log(2.0))
    gk = d.select(
        "symbol",
        "trading_day",
        F.round(0.5 * hl * hl - (2 * ln2 - 1) * co * co, 8).alias("v"),
    )
    med = gk.groupBy("symbol").agg(F.median("v").alias("m"))
    hi = F.when(F.col("v") > F.col("m"), 1).otherwise(0)
    wsym = Window.partitionBy("symbol").orderBy("trading_day")
    regimes = (
        gk.join(F.broadcast(med), "symbol")
        .select(
            "symbol",
            "trading_day",
            hi.alias("hi"),
            F.lag(hi).over(wsym).alias("prev_hi"),
        )
        .filter(F.col("prev_hi").isNotNull())
    )
    cell = lambda a, b: F.count(  # noqa: E731
        F.when((F.col("prev_hi") == a) & (F.col("hi") == b), 1)
    ).cast("bigint")
    return regimes.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        cell(1, 1).alias("n_hh"),
        cell(1, 0).alias("n_hl"),
        cell(0, 1).alias("n_lh"),
        cell(0, 0).alias("n_ll"),
        F.round(
            F.count(F.when(F.col("prev_hi") == F.col("hi"), 1)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            4,
        ).alias("persistence"),
    )


# ---------------------------------------------------------------------------
# Newey-West (1987) HAC-robust mean-return t-statistic.
# ---------------------------------------------------------------------------
@register(
    "newey_west_tstat",
    oracle=f"""
WITH {_DAILY_CTE},
rets AS (
  SELECT symbol, trading_day,
         ln(close / lag(close) OVER (
           PARTITION BY symbol ORDER BY trading_day)) AS r
  FROM daily
), demeaned AS (
  SELECT symbol, trading_day,
         round(avg(r) OVER (PARTITION BY symbol), 10) AS m,
         r - round(avg(r) OVER (PARTITION BY symbol), 10) AS d
  FROM rets WHERE r IS NOT NULL
), lagged AS (
  SELECT symbol, m, d,
         lag(d, 1) OVER w AS d1, lag(d, 2) OVER w AS d2,
         lag(d, 3) OVER w AS d3, lag(d, 4) OVER w AS d4,
         lag(d, 5) OVER w AS d5
  FROM demeaned WINDOW w AS (PARTITION BY symbol ORDER BY trading_day)
), sums AS (
  SELECT symbol, min(m) AS mu, CAST(count(*) AS BIGINT) AS n_ret,
         round((sum(d * d)
                + 2 * ((1 - 1/6.0) * coalesce(sum(d * d1), 0)
                     + (1 - 2/6.0) * coalesce(sum(d * d2), 0)
                     + (1 - 3/6.0) * coalesce(sum(d * d3), 0)
                     + (1 - 4/6.0) * coalesce(sum(d * d4), 0)
                     + (1 - 5/6.0) * coalesce(sum(d * d5), 0)))
               / count(*), 10) AS s_nw
  FROM lagged GROUP BY symbol
)
SELECT symbol, n_ret, mu,
       s_nw,
       CASE WHEN s_nw > 0
            THEN round(mu / sqrt(s_nw / n_ret), 6) END AS t_nw
FROM sums
""",
    doc="Newey-West (1987) HAC-robust t-statistic on the mean daily log "
    "return per symbol: serial correlation inflates the naive t-stat, "
    "so the long-run variance S = g0 + 2*sum_l w_l*g_l with Bartlett "
    "weights w_l = 1 - l/(L+1), L=5 replaces the iid variance — the "
    "significance test behind every 'is this alpha real' table.  "
    "Determinism follows the filter-stage rule twice: the mean is "
    "rounded to 10dp BEFORE demeaning (so the d series is identical "
    "on both engines; the raw float mean is partition-order "
    "sensitive), and S is rounded to 10dp before the t-ratio.  The "
    "autocovariance sums are plain float aggs rounded at 10dp — at "
    "the ~1e-3 magnitudes of squared daily returns the partition-"
    "order drift (~1e-18) sits nine orders below the quantum.  "
    "Bartlett weights are built from ONE literal expression "
    "(1 - l/6.0) parsed identically by both engines.  Scale shape: "
    "ONE symbol-window exchange covers the return lag, the unbounded "
    "mean window and all five autocovariance lags; the final rollup "
    "partial-aggregates on the same key — two shuffles end to end.",
)
def q_newey_west_tstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    w = Window.partitionBy("symbol").orderBy("trading_day")
    wall = Window.partitionBy("symbol")
    rets = d.select(
        "symbol",
        "trading_day",
        F.log(F.col("close") / F.lag("close").over(w)).alias("r"),
    ).filter(F.col("r").isNotNull())
    m = F.round(F.avg("r").over(wall), 10)
    demeaned = rets.select(
        "symbol", "trading_day", m.alias("m"), (F.col("r") - m).alias("d")
    )
    lagged = demeaned.select(
        "symbol",
        "m",
        "d",
        *[F.lag("d", l).over(w).alias(f"d{l}") for l in range(1, 6)],
    )
    gl = [
        F.coalesce(F.sum(F.col("d") * F.col(f"d{l}")), F.lit(0.0))
        for l in range(1, 6)
    ]
    bartlett = [1.0 - l / 6.0 for l in range(1, 6)]
    # left-to-right addition chain identical to the oracle's (reduce, not
    # Python sum(): sum() prepends an integer 0 and 0 + (-0.0) flips the
    # zero sign, a strict-gate hazard on degenerate all-zero series)
    from functools import reduce
    from operator import add

    weighted = reduce(add, [F.lit(wl) * g for wl, g in zip(bartlett, gl)])
    s_nw = F.round(
        (F.sum(F.col("d") * F.col("d")) + 2 * weighted)
        / F.count(F.lit(1)),
        10,
    )
    sums = lagged.groupBy("symbol").agg(
        F.min("m").alias("mu"),
        F.count(F.lit(1)).cast("bigint").alias("n_ret"),
        s_nw.alias("s_nw"),
    )
    t = F.when(
        F.col("s_nw") > 0,
        F.round(F.col("mu") / F.sqrt(F.col("s_nw") / F.col("n_ret")), 6),
    )
    return sums.select("symbol", "n_ret", "mu", "s_nw", t.alias("t_nw"))


# ---------------------------------------------------------------------------
# Fama-MacBeth (1973) two-pass cross-sectional regression on the
# momentum signal — the parametric complement to signal_rank_ic.
# ---------------------------------------------------------------------------
@register(
    "fama_macbeth_momentum",
    oracle=f"""
WITH {_DAILY_CTE},
sig AS (
  SELECT symbol, trading_day,
         ln(close) - ln(lag(close, 3) OVER w) AS mom,
         ln(lead(close) OVER w) - ln(close) AS fwd
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY trading_day)
), xs AS (
  SELECT trading_day,
         CAST(count(*) AS BIGINT) AS n_sym,
         sum(mom) AS sx, sum(fwd) AS sy,
         sum(mom * fwd) AS sxy, sum(mom * mom) AS sxx
  FROM sig WHERE mom IS NOT NULL AND fwd IS NOT NULL
  GROUP BY trading_day
), slopes AS (
  SELECT trading_day,
         round((n_sym * sxy - sx * sy) /
               nullif(n_sym * sxx - sx * sx, 0.0), 8) AS lam
  FROM xs WHERE n_sym >= 4
)
SELECT CAST(count(lam) AS BIGINT) AS n_days,
       round(avg(lam), 8) AS lambda_mean,
       round(stddev_samp(lam) / sqrt(count(lam)), 8) AS lambda_se,
       CASE WHEN stddev_samp(lam) > 0
            THEN round(avg(lam) / (stddev_samp(lam) / sqrt(count(lam))), 4)
       END AS lambda_tstat
FROM slopes
""",
    doc="Fama-MacBeth (1973) two-pass test of the 3-day momentum signal: "
    "each day, regress next-day forward returns on the signal across "
    "the universe (OLS slope from raw co-moment sums, the same "
    "closed form both engines compute); then treat the daily slope "
    "series as T iid draws — lambda_mean is the premium estimate and "
    "lambda_tstat its significance.  The parametric complement to "
    "signal_rank_ic's Spearman IC (same signal/forward definitions, "
    "same >=4-symbol cross-section gate); for autocorrelation-robust "
    "errors compose with the newey_west_tstat machinery.  "
    "Determinism: daily slopes are rounded to 8dp BEFORE the pass-2 "
    "aggregation (filter-stage rule) and the pass-2 outputs round at "
    "8/4dp, orders of magnitude above cross-engine drift in the "
    "~1e-2-magnitude sums.  Scale shape: all heavy lifting is the "
    "(symbol, day) tick rollup; the cross-sectional sums share one "
    "day-keyed exchange whose cardinality is the universe size, and "
    "pass 2 is a scalar all-reduce over T rows.",
)
def q_fama_macbeth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_ohlc(spark, sf_dir).select("symbol", "trading_day", "close")
    w = Window.partitionBy("symbol").orderBy("trading_day")
    sig = d.select(
        "symbol",
        "trading_day",
        (F.log("close") - F.log(F.lag("close", 3).over(w))).alias("mom"),
        (F.log(F.lead("close").over(w)) - F.log("close")).alias("fwd"),
    ).filter(F.col("mom").isNotNull() & F.col("fwd").isNotNull())
    xs = sig.groupBy("trading_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sym"),
        F.sum("mom").alias("sx"),
        F.sum("fwd").alias("sy"),
        F.sum(F.col("mom") * F.col("fwd")).alias("sxy"),
        F.sum(F.col("mom") * F.col("mom")).alias("sxx"),
    )
    lam = F.round(
        (F.col("n_sym") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.nullif(
            F.col("n_sym") * F.col("sxx") - F.col("sx") * F.col("sx"),
            F.lit(0.0),
        ),
        8,
    )
    slopes = xs.filter(F.col("n_sym") >= 4).select(lam.alias("lam"))
    se = F.stddev_samp("lam") / F.sqrt(F.count("lam"))
    return slopes.agg(
        F.count("lam").cast("bigint").alias("n_days"),
        F.round(F.avg("lam"), 8).alias("lambda_mean"),
        F.round(se, 8).alias("lambda_se"),
        F.when(
            F.stddev_samp("lam") > 0, F.round(F.avg("lam") / se, 4)
        ).alias("lambda_tstat"),
    )
