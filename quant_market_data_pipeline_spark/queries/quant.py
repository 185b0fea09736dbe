"""Quant-analytics window/rollup queries over the tick stream.

The reference stops at bar building + z-score (transform_data.py); a quant
user of a 100 TB tick lake also needs the derived-series layer: returns,
realized volatility, drawdown, hierarchical bar rollups (the
hypertable/continuous-aggregate pattern) and cross-symbol return
correlation.  All are window/aggregate compositions — no UDFs, one
hash-shuffle per aggregation level, window exchanges on (symbol) or
(pair) keys that are low-skew by construction.

Scale notes per query are in the docstrings; the common design rule is:
derive coarse series FROM the next-finer materialized series (bars from
ticks once, hours from 5-min bars, days from hours) so each rollup level
reads ~1/width of the previous level instead of re-scanning raw ticks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.bars import build_bars
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import (
    configure_runtime,
    materialize_corpus,
)
from quant_market_data_pipeline_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, "events", sf_dir)


def _bars_close(
    spark: SparkSession, sf_dir: str, positive_ticks: bool = False
) -> DataFrame:
    """5-min close series per symbol (deterministic last-by-(ts, event_id)).

    ``positive_ticks``: drop value <= 0 ticks BEFORE bar building — the
    clean-then-aggregate order the return-series oracles use.  Filtering
    bar closes after the fact diverges when a bucket's last tick is
    non-positive but earlier ticks are valid (the bucket should survive
    with the last VALID tick as close; observed at sf0.1).
    """
    ticks = _events(spark, sf_dir)
    if positive_ticks:
        ticks = ticks.filter(F.col("value") > 0)
    bars = build_bars(
        ticks,
        key="event_type",
        ts="ts",
        price="value",
        width="5 minutes",
        tiebreak="event_id",
    )
    return bars.select(
        F.col("event_type").alias("symbol"), "bar_ts", "close"
    )


# ---------------------------------------------------------------------------
# Log returns + daily realized volatility.
# ---------------------------------------------------------------------------
@register(
    "bar_returns_daily_vol",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), rets AS (
  SELECT symbol, bar_ts,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           AS r
  FROM bars
)
SELECT symbol, CAST(bar_ts AS DATE) AS trading_day,
       CAST(count(r) AS BIGINT) AS n_ret,
       round(avg(r), 6) AS mean_ret,
       round(stddev_samp(r), 6) AS ret_stddev,
       round(sum(r * r), 6) AS realized_var
FROM rets
GROUP BY 1, 2
""",
    doc="5-min log returns (LAG over the close series) rolled to daily "
    "realized volatility.  Two shuffles total: bar hash-agg on (symbol, "
    "bucket), then the window exchange on symbol doubles as the partial "
    "for the daily agg.  Returns derive from the materialized bar series, "
    "not raw ticks — the rollup reads bars/width rows.",
)
def q_bar_returns_daily_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir, positive_ticks=True)
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    rets = bars.withColumn(
        "r", F.log("close") - F.log(F.lag("close").over(w))
    )
    return (
        rets.groupBy("symbol", F.to_date("bar_ts").alias("trading_day"))
        .agg(
            F.count("r").alias("n_ret"),
            F.round(F.avg("r"), 6).alias("mean_ret"),
            F.round(F.stddev_samp("r"), 6).alias("ret_stddev"),
            F.round(F.sum(F.col("r") * F.col("r")), 6).alias("realized_var"),
        )
    )


# ---------------------------------------------------------------------------
# Maximum drawdown from the running peak of the daily close series.
# ---------------------------------------------------------------------------
@register(
    "max_drawdown",
    oracle="""
WITH daily AS (
  SELECT event_type AS symbol, date_trunc('day', ts) AS trading_day,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), tracked AS (
  SELECT symbol, trading_day, close,
         max(close) OVER (PARTITION BY symbol ORDER BY trading_day
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM daily
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       round(max(peak), 6) AS max_peak,
       round(max((peak - close) / peak), 6) AS max_drawdown
FROM tracked
GROUP BY symbol
""",
    doc="Running-peak max drawdown per symbol over daily closes: "
    "cummax window (ROWS UNBOUNDED PRECEDING) then an order-insensitive "
    "max — no iteration, one window exchange on symbol.",
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").alias("trading_day"),
    ).agg(
        F.max(F.struct("ts", "event_id", "value"))
        .getField("value")
        .alias("close")
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("trading_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tracked = daily.withColumn("peak", F.max("close").over(w))
    return tracked.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max("peak"), 6).alias("max_peak"),
        F.round(
            F.max((F.col("peak") - F.col("close")) / F.col("peak")), 6
        ).alias("max_drawdown"),
    )


# ---------------------------------------------------------------------------
# Hierarchical rollup: 1-hour bars FROM the 5-min bars (hypertable-style
# continuous aggregate).
# ---------------------------------------------------------------------------
@register(
    "bars_rollup_1h",
    oracle="""
WITH five AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS b5,
         arg_min(value, ts) AS open,
         max(value) AS high,
         min(value) AS low,
         arg_max(value, ts) AS close,
         count(*) AS volume
  FROM events GROUP BY 1, 2
)
SELECT symbol, time_bucket(INTERVAL '1 hour', b5) AS bar_ts,
       arg_min(open, b5) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, b5) AS close,
       CAST(sum(volume) AS BIGINT) AS volume
FROM five
GROUP BY 1, 2
""",
    doc="Hourly OHLCV re-aggregated FROM the 5-min bars, not from raw "
    "ticks: OHLCV merges associatively (open=first-by-bucket, close="
    "last-by-bucket, hi/lo=max/min, vol=sum), so each rollup level reads "
    "1/12 of the finer level.  At 100 TB of ticks the hourly cascade "
    "touches only the ~GB bar layer.  Same pattern as a TimescaleDB "
    "continuous aggregate / materialized rollup.",
)
def q_bars_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    five = build_bars(
        _events(spark, sf_dir),
        key="event_type",
        ts="ts",
        price="value",
        width="5 minutes",
        tiebreak="event_id",
    ).select(
        F.col("event_type").alias("symbol"),
        F.col("bar_ts").alias("b5"),
        "open",
        "high",
        "low",
        "close",
        "volume",
    )
    return (
        five.groupBy(
            "symbol", F.window("b5", "1 hour").start.alias("bar_ts")
        )
        .agg(
            F.min(F.struct("b5", "open")).getField("open").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max(F.struct("b5", "close")).getField("close").alias("close"),
            F.sum("volume").alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-symbol return correlation (aligned 5-min buckets).
# ---------------------------------------------------------------------------
@register(
    "pair_return_correlation",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), rets AS (
  SELECT symbol, bar_ts,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           AS r
  FROM bars
), clean AS (SELECT * FROM rets WHERE r IS NOT NULL)
SELECT a.symbol AS sym_a, b.symbol AS sym_b,
       CAST(count(*) AS BIGINT) AS n_obs,
       round(corr(a.r, b.r), 4) AS ret_corr
FROM clean a JOIN clean b ON a.bar_ts = b.bar_ts AND a.symbol < b.symbol
GROUP BY 1, 2
""",
    doc="Pairwise Pearson correlation of aligned 5-min log returns: "
    "equi-join on the bar bucket (hash shuffle, high-cardinality key), "
    "then one hash-agg on the (sym_a, sym_b) pair.  The symbol-pair "
    "fan-out is |symbols| choose 2 per bucket — bounded by the universe "
    "size, not the tick count, so the join output stays linear in bars.",
)
def q_pair_return_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir, positive_ticks=True)
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    rets = bars.withColumn(
        "r", F.log("close") - F.log(F.lag("close").over(w))
    ).filter(F.col("r").isNotNull())
    # both self-join sides reference the bar+window build; materialize it
    # once (index-build convention, PLANS.md) instead of running the tick
    # scan and window twice.
    rets = materialize_corpus(rets)
    a = rets.select(
        F.col("symbol").alias("sym_a"), "bar_ts", F.col("r").alias("ra")
    )
    b = rets.select(
        F.col("symbol").alias("sym_b"), "bar_ts", F.col("r").alias("rb")
    )
    joined = a.join(b, "bar_ts").filter(F.col("sym_a") < F.col("sym_b"))
    return joined.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.corr("ra", "rb"), 4).alias("ret_corr"),
    )


# ---------------------------------------------------------------------------
# Bollinger bands: 20-bar rolling mean +/- 2 sigma with breakout flag.
# ---------------------------------------------------------------------------
_BARS_CTE = """
bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
)"""


@register(
    "bollinger_bands",
    oracle=f"""
WITH {_BARS_CTE},
b AS (
  SELECT symbol, bar_ts, close,
         avg(close) OVER w AS mid,
         stddev_samp(close) OVER w AS sd,
         count(*) OVER w AS n
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_ts, round(close, 6) AS close,
       round(mid, 6) AS mid,
       round(mid + 2 * sd, 6) AS upper_band,
       round(mid - 2 * sd, 6) AS lower_band,
       CASE WHEN close > mid + 2 * sd THEN 1
            WHEN close < mid - 2 * sd THEN -1 ELSE 0 END AS breakout
FROM b WHERE n = 20
""",
    doc="Bollinger bands over the 5-min close series: 20-bar trailing "
    "mean +/- 2 stddev and a breakout flag.  One window exchange on "
    "symbol serves all three band columns; warm-up rows (frame < 20) "
    "are dropped so every band is a full-width statistic.",
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_ts")
        .rowsBetween(-19, Window.currentRow)
    )
    mid = F.avg("close").over(w)
    sd = F.stddev_samp("close").over(w)
    n = F.count(F.lit(1)).over(w)
    return (
        bars.select(
            "symbol",
            "bar_ts",
            F.col("close"),
            mid.alias("__mid"),
            sd.alias("__sd"),
            n.alias("__n"),
        )
        .filter(F.col("__n") == 20)
        .select(
            "symbol",
            "bar_ts",
            F.round("close", 6).alias("close"),
            F.round("__mid", 6).alias("mid"),
            F.round(F.col("__mid") + 2 * F.col("__sd"), 6).alias("upper_band"),
            F.round(F.col("__mid") - 2 * F.col("__sd"), 6).alias("lower_band"),
            F.when(
                F.col("close") > F.col("__mid") + 2 * F.col("__sd"), F.lit(1)
            )
            .when(
                F.col("close") < F.col("__mid") - 2 * F.col("__sd"), F.lit(-1)
            )
            .otherwise(F.lit(0))
            .alias("breakout"),
        )
    )


# ---------------------------------------------------------------------------
# RSI(14), simple-average form (cutler's RSI: window averages, no
# recursive Wilder smoothing -- expressible as a pure window aggregate).
# ---------------------------------------------------------------------------
@register(
    "rsi_14",
    oracle=f"""
WITH {_BARS_CTE},
diffs AS (
  SELECT symbol, bar_ts,
         close - lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts)
           AS diff
  FROM bars
), gl AS (
  SELECT symbol, bar_ts,
         CASE WHEN diff > 0 THEN diff ELSE 0 END AS gain,
         CASE WHEN diff < 0 THEN -diff ELSE 0 END AS loss
  FROM diffs WHERE diff IS NOT NULL
), rsi AS (
  SELECT symbol, bar_ts,
         avg(gain) OVER w AS ag, avg(loss) OVER w AS al,
         count(*) OVER w AS n
  FROM gl
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_ts,
       round(CASE WHEN al = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi
FROM rsi WHERE n = 14
""",
    doc="Cutler's RSI(14) on 5-min bars: trailing simple averages of "
    "gains and losses over one symbol-keyed window exchange (the "
    "recursive Wilder EMA variant lives in streaming/stateful.py "
    "territory; this closed form is the batch-scan answer).",
)
def q_rsi_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir)
    lagw = Window.partitionBy("symbol").orderBy("bar_ts")
    diffs = bars.withColumn(
        "diff", F.col("close") - F.lag("close").over(lagw)
    ).filter(F.col("diff").isNotNull())
    gl = diffs.select(
        "symbol",
        "bar_ts",
        F.when(F.col("diff") > 0, F.col("diff")).otherwise(F.lit(0.0)).alias(
            "gain"
        ),
        F.when(F.col("diff") < 0, -F.col("diff")).otherwise(F.lit(0.0)).alias(
            "loss"
        ),
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_ts")
        .rowsBetween(-13, Window.currentRow)
    )
    scored = gl.select(
        "symbol",
        "bar_ts",
        F.avg("gain").over(w).alias("__ag"),
        F.avg("loss").over(w).alias("__al"),
        F.count(F.lit(1)).over(w).alias("__n"),
    ).filter(F.col("__n") == 14)
    return scored.select(
        "symbol",
        "bar_ts",
        F.round(
            F.when(F.col("__al") == 0, F.lit(100.0)).otherwise(
                100.0 - 100.0 / (1.0 + F.col("__ag") / F.col("__al"))
            ),
            6,
        ).alias("rsi"),
    )


# ---------------------------------------------------------------------------
# Intraday seasonality: mean 5-min return by hour of day.
# ---------------------------------------------------------------------------
@register(
    "intraday_seasonality",
    oracle=f"""
WITH {_BARS_CTE},
rets AS (
  SELECT symbol, bar_ts,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           AS r
  FROM bars WHERE close > 0
)
SELECT symbol, CAST(hour(bar_ts) AS BIGINT) AS hod,
       CAST(count(*) AS BIGINT) AS n_ret,
       round(avg(r), 6) AS mean_ret,
       round(stddev_samp(r), 6) AS ret_stddev
FROM rets WHERE r IS NOT NULL
GROUP BY 1, 2
""",
    doc="Hour-of-day return seasonality profile: the window exchange on "
    "symbol feeds a (symbol, hour) hash aggregate -- 24 output rows per "
    "symbol regardless of input scale, the map-side partials absorb "
    "everything.",
)
def q_intraday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir).filter(F.col("close") > 0)
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    rets = bars.withColumn(
        "r", F.log("close") - F.log(F.lag("close").over(w))
    ).filter(F.col("r").isNotNull())
    return rets.groupBy(
        "symbol", F.hour("bar_ts").cast("long").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.round(F.avg("r"), 6).alias("mean_ret"),
        F.round(F.stddev_samp("r"), 6).alias("ret_stddev"),
    )


# ---------------------------------------------------------------------------
# Round-4 indicator suite: VWAP, ATR, stochastic oscillator, OBV, MACD
# (bounded), market beta.  Same design rules as above: bars built once
# per query with ONE (symbol, bucket) hash-shuffle, every indicator is a
# window composition over the symbol partition (low-skew: symbols are
# the natural distribution key of a tick lake), warm-up rows without a
# full lookback are dropped on BOTH engines so outputs are exact.
# ---------------------------------------------------------------------------

_OHLCV_CTE = """\
bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         max(value) AS high,
         min(value) AS low,
         arg_max(value, ts) AS close,
         count(*) AS volume
  FROM events GROUP BY 1, 2
)"""


def _bars_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full OHLCV 5-min bars (Spark twin of _OHLCV_CTE)."""
    bars = build_bars(
        _events(spark, sf_dir),
        key="event_type",
        ts="ts",
        price="value",
        width="5 minutes",
        tiebreak="event_id",
    )
    return bars.select(
        F.col("event_type").alias("symbol"),
        "bar_ts",
        "high",
        "low",
        "close",
        "volume",
    )


@register(
    "vwap_daily",
    oracle="""
SELECT event_type AS symbol,
       time_bucket(INTERVAL '1 day', ts) AS day,
       round(sum(value * CAST(json_extract(props, '$.k') AS BIGINT))
             / sum(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS vwap,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS total_size,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM events
GROUP BY 1, 2
""",
    doc="Daily volume-weighted average price, trade size parsed from the "
    "props JSON payload (semi-structured tick enrichment — the reference "
    "stores vendor JSON raw; reference project/ingest_data.py:56-90).  "
    "ONE hash aggregate on (symbol, day): the JSON path extraction is a "
    "JVM built-in (get_json_object), map-side partials absorb the tick "
    "volume, no window needed.",
)
def q_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    size = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").alias("day"),
            F.col("value"),
            size.alias("__sz"),
        )
        .groupBy("symbol", "day")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("__sz")) / F.sum("__sz"), 6
            ).alias("vwap"),
            F.sum("__sz").alias("total_size"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@register(
    "atr_14",
    oracle=f"""
WITH {_OHLCV_CTE},
tr AS (
  SELECT symbol, bar_ts,
         greatest(high - low,
                  abs(high - lag(close) OVER w),
                  abs(low - lag(close) OVER w)) AS tr
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts)
), atr AS (
  SELECT symbol, bar_ts, round(tr, 6) AS true_range,
         avg(tr) OVER wa AS atr, count(*) OVER wa AS n
  FROM tr WHERE tr IS NOT NULL
  WINDOW wa AS (PARTITION BY symbol ORDER BY bar_ts
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_ts, true_range, round(atr, 6) AS atr_14
FROM atr WHERE n = 14
""",
    doc="ATR(14), simple-average form: true range = max(high-low, "
    "|high-prev_close|, |low-prev_close|), 14-bar trailing mean.  The "
    "lag and the trailing average share one symbol-keyed window "
    "exchange; warm-up rows (no prev close / frame < 14) dropped.",
)
def q_atr_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_ohlcv(spark, sf_dir)
    lagw = Window.partitionBy("symbol").orderBy("bar_ts")
    pc = F.lag("close").over(lagw)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - pc),
        F.abs(F.col("low") - pc),
    )
    trs = bars.select("symbol", "bar_ts", tr.alias("tr")).filter(
        F.col("tr").isNotNull()
    )
    wa = (
        Window.partitionBy("symbol")
        .orderBy("bar_ts")
        .rowsBetween(-13, Window.currentRow)
    )
    return (
        trs.select(
            "symbol",
            "bar_ts",
            F.round("tr", 6).alias("true_range"),
            F.avg("tr").over(wa).alias("__atr"),
            F.count(F.lit(1)).over(wa).alias("__n"),
        )
        .filter(F.col("__n") == 14)
        .select(
            "symbol",
            "bar_ts",
            "true_range",
            F.round("__atr", 6).alias("atr_14"),
        )
    )


@register(
    "stochastic_14_3",
    oracle=f"""
WITH {_OHLCV_CTE},
k AS (
  SELECT symbol, bar_ts,
         100.0 * (close - min(low) OVER w)
           / nullif(max(high) OVER w - min(low) OVER w, 0) AS pct_k,
         count(*) OVER w AS n14
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
), kk AS (
  SELECT symbol, bar_ts, pct_k,
         avg(pct_k) OVER wd AS pct_d, count(*) OVER wd AS n3
  FROM k WHERE n14 = 14
  WINDOW wd AS (PARTITION BY symbol ORDER BY bar_ts
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_ts, round(pct_k, 6) AS pct_k, round(pct_d, 6) AS pct_d
FROM kk WHERE n3 = 3
""",
    doc="Stochastic oscillator %K(14)/%D(3): rolling 14-bar high/low "
    "channel position, 3-bar smoothed.  Both window passes share the "
    "symbol partitioning -> one exchange; zero-width channels null-gate "
    "(nullif) instead of dividing by zero.",
)
def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_ohlcv(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_ts")
        .rowsBetween(-13, Window.currentRow)
    )
    ll = F.min("low").over(w)
    hh = F.max("high").over(w)
    k = bars.select(
        "symbol",
        "bar_ts",
        (
            100.0
            * (F.col("close") - ll)
            / F.nullif(hh - ll, F.lit(0))
        ).alias("pct_k"),
        F.count(F.lit(1)).over(w).alias("__n14"),
    ).filter(F.col("__n14") == 14)
    wd = (
        Window.partitionBy("symbol")
        .orderBy("bar_ts")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        k.select(
            "symbol",
            "bar_ts",
            "pct_k",
            F.avg("pct_k").over(wd).alias("__pd"),
            F.count(F.lit(1)).over(wd).alias("__n3"),
        )
        .filter(F.col("__n3") == 3)
        .select(
            "symbol",
            "bar_ts",
            F.round("pct_k", 6).alias("pct_k"),
            F.round("__pd", 6).alias("pct_d"),
        )
    )


@register(
    "obv_daily",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '1 day', ts) AS day,
         arg_max(value, ts) AS close,
         count(*) AS volume
  FROM events GROUP BY 1, 2
), d AS (
  SELECT symbol, day, volume,
         close - lag(close) OVER (PARTITION BY symbol ORDER BY day) AS diff
  FROM bars
), delta AS (
  SELECT symbol, day,
         CASE WHEN diff > 0 THEN volume
              WHEN diff < 0 THEN -volume
              ELSE 0 END AS dv
  FROM d
)
SELECT symbol, day,
       CAST(sum(dv) OVER (PARTITION BY symbol ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
FROM delta
""",
    doc="On-balance volume over daily bars: sign of the close-to-close "
    "move gates the day's tick volume into a running sum.  Daily bars "
    "are ONE hash aggregate over ticks; the lag + cumulative sum share "
    "the symbol window exchange.  First day (no prev close) contributes "
    "0 on both engines.",
)
def q_obv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bars = build_bars(
        ev, key="event_type", ts="ts", price="value",
        width="1 day", tiebreak="event_id",
    ).select(
        F.col("event_type").alias("symbol"),
        F.col("bar_ts").alias("day"),
        "close",
        "volume",
    )
    lagw = Window.partitionBy("symbol").orderBy("day")
    diff = F.col("close") - F.lag("close").over(lagw)
    delta = bars.select(
        "symbol",
        "day",
        F.when(diff > 0, F.col("volume"))
        .when(diff < 0, -F.col("volume"))
        .otherwise(F.lit(0))
        .alias("dv"),
    )
    run = Window.partitionBy("symbol").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return delta.select(
        "symbol", "day", F.sum("dv").over(run).cast("long").alias("obv")
    )


# ---------------------------------------------------------------------------
# MACD(12,26,9), bounded-lookback form.  The textbook EMAs are infinite
# recursions; truncating each to K terms (renormalized, like
# pipeline_ops.ewma_bounded) keeps the whole indicator one window
# composition.  Truncation error: (1-2/27)^40 < 0.05% of the oldest
# state for the slow EMA.  Coefficients are Python float literals
# injected into BOTH engines so the arithmetic is bit-identical.
# ---------------------------------------------------------------------------
_MACD_K = 40  # lookback terms per EMA
_MACD_SIG_K = 9  # signal-line terms over the macd series


def _ema_coeffs(span: int, k: int) -> tuple[list[float], float]:
    a = 2.0 / (span + 1.0)
    return [a * (1.0 - a) ** i for i in range(k)], 1.0 - (1.0 - a) ** k


_MACD_F_C, _MACD_F_D = _ema_coeffs(12, _MACD_K)
_MACD_S_C, _MACD_S_D = _ema_coeffs(26, _MACD_K)
_MACD_G_C, _MACD_G_D = _ema_coeffs(9, _MACD_SIG_K)

_MACD_FAST_SQL = " + ".join(
    f"{c!r} * lag(close, {i}) OVER w" for i, c in enumerate(_MACD_F_C)
)
_MACD_SLOW_SQL = " + ".join(
    f"{c!r} * lag(close, {i}) OVER w" for i, c in enumerate(_MACD_S_C)
)
_MACD_SIG_SQL = " + ".join(
    f"{c!r} * lag(macd, {i}) OVER w2" for i, c in enumerate(_MACD_G_C)
)


@register(
    "macd_12_26_9",
    oracle=f"""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), m AS (
  SELECT symbol, bar_ts,
         ({_MACD_FAST_SQL}) / {_MACD_F_D!r}
           - ({_MACD_SLOW_SQL}) / {_MACD_S_D!r} AS macd,
         row_number() OVER w AS rn
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts)
), valid AS (
  SELECT symbol, bar_ts, macd FROM m WHERE rn >= {_MACD_K}
), sig AS (
  SELECT symbol, bar_ts, macd,
         ({_MACD_SIG_SQL}) / {_MACD_G_D!r} AS signal,
         row_number() OVER w2 AS rn2
  FROM valid
  WINDOW w2 AS (PARTITION BY symbol ORDER BY bar_ts)
)
SELECT symbol, bar_ts, round(macd, 6) AS macd,
       round(signal, 6) AS signal,
       round(macd - signal, 6) AS histogram
FROM sig WHERE rn2 >= {_MACD_SIG_K}
""",
    doc=f"MACD(12,26,9) in bounded-EWMA form (K={_MACD_K} lags per EMA, "
    f"{_MACD_SIG_K}-term signal, renormalized): fast-minus-slow EMA of "
    "5-min closes, then the signal EWMA over the macd series itself.  "
    "Two window passes over the SAME symbol partitioning -> one "
    "exchange; rows without full lookback dropped on both engines.",
)
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_ts")

    def _ewma_terms(col: str, coeffs: list[float], over) -> F.Column:
        terms = None
        for i, c in enumerate(coeffs):
            t = F.lit(c) * F.lag(col, i).over(over)
            terms = t if terms is None else terms + t
        return terms

    fast = _ewma_terms("close", _MACD_F_C, w) / F.lit(_MACD_F_D)
    slow = _ewma_terms("close", _MACD_S_C, w) / F.lit(_MACD_S_D)
    m = bars.select(
        "symbol",
        "bar_ts",
        (fast - slow).alias("macd"),
        F.row_number().over(w).alias("rn"),
    )
    valid = m.filter(F.col("rn") >= _MACD_K).select("symbol", "bar_ts", "macd")
    w2 = Window.partitionBy("symbol").orderBy("bar_ts")
    sig = valid.select(
        "symbol",
        "bar_ts",
        "macd",
        (_ewma_terms("macd", _MACD_G_C, w2) / F.lit(_MACD_G_D)).alias(
            "signal"
        ),
        F.row_number().over(w2).alias("rn2"),
    )
    return sig.filter(F.col("rn2") >= _MACD_SIG_K).select(
        "symbol",
        "bar_ts",
        F.round("macd", 6).alias("macd"),
        F.round("signal", 6).alias("signal"),
        F.round(F.col("macd") - F.col("signal"), 6).alias("histogram"),
    )


# ---------------------------------------------------------------------------
# Market beta: per-symbol OLS slope of symbol returns on the equal-weight
# market return.  The market series is a tiny (one row per bucket)
# aggregate -> broadcast back onto the per-symbol return stream, then
# covar/var/corr aggregate per symbol.
# ---------------------------------------------------------------------------
@register(
    "beta_vs_market",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), rets AS (
  SELECT symbol, bar_ts,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           AS r
  FROM bars
), rr AS (
  SELECT * FROM rets WHERE r IS NOT NULL
), mkt AS (
  SELECT bar_ts, avg(r) AS m FROM rr GROUP BY bar_ts
)
SELECT rr.symbol AS symbol,
       CAST(count(*) AS BIGINT) AS n_obs,
       round(covar_pop(rr.r, mkt.m) / var_pop(mkt.m), 6) AS beta,
       round(corr(rr.r, mkt.m), 6) AS mkt_corr
FROM rr JOIN mkt ON rr.bar_ts = mkt.bar_ts
GROUP BY 1
""",
    doc="Per-symbol market beta over 5-min log returns: the equal-weight "
    "market return is a per-bucket aggregate (rows = #buckets, "
    "independent of tick volume) broadcast-joined back onto the return "
    "stream, then covar_pop/var_pop/corr per symbol.  Two shuffles "
    "total (bar agg, symbol agg) + one broadcast — no window needed "
    "for the regression itself.",
)
def q_beta_vs_market(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir, positive_ticks=True)
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    rets = bars.select(
        "symbol",
        "bar_ts",
        (F.log("close") - F.log(F.lag("close").over(w))).alias("r"),
    ).filter(F.col("r").isNotNull())
    mkt = rets.groupBy("bar_ts").agg(F.avg("r").alias("m"))
    joined = rets.join(F.broadcast(mkt), "bar_ts")
    return joined.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.covar_pop("r", "m") / F.var_pop("m"), 6).alias("beta"),
        F.round(F.corr("r", "m"), 6).alias("mkt_corr"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average price: interval-to-next-tick weighting.
# ---------------------------------------------------------------------------
@register(
    "twap_daily",
    oracle="""
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS trading_day, ts, value,
         lead(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                        ORDER BY ts, event_id) AS nxt
  FROM events WHERE value > 0
)
SELECT symbol, trading_day,
       CAST(count(*) AS BIGINT) AS n_intervals,
       round(sum(value * (epoch_us(nxt) - epoch_us(ts)))
             / sum(epoch_us(nxt) - epoch_us(ts)), 6) AS twap
FROM t WHERE nxt IS NOT NULL
GROUP BY 1, 2
""",
    doc="Daily TIME-weighted average price (vwap_daily's twin for "
    "irregular tick arrival): each tick's price holds until the next "
    "tick of the same (symbol, day), weight = interval length in exact "
    "integer microseconds (unix_micros — no float epoch drift), the "
    "day's last tick carries no interval and drops on both sides.  One "
    "window exchange on (symbol, day) doubles as the partial for the "
    "final hash aggregate; weights are int64 so the only float rounding "
    "is the final ratio.",
)
def q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    day = F.to_date("ts")
    w = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("symbol"),
        day.alias("trading_day"),
        F.unix_micros("ts").alias("us"),
        F.unix_micros(F.lead("ts").over(w)).alias("nxt_us"),
        "value",
    ).filter(F.col("nxt_us").isNotNull())
    wt = F.col("nxt_us") - F.col("us")
    return t.groupBy("symbol", "trading_day").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum(F.col("value") * wt) / F.sum(wt), 6).alias("twap"),
    )


# ---------------------------------------------------------------------------
# Event-volume anomaly detection: trailing-window z-score on daily counts.
# ---------------------------------------------------------------------------
@register(
    "anomaly_zscore_counts",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, event_date, n_events,
         avg(n_events) OVER w AS mu,
         stddev_samp(n_events) OVER w AS sigma,
         count(*) OVER w AS n_hist
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY event_date
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, event_date, CAST(n_events AS BIGINT) AS n_events,
       CASE WHEN n_hist >= 3 AND sigma > 0
            THEN round((n_events - mu) / sigma, 4) END AS zscore,
       coalesce(n_hist >= 3 AND sigma > 0
                AND abs((n_events - mu) / sigma) >= 2.0, FALSE)
         AS is_anomaly
FROM scored
""",
    doc="Operational anomaly flag on daily event volume: z-score of each "
    "(event_type, day) count against its own TRAILING 7-day window "
    "(ROWS 7 PRECEDING..1 PRECEDING — the current day never pollutes "
    "its own baseline), min-periods 3 and sigma>0 gate exactly like the "
    "flagship z-score (operators/rolling.py).  Daily pre-aggregation "
    "first: the window runs over #days rows per type, not raw events, "
    "so the exchange is tiny at any scale.",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_date")
        .rowsBetween(-7, -1)
    )
    scored = daily.select(
        "event_type",
        "event_date",
        "n_events",
        F.avg("n_events").over(w).alias("mu"),
        F.stddev_samp("n_events").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    ok = (F.col("n_hist") >= 3) & (F.col("sigma") > 0)
    z = (F.col("n_events") - F.col("mu")) / F.col("sigma")
    return scored.select(
        "event_type",
        "event_date",
        "n_events",
        F.when(ok, F.round(z, 4)).alias("zscore"),
        (ok & (F.abs(z) >= 2.0)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Mean-reversion half-life per pair (AR(1) fit on the flagship spread).
# ---------------------------------------------------------------------------
@register(
    "pair_halflife",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), pairs(sym1, sym2) AS (VALUES ('click','view'), ('purchase','signup')),
aligned AS (
  SELECT p.sym1 || '_' || p.sym2 AS pair_name, b1.bar_ts AS ts_b,
         ln(b1.close) - ln(b2.close) AS spread
  FROM pairs p
  JOIN bars b1 ON b1.symbol = p.sym1
  JOIN bars b2 ON b2.symbol = p.sym2 AND b2.bar_ts = b1.bar_ts
), lagged AS (
  SELECT pair_name, spread,
         lag(spread) OVER (PARTITION BY pair_name ORDER BY ts_b) AS x
  FROM aligned
)
SELECT pair_name, CAST(count(*) AS BIGINT) AS n_obs,
       round(covar_pop(spread - x, x) / var_pop(x), 6) AS ar1_slope,
       CASE WHEN covar_pop(spread - x, x) / var_pop(x) < 0
            THEN round(-ln(2) / (covar_pop(spread - x, x) / var_pop(x)), 4)
       END AS halflife_bars
FROM lagged WHERE x IS NOT NULL GROUP BY 1
""",
    doc="Ornstein-Uhlenbeck-style mean-reversion half-life of the pair "
    "spread: fit Delta-spread_t = a + b * spread_(t-1) by OLS "
    "(b = covar_pop/var_pop -- same moment form beta_vs_market uses), "
    "half-life = -ln(2)/b in bar units.  The research companion to the "
    "flagship z-score: it answers 'how many bars does a shock take to "
    "decay?'.  Plan: the same fused bar+pair alignment as the flagship "
    "(one shuffle on (pair, bucket)), one lag window and one tiny "
    "per-pair aggregate on the pair-partitioned exchange -- nothing "
    "here scales with tick volume except the first bar aggregate.",
)
def q_pair_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fused leg-dimension alignment (same shape as plans/flagship.py):
    # a naive b1-join-b2 self-join builds the bar aggregate TWICE (one
    # subtree per join side — observed in the executed plan); instead
    # the bar series joins the broadcast leg map once and a conditional
    # struct-max per (pair, bucket) pivots both legs out of ONE scan.
    bars = _bars_close(spark, sf_dir, positive_ticks=True)
    leg_rows = [
        (s, f"{s1}_{s2}", i + 1)
        for s1, s2 in [("click", "view"), ("purchase", "signup")]
        for i, s in enumerate((s1, s2))
    ]
    legs = spark.createDataFrame(leg_rows, ["symbol", "pair_name", "leg"])
    aligned = (
        bars.join(F.broadcast(legs), "symbol")
        .groupBy("pair_name", "bar_ts")
        .agg(
            F.max(F.when(F.col("leg") == 1, F.col("close"))).alias("close1"),
            F.max(F.when(F.col("leg") == 2, F.col("close"))).alias("close2"),
        )
        .filter(F.col("close1").isNotNull() & F.col("close2").isNotNull())
        .select(
            "pair_name",
            "bar_ts",
            (F.log("close1") - F.log("close2")).alias("spread"),
        )
    )
    w = Window.partitionBy("pair_name").orderBy("bar_ts")
    lagged = aligned.select(
        "pair_name", "spread", F.lag("spread").over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    slope = F.covar_pop(F.col("spread") - F.col("x"), F.col("x")) / F.var_pop(
        "x"
    )
    return lagged.groupBy("pair_name").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(slope, 6).alias("ar1_slope"),
        F.when(slope < 0, F.round(-F.lit(math.log(2.0)) / slope, 4)).alias(
            "halflife_bars"
        ),
    )


# ---------------------------------------------------------------------------
# Winsorized tick-value stats per symbol (outlier-robust moments).
# ---------------------------------------------------------------------------
@register(
    "winsorized_value_stats",
    oracle="""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS q01,
         quantile_cont(value, 0.99) AS q99
  FROM events GROUP BY 1
)
SELECT e.event_type AS event_type, CAST(count(*) AS BIGINT) AS n,
       round(q.q01, 6) AS p01, round(q.q99, 6) AS p99,
       round(avg(greatest(q.q01, least(q.q99, e.value))), 6) AS wins_mean,
       round(stddev_samp(greatest(q.q01, least(q.q99, e.value))), 6)
         AS wins_std
FROM events e JOIN q USING (event_type)
GROUP BY 1, q.q01, q.q99
""",
    doc="Outlier-robust moments: clamp each tick value to its symbol's "
    "exact interpolated [p01, p99] band, then mean/std of the clamped "
    "stream — the standard fat-tail guard before fitting anything to "
    "market data.  Two passes by necessity (percentiles are holistic): "
    "pass 1 is one per-symbol aggregate producing a #symbols-row "
    "boundary table, which broadcasts back onto the tick stream for "
    "the clamped second aggregate.  Both shuffles key on the uniform "
    "symbol column; nothing materializes per-tick state.",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("q01"),
        F.percentile("value", F.lit(0.99)).alias("q99"),
    )
    clamped = ev.join(F.broadcast(q), "event_type").select(
        "event_type",
        "q01",
        "q99",
        F.greatest("q01", F.least("q99", F.col("value"))).alias("w"),
    )
    return clamped.groupBy("event_type", "q01", "q99").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("w"), 6).alias("wins_mean"),
        F.round(F.stddev_samp("w"), 6).alias("wins_std"),
    ).select(
        "event_type",
        "n",
        F.round("q01", 6).alias("p01"),
        F.round("q99", 6).alias("p99"),
        "wins_mean",
        "wins_std",
    )


# ---------------------------------------------------------------------------
# Rolling 60-bar market beta per symbol (windowed regression moments).
# ---------------------------------------------------------------------------
@register(
    "rolling_beta_60",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), rets AS (
  SELECT symbol, bar_ts,
         ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY bar_ts))
           AS r
  FROM bars
), rr AS (SELECT * FROM rets WHERE r IS NOT NULL),
mkt AS (SELECT bar_ts, avg(r) AS m FROM rr GROUP BY bar_ts),
j AS (SELECT rr.symbol, rr.bar_ts, rr.r, mkt.m
      FROM rr JOIN mkt USING (bar_ts)),
wb AS (
  SELECT symbol, bar_ts,
         covar_pop(r, m) OVER w AS cv,
         var_pop(m) OVER w AS vm,
         count(*) OVER w AS c
  FROM j
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts
               ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_ts,
       CASE WHEN c >= 30 AND vm > 0 THEN round(cv / vm, 4) END AS beta60
FROM wb
""",
    doc="Time-varying market exposure: 60-bar trailing beta per symbol "
    "against the equal-weight market return, the windowed twin of "
    "beta_vs_market.  The regression moments (covar_pop, var_pop) run "
    "as window aggregates over ONE symbol-partitioned exchange — the "
    "same frame the flagship z-score uses, so at 100 TB this adds "
    "columns to an existing sort, not a new shuffle.  The per-bucket "
    "market return joins in as a #buckets-row broadcast.  Min-periods "
    "30 and var>0 gate nulls exactly like the flagship.",
)
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir, positive_ticks=True)
    wlag = Window.partitionBy("symbol").orderBy("bar_ts")
    rets = bars.select(
        "symbol",
        "bar_ts",
        (F.log("close") - F.log(F.lag("close").over(wlag))).alias("r"),
    ).filter(F.col("r").isNotNull())
    mkt = rets.groupBy("bar_ts").agg(F.avg("r").alias("m"))
    j = rets.join(F.broadcast(mkt), "bar_ts")
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar_ts")
        .rowsBetween(-59, 0)
    )
    cv = F.covar_pop("r", "m").over(w)
    vm = F.var_pop("m").over(w)
    c = F.count(F.lit(1)).over(w)
    return j.select(
        "symbol",
        "bar_ts",
        F.when((c >= 30) & (vm > 0), F.round(cv / vm, 4)).alias("beta60"),
    )


# ---------------------------------------------------------------------------
# Tick-rule order-flow imbalance per (symbol, day).
# ---------------------------------------------------------------------------
@register(
    "tick_rule_imbalance",
    oracle="""
WITH t AS (
  SELECT event_type, CAST(ts AS DATE) AS d, value,
         lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS pv
  FROM events
)
SELECT event_type, d AS trading_day,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(sum(CASE WHEN pv IS NULL OR value = pv THEN 0
                     WHEN value > pv THEN 1 ELSE -1 END) AS BIGINT)
         AS imbalance,
       round(avg(CASE WHEN pv IS NULL OR value = pv THEN 0.0
                      WHEN value > pv THEN 1.0 ELSE -1.0 END), 6)
         AS imbalance_ratio
FROM t GROUP BY 1, 2
""",
    doc="Microstructure order-flow proxy: classify each tick +1/-1/0 by "
    "the tick rule (up/down vs the previous trade, (ts, event_id) "
    "tiebreak) and roll daily net imbalance + ratio per symbol.  One "
    "window exchange on symbol classifies; the daily rollup partial-"
    "aggregates on the same partitioning before the tiny (symbol, "
    "day) exchange.",
)
def q_tick_rule_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = ev.select(
        "event_type",
        F.to_date("ts").alias("trading_day"),
        "value",
        F.lag("value").over(w).alias("pv"),
    )
    side = F.when(
        F.col("pv").isNull() | (F.col("value") == F.col("pv")), F.lit(0)
    ).when(F.col("value") > F.col("pv"), F.lit(1)).otherwise(F.lit(-1))
    return t.groupBy("event_type", "trading_day").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(side).alias("imbalance"),
        F.round(F.avg(side.cast("double")), 6).alias("imbalance_ratio"),
    )


# ---------------------------------------------------------------------------
# Amihud illiquidity per symbol (daily |return| per unit volume).
# ---------------------------------------------------------------------------
@register(
    "amihud_illiquidity",
    oracle="""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS d,
         arg_max(value, ts) AS close, count(*) AS vol
  FROM events WHERE value > 0 GROUP BY 1, 2
), r AS (
  SELECT symbol, d, vol,
         abs(ln(close) - ln(lag(close) OVER (PARTITION BY symbol ORDER BY d)))
           AS aret
  FROM daily
)
SELECT symbol, CAST(count(aret) AS BIGINT) AS n_days,
       round(avg(aret / vol) * 1e6, 6) AS amihud_x1m
FROM r WHERE aret IS NOT NULL GROUP BY 1
""",
    doc="Amihud (2002) illiquidity: mean daily |log return| per unit "
    "volume (x1e6), the standard price-impact proxy when order-book "
    "depth is unavailable.  Derives from the materialized daily series "
    "(#symbols x #days rows) — the tick scan happens once in the daily "
    "rollup; the lag window and final aggregate touch only daily "
    "rows.",
)
def q_amihud(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.to_date("ts").alias("d"),
    ).agg(
        F.max(F.struct("ts", "event_id", "value"))
        .getField("value")
        .alias("close"),
        F.count(F.lit(1)).alias("vol"),
    )
    w = Window.partitionBy("symbol").orderBy("d")
    r = daily.select(
        "symbol",
        "vol",
        F.abs(F.log("close") - F.log(F.lag("close").over(w))).alias("aret"),
    ).filter(F.col("aret").isNotNull())
    return r.groupBy("symbol").agg(
        F.count("aret").alias("n_days"),
        F.round(
            F.avg(F.col("aret") / F.col("vol")) * F.lit(1e6), 6
        ).alias("amihud_x1m"),
    )


# ---------------------------------------------------------------------------
# Overnight vs intraday return decomposition.
# ---------------------------------------------------------------------------
@register(
    "overnight_intraday_split",
    oracle="""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS day,
         arg_min(value, ts) AS open, arg_max(value, ts) AS close
  FROM events WHERE value > 0
  GROUP BY 1, 2
), rets AS (
  SELECT symbol, day,
         ln(open) - ln(lag(close) OVER (
           PARTITION BY symbol ORDER BY day)) AS overnight,
         ln(close) - ln(open) AS intraday
  FROM daily
)
SELECT symbol,
       CAST(count(overnight) AS BIGINT) AS n_days,
       round(avg(overnight), 6) AS mean_overnight,
       round(avg(intraday), 6) AS mean_intraday,
       round(sum(overnight * overnight)
             / nullif(sum(overnight * overnight)
                      + sum(intraday * intraday), 0.0), 6)
         AS overnight_var_share
FROM rets WHERE overnight IS NOT NULL
GROUP BY 1
""",
    doc="Overnight vs intraday return decomposition per symbol: each "
    "day's first/last positive tick (arg_min/arg_max by ts) gives open "
    "and close; overnight = ln(open_d) - ln(close_{d-1}) via LAG over "
    "the per-symbol day series, intraday = ln(close_d / open_d); the "
    "variance share tells a desk where the risk actually accrues (a "
    "classic market-microstructure decomposition — close-to-close vol "
    "systematically mixes the two regimes).  Scale shape: one "
    "(symbol, day) hash-agg reduces the ticks, then a window exchange "
    "on symbol over day-count-sized partitions and a |symbols|-row "
    "final agg.",
)
def q_overnight_intraday_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ticks = _events(spark, sf_dir).filter(F.col("value") > 0)
    daily = ticks.groupBy(
        F.col("event_type").alias("symbol"),
        F.to_date("ts").alias("day"),
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max_by("value", "ts").alias("close"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    rets = daily.select(
        "symbol",
        (F.log("open") - F.log(F.lag("close").over(w))).alias("overnight"),
        (F.log("close") - F.log("open")).alias("intraday"),
    ).filter(F.col("overnight").isNotNull())
    ovar = F.sum(F.col("overnight") * F.col("overnight"))
    ivar = F.sum(F.col("intraday") * F.col("intraday"))
    return rets.groupBy("symbol").agg(
        F.count("overnight").cast("bigint").alias("n_days"),
        F.round(F.avg("overnight"), 6).alias("mean_overnight"),
        F.round(F.avg("intraday"), 6).alias("mean_intraday"),
        F.round(ovar / F.nullif(ovar + ivar, F.lit(0.0)), 6).alias(
            "overnight_var_share"
        ),
    )


# ---------------------------------------------------------------------------
# Transaction-cost analysis: signed slippage vs the day's VWAP.
# ---------------------------------------------------------------------------
@register(
    "vwap_slippage_tca",
    oracle="""
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS d, value,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS pv
  FROM events WHERE value > 0
), vwap AS (
  SELECT symbol, d, round(sum(value * k) / sum(k), 6) AS vw
  FROM t GROUP BY 1, 2
), signed AS (
  SELECT t.symbol, t.d, t.value, v.vw,
         CASE WHEN pv IS NULL OR value = pv THEN 0
              WHEN value > pv THEN 1 ELSE -1 END AS side
  FROM t JOIN vwap v ON t.symbol = v.symbol AND t.d = v.d
)
SELECT symbol, d AS trading_day,
       CAST(count(CASE WHEN side = 1 THEN 1 END) AS BIGINT) AS n_buys,
       CAST(count(CASE WHEN side = -1 THEN 1 END) AS BIGINT) AS n_sells,
       round(avg(CASE WHEN side = 1
                      THEN (value - vw) / vw * 10000 END), 4)
         AS buy_slip_bps,
       round(avg(CASE WHEN side = -1
                      THEN (vw - value) / vw * 10000 END), 4)
         AS sell_slip_bps
FROM signed GROUP BY 1, 2
""",
    doc="Transaction-cost analysis vs the day's size-weighted VWAP: ticks "
    "classify buy/sell by the tick rule (tick_rule_imbalance's "
    "convention), and slippage is the side-signed deviation from VWAP "
    "in basis points (buys above VWAP cost, sells below VWAP cost) — "
    "the execution-quality report every desk runs nightly.  Scale "
    "shape: the VWAP table is a (symbol, day) hash-agg joined back "
    "(dimension-sized), the tick-rule window reuses the symbol "
    "exchange, and VWAP is rounded to 6dp BEFORE the per-tick "
    "deviation arithmetic (filter-stage rule).",
)
def q_vwap_slippage_tca(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    t = ev.select(
        F.col("event_type").alias("symbol"),
        F.to_date("ts").alias("trading_day"),
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.lag("value")
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("pv"),
    )
    vwap = t.groupBy("symbol", "trading_day").agg(
        F.round(F.sum(F.col("value") * F.col("k")) / F.sum("k"), 6).alias(
            "vw"
        )
    )
    side = (
        F.when(F.col("pv").isNull() | (F.col("value") == F.col("pv")), 0)
        .when(F.col("value") > F.col("pv"), 1)
        .otherwise(-1)
    )
    # explicit broadcast (r14): the vwap frame is (symbol, day)-sized —
    # a dimension at every scale this engine targets — but its runtime
    # byte size sat ON AQE's broadcast threshold, flipping the join
    # between BHJ (t reuses its window exchange; probe floor ~0.34 s at
    # sf0.1) and SMJ (a second full shuffle of the tick frame; ~0.69 s)
    # run to run — the r13 bench's only drift_over_40pct flag.  Pinning
    # the dimension side makes the plan load-independent.
    signed = t.join(F.broadcast(vwap), ["symbol", "trading_day"]).select(
        "symbol", "trading_day", "value", "vw", side.alias("side")
    )
    return signed.groupBy("symbol", "trading_day").agg(
        F.count(F.when(F.col("side") == 1, F.lit(1)))
        .cast("bigint")
        .alias("n_buys"),
        F.count(F.when(F.col("side") == -1, F.lit(1)))
        .cast("bigint")
        .alias("n_sells"),
        F.round(
            F.avg(
                F.when(
                    F.col("side") == 1,
                    (F.col("value") - F.col("vw")) / F.col("vw") * 10000,
                )
            ),
            4,
        ).alias("buy_slip_bps"),
        F.round(
            F.avg(
                F.when(
                    F.col("side") == -1,
                    (F.col("vw") - F.col("value")) / F.col("vw") * 10000,
                )
            ),
            4,
        ).alias("sell_slip_bps"),
    )


# ---------------------------------------------------------------------------
# Longest underwater streak (gaps-and-islands over the drawdown state).
# ---------------------------------------------------------------------------
@register(
    "underwater_streaks",
    oracle="""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS day,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), state AS (
  SELECT symbol, day, close,
         max(close) OVER (PARTITION BY symbol ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM daily
), islands AS (
  SELECT symbol, day, close < peak AS under,
         CAST(sum(CASE WHEN close < peak THEN 0 ELSE 1 END)
              OVER (PARTITION BY symbol ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM state
), runs AS (
  SELECT symbol, island, CAST(count(*) AS BIGINT) AS run_len
  FROM islands WHERE under GROUP BY 1, 2
)
SELECT i.symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(count(CASE WHEN i.under THEN 1 END) AS BIGINT)
         AS n_underwater_days,
       CAST(coalesce(max(r.run_len), 0) AS BIGINT)
         AS longest_underwater_run
FROM islands i
LEFT JOIN runs r ON r.symbol = i.symbol AND r.island = i.island
GROUP BY 1
""",
    doc="Longest underwater streak per symbol: consecutive days below "
    "the running close peak — drawdown DURATION, the recovery-time "
    "complement to max_drawdown's depth.  The streaks come from the "
    "gaps-and-islands pattern: a running count of at-peak days is "
    "constant exactly while the symbol stays underwater, so it is the "
    "island id; one groupBy gives run lengths.  All three windows and "
    "both aggregations reuse ONE symbol-keyed exchange over day-count-"
    "sized partitions.",
)
def q_underwater_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ticks = _events(spark, sf_dir).filter(F.col("value") > 0)
    daily = ticks.groupBy(
        F.col("event_type").alias("symbol"), F.to_date("ts").alias("day")
    ).agg(F.max_by("value", "ts").alias("close"))
    wrun = Window.partitionBy("symbol").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    state = daily.select(
        "symbol", "day", "close", F.max("close").over(wrun).alias("peak")
    )
    under = F.col("close") < F.col("peak")
    # cumsum-anchor streak length: cu counts underwater days so far;
    # anchor remembers cu at the last at-peak day; their difference is
    # the CURRENT streak length — no island ids, no join-back, and the
    # whole computation stays inside the one symbol-keyed window
    # exchange (the gaps-and-islands groupBy form costs 2 more)
    cumu = state.select(
        "symbol",
        "day",
        under.alias("under"),
        F.sum(F.when(under, 1).otherwise(0)).over(wrun).alias("cu"),
    )
    anchor = F.max(
        F.when(F.col("under"), 0).otherwise(F.col("cu"))
    ).over(wrun)
    streaks = cumu.select(
        "symbol", "under", (F.col("cu") - anchor).alias("streak")
    )
    return streaks.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.count(F.when(F.col("under"), F.lit(1)))
        .cast("bigint")
        .alias("n_underwater_days"),
        F.max("streak").cast("bigint").alias("longest_underwater_run"),
    )


# ---------------------------------------------------------------------------
# Forecast backtest: naive vs seasonal-naive MAPE per symbol.
# ---------------------------------------------------------------------------
@register(
    "forecast_backtest_mape",
    oracle="""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS day,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), f AS (
  SELECT symbol, close,
         lag(close, 1) OVER w AS naive,
         lag(close, 5) OVER w AS snaive
  FROM daily WINDOW w AS (PARTITION BY symbol ORDER BY day)
)
SELECT symbol,
       CAST(count(naive) AS BIGINT) AS n_naive,
       round(avg(abs(close - naive) / close), 6) AS mape_naive,
       CAST(count(snaive) AS BIGINT) AS n_snaive,
       round(avg(abs(close - snaive) / close), 6) AS mape_snaive,
       round(avg(abs(close - naive) / close), 6)
         <= round(avg(abs(close - snaive) / close), 6) AS naive_wins
FROM f GROUP BY 1
""",
    doc="Forecast-evaluation layer: walk-forward backtest of the two "
    "standard baselines every forecasting project must beat — naive "
    "(yesterday's close) and seasonal-naive (5 trading days back) — "
    "reporting per-symbol MAPE and which baseline wins (MAPEs rounded "
    "6dp BEFORE the comparison, filter-stage rule).  The lag forecasts "
    "are leakage-free by construction.  Scale shape: one (symbol, day) "
    "hash-agg reduces the ticks, both LAG columns share one symbol "
    "window exchange, and the final agg reuses its partitioning.",
)
def q_forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ticks = _events(spark, sf_dir).filter(F.col("value") > 0)
    daily = ticks.groupBy(
        F.col("event_type").alias("symbol"), F.to_date("ts").alias("day")
    ).agg(F.max_by("value", "ts").alias("close"))
    w = Window.partitionBy("symbol").orderBy("day")
    f = daily.select(
        "symbol",
        "close",
        F.lag("close", 1).over(w).alias("naive"),
        F.lag("close", 5).over(w).alias("snaive"),
    )
    mape_n = F.round(
        F.avg(F.abs(F.col("close") - F.col("naive")) / F.col("close")), 6
    )
    mape_s = F.round(
        F.avg(F.abs(F.col("close") - F.col("snaive")) / F.col("close")), 6
    )
    return f.groupBy("symbol").agg(
        F.count("naive").cast("bigint").alias("n_naive"),
        mape_n.alias("mape_naive"),
        F.count("snaive").cast("bigint").alias("n_snaive"),
        mape_s.alias("mape_snaive"),
        (mape_n <= mape_s).alias("naive_wins"),
    )


# ---------------------------------------------------------------------------
# Position keeping + mark-to-market PnL from tick-rule-signed fills.
# ---------------------------------------------------------------------------
@register(
    "position_pnl_daily",
    oracle="""
WITH fills AS (
  SELECT event_type AS symbol, ts, event_id, value,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS pv
  FROM events WHERE value > 0
), signed AS (
  SELECT symbol, ts, event_id, value,
         CASE WHEN pv IS NULL OR value = pv THEN 0
              WHEN value > pv THEN k ELSE -k END AS signed_qty
  FROM fills
), book AS (
  SELECT symbol, ts, event_id, value,
         CAST(sum(signed_qty) OVER w AS BIGINT) AS pos,
         sum(-signed_qty * value) OVER w AS cash
  FROM signed
  WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT symbol, CAST(ts AS DATE) AS trading_day,
       CAST(pos AS BIGINT) AS eod_position,
       round(pos * value + cash, 4) AS eod_pnl
FROM book
QUALIFY row_number() OVER (PARTITION BY symbol, CAST(ts AS DATE)
                           ORDER BY ts DESC, event_id DESC) = 1
""",
    doc="Position keeping from the tick stream: each tick is a fill whose "
    "side comes from the tick rule and whose size from the props "
    "payload; the running position and cash are ONE cumulative window "
    "per symbol, and mark-to-market PnL = pos * last_price + cash rolls "
    "to end-of-day rows — the book a desk reconciles nightly.  "
    "Determinism: cumulative double sums follow the window's row order "
    "on both engines (same addition sequence, bit-identical), and the "
    "EOD pick is arg_max by (ts, event_id).  Scale shape: the tick-rule "
    "lag, both running sums and the daily rollup all reuse ONE "
    "symbol-keyed exchange.",
)
def q_position_pnl_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    w = Window.partitionBy("symbol").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fills = ev.select(
        F.col("event_type").alias("symbol"),
        "ts",
        "event_id",
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    ).withColumn("pv", F.lag("value").over(w))
    signed_qty = (
        F.when(F.col("pv").isNull() | (F.col("value") == F.col("pv")), 0)
        .when(F.col("value") > F.col("pv"), F.col("k"))
        .otherwise(-F.col("k"))
    )
    signed = fills.select(
        "symbol", "ts", "event_id", "value", signed_qty.alias("signed_qty")
    )
    book = signed.select(
        "symbol",
        "ts",
        "event_id",
        "value",
        F.sum("signed_qty").over(wrun).alias("pos"),
        F.sum(-F.col("signed_qty") * F.col("value")).over(wrun).alias("cash"),
    )
    key = F.struct("ts", "event_id")
    return book.groupBy(
        "symbol", F.to_date("ts").alias("trading_day")
    ).agg(
        F.max_by("pos", key).cast("bigint").alias("eod_position"),
        F.round(
            F.max_by(F.col("pos") * F.col("value") + F.col("cash"), key), 4
        ).alias("eod_pnl"),
    )


# ---------------------------------------------------------------------------
# Roll (1984) implied spread from serial covariance of price changes.
# ---------------------------------------------------------------------------
@register(
    "roll_spread_estimator",
    oracle="""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events WHERE value > 0 GROUP BY 1, 2
), dp AS (
  SELECT symbol, CAST(bar_ts AS DATE) AS trading_day, bar_ts,
         close - lag(close) OVER (
           PARTITION BY symbol, CAST(bar_ts AS DATE) ORDER BY bar_ts) AS d
  FROM bars
), lagged AS (
  SELECT symbol, trading_day,
         CAST(d AS DECIMAL(18,6)) AS dx,
         CAST(lag(d) OVER (
           PARTITION BY symbol, trading_day ORDER BY bar_ts)
           AS DECIMAL(18,6)) AS dy
  FROM dp
), sums AS (
  SELECT symbol, trading_day,
         CAST(count(CASE WHEN dx IS NOT NULL AND dy IS NOT NULL
                         THEN 1 END) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN dy IS NOT NULL THEN dx END) AS DOUBLE) AS sx,
         CAST(sum(CASE WHEN dx IS NOT NULL THEN dy END) AS DOUBLE) AS sy,
         CAST(sum(dx * dy) AS DOUBLE) AS sxy
  FROM lagged GROUP BY 1, 2
)
SELECT symbol, trading_day, n_pairs,
       round(CASE WHEN n_pairs >= 2
                  THEN (sxy - sx * sy / n_pairs) / (n_pairs - 1) END, 6)
         AS autocov,
       round(CASE WHEN n_pairs >= 2 THEN 2 * sqrt(greatest(0.0,
                  -((sxy - sx * sy / n_pairs) / (n_pairs - 1)))) END, 6)
         AS roll_spread
FROM sums
""",
    doc="Roll (1984) effective-spread estimator per (symbol, day): bid-ask "
    "bounce makes consecutive price changes negatively autocorrelated, "
    "and s = 2*sqrt(-cov(dp_t, dp_{t-1})) recovers the spread from trade "
    "prices alone (no quote data).  Negative-cov days clamp to 0 via "
    "GREATEST.  The co-moment is computed from EXACT decimal sums "
    "(dx, dy cast to DECIMAL(18,6) so products stay inside width-38 "
    "exact decimals on both engines; Sx, Sy, Sxy accumulate exactly "
    "and order-independently) with the covariance assembled in double "
    "only "
    "at the end — a float covar_samp is summation-order-dependent "
    "across partitions, and at |autocov| ~ 5e3 a 1-ulp drift flips the "
    "round-to-6 boundary between engines (observed at sf0.001).  Scale "
    "shape: ticks reduce ONCE to 5-min bars (hash-agg), then one window "
    "exchange on (symbol) covers both lags and the (symbol, day) "
    "decimal-sum agg rides the same partitioning — cost is the bar "
    "build, exactly like every other derived-series query.",
)
def q_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_close(spark, sf_dir, positive_ticks=True).withColumn(
        "trading_day", F.to_date("bar_ts")
    )
    w = Window.partitionBy("symbol", "trading_day").orderBy("bar_ts")
    dp = bars.withColumn("d", F.col("close") - F.lag("close").over(w))
    lagged = dp.select(
        "symbol",
        "trading_day",
        F.col("d").cast("decimal(18,6)").alias("dx"),
        F.lag("d").over(w).cast("decimal(18,6)").alias("dy"),
    )
    sums = lagged.groupBy("symbol", "trading_day").agg(
        F.count(
            F.when(
                F.col("dx").isNotNull() & F.col("dy").isNotNull(), 1
            )
        )
        .cast("bigint")
        .alias("n_pairs"),
        F.sum(F.when(F.col("dy").isNotNull(), F.col("dx")))
        .cast("double")
        .alias("sx"),
        F.sum(F.when(F.col("dx").isNotNull(), F.col("dy")))
        .cast("double")
        .alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("double").alias("sxy"),
    )
    cov = (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n_pairs")
    ) / (F.col("n_pairs") - 1)
    return sums.select(
        "symbol",
        "trading_day",
        "n_pairs",
        F.round(F.when(F.col("n_pairs") >= 2, cov), 6).alias("autocov"),
        F.round(
            F.when(
                F.col("n_pairs") >= 2,
                2 * F.sqrt(F.greatest(F.lit(0.0), -cov)),
            ),
            6,
        ).alias("roll_spread"),
    )


# ---------------------------------------------------------------------------
# Corwin-Schultz (2012) high-low spread estimator over day pairs.
# ---------------------------------------------------------------------------
@register(
    "corwin_schultz_spread",
    oracle="""
WITH daily AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS trading_day,
         max(value) AS hi, min(value) AS lo
  FROM events WHERE value > 0 GROUP BY 1, 2
), pairs AS (
  SELECT symbol, trading_day, hi, lo,
         lead(hi) OVER (PARTITION BY symbol ORDER BY trading_day) AS hi2,
         lead(lo) OVER (PARTITION BY symbol ORDER BY trading_day) AS lo2
  FROM daily
), terms AS (
  SELECT symbol, trading_day,
         ln(hi / lo) * ln(hi / lo) + ln(hi2 / lo2) * ln(hi2 / lo2) AS beta,
         ln(greatest(hi, hi2) / least(lo, lo2))
           * ln(greatest(hi, hi2) / least(lo, lo2)) AS gamma
  FROM pairs WHERE hi2 IS NOT NULL
), alpha AS (
  SELECT symbol, trading_day, beta, gamma,
         (sqrt(2 * beta) - sqrt(beta)) / (3 - 2 * sqrt(2))
           - sqrt(gamma / (3 - 2 * sqrt(2))) AS a
  FROM terms
)
SELECT symbol, trading_day,
       round(beta, 6) AS beta, round(gamma, 6) AS gamma,
       round(2 * (exp(a) - 1) / (1 + exp(a)), 6) AS cs_spread
FROM alpha
""",
    doc="Corwin-Schultz (2012) high-low spread estimator: consecutive-day "
    "(hi, lo) pairs -> beta (sum of squared single-day log ranges), gamma "
    "(squared two-day log range), alpha, and S = 2(e^a - 1)/(1 + e^a).  "
    "Daily ranges are one fact hash-agg; the day-pairing LEAD and the "
    "closed-form spread run on the days-x-symbols frame (dimension-"
    "sized).  Negative estimates are conventionally clamped by consumers; "
    "the raw estimator value is reported so the clamp stays a policy.",
)
def q_corwin_schultz(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.to_date("ts").alias("trading_day"),
    ).agg(F.max("value").alias("hi"), F.min("value").alias("lo"))
    w = Window.partitionBy("symbol").orderBy("trading_day")
    pairs = daily.withColumn("hi2", F.lead("hi").over(w)).withColumn(
        "lo2", F.lead("lo").over(w)
    ).filter(F.col("hi2").isNotNull())
    lr1 = F.log(F.col("hi") / F.col("lo"))
    lr2 = F.log(F.col("hi2") / F.col("lo2"))
    lr12 = F.log(
        F.greatest("hi", "hi2") / F.least("lo", "lo2")
    )
    denom = F.lit(3.0) - F.lit(2.0) * F.sqrt(F.lit(2.0))
    terms = pairs.select(
        "symbol",
        "trading_day",
        (lr1 * lr1 + lr2 * lr2).alias("beta"),
        (lr12 * lr12).alias("gamma"),
    )
    a = (
        (F.sqrt(2 * F.col("beta")) - F.sqrt("beta")) / denom
        - F.sqrt(F.col("gamma") / denom)
    )
    alpha = terms.withColumn("a", a)
    return alpha.select(
        "symbol",
        "trading_day",
        F.round("beta", 6).alias("beta"),
        F.round("gamma", 6).alias("gamma"),
        F.round(
            2 * (F.exp("a") - 1) / (1 + F.exp("a")), 6
        ).alias("cs_spread"),
    )


# ---------------------------------------------------------------------------
# Volatility signature: realized variance vs sampling interval.
# ---------------------------------------------------------------------------
@register(
    "realized_vol_signature",
    oracle="""
WITH widths AS (SELECT * FROM (VALUES (5), (15), (30)) AS t(width_min)),
closes AS (
  SELECT w.width_min, e.event_type AS symbol,
         to_timestamp(floor(epoch(e.ts) / (60 * w.width_min))
                      * (60 * w.width_min)) AS bucket_ts,
         arg_max(e.value, e.ts) AS close
  FROM events e CROSS JOIN widths w
  WHERE e.value > 0
  GROUP BY 1, 2, 3
), rets AS (
  SELECT width_min, symbol,
         ln(close) - ln(lag(close) OVER (
           PARTITION BY width_min, symbol ORDER BY bucket_ts)) AS r
  FROM closes
)
SELECT symbol, width_min,
       CAST(count(r) AS BIGINT) AS n_ret,
       round(sum(r * r), 6) AS realized_var,
       round(avg(abs(r)), 6) AS mean_abs_ret
FROM rets GROUP BY 1, 2
""",
    doc="Volatility signature plot: realized variance of log returns "
    "sampled at 5/15/30-minute intervals per symbol.  Microstructure "
    "noise inflates RV at fine sampling; the signature's level-off "
    "locates the noise floor (Andersen et al.).  Plan: ONE tick scan "
    "explodes to the 3 sampling widths (array explode, map-side), one "
    "hash-agg on (width, symbol, bucket) builds all close series "
    "together, one window exchange on (width, symbol) computes returns "
    "— 3 widths cost one scan + one shuffle, not 3 pipeline runs.",
)
def q_vol_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    widths = F.explode(F.array(F.lit(5), F.lit(15), F.lit(30))).alias(
        "width_min"
    )
    sec = F.col("width_min") * 60
    bucketed = ev.select(
        F.col("event_type").alias("symbol"), "ts", "event_id", "value", widths
    ).withColumn(
        "bucket_ts",
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / sec) * sec
        ),
    )
    closes = bucketed.groupBy("width_min", "symbol", "bucket_ts").agg(
        F.max(F.struct("ts", "event_id", "value"))
        .getField("value")
        .alias("close")
    )
    w = Window.partitionBy("width_min", "symbol").orderBy("bucket_ts")
    rets = closes.withColumn(
        "r", F.log("close") - F.log(F.lag("close").over(w))
    )
    return rets.groupBy("symbol", "width_min").agg(
        F.count("r").cast("bigint").alias("n_ret"),
        F.round(F.sum(F.col("r") * F.col("r")), 6).alias("realized_var"),
        F.round(F.avg(F.abs("r")), 6).alias("mean_abs_ret"),
    )


# ---------------------------------------------------------------------------
# VPIN order-flow toxicity: tick-rule sides in equal-tick volume buckets.
# ---------------------------------------------------------------------------
_VPIN_BUCKET = 50  # ticks per volume bucket
_VPIN_WINDOW = 5  # buckets averaged into the VPIN estimate


@register(
    "vpin_toxicity",
    oracle=f"""
WITH t AS (
  SELECT event_type AS symbol, value,
         lag(value) OVER w AS pv,
         row_number() OVER w AS rn
  FROM events WHERE value > 0
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), sided AS (
  SELECT symbol, (rn - 1) // {_VPIN_BUCKET} AS bucket_id,
         CASE WHEN pv IS NULL OR value = pv THEN 0
              WHEN value > pv THEN 1 ELSE -1 END AS side
  FROM t
), buckets AS (
  SELECT symbol, CAST(bucket_id AS BIGINT) AS bucket_id,
         CAST(count(*) AS BIGINT) AS n_ticks,
         CAST(abs(sum(side)) AS DOUBLE) / count(*) AS oi_frac
  FROM sided GROUP BY 1, 2
)
SELECT symbol, bucket_id, n_ticks,
       round(oi_frac, 6) AS oi_frac,
       CASE WHEN count(*) OVER wb >= {_VPIN_WINDOW}
            THEN round(avg(oi_frac) OVER wb, 6) END AS vpin
FROM buckets
WINDOW wb AS (PARTITION BY symbol ORDER BY bucket_id
              ROWS BETWEEN {_VPIN_WINDOW - 1} PRECEDING AND CURRENT ROW)
""",
    doc="VPIN (Easley/Lopez de Prado/O'Hara) order-flow toxicity: classify "
    f"each tick +1/-1/0 by the tick rule, cut the per-symbol stream into "
    f"equal-volume buckets of {_VPIN_BUCKET} ticks (volume proxy = tick "
    "count, as the feed carries no trade size), take |net signed flow| / "
    f"bucket volume per bucket, and average the last {_VPIN_WINDOW} "
    "buckets (null-gated until the window fills, like rolling_beta_60).  "
    "Plan shape: the tick-rule lag, the enumeration row_number and the "
    "bucket rollup all share ONE symbol-keyed exchange (the groupBy key "
    "is a function of the window partition key), then the VPIN window "
    "runs on the bucket frame — #buckets = ticks/"
    f"{_VPIN_BUCKET} rows, so the second exchange is tiny.  oi_frac is "
    "exact integer arithmetic (|int sum| / count) so the rolling mean "
    "feeds on bit-identical doubles in both engines — no float-drift "
    "compounding across the two stages.",
)
def q_vpin_toxicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    # rename BEFORE the window: the symbol attribute then carries the
    # hash(symbol) output partitioning through the bucket rollup and the
    # VPIN window, so the whole query runs on ONE exchange
    base = ev.select(
        F.col("event_type").alias("symbol"), "ts", "event_id", "value"
    )
    w = Window.partitionBy("symbol").orderBy("ts", "event_id")
    t = base.select(
        "symbol",
        "value",
        F.lag("value").over(w).alias("pv"),
        F.row_number().over(w).alias("rn"),
    )
    side = (
        F.when(F.col("pv").isNull() | (F.col("value") == F.col("pv")), 0)
        .when(F.col("value") > F.col("pv"), 1)
        .otherwise(-1)
    )
    sided = t.select(
        "symbol",
        ((F.col("rn") - 1) / _VPIN_BUCKET).cast("bigint").alias("bucket_id"),
        side.alias("side"),
    )
    buckets = sided.groupBy("symbol", "bucket_id").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        (
            F.abs(F.sum("side")).cast("double") / F.count(F.lit(1))
        ).alias("oi_frac"),
    )
    wb = (
        Window.partitionBy("symbol")
        .orderBy("bucket_id")
        .rowsBetween(-(_VPIN_WINDOW - 1), 0)
    )
    nb = F.count(F.lit(1)).over(wb)
    return buckets.select(
        "symbol",
        "bucket_id",
        "n_ticks",
        F.round("oi_frac", 6).alias("oi_frac"),
        F.when(
            nb >= _VPIN_WINDOW, F.round(F.avg("oi_frac").over(wb), 6)
        ).alias("vpin"),
    )


# ---------------------------------------------------------------------------
# Bipower variation vs realized variance: intraday jump detection.
# ---------------------------------------------------------------------------
_HALF_PI = 1.5707963267948966  # pi/2, spelled as the same literal on both
# engines so BV is bit-identical before rounding


@register(
    "bipower_jump_stats",
    oracle=f"""
WITH r AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS trading_day,
         ts, event_id,
         ln(value) - ln(lag(value) OVER w) AS r
  FROM events WHERE value > 0
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id)
), bp AS (
  SELECT symbol, trading_day, r,
         abs(r) * abs(lag(r) OVER (PARTITION BY symbol, trading_day
                                   ORDER BY ts, event_id)) AS prod
  FROM r
), agg AS (
  SELECT symbol, trading_day,
         CAST(count(r) AS BIGINT) AS n_ret,
         round(sum(r * r), 8) AS rv,
         round({_HALF_PI} * sum(prod), 8) AS bv
  FROM bp GROUP BY 1, 2 HAVING count(r) >= 5
)
SELECT symbol, trading_day, n_ret, rv, bv,
       CASE WHEN rv > 0
            THEN round(greatest(0.0, 1.0 - bv / rv), 6) END AS jump_frac
FROM agg
""",
    doc="Barndorff-Nielsen/Shephard jump detection: per (symbol, day), "
    "realized variance RV = sum r^2 of within-day tick log returns vs "
    "bipower variation BV = (pi/2) * sum |r_t||r_t-1| (BV is robust to "
    "jumps, RV is not), and the relative jump component "
    "max(0, 1 - BV/RV).  jump_frac derives from the ROUNDED rv/bv "
    "(filter-stage rule) so cross-engine float drift cannot leak "
    "through the ratio.  Plan shape: return lag and adjacent-product "
    "lag share ONE (symbol, day)-keyed exchange; the day rollup "
    "partial-aggregates on the same key before the final tiny "
    "exchange.  At 100 TB this is one uniform shuffle of the tick "
    "fact keyed by (symbol, day) — no joins, no second scan.",
)
def q_bipower_jump_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    # rename + derive the day key BEFORE the window so both window
    # passes and the day rollup share ONE (symbol, trading_day) exchange
    base = ev.select(
        F.col("event_type").alias("symbol"),
        F.to_date("ts").alias("trading_day"),
        "ts",
        "event_id",
        "value",
    )
    wd = Window.partitionBy("symbol", "trading_day").orderBy(
        "ts", "event_id"
    )
    r = base.select(
        "symbol",
        "trading_day",
        "ts",
        "event_id",
        (F.log("value") - F.log(F.lag("value").over(wd))).alias("r"),
    )
    # adjacent IN TIME: the product lag re-uses the same (ts, event_id)
    # ordering as the return lag, so both windows share one sort+exchange
    wr = Window.partitionBy("symbol", "trading_day").orderBy(
        "ts", "event_id"
    )
    bp = r.select(
        "symbol",
        "trading_day",
        "r",
        (F.abs("r") * F.abs(F.lag("r").over(wr))).alias("prod"),
    )
    agg = (
        bp.groupBy("symbol", "trading_day")
        .agg(
            F.count("r").alias("n_ret"),
            F.round(F.sum(F.col("r") * F.col("r")), 8).alias("rv"),
            F.round(F.lit(_HALF_PI) * F.sum("prod"), 8).alias("bv"),
        )
        .filter(F.col("n_ret") >= 5)
    )
    return agg.select(
        "symbol",
        "trading_day",
        "n_ret",
        "rv",
        "bv",
        F.when(
            F.col("rv") > 0,
            F.round(
                F.greatest(F.lit(0.0), 1.0 - F.col("bv") / F.col("rv")), 6
            ),
        ).alias("jump_frac"),
    )
