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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.bars import build_bars
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import configure_runtime
from quant_market_data_pipeline_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, "events", sf_dir)


def _bars_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-min close series per symbol (deterministic last-by-(ts, event_id))."""
    bars = build_bars(
        _events(spark, sf_dir),
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
    bars = _bars_close(spark, sf_dir).filter(F.col("close") > 0)
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
    bars = _bars_close(spark, sf_dir).filter(F.col("close") > 0)
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    rets = bars.withColumn(
        "r", F.log("close") - F.log(F.lag("close").over(w))
    ).filter(F.col("r").isNotNull())
    # both self-join sides reference the bar+window build; materialize it
    # once (index-build convention, PLANS.md) instead of running the tick
    # scan and window twice.
    rets = rets.localCheckpoint()
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
