"""Flagship plan: tick stream -> bars -> aligned pairs -> rolling z-score.

This is the reference's E1 transform spine (SURVEY §3,
/root/reference/project/transform_data.py:101-180) generalized to any
tick/event source:

  scan -> bar build -> pair align (J1) -> log-spread (P9)
       -> rolling z-score W1-W5 with min-periods gate (P10)
       -> leg projection + sign flip (P11) -> long-format stack (U1)

On the driver testdata, "symbols" are ``event_type`` values of the
``events`` table and the price is ``value`` (FIXTURES.md operator-fixture
mapping); semantics are identical to the reference's close-price pairs.

Scale shape — deliberately different from the reference's per-pair driver
loop (which re-scans the source once per pair):

- ONE aggregation builds bars for every symbol (single shuffle);
- the pair list is a *broadcast dimension*, not Python control flow, so
  1 pair or 10,000 pairs is the same three-stage plan;
- the alignment join shuffles on (symbol, bar_ts) — unskewed by
  construction (one row per symbol-bar);
- the rolling window partitions by the real ``pair_name`` column;
- the two legs are emitted by an ``explode`` of an inline struct array —
  one pass over the scored frame, no union re-scan and no cache needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.bars import build_bars
from quant_market_data_pipeline_spark.operators.rolling import with_rolling_zscore


def pair_zscore(
    ticks: DataFrame,
    pairs: list[tuple[str, str]],
    key: str = "event_type",
    ts: str = "ts",
    price: str = "value",
    width: str = "5 minutes",
    window_bars: int = 60,
    min_periods: int = 30,
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """Long-format (symbol, timestamp, close, spread, z_score, pair_name).

    ``spread = ln(close1) - ln(close2)`` per pair per aligned bar
    (transform_data.py:139); z-score over a ``window_bars`` trailing frame,
    NULL below ``min_periods`` (``:145-153``); leg 2 carries the negated
    spread/z-score (``:176-177``).
    """
    spark = ticks.sparkSession
    bars = build_bars(
        ticks, key=key, ts=ts, price=price, width=width, tiebreak=tiebreak
    ).select(
        F.col(key).alias("symbol"),
        F.col("bar_ts").alias("timestamp"),
        F.col("close"),
    )

    pairs_dim = spark.createDataFrame(pairs, ["sym1", "sym2"]).withColumn(
        "pair_name", F.concat_ws("_", "sym1", "sym2")
    )

    leg1 = bars.join(
        F.broadcast(pairs_dim), bars["symbol"] == pairs_dim["sym1"], "inner"
    ).select("pair_name", "sym1", "sym2", "timestamp", F.col("close").alias("close1"))
    leg2 = bars.select(
        F.col("symbol").alias("__s2"),
        F.col("timestamp").alias("__ts2"),
        F.col("close").alias("close2"),
    )
    aligned = leg1.join(
        leg2,
        (F.col("sym2") == F.col("__s2")) & (F.col("timestamp") == F.col("__ts2")),
        "inner",
    ).drop("__s2", "__ts2")

    spread = aligned.withColumn("spread", F.log("close1") - F.log("close2"))
    scored = with_rolling_zscore(
        spread,
        value="spread",
        partition_by=["pair_name"],
        order_by=["timestamp"],
        n=window_bars,
        min_periods=min_periods,
    )

    leg_structs = F.array(
        F.struct(
            F.col("sym1").alias("symbol"),
            F.col("close1").alias("close"),
            F.lit(1.0).alias("sign"),
        ),
        F.struct(
            F.col("sym2").alias("symbol"),
            F.col("close2").alias("close"),
            F.lit(-1.0).alias("sign"),
        ),
    )
    return scored.select(
        F.explode(leg_structs).alias("leg"),
        "timestamp",
        "spread",
        "z_score",
        "pair_name",
    ).select(
        F.col("leg.symbol").alias("symbol"),
        "timestamp",
        F.col("leg.close").alias("close"),
        (F.col("spread") * F.col("leg.sign")).alias("spread"),
        (F.col("z_score") * F.col("leg.sign")).alias("z_score"),
        "pair_name",
    )
