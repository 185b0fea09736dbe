"""Bar builder determinism + flagship pair semantics."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.bars import build_bars, floor_bucket
from quant_market_data_pipeline_spark.plans.flagship import pair_zscore


def test_bar_open_close_deterministic_with_ties(spark):
    """Two ticks at the same timestamp: the tiebreak column decides."""
    t = pd.Timestamp("2024-01-01 10:02:00")
    pdf = pd.DataFrame(
        [
            {"symbol": "A", "timestamp": t, "price": 5.0, "seq": 2},
            {"symbol": "A", "timestamp": t, "price": 1.0, "seq": 1},
            {"symbol": "A", "timestamp": t + pd.Timedelta(seconds=30), "price": 3.0,
             "seq": 3},
        ]
    )
    bars = build_bars(
        spark.createDataFrame(pdf), key="symbol", ts="timestamp", price="price",
        tiebreak="seq",
    ).collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b["open"], b["close"], b["high"], b["low"], b["volume"]) == (
        1.0, 3.0, 5.0, 1.0, 3,
    )


def test_floor_bucket_equals_window_start(spark, events):
    df = events.select(
        F.window("ts", "5 minutes").start.alias("w"), floor_bucket("ts").alias("f")
    )
    assert df.filter(F.col("w") != F.col("f")).count() == 0


def test_flagship_leg_antisymmetry(spark, events):
    out = pair_zscore(events, [("click", "view")], width="1 hour").toPandas()
    byts = out.pivot_table(
        index="timestamp", columns="symbol", values="spread", aggfunc="first"
    )
    # Leg 2 carries the negated spread at every aligned timestamp.
    assert ((byts["click"] + byts["view"]).abs() < 1e-12).all()
    # spread = ln(close1) - ln(close2)
    sample = out[out["symbol"] == "click"].head(5)
    closes = out[out["symbol"] == "view"].set_index("timestamp")["close"]
    for _, r in sample.iterrows():
        want = math.log(r["close"]) - math.log(closes[r["timestamp"]])
        assert abs(r["spread"] - want) < 1e-12
