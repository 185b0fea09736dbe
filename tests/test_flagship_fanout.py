"""Fused flagship plan vs an independent naive computation, on OVERLAPPING
pairs — a symbol appearing in multiple pairs exercises the broadcast
leg-map fan-out that the oracle's disjoint pairs never hit."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.plans.flagship import pair_zscore

PAIRS = [("click", "view"), ("click", "purchase"), ("view", "purchase")]


def _naive_pandas(events_pdf: pd.DataFrame, pairs, width="1 hour"):
    """Reference-style computation: per-pair bars -> align -> spread ->
    rolling z — pure pandas, independently coded."""
    df = events_pdf.copy()
    df["bucket"] = df["ts"].dt.floor("h")
    # close = last tick by (ts, event_id) per (type, bucket)
    df = df.sort_values(["ts", "event_id"])
    closes = (
        df.groupby(["event_type", "bucket"])["value"].last().reset_index()
    )
    out = []
    for s1, s2 in pairs:
        a = closes[closes.event_type == s1].set_index("bucket")["value"]
        b = closes[closes.event_type == s2].set_index("bucket")["value"]
        common = a.index.intersection(b.index).sort_values()
        spread = pd.Series(
            [math.log(a[t]) - math.log(b[t]) for t in common], index=common
        )
        m = spread.rolling(60, min_periods=1).mean()
        sd = spread.rolling(60, min_periods=1).std(ddof=1)
        n = spread.rolling(60, min_periods=1).count()
        z = ((spread - m) / sd).where(n >= 30)
        for t in common:
            out.append((f"{s1}_{s2}", t, spread[t], z[t]))
    return pd.DataFrame(
        out, columns=["pair_name", "timestamp", "spread", "z_score"]
    )


def test_fanout_pairs_match_naive(spark, events):
    got = (
        pair_zscore(events, PAIRS, width="1 hour")
        .filter(F.col("z_score").isNotNull() | F.col("z_score").isNull())
        .select("pair_name", "symbol", "timestamp", "spread", "z_score")
        .toPandas()
    )
    # leg 1 rows carry the raw spread; leg 2 the negation
    leg1 = {}
    for r in got.itertuples():
        s1 = r.pair_name.split("_")[0]
        if r.symbol == s1:
            leg1[(r.pair_name, r.timestamp)] = (r.spread, r.z_score)

    want = _naive_pandas(
        events.select("event_id", "ts", "event_type", "value").toPandas(),
        PAIRS,
    )
    assert len(leg1) == len(want)
    for r in want.itertuples():
        sp, z = leg1[(r.pair_name, r.timestamp)]
        assert abs(sp - r.spread) < 1e-9
        if pd.isna(r.z_score):
            assert z is None or pd.isna(z)
        else:
            assert abs(z - r.z_score) < 1e-6
