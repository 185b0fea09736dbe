"""Serving adapters == their SQL twins (app.py:24-61 semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.serving import (
    range_query,
    symbol_list,
    tail_preview,
    to_display_pandas,
)


def _bars(events):
    return events.select(
        F.col("event_type").alias("symbol"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("close"),
    )


def test_symbol_list(spark, events):
    assert symbol_list(_bars(events)) == sorted(
        r[0] for r in events.select("event_type").distinct().collect()
    )


def test_range_query_bounds_inclusive(spark, events):
    bars = _bars(events)
    lo = dt.datetime(2024, 1, 10)
    hi = dt.datetime(2024, 1, 20)
    got = range_query(bars, "click", lo, hi).toPandas()
    assert (got["symbol"] == "click").all()
    assert got["timestamp"].min() >= lo and got["timestamp"].max() <= hi
    assert got["timestamp"].is_monotonic_increasing
    want_n = bars.filter(
        (F.col("symbol") == "click")
        & (F.col("timestamp") >= F.lit(lo))
        & (F.col("timestamp") <= F.lit(hi))
    ).count()
    assert len(got) == want_n


def test_tail_preview_is_latest_ascending(spark, events):
    bars = _bars(events).filter(F.col("symbol") == "view")
    got = tail_preview(bars, n=50).toPandas()
    assert len(got) == 50
    assert got["timestamp"].is_monotonic_increasing
    cutoff = got["timestamp"].min()
    n_after = bars.filter(F.col("timestamp") > F.lit(cutoff)).count()
    assert n_after == 49  # exactly the 49 newer rows are inside the tail


def test_display_tz_conversion_is_edge_only(spark, events):
    bars = _bars(events).limit(10)
    raw = bars.toPandas()
    disp = to_display_pandas(bars)
    # January: ET = UTC-5
    assert (
        (raw["timestamp"] - disp["timestamp"]) == dt.timedelta(hours=5)
    ).all()
