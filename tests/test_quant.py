"""Quant-analytics query properties (queries/quant.py).

Oracle equivalence is covered by the DuckDB gate; these tests pin the
semantic invariants the SQL can't state: rollup associativity, drawdown
bounds, correlation self-consistency.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.bars import build_bars
from quant_market_data_pipeline_spark.queries.quant import (
    q_bar_returns_daily_vol,
    q_bars_rollup_1h,
    q_max_drawdown,
    q_pair_return_correlation,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rollup_1h_equals_direct_1h_bars(spark, events):
    """OHLCV merges associatively: hourly bars re-aggregated from 5-min
    bars must be IDENTICAL to hourly bars built straight from ticks."""
    rolled = q_bars_rollup_1h(spark, SF_DIR)
    direct = build_bars(
        events,
        key="event_type",
        ts="ts",
        price="value",
        width="1 hour",
        tiebreak="event_id",
    ).select(
        F.col("event_type").alias("symbol"),
        "bar_ts",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )
    r = {tuple(x) for x in rolled.collect()}
    d = {tuple(x) for x in direct.collect()}
    assert r == d


def test_max_drawdown_bounds(spark):
    rows = q_max_drawdown(spark, SF_DIR).collect()
    assert rows
    for row in rows:
        # drawdown from a running peak is within [0, 1) for positive prices
        assert 0.0 <= row.max_drawdown < 1.0
        assert row.n_days >= 1
        assert row.max_peak > 0


def test_daily_vol_consistency(spark):
    """stddev² ≈ (sum(r²) − n·mean²)/(n−1) on every (symbol, day)."""
    rows = q_bar_returns_daily_vol(spark, SF_DIR).collect()
    assert rows
    checked = 0
    for row in rows:
        if row.n_ret < 2 or row.ret_stddev is None:
            continue
        var = (row.realized_var - row.n_ret * row.mean_ret**2) / (
            row.n_ret - 1
        )
        # inputs are rounded to 6dp before the identity is formed
        assert math.isclose(
            row.ret_stddev**2, var, rel_tol=0.05, abs_tol=1e-5
        )
        checked += 1
    assert checked > 0


def test_return_correlation_shape(spark):
    rows = q_pair_return_correlation(spark, SF_DIR).collect()
    assert rows
    syms = set()
    for row in rows:
        assert row.sym_a < row.sym_b  # each unordered pair exactly once
        assert -1.0 <= row.ret_corr <= 1.0
        assert row.n_obs >= 2
        syms.update((row.sym_a, row.sym_b))
    # every symbol pair with aligned buckets is present: 4 symbols -> 6 pairs
    assert len(rows) == len(syms) * (len(syms) - 1) // 2
