"""Hypothesis property tests for the round-8 operators.

Each test generates adversarial small inputs, writes them as the events
fixture, runs the REAL registered query through Spark, and compares
against an independent sequential replication written directly from the
math (not from the operator's code path) — the strategy the Fama-MacBeth
and VPIN goldens use.  max_examples is small because every example pays
a parquet write + Spark job; hypothesis still finds boundary shapes
(duplicate timestamps, single-tick days, all-up runs) that fixed
fixtures miss.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import types as T

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_BASE = dt.datetime(2024, 6, 1)


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, schema=_EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


@st.composite
def _attribution_events(draw):
    """2 users, a mix of purchases/touches at second-granular offsets
    inside 12 days — dense enough that frames overlap and straddle the
    7-day boundary."""
    n = draw(st.integers(20, 45))
    rows = []
    for i in range(n):
        etype = draw(
            st.sampled_from(["purchase", "click", "view", "click", "view"])
        )
        ts = _BASE + dt.timedelta(seconds=draw(st.integers(0, 12 * 86400)))
        user = draw(st.integers(1, 2))
        value = float(draw(st.integers(1, 500)))
        rows.append((i, ts, user, etype, value, None))
    return rows


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_attribution_events())
def test_attribution_matches_per_touch_replication(spark, tmp_path, rows):
    from quant_market_data_pipeline_spark.queries.core import (
        q_attribution_time_decay,
    )

    sf = _write(spark, tmp_path, rows)
    got = {
        (r.touch_type, r.purchase_day): (r.n_touches, r.credited_value)
        for r in q_attribution_time_decay(spark, sf).collect()
    }
    purchases = [r for r in rows if r[3] == "purchase"]
    touches = [r for r in rows if r[3] in ("click", "view")]
    agg: dict[tuple, list] = {}
    for _pid, pts, puser, _t, pval, _p in purchases:
        pairs = [
            (t[3], (pts.date() - t[1].date()).days)
            for t in touches
            if t[2] == puser and pts - dt.timedelta(days=7) <= t[1] <= pts
        ]
        if not pairs:
            continue
        sw = sum(0.5**d for _typ, d in pairs)
        for typ in ("click", "view"):
            w = sum(0.5**d for tt, d in pairs if tt == typ)
            n_t = sum(1 for tt, _d in pairs if tt == typ)
            if n_t:
                cur = agg.setdefault((typ, pts.date()), [0, 0.0])
                cur[0] += n_t
                cur[1] += pval * w / sw
    assert set(got) == set(agg)
    for k, (n_t, credited) in agg.items():
        assert got[k][0] == n_t, k
        assert abs(got[k][1] - round(credited, 6)) <= 2e-6, k


@st.composite
def _tick_tape(draw):
    """One symbol, 60-140 ticks, DUPLICATE timestamps allowed (the
    event_id tiebreak is the thing under test)."""
    n = draw(st.integers(60, 140))
    rows = []
    for i in range(n):
        ts = _BASE + dt.timedelta(seconds=draw(st.integers(0, 3600)))
        price = float(draw(st.integers(1, 1000))) / 10.0
        rows.append((i, ts, 1, "x", price, None))
    return rows


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_tick_tape())
def test_tick_clock_bars_match_sequential_partitioning(spark, tmp_path, rows):
    from quant_market_data_pipeline_spark.queries.execution import (
        q_tick_clock_bars,
    )

    sf = _write(spark, tmp_path, rows)
    got = {
        r.bar_idx: r
        for r in q_tick_clock_bars(spark, sf).collect()
        if r.symbol == "x"
    }
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    k = 50
    want_bars = [ordered[i : i + k] for i in range(0, len(ordered), k)]
    assert len(got) == len(want_bars)
    for idx, bar in enumerate(want_bars):
        r = got[idx]
        prices = [t[4] for t in bar]
        assert r.n_ticks == len(bar)
        assert r.open == prices[0]
        assert r.close == prices[-1]
        assert r.high == max(prices)
        assert r.low == min(prices)
        span = (bar[-1][1] - bar[0][1]).total_seconds()
        # span uses min/max ts, not first/last by tiebreak
        tss = [t[1] for t in bar]
        span = (max(tss) - min(tss)).total_seconds()
        assert abs(r.span_minutes - round(span / 60.0, 4)) <= 1e-9


@st.composite
def _pair_walk(draw):
    """Aligned y/x daily log-price walks, 25-60 days."""
    n = draw(st.integers(25, 60))
    steps = draw(
        st.lists(
            st.tuples(
                st.integers(-40, 40),
                st.integers(-40, 40),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return steps


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(steps=_pair_walk())
def test_kalman_matches_independent_recursion(spark, tmp_path, steps):
    from quant_market_data_pipeline_spark.queries.execution import (
        q_kalman_hedge_beta,
    )

    rows = []
    ly, lx = 0.0, 0.0
    series = []
    for i, (dy, dx) in enumerate(steps):
        ly += dy / 100.0
        lx += dx / 100.0
        day = _BASE + dt.timedelta(days=i, hours=12)
        rows.append((2 * i, day, 1, "click", math.exp(ly), None))
        rows.append((2 * i + 1, day, 1, "view", math.exp(lx), None))
        series.append((day.date(), ly, lx))
    sf = _write(spark, tmp_path, rows)
    got = {
        r.trading_day: r
        for r in q_kalman_hedge_beta(spark, sf).collect()
    }
    assert set(got) == {d for d, _y, _x in series}
    # independent sequential replication of the filter equations; the
    # log-price inputs must come from the SAME ln(exp(v)) round-trip the
    # engine sees, so recompute them from the written prices
    beta, p, q, r_ = 0.0, 1.0, 1e-5, 1e-3
    for day, ly_, lx_ in series:
        y = math.log(math.exp(ly_))
        x = math.log(math.exp(lx_))
        pp = p + q
        gain = pp * x / (pp * x * x + r_)
        innov = y - beta * x
        beta = beta + gain * innov
        p = (1.0 - gain * x) * pp
        g = got[day]
        assert abs(g.gain - round(gain, 6)) <= 1e-6, day
        assert abs(g.innovation - round(innov, 6)) <= 1e-6, day
        assert abs(g.beta - round(beta, 6)) <= 1e-6, day
