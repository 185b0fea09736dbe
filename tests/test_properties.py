"""Property-based tests (hypothesis): randomized inputs against
independently-computed truths for the operators with the subtlest edge
cases — as-of matching under duplicate/boundary timestamps, and OHLCV
invariants under tick reordering."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quant_market_data_pipeline_spark.operators.asof import asof_join
from quant_market_data_pipeline_spark.operators.bars import build_bars

BASE = dt.datetime(2024, 1, 1)

# timestamps on a coarse grid to force boundary/duplicate collisions
_ts = st.integers(min_value=0, max_value=40).map(
    lambda m: BASE + dt.timedelta(minutes=3 * m)
)
_key = st.sampled_from(["A", "B"])


@st.composite
def asof_frames(draw):
    n_l = draw(st.integers(2, 12))
    n_r = draw(st.integers(2, 12))
    left = pd.DataFrame(
        {
            "k": [draw(_key) for _ in range(n_l)],
            "ts": [draw(_ts) for _ in range(n_l)],
            "lv": list(range(n_l)),
        }
    )
    right = pd.DataFrame(
        {
            "k": [draw(_key) for _ in range(n_r)],
            "ts": [draw(_ts) for _ in range(n_r)],
            "rv": [float(i) for i in range(n_r)],
        }
    )
    # merge_asof requires unique (k, ts) on the right for a well-defined
    # golden; dedup keeping the last (engine tiebreak = last in order)
    right = right.drop_duplicates(["k", "ts"], keep="last")
    return left, right


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frames=asof_frames(), direction=st.sampled_from(["backward", "forward"]))
def test_asof_matches_merge_asof(spark, frames, direction):
    left, right = frames
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts="ts",
            right_cols=["rv"],
            direction=direction,
        )
        .orderBy("lv")
        .toPandas()
    )
    golden = pd.merge_asof(
        left.sort_values(["ts", "lv"], kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction=direction,
    ).sort_values("lv", kind="stable")
    np.testing.assert_allclose(
        out["rv_right"].to_numpy(dtype=float),
        golden["rv"].to_numpy(dtype=float),
        equal_nan=True,
    )


@st.composite
def tick_frames(draw):
    n = draw(st.integers(1, 40))
    return pd.DataFrame(
        {
            "event_id": list(range(n)),
            "ts": [draw(_ts) for _ in range(n)],
            "symbol": [draw(_key) for _ in range(n)],
            "price": [
                draw(
                    st.floats(
                        0.5, 100, allow_nan=False, allow_infinity=False
                    )
                )
                for _ in range(n)
            ],
        }
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ticks=tick_frames())
def test_bar_invariants_and_shuffle_determinism(spark, ticks):
    df = spark.createDataFrame(ticks)
    bars = build_bars(
        df, key="symbol", ts="ts", price="price",
        width="15 minutes", tiebreak="event_id",
    ).toPandas()

    # volume conserved; OHLC ordering invariants
    assert bars["volume"].sum() == len(ticks)
    assert (bars["low"] <= bars[["open", "close"]].min(axis=1) + 1e-12).all()
    assert (bars["high"] >= bars[["open", "close"]].max(axis=1) - 1e-12).all()

    # determinism under input reordering (shuffled arrival)
    shuffled = ticks.sample(frac=1.0, random_state=7)
    bars2 = build_bars(
        spark.createDataFrame(shuffled), key="symbol", ts="ts",
        price="price", width="15 minutes", tiebreak="event_id",
    ).toPandas()
    a = bars.sort_values(["symbol", "bar_ts"]).reset_index(drop=True)
    b = bars2.sort_values(["symbol", "bar_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(
        st.integers(min_value=-10**9, max_value=10**9),
        min_size=1,
        max_size=300,
    ),
    parts=st.sampled_from([1, 3, 7, 32]),
)
def test_money_sum_partition_order_invariant(spark, cents, parts):
    """money_sum is EXACT: bit-identical to the Decimal ground truth for
    any partitioning/arrival order — the property the oracle value-hash
    gate depends on (plain float sum breaks it at money scale)."""
    import decimal

    from quant_market_data_pipeline_spark.functions.exact import money_sum

    values = [c / 100.0 for c in cents]
    truth = float(sum(decimal.Decimal(c) for c in cents) / 100)

    got = set()
    for seed in (0, 1):
        order = values if seed == 0 else list(reversed(values))
        df = spark.createDataFrame(
            [(v,) for v in order], "x double"
        ).repartition(parts)
        row = df.agg(money_sum("x").alias("s")).collect()[0]
        got.add(row["s"])
    assert got == {truth}, (got, truth)
