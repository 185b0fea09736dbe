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


# --- round-7: VPIN bucketing vs an independent pandas golden ------------


@st.composite
def vpin_tapes(draw):
    n = draw(st.integers(20, 90))
    # coarse ts grid forces duplicate timestamps (the (ts, event_id)
    # tiebreak is under test) and a tiny price grid forces equal-price
    # side-0 ticks
    return pd.DataFrame(
        {
            "symbol": [draw(_key) for _ in range(n)],
            "ts": [
                BASE + dt.timedelta(seconds=draw(st.integers(0, 50)))
                for _ in range(n)
            ],
            "event_id": list(range(n)),
            "value": [float(draw(st.integers(1, 5))) for _ in range(n)],
        }
    )


def _vpin_golden(df: pd.DataFrame, bucket: int, window: int) -> dict:
    out = {}
    for sym, g in df.sort_values(["ts", "event_id"]).groupby("symbol"):
        vals = g["value"].tolist()
        sides, last = [], None
        for v in vals:
            if last is None or v == last:
                sides.append(0)
            elif v > last:
                sides.append(1)
            else:
                sides.append(-1)
            last = v
        ring = []
        for start in range(0, len(vals), bucket):
            chunk = sides[start : start + bucket]
            oi = abs(sum(chunk)) / len(chunk)
            ring.append(oi)
            vpin = (
                round(sum(ring[-window:]) / window, 6)
                if len(ring) >= window
                else None
            )
            out[(sym, start // bucket)] = (len(chunk), round(oi, 6), vpin)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tape=vpin_tapes())
def test_vpin_bucketing_matches_pandas_golden(spark, tape):
    import tempfile

    from quant_market_data_pipeline_spark.queries import quant as q

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            tape.rename(columns={"symbol": "event_type"})
        ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        old_b, old_w = q._VPIN_BUCKET, q._VPIN_WINDOW
        q._VPIN_BUCKET, q._VPIN_WINDOW = 7, 3
        try:
            rows = q.q_vpin_toxicity(spark, tmp).collect()
        finally:
            q._VPIN_BUCKET, q._VPIN_WINDOW = old_b, old_w
    got = {
        (r.symbol, r.bucket_id): (r.n_ticks, r.oi_frac, r.vpin)
        for r in rows
    }
    assert got == _vpin_golden(tape, bucket=7, window=3)


# --- round-7: bipower RV/BV vs pandas; attribution credit conservation --


@st.composite
def bipower_tapes(draw):
    n = draw(st.integers(12, 60))
    return pd.DataFrame(
        {
            "event_type": [draw(_key) for _ in range(n)],
            "ts": [
                BASE
                + dt.timedelta(
                    days=draw(st.integers(0, 1)),
                    seconds=draw(st.integers(0, 3000)),
                )
                for _ in range(n)
            ],
            "event_id": list(range(n)),
            "value": [
                float(draw(st.integers(1, 50))) for _ in range(n)
            ],
        }
    )


def _bipower_golden(df: pd.DataFrame) -> dict:
    import math

    out = {}
    df = df.sort_values(["ts", "event_id"])
    df = df.assign(day=df["ts"].dt.date)
    for (sym, day), g in df.groupby(["event_type", "day"]):
        lp = [math.log(v) for v in g["value"]]
        rs = [b - a for a, b in zip(lp, lp[1:])]
        if len(rs) < 5:
            continue
        rv = round(sum(r * r for r in rs), 8)
        bv = round(
            1.5707963267948966
            * sum(abs(a) * abs(b) for a, b in zip(rs, rs[1:])),
            8,
        )
        jf = round(max(0.0, 1.0 - bv / rv), 6) if rv > 0 else None
        out[(sym, day)] = (len(rs), rv, bv, jf)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tape=bipower_tapes())
def test_bipower_matches_pandas_golden(spark, tape):
    import tempfile

    from quant_market_data_pipeline_spark.queries.quant import (
        q_bipower_jump_stats,
    )

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(tape).write.mode("overwrite").parquet(
            f"{tmp}/events.parquet"
        )
        rows = q_bipower_jump_stats(spark, tmp).collect()
    got = {
        (r.symbol, r.trading_day): (r.n_ret, r.rv, r.bv, r.jump_frac)
        for r in rows
    }
    assert got == _bipower_golden(tape)


@st.composite
def attribution_tapes(draw):
    n = draw(st.integers(6, 40))
    types = st.sampled_from(["purchase", "click", "view", "error"])
    return pd.DataFrame(
        {
            "event_id": list(range(n)),
            "ts": [
                BASE + dt.timedelta(hours=draw(st.integers(0, 400)))
                for _ in range(n)
            ],
            "user_id": [draw(st.integers(1, 3)) for _ in range(n)],
            "event_type": [draw(types) for _ in range(n)],
            "value": [float(draw(st.integers(0, 200))) for _ in range(n)],
            "props": [None] * n,
        }
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tape=attribution_tapes())
def test_attribution_conserves_credited_value(spark, tape):
    """Total credited revenue must equal the total value of purchases
    that have >= 1 in-window touch — the normalization invariant that
    holds for ANY tape; per-day/type splits are the oracle gate's job."""
    import tempfile

    from quant_market_data_pipeline_spark.queries.core import (
        q_attribution_time_decay,
    )

    # independent truth: purchases with at least one click/view by the
    # same user within (p_ts - 7d, p_ts]
    p = tape[tape.event_type == "purchase"]
    t = tape[tape.event_type.isin(["click", "view"])]
    want = 0.0
    for _, pr in p.iterrows():
        touches = t[
            (t.user_id == pr.user_id)
            & (t.ts <= pr.ts)
            & (t.ts >= pr.ts - pd.Timedelta(days=7))
        ]
        if len(touches):
            want += pr.value
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(tape).write.mode("overwrite").parquet(
            f"{tmp}/events.parquet"
        )
        rows = q_attribution_time_decay(spark, tmp).collect()
    got = sum(r.credited_value for r in rows)
    assert abs(got - want) < 1e-3


# --- round-7: Hurst R/S vs an independent sequential-python golden ------


@st.composite
def daily_close_tapes(draw):
    n_days = draw(st.integers(18, 34))
    rows = []
    for s in ("A", "B"):
        for i in range(n_days):
            rows.append(
                {
                    "event_type": s,
                    "ts": BASE + dt.timedelta(days=i, hours=12),
                    "event_id": len(rows),
                    "value": float(draw(st.integers(1, 50))),
                }
            )
    return pd.DataFrame(rows)


def _hurst_golden(df: pd.DataFrame, sizes=(4, 8, 16)) -> dict:
    import math

    out = {}
    for sym, g in df.sort_values("ts").groupby("event_type"):
        closes = g["value"].tolist()
        rets = [
            math.log(b) - math.log(a) for a, b in zip(closes, closes[1:])
        ]
        pts = []
        for sz in sizes:
            rs_vals = []
            for blk in range(len(rets) // sz):
                chunk = rets[blk * sz : (blk + 1) * sz]
                mean = sum(chunk) / sz
                sd = math.sqrt(sum((x - mean) ** 2 for x in chunk) / sz)
                if sd <= 0:
                    continue
                cum, zmin, zmax = 0.0, float("inf"), float("-inf")
                for pos, x in enumerate(chunk, start=1):
                    cum += x
                    z = cum - pos * mean
                    zmin, zmax = min(zmin, z), max(zmax, z)
                rs_vals.append((zmax - zmin) / sd)
            if rs_vals:
                pts.append(
                    (
                        math.log(float(sz)),
                        math.log(round(sum(rs_vals) / len(rs_vals), 6)),
                    )
                )
        if len(pts) >= 2:
            n = len(pts)
            mx = sum(p[0] for p in pts) / n
            my = sum(p[1] for p in pts) / n
            sxy = sum(p[0] * p[1] for p in pts) / n - mx * my
            sxx = sum(p[0] * p[0] for p in pts) / n - mx * mx
            if sxx != 0:
                out[sym] = (n, sxy / sxx)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tape=daily_close_tapes())
def test_hurst_matches_sequential_golden(spark, tape):
    import tempfile

    from quant_market_data_pipeline_spark.queries.risk import (
        q_hurst_rs_exponent,
    )

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(tape).write.mode("overwrite").parquet(
            f"{tmp}/events.parquet"
        )
        rows = q_hurst_rs_exponent(spark, tmp).collect()
    want = _hurst_golden(tape)
    got = {r.symbol: (r.n_sizes, r.hurst) for r in rows}
    assert set(got) == set(want)
    for sym, (n, slope) in want.items():
        assert got[sym][0] == n
        assert abs(got[sym][1] - slope) <= 1.5e-4


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    day_offsets=st.sets(st.integers(0, 120), min_size=5, max_size=40),
)
def test_purged_kfold_invariants_random_calendars(
    spark, tmp_path, day_offsets
):
    """On ANY day set: the role matrix is exactly days x 5, every day is
    'test' in exactly its own fold, ntile fold sizes are balanced to
    within one, no train day sits inside [lo-3, hi+3] of its eval fold,
    and every purged day does."""
    import datetime as dt

    from pyspark.sql import types as T

    from quant_market_data_pipeline_spark.queries.pipeline_ops import (
        q_purged_kfold,
    )

    base = dt.datetime(2024, 1, 1, 12)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    rows = [
        (i, base + dt.timedelta(days=o), 1, "x", 1.0, None)
        for i, o in enumerate(sorted(day_offsets))
    ]
    spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = q_purged_kfold(spark, str(tmp_path)).collect()
    n_days = len(day_offsets)
    assert len(out) == n_days * 5
    test_days = {}
    for r in out:
        if r.role == "test":
            test_days.setdefault(r.eval_fold, set()).add(r.trading_day)
    assert set(test_days) == {1, 2, 3, 4, 5}
    sizes = sorted(len(v) for v in test_days.values())
    assert sum(sizes) == n_days and sizes[-1] - sizes[0] <= 1
    # folds are contiguous time blocks in ntile order
    ordered = sorted(
        (min(v), max(v), f) for f, v in test_days.items()
    )
    assert [f for _, _, f in ordered] == [1, 2, 3, 4, 5]
    embargo = dt.timedelta(days=3)
    per_day_test_count = {}
    for r in out:
        lo, hi = min(test_days[r.eval_fold]), max(test_days[r.eval_fold])
        inside_band = lo - embargo <= r.trading_day <= hi + embargo
        if r.role == "test":
            per_day_test_count[r.trading_day] = (
                per_day_test_count.get(r.trading_day, 0) + 1
            )
            assert r.trading_day in test_days[r.eval_fold]
        elif r.role == "train":
            assert not inside_band
        else:
            assert inside_band and not (lo <= r.trading_day <= hi and
                                        r.trading_day in test_days[r.eval_fold])
    assert all(c == 1 for c in per_day_test_count.values())
    assert len(per_day_test_count) == n_days


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.floats(90.0, 110.0, allow_nan=False),  # day low anchor
            st.floats(0.001, 0.2, allow_nan=False),   # relative range
        ),
        min_size=2,
        max_size=8,
    )
)
def test_corwin_schultz_matches_python_replication(spark, tmp_path, data):
    """Random daily (low, range) pairs: the engine's beta/gamma/spread
    must equal a sequential pure-Python replication of the same
    expression tree (catches silent expression drift in either the
    estimator or the daily rollup)."""
    import math as m

    from quant_market_data_pipeline_spark.queries.quant import (
        q_corwin_schultz,
    )

    base = dt.datetime(2024, 2, 1)
    rows, days = [], []
    for i, (lo, rel) in enumerate(data):
        hi = lo * (1.0 + rel)
        d0 = base + dt.timedelta(days=i)
        rows += [
            (2 * i, d0, 1, "X", lo, None),
            (2 * i + 1, d0 + dt.timedelta(minutes=1), 1, "X", hi, None),
        ]
        days.append((hi, lo))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = {
        r.trading_day: r
        for r in q_corwin_schultz(spark, str(tmp_path)).collect()
    }
    assert len(got) == len(days) - 1
    denom = 3.0 - 2.0 * m.sqrt(2.0)
    for i in range(len(days) - 1):
        (h1, l1), (h2, l2) = days[i], days[i + 1]
        beta = m.log(h1 / l1) * m.log(h1 / l1) + m.log(h2 / l2) * m.log(
            h2 / l2
        )
        gamma = m.log(max(h1, h2) / min(l1, l2)) ** 2
        a = (m.sqrt(2 * beta) - m.sqrt(beta)) / denom - m.sqrt(gamma / denom)
        s = 2 * (m.exp(a) - 1) / (1 + m.exp(a))
        r = got[(base + dt.timedelta(days=i)).date()]
        assert r.beta == round(beta, 6)
        assert r.gamma == round(gamma, 6)
        assert abs(r.cs_spread - round(s, 6)) <= 1e-6


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    closes=st.lists(
        st.floats(50.0, 150.0, allow_nan=False), min_size=8, max_size=20
    )
)
def test_newey_west_matches_python_replication(spark, tmp_path, closes):
    """Random daily close paths: mu / s_nw / t_nw must equal a
    sequential Python replication including both filter-stage
    roundings (mean to 10dp before demeaning, S to 10dp before the
    ratio)."""
    import math as m

    from pyspark.sql import types as T

    from quant_market_data_pipeline_spark.queries.risk import (
        q_newey_west_tstat,
    )

    base = dt.datetime(2024, 2, 1)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    rows = [
        (i, base + dt.timedelta(days=i), 1, "X", c, None)
        for i, c in enumerate(closes)
    ]
    spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = q_newey_west_tstat(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    rets = [m.log(closes[i] / closes[i - 1]) for i in range(1, len(closes))]
    mu = round(sum(rets) / len(rets), 10)
    d = [x - mu for x in rets]
    n = len(d)
    g = [sum(d[t] * d[t - l] for t in range(l, n)) for l in range(6)]
    import functools
    import operator

    weighted = functools.reduce(
        operator.add, [(1.0 - l / 6.0) * g[l] for l in range(1, 6)]
    )
    s_nw = round((g[0] + 2 * weighted) / n, 10)
    assert r.n_ret == n
    assert abs(r.mu - mu) <= 1e-9
    assert abs(r.s_nw - s_nw) <= 1e-9
    if s_nw > 0:
        assert abs(r.t_nw - round(mu / m.sqrt(s_nw / n), 6)) <= 1e-5
    else:
        assert r.t_nw is None


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2.0, 2.0, allow_nan=False), min_size=8, max_size=8
        ),
        min_size=4,
        max_size=12,
    ),
    labels=st.data(),
)
def test_hard_negatives_never_pair_same_label(spark, tmp_path, vecs, labels):
    """Random small-dim embedding sets with random labels: the output
    never pairs equal labels, rn is a dense 1..k prefix per anchor, and
    every reported cosine matches numpy within rounding."""
    from pyspark.sql import types as T

    from quant_market_data_pipeline_spark.queries.llm import (
        q_hard_negative_mining,
    )

    dim = 64
    padded = [list(v) + [0.0] * (dim - len(v)) for v in vecs]
    labs = [
        labels.draw(st.integers(0, 3), label=f"label{i}")
        for i in range(len(padded))
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(
        [(i, v, l) for i, (v, l) in enumerate(zip(padded, labs))],
        schema=schema,
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    rows = q_hard_negative_mining(spark, str(tmp_path)).collect()
    per_anchor = {}
    f32 = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in padded]
    for r in rows:
        assert labs[r.anchor_id] == r.anchor_label
        assert labs[r.negative_id] == r.negative_label
        assert r.anchor_label != r.negative_label
        a, b = f32[r.anchor_id], f32[r.negative_id]
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 0 and nb > 0:
            assert abs(r.cos_sim - float(a @ b) / (na * nb)) < 1e-5
        per_anchor.setdefault(r.anchor_id, []).append(r.rn)
    for rns in per_anchor.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))


_EMB_SCHEMA_STR = (
    "vec_id long, embedding array<float>, label int"
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2.0, 2.0, allow_nan=False), min_size=64, max_size=64
        ).filter(lambda v: sum(abs(x) for x in v) > 0.1),
        min_size=5,
        max_size=10,
    )
)
def test_matryoshka_overlap_matches_numpy(spark, tmp_path, vecs):
    """Random embeddings: the overlap@3 per query must equal a numpy
    replication of BOTH rankings (float32 storage round-trip, 6dp cosine
    rounding, neighbor-id tiebreak)."""
    from quant_market_data_pipeline_spark.queries.llm import (
        q_matryoshka_overlap_audit,
    )

    spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)], schema=_EMB_SCHEMA_STR
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    f64 = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]

    def topk(mats, q):
        scored = []
        for j, x in enumerate(mats):
            if j == q:
                continue
            den = np.linalg.norm(mats[q]) * np.linalg.norm(x)
            c = float(mats[q] @ x) / den if den else float("nan")
            scored.append((-round(c, 6), j))
        scored.sort()
        return {j for _, j in scored[:3]}

    full = f64
    trunc = [x[:16] for x in f64]
    got = {
        r.query_id: r
        for r in q_matryoshka_overlap_audit(spark, str(tmp_path)).collect()
    }
    for q in range(len(vecs)):
        exp_full, exp_trunc = topk(full, q), topk(trunc, q)
        kept = len(exp_full & exp_trunc)
        assert got[q].n_full == 3
        assert got[q].n_kept == kept, (q, exp_full, exp_trunc)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdefg", min_size=1, max_size=3),
        st.integers(1, 50),
        min_size=2,
        max_size=8,
    )
)
def test_unigram_sampling_table_matches_python(spark, tmp_path, counts):
    """Random token histograms: p, cum_lo and cum_hi must equal a
    sequential Python replication of the unigram^0.75 pipeline
    (rounded-p cumulation in (cnt desc, token) order), and the ranges
    must tile [0, ~1] without gaps."""
    from quant_market_data_pipeline_spark.queries.textprep import (
        q_unigram_negative_sampling,
    )

    text = " ".join(t for t, c in sorted(counts.items()) for _ in range(c))
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = q_unigram_negative_sampling(spark, str(tmp_path)).collect()
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r.token for r in rows] == [t for t, _ in order]
    tw = sum(c**0.75 for c in counts.values())
    cum = 0.0
    for r, (t, c) in zip(rows, order):
        p = round(c**0.75 / tw, 8)
        assert r.cnt == c and r.p == p
        assert r.cum_lo == round(cum, 8)
        cum += p
        assert r.cum_hi == round(cum, 8)
    assert abs(cum - 1.0) < 1e-6


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    paths=st.lists(  # one close path per symbol, same calendar
        st.lists(
            st.floats(50.0, 150.0, allow_nan=False), min_size=8, max_size=8
        ),
        min_size=4,
        max_size=6,
    )
)
def test_fama_macbeth_matches_python_replication(spark, tmp_path, paths):
    """Random multi-symbol close paths: lambda_mean/se/tstat must equal a
    sequential Python replication of both passes, including the 8dp
    slope rounding between them."""
    import math as m

    from pyspark.sql import types as T

    from quant_market_data_pipeline_spark.queries.risk import (
        q_fama_macbeth,
    )

    base = dt.datetime(2024, 2, 1, 12)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    rows, eid = [], 0
    for s, path in enumerate(paths):
        for t, c in enumerate(path):
            rows.append(
                (eid, base + dt.timedelta(days=t), 1, f"S{s}", c, None)
            )
            eid += 1
    spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = q_fama_macbeth(spark, str(tmp_path)).collect()[0]

    n_days = len(paths[0])
    lams = []
    for t in range(3, n_days - 1):  # mom needs lag 3, fwd needs lead 1
        pts = []
        for path in paths:
            mom = m.log(path[t]) - m.log(path[t - 3])
            fwd = m.log(path[t + 1]) - m.log(path[t])
            pts.append((mom, fwd))
        n = len(pts)
        if n < 4:
            continue
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        den = n * sxx - sx * sx
        if den == 0.0:
            continue  # nullif -> NULL lam, excluded from pass 2
        lams.append(round((n * sxy - sx * sy) / den, 8))
    assert out.n_days == len(lams)
    if not lams:
        assert out.lambda_mean is None
        return
    mean = sum(lams) / len(lams)
    assert abs(out.lambda_mean - round(mean, 8)) <= 1e-7
    if len(lams) > 1:
        var = sum((x - mean) ** 2 for x in lams) / (len(lams) - 1)
        se = m.sqrt(var) / m.sqrt(len(lams))
        assert abs(out.lambda_se - round(se, 8)) <= 1e-6
        if se > 0:
            assert abs(out.lambda_tstat - round(mean / se, 4)) <= 1e-2
