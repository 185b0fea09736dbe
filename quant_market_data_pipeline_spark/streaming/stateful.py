"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in surface covers tumbling bars + watermark dedup
(bars_stream.py) and gap sessions (``F.session_window``).  This module is
the escape hatch the engine offers when semantics outgrow built-ins —
arbitrary per-key state machines fed Arrow batches.

``sessionize_with_state`` re-implements gap sessionization as an explicit
state machine (same semantics as the batch ``session_window_stats`` query
— parity-tested) to pin down the pattern: accumulate the open session in
state, emit sessions closed by in-batch gaps immediately, and let an
EVENT-TIME TIMEOUT flush the final session once the watermark passes
``session_end + gap``.  State per key is O(1) (one open session), so
total state is bounded by the live-key cardinality regardless of
throughput — the property that keeps it viable at 100 TB/day.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# Open-session accumulator: bounds in MICROSECONDS since epoch (long state
# survives restarts via the state store; micros preserve the source
# precision exactly).
STATE_SCHEMA = "start long, end long, n long, total double"


def _emit(user_id: int, sessions: list[tuple[int, int, int, float]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
            "session_end": pd.to_datetime([s[1] for s in sessions], unit="us"),
            "n_events": [s[2] for s in sessions],
            "total_value": [s[3] for s in sessions],
        }
    )


def sessionize_with_state(
    ticks: DataFrame,
    gap: str = "30 minutes",
    ts: str = "ts",
    value: str = "value",
    key: str = "user_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Gap-sessionize a stream with an explicit per-key state machine.

    Semantics match ``F.session_window(ts, gap)``: a new session starts
    when an event arrives >= ``gap`` after the previous one (strict
    boundary — windows are [t, t+gap) half-open).
    """
    n, unit = gap.split()
    gap_us = int(n) * {
        "seconds": 1_000_000,
        "minutes": 60_000_000,
        "hours": 3_600_000_000,
    }[unit if unit.endswith("s") else unit + "s"]

    def fn(
        key_tuple: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key_tuple
        if state.hasTimedOut:
            # Watermark passed end+gap: nothing can extend this session.
            yield _emit(user_id, [state.get])
            state.remove()
            return

        rows = pd.concat(list(pdfs)).sort_values(ts)
        times = rows[ts].astype("int64") // 1000  # ns -> us
        vals = rows[value]

        start = end = None
        n_ev, total = 0, 0.0
        if state.exists:
            start, end, n_ev, total = state.get

        closed: list[tuple[int, int, int, float]] = []
        for t, v in zip(times, vals):
            t, v = int(t), float(v)
            if start is None:
                start, end, n_ev, total = t, t, 1, v
            elif t - end >= gap_us:
                closed.append((start, end, n_ev, total))
                start, end, n_ev, total = t, t, 1, v
            else:
                end, n_ev, total = t, n_ev + 1, total + v

        state.update((start, end, n_ev, total))
        # Flush once the watermark clears the gap horizon; never set a
        # timeout at/behind the current watermark (Spark rejects it).
        state.setTimeoutTimestamp(
            max((end + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield _emit(user_id, closed)

    return (
        ticks.withWatermark(ts, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("pair_name", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("spread", T.DoubleType()),
        T.StructField("z_score", T.DoubleType()),
    ]
)

# Trailing spreads ring buffer (timestamps + values), capped at the window.
ZSTATE_SCHEMA = "ts array<long>, sp array<double>"


def rolling_zscore_stream(
    spreads: DataFrame,
    window_bars: int = 60,
    min_periods: int = 30,
    key: str = "pair_name",
    ts: str = "timestamp",
    value: str = "spread",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """The flagship rolling z-score as a live streaming operator.

    Input: an aligned per-pair spread stream (e.g. ``stream_bars`` output
    joined across legs, or a precomputed spread feed).  Per key the state
    holds the trailing ``window_bars`` (ts, spread) pairs — O(window)
    doubles per pair, independent of throughput — and every arriving bar
    emits its z-score against the sample stddev (ddof=1, matching
    ``F.stddev`` and transform_data.py:145-153) with the min-periods
    NULL gate.

    Batch/stream parity caveat (tested): rows must arrive in event-time
    order per key within a batch — the operator sorts each batch, and
    cross-batch disorder inside the watermark produces the same bars a
    late-data-aware batch recompute would.
    """
    import math

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (pair,) = key_tuple
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs)).sort_values(ts)
        times = rows[ts].astype("int64") // 1000
        vals = rows[value]

        if state.exists:
            hist_ts, hist_sp = state.get
            hist_ts, hist_sp = list(hist_ts), list(hist_sp)
        else:
            hist_ts, hist_sp = [], []

        out_ts, out_sp, out_z = [], [], []
        for t, v in zip(times, vals):
            t, v = int(t), float(v)
            hist_ts.append(t)
            hist_sp.append(v)
            if len(hist_sp) > window_bars:
                hist_ts = hist_ts[-window_bars:]
                hist_sp = hist_sp[-window_bars:]
            n = len(hist_sp)
            if n >= min_periods:
                mean = sum(hist_sp) / n
                var = sum((x - mean) ** 2 for x in hist_sp) / (n - 1)
                sd = math.sqrt(var)
                z = (v - mean) / sd if sd > 0 else None
            else:
                z = None
            out_ts.append(t)
            out_sp.append(v)
            out_z.append(z)

        state.update((hist_ts, hist_sp))
        yield pd.DataFrame(
            {
                "pair_name": [pair] * len(out_ts),
                "timestamp": pd.to_datetime(out_ts, unit="us"),
                "spread": out_sp,
                "z_score": out_z,
            }
        )

    return (
        spreads.withWatermark(ts, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=ZSCORE_SCHEMA,
            stateStructType=ZSTATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RSI_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("bar_ts", T.TimestampType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("rsi", T.DoubleType()),
    ]
)

# Wilder recursion state: last close, the two smoothed averages, the
# diff count, and the seed accumulators for the first `period` diffs.
RSI_STATE_SCHEMA = (
    "last_close double, avg_g double, avg_l double, n long, "
    "sum_g double, sum_l double"
)


def wilder_rsi_stream(
    bars: DataFrame,
    period: int = 14,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Wilder's RSI as a stateful streaming operator.

    Wilder smoothing is RECURSIVE — ``avg_g[t] = (avg_g[t-1] * (p-1) +
    gain[t]) / p`` — so unlike the closed-form Cutler variant
    (``queries/quant.py:q_rsi_14``, a pure window aggregate), every value
    depends on the entire history.  A batch window cannot express it
    without materializing per-key arrays; a per-key state machine holds
    exactly FIVE doubles regardless of history length — O(1) state per
    symbol, the property that keeps the operator viable on an unbounded
    tick stream.

    Seed semantics: the first ``period`` diffs average simply; from then
    on the recursion applies (the standard Wilder definition).  Bars must
    arrive event-time-ordered per key within a batch (each batch is
    sorted; the watermark bounds cross-batch disorder).
    """

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (sym,) = key_tuple
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs)).sort_values(ts)
        times = rows[ts].astype("int64") // 1000
        closes = rows[close]

        if state.exists:
            last_c, avg_g, avg_l, n, sum_g, sum_l = state.get
        else:
            last_c, avg_g, avg_l, n, sum_g, sum_l = None, 0.0, 0.0, 0, 0.0, 0.0

        out_ts, out_c, out_rsi = [], [], []
        for t, c in zip(times, closes):
            t, c = int(t), float(c)
            rsi = None
            if last_c is not None:
                diff = c - last_c
                gain = diff if diff > 0 else 0.0
                loss = -diff if diff < 0 else 0.0
                if n < period:
                    sum_g, sum_l, n = sum_g + gain, sum_l + loss, n + 1
                    if n == period:
                        avg_g, avg_l = sum_g / period, sum_l / period
                else:
                    avg_g = (avg_g * (period - 1) + gain) / period
                    avg_l = (avg_l * (period - 1) + loss) / period
                if n >= period:
                    rsi = (
                        100.0
                        if avg_l == 0
                        else 100.0 - 100.0 / (1.0 + avg_g / avg_l)
                    )
            last_c = c
            out_ts.append(t)
            out_c.append(c)
            out_rsi.append(rsi)

        state.update((last_c, avg_g, avg_l, n, sum_g, sum_l))
        yield pd.DataFrame(
            {
                "symbol": [sym] * len(out_ts),
                "bar_ts": pd.to_datetime(out_ts, unit="us"),
                "close": out_c,
                "rsi": out_rsi,
            }
        )

    return (
        bars.withWatermark(ts, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=RSI_SCHEMA,
            stateStructType=RSI_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


VPIN_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("bucket_id", T.LongType()),
        T.StructField("n_ticks", T.LongType()),
        T.StructField("oi_frac", T.DoubleType()),
        T.StructField("vpin", T.DoubleType()),
    ]
)

# Per-symbol VPIN accumulator: the previous trade price (tick rule),
# the open bucket's fill + signed sum, the next bucket id to assign,
# and the trailing ring of completed-bucket oi fractions.  O(window)
# doubles per key — independent of throughput.
VPIN_STATE_SCHEMA = (
    "last_price double, fill long, signed long, next_bucket long, "
    "ring array<double>"
)


def vpin_stream(
    ticks: DataFrame,
    bucket_size: int = 50,
    window_buckets: int = 5,
    key: str = "symbol",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """VPIN order-flow toxicity as a live streaming operator.

    Streaming twin of the batch ``vpin_toxicity`` query: classify each
    tick +1/-1/0 by the tick rule against the PREVIOUS trade (state
    carries the last price across micro-batches), cut the per-symbol
    stream into equal-volume buckets of ``bucket_size`` ticks, and on
    each bucket CLOSE emit |net signed flow| / bucket volume plus the
    trailing ``window_buckets`` VPIN average (NULL until the ring
    fills).  Only completed buckets are emitted — the open bucket lives
    in state until its 50th tick arrives, possibly batches later, so
    emission is append-mode clean (a bucket is emitted exactly once).

    Parity contract (gated by ``stream_vpin_e2e``): rows must arrive in
    per-key event-time order across batches (time-sliced landing) and
    the operator sorts each batch by (ts, tiebreak) — then bucket ids,
    sides, and ring contents reproduce the batch row_number bucketing
    exactly.
    """

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (symbol,) = key_tuple
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs)).sort_values([ts, tiebreak])
        vals = [float(v) for v in rows[value]]

        if state.exists:
            last_price, fill, signed, next_bucket, ring = state.get
            ring = list(ring)
            have_last = True
        else:
            last_price, fill, signed, next_bucket, ring = 0.0, 0, 0, 0, []
            have_last = False

        out: list[tuple[int, float, float | None]] = []
        for v in vals:
            if not have_last or v == last_price:
                side = 0
            elif v > last_price:
                side = 1
            else:
                side = -1
            have_last = True
            last_price = v
            signed += side
            fill += 1
            if fill == bucket_size:
                oi = abs(signed) / float(bucket_size)
                ring.append(oi)
                ring = ring[-window_buckets:]
                vpin = (
                    sum(ring) / window_buckets
                    if len(ring) == window_buckets
                    else None
                )
                out.append((next_bucket, oi, vpin))
                next_bucket += 1
                fill = 0
                signed = 0

        state.update((last_price, fill, signed, next_bucket, ring))
        yield pd.DataFrame(
            {
                "symbol": [symbol] * len(out),
                "bucket_id": [o[0] for o in out],
                "n_ticks": [bucket_size] * len(out),
                "oi_frac": [o[1] for o in out],
                "vpin": [o[2] for o in out],
            }
        )

    return (
        ticks.withWatermark(ts, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=VPIN_SCHEMA,
            stateStructType=VPIN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
