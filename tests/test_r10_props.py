"""Round-10 property tests: the new sketch audits vs independent
from-scratch reimplementations (the r9 Count-Min/Bloom pattern — the
engine's expression pipeline and a plain-Python twin must agree on
EVERY register and estimate, not just on fixture outputs)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.queries.relational import (
    _HLL_LC_GATE,
    _HLL_M,
    _HLL_NUM,
    _HLL_P,
    hll_estimate_from_regs,
    hll_rho_frame,
)


def _py_hll(values) -> tuple[dict[int, int], float, int]:
    """Independent HLL: registers, estimate, zero-register count."""
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
        bucket = h & (_HLL_M - 1)
        w = h >> _HLL_P
        rho = 44 - w.bit_length()  # w == 0 -> 44
        regs[bucket] = max(regs.get(bucket, 0), rho)
    sum_int = sum(1 << (44 - r) for r in regs.values())
    sum_int += (_HLL_M - len(regs)) * (1 << 44)
    raw_e = _HLL_NUM / sum_int
    zero = _HLL_M - len(regs)
    if raw_e <= _HLL_LC_GATE and zero > 0:
        est = round(float(_HLL_M) * math.log(float(_HLL_M) / zero), 4)
    else:
        est = round(raw_e, 4)
    return regs, est, zero


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**12), max_value=10**12),
        min_size=1,
        max_size=400,
    )
)
def test_hll_registers_and_estimate_match_python_twin(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x long")
    rho = hll_rho_frame(df, "x", [])
    regs = {
        r.bucket: r.rho_max
        for r in rho.groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
        .collect()
    }
    est_row = hll_estimate_from_regs(
        rho.groupBy("bucket").agg(F.max("rho").alias("rho_max")), []
    ).collect()[0]

    py_regs, py_est, py_zero = _py_hll(values)
    assert regs == py_regs
    assert est_row.zero_registers == py_zero
    assert est_row.hll_estimate == pytest.approx(py_est, abs=0)


def test_hll_merge_invariance(spark):
    """Register max-merge must make the estimate independent of how the
    input is split — the exact property stream_hll_distinct_e2e ships."""
    vals = [f"u{i % 137}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    whole = hll_estimate_from_regs(
        hll_rho_frame(df, "x", [])
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max")),
        [],
    ).collect()[0]

    # 4-way split, per-split partial registers, max-merged
    parts = [
        spark.createDataFrame(
            [(v,) for v in vals[i::4]], "x string"
        )
        for i in range(4)
    ]
    partials = None
    for p in parts:
        pr = (
            hll_rho_frame(p, "x", [])
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho_max"))
        )
        partials = pr if partials is None else partials.unionByName(pr)
    merged = hll_estimate_from_regs(
        partials.groupBy("bucket").agg(
            F.max("rho_max").alias("rho_max")
        ),
        [],
    ).collect()[0]
    assert merged == whole


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=1.0, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=8,
        max_size=300,
    )
)
def test_quantile_histogram_error_bound(spark, values):
    """The 256-bin sketch's TRUE resolution guarantee: the read-out lies
    within one bin width of the rank-ceil(q*n) ORDER STATISTIC (the
    smallest value whose cumulative count reaches the target rank) —
    the estimate interpolates inside that statistic's bin.  Against the
    type-7 INTERPOLATED percentile (what the audit's exact side and
    abs_err column use), the error can additionally include the local
    gap between adjacent order statistics — hypothesis found the case
    ([1.0 x7, 2.0], q=0.95: sketch 1.998 vs interpolated 1.65) that
    falsified the naive 'abs_err <= bin width' claim, which is why the
    query doc states the bound against the order statistic."""
    from quant_market_data_pipeline_spark.queries.relational import _QH_BINS

    arr = np.asarray(sorted(values), dtype=np.float64)
    lo, hi = float(arr.min()), float(arr.max())
    if hi == lo:
        return  # degenerate: zero-width histogram undefined
    width = (hi - lo) / _QH_BINS
    bins = np.minimum(
        np.floor((arr - lo) / width).astype(int), _QH_BINS - 1
    )
    counts = np.bincount(bins, minlength=_QH_BINS)
    n = len(arr)
    for q in (0.5, 0.95, 0.99):
        target = q * n
        cum = np.cumsum(counts)
        b = int(np.argmax(cum >= target))
        below = int(cum[b - 1]) if b else 0
        est = lo + width * (b + (target - below) / counts[b])
        order_stat = float(arr[math.ceil(target) - 1])
        assert abs(est - order_stat) <= width + 1e-9 * max(abs(hi), 1.0)
