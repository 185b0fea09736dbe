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
    hll_estimate_from_regs,
    hll_rho_frame,
)

# The twin derives EVERY constant from the published HLL paper, NOT
# from production imports — r10's twin imported _HLL_NUM and so could
# only check self-consistency, which is exactly how a 2x raw-branch
# numerator bias (2^43 where the 2^(44-rho) register scaling demands
# 2^44) shipped undetected.  m=512 (p=9), alpha_m = 0.7213/(1+1.079/m)
# (Flajolet et al. 2007, m >= 128), numerator alpha*m^2*2^44 because
# sum_int = 2^44 * sum(2^-M[j]), LC gate 2.5*m.
_TWIN_M = 512
_TWIN_P = 9
_TWIN_ALPHA = 0.7213 / (1.0 + 1.079 / 512.0)
_TWIN_NUM = _TWIN_ALPHA * 512.0 * 512.0 * float(1 << 44)
_TWIN_LC_GATE = 2.5 * 512.0


def _py_hll(values) -> tuple[dict[int, int], float, int]:
    """Independent HLL: registers, estimate, zero-register count."""
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
        bucket = h & (_TWIN_M - 1)
        w = h >> _TWIN_P
        rho = 44 - w.bit_length()  # w == 0 -> 44
        regs[bucket] = max(regs.get(bucket, 0), rho)
    sum_int = sum(1 << (44 - r) for r in regs.values())
    sum_int += (_TWIN_M - len(regs)) * (1 << 44)
    raw_e = _TWIN_NUM / sum_int
    zero = _TWIN_M - len(regs)
    if raw_e <= _TWIN_LC_GATE and zero > 0:
        est = round(float(_TWIN_M) * math.log(float(_TWIN_M) / zero), 4)
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


def test_hll_raw_branch_accuracy(spark):
    """Absolute accuracy bound on the PRODUCTION raw branch — the test
    the r10 suite lacked (its twin shared production's numerator, so a
    constant-factor bias cancelled out).  For n >> 2.5*m the relative
    error of a correct m=512 HLL is ~1.04/sqrt(512) = 4.6% (1 sigma);
    15% is ~3 sigma.  The r10 2^43 numerator put every raw estimate at
    ~half the true count (rel_err ~0.5) — this assertion fails on that
    code and pins the 2^44 fix."""
    n = 20_000  # >> 2.5*512 = 1280: firmly in the raw-HLL branch
    df = spark.range(n).select(F.col("id").cast("long").alias("x"))
    est_row = hll_estimate_from_regs(
        hll_rho_frame(df, "x", [])
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max")),
        [],
    ).collect()[0]
    assert est_row.zero_registers == 0  # raw branch, no LC gate
    rel_err = abs(est_row.hll_estimate - n) / n
    assert rel_err < 0.15, f"raw-branch rel_err {rel_err:.3f} (est {est_row.hll_estimate})"

    # And the independent twin agrees with production on the same input.
    _, py_est, _ = _py_hll(range(n))
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


def test_quantile_histogram_split_merge_invariance(spark):
    """With FIXED edges, per-split bin-count partials SUM-merge to
    exactly the whole-data histogram — the algebraic property
    stream_quantile_e2e's foreachBatch partials rest on (the quantile
    twin of test_hll_merge_invariance)."""
    from quant_market_data_pipeline_spark.queries.relational import (
        qh_bin_expr,
    )

    vals = [float((i * 37) % 997) + 0.25 for i in range(2000)]
    lo, hi = min(vals), max(vals)

    def hist_of(rows):
        df = spark.createDataFrame([(v,) for v in rows], "x double")
        return {
            r.bin: r.cnt
            for r in df.select(
                qh_bin_expr(F.col("x"), F.lit(lo), F.lit(hi)).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    whole = hist_of(vals)
    merged: dict[int, int] = {}
    for i in range(4):
        for b, c in hist_of(vals[i::4]).items():
            merged[b] = merged.get(b, 0) + c
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
