"""Genuinely sequential per-key recursions at the Arrow boundary.

Some research-layer state machines are NOT window-expressible: the next
state depends on the previous OUTPUT, not on a bounded frame of inputs
(Kalman gain carries the covariance recursion; RiskMetrics EWMA carries
infinite memory).  The engine's rule for this class (same as the
streaming Wilder RSI): run the recursion in an Arrow-batched
``applyInPandas`` over the DIMENSION-sized reduction — never over raw
ticks — so each group is a few hundred rows of daily state, and the
batch twin is still oracle-checkable via a DuckDB RECURSIVE CTE doing
the IDENTICAL arithmetic sequence (both engines evaluate the same IEEE
ops in the same order, so 6dp-rounded equality has ~10 digits of
margin).

Scale: the exchange is one hash partition per key (symbol / pair); the
per-group Python cost is O(days).  At 100 TB the tick->daily rollup
dominates; the recursion is noise.  Groups are bounded BY CONTRACT
(calendar days), not by data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kalman_hedge(
    aligned: DataFrame,
    key: str = "pair_name",
    day: str = "trading_day",
    x: str = "x",
    y: str = "y",
    q: float = 1e-5,
    r: float = 1e-3,
    beta0: float = 0.0,
    p0: float = 1.0,
) -> DataFrame:
    """Scalar-state Kalman filter for a time-varying hedge ratio.

    Model: y_t = beta_t * x_t + eps (obs noise R), beta_t random-walks
    with state noise Q.  Per step (the exact op order the DuckDB
    RECURSIVE oracle mirrors):

        pp    = p + Q
        gain  = pp * x / (pp * x * x + R)
        innov = y - beta * x            (pre-update residual)
        beta' = beta + gain * innov
        p'    = (1 - gain * x) * pp

    Returns (key, day, x, y, innovation, gain, beta, p) per input row.
    """
    schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(day, T.DateType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("innovation", T.DoubleType()),
            T.StructField("gain", T.DoubleType()),
            T.StructField("beta", T.DoubleType()),
            T.StructField("p", T.DoubleType()),
        ]
    )

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values(day).reset_index(drop=True)
        beta, p = beta0, p0
        innovs, gains, betas, ps = [], [], [], []
        for xi, yi in zip(pdf[x].tolist(), pdf[y].tolist()):
            pp = p + q
            gain = pp * xi / (pp * xi * xi + r)
            innov = yi - beta * xi
            beta = beta + gain * innov
            p = (1.0 - gain * xi) * pp
            innovs.append(innov)
            gains.append(gain)
            betas.append(beta)
            ps.append(p)
        return pd.DataFrame(
            {
                key: pdf[key],
                day: pdf[day],
                "x": pdf[x],
                "y": pdf[y],
                "innovation": innovs,
                "gain": gains,
                "beta": betas,
                "p": ps,
            }
        )

    return aligned.select(key, day, F.col(x).alias("x"), F.col(y).alias("y")) \
        .groupBy(key).applyInPandas(fit, schema=schema)


def ewma_variance(
    rets: DataFrame,
    key: str = "symbol",
    day: str = "trading_day",
    r: str = "r",
    lam: float = 0.94,
) -> DataFrame:
    """RiskMetrics infinite-memory EWMA variance per key.

    v_1 = r_1^2; v_t = lam * v_{t-1} + (1 - lam) * r_t^2.  Unlike
    ``ewma_bounded`` (K-lag truncation, window-expressible) this is the
    exact recursion — full memory, O(1) state — so it lives at the Arrow
    boundary with a RECURSIVE-CTE oracle twin.
    """
    schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(day, T.DateType()),
            T.StructField("r", T.DoubleType()),
            T.StructField("ewma_var", T.DoubleType()),
        ]
    )

    def roll(pdf):
        import pandas as pd

        pdf = pdf.sort_values(day).reset_index(drop=True)
        v = None
        out = []
        for ri in pdf[r].tolist():
            v = ri * ri if v is None else lam * v + (1.0 - lam) * ri * ri
            out.append(v)
        return pd.DataFrame(
            {key: pdf[key], day: pdf[day], "r": pdf[r], "ewma_var": out}
        )

    return rets.select(key, day, F.col(r).alias("r")).groupBy(key).applyInPandas(
        roll, schema=schema
    )


def garch_variance(
    rets: DataFrame,
    key: str = "symbol",
    day: str = "trading_day",
    r: str = "r",
    omega: float = 2e-6,
    alpha: float = 0.05,
    beta: float = 0.90,
) -> DataFrame:
    """GARCH(1,1) variance filter per key with FIXED parameters.

    v_1 = omega / (1 - alpha - beta) (the model's long-run variance);
    v_t = omega + alpha * r_{t-1}^2 + beta * v_{t-1} for t >= 2 — the
    one-step-ahead conditional variance.  Like ``ewma_variance`` this
    is a genuine recursion (beta carries full memory, O(1) state), so
    it lives at the Arrow boundary with a RECURSIVE-CTE oracle twin
    performing the identical IEEE op sequence.  Parameter ESTIMATION
    (MLE) is out of scope by design: filtering with shipped parameters
    is the scale-shaped production operation; fitting is a small-data
    offline task.
    """
    schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(day, T.DateType()),
            T.StructField("r", T.DoubleType()),
            T.StructField("garch_var", T.DoubleType()),
        ]
    )
    v0 = omega / (1.0 - alpha - beta)

    def roll(pdf):
        import pandas as pd

        pdf = pdf.sort_values(day).reset_index(drop=True)
        v = None
        prev = None
        out = []
        for ri in pdf[r].tolist():
            if v is None:
                v = v0
            else:
                v = omega + alpha * (prev * prev) + beta * v
            prev = ri
            out.append(v)
        return pd.DataFrame(
            {key: pdf[key], day: pdf[day], "r": pdf[r], "garch_var": out}
        )

    return rets.select(key, day, F.col(r).alias("r")).groupBy(key).applyInPandas(
        roll, schema=schema
    )
