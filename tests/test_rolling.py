"""Rolling z-score vs a pandas golden (SURVEY §5: rolling 60, min_periods
30, ddof=1 to match F.stddev)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_market_data_pipeline_spark.operators.rolling import with_rolling_zscore


def test_zscore_matches_pandas_golden(spark):
    rng = np.random.default_rng(7)
    n = 200
    pdf = pd.DataFrame(
        {
            "pair": ["a"] * n,
            "t": np.arange(n),
            "spread": rng.normal(size=n),
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        with_rolling_zscore(
            df, value="spread", partition_by=["pair"], order_by=["t"], n=60,
            min_periods=30,
        )
        .orderBy("t")
        .toPandas()
    )

    roll = pdf["spread"].rolling(window=60, min_periods=30)
    golden = (pdf["spread"] - roll.mean()) / roll.std(ddof=1)

    got = out["z_score"].to_numpy(dtype=float)
    want = golden.to_numpy(dtype=float)
    # First 29 rows gated to NULL.
    assert np.all(np.isnan(got[:29]))
    np.testing.assert_allclose(got[29:], want[29:], rtol=1e-9)


def test_zscore_zero_variance_is_null(spark):
    pdf = pd.DataFrame({"pair": ["a"] * 40, "t": range(40), "spread": [1.0] * 40})
    out = (
        with_rolling_zscore(
            df := spark.createDataFrame(pdf), value="spread",
            partition_by=["pair"], order_by=["t"], n=60, min_periods=30,
        )
        .where("t >= 29")
        .toPandas()
    )
    assert out["z_score"].isna().all()  # NULLIF(stddev,0) guard, not error/inf
