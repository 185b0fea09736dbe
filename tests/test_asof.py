"""As-of join vs pandas merge_asof (backward, inclusive)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_market_data_pipeline_spark.operators.asof import asof_join


def _frames():
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "ts": pd.to_datetime(rng.integers(0, 10_000, 300), unit="s"),
            "lv": rng.normal(size=300),
        }
    ).sort_values("ts", kind="stable").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": pd.to_datetime(rng.integers(0, 10_000, 200), unit="s"),
            "rv": rng.normal(size=200),
        }
    )
    # merge_asof with duplicate right timestamps per key keeps the LAST
    # occurrence; drop dupes to keep the golden unambiguous.
    right = (
        right.drop_duplicates(["k", "ts"]).sort_values("ts", kind="stable")
        .reset_index(drop=True)
    )
    return left, right


def test_asof_backward_matches_pandas(spark):
    left, right = _frames()
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts="ts",
            right_cols=["rv"],
        )
        .orderBy("ts", "lv")
        .toPandas()
    )
    golden = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k",
        direction="backward",
    ).sort_values(["ts", "lv"], kind="stable")

    np.testing.assert_allclose(
        out["rv_right"].to_numpy(dtype=float),
        golden["rv"].to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )


def test_asof_tolerance(spark):
    left, right = _frames()
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts="ts",
            right_cols=["rv"],
            tolerance_seconds=500,
        )
        .orderBy("ts", "lv")
        .toPandas()
    )
    golden = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k",
        direction="backward", tolerance=pd.Timedelta(seconds=500),
    ).sort_values(["ts", "lv"], kind="stable")
    np.testing.assert_allclose(
        out["rv_right"].to_numpy(dtype=float),
        golden["rv"].to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )


def test_asof_forward_tolerance(spark):
    left, right = _frames()
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts="ts",
            right_cols=["rv"],
            tolerance_seconds=500,
            direction="forward",
        )
        .orderBy("ts", "lv")
        .toPandas()
    )
    golden = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k",
        direction="forward", tolerance=pd.Timedelta(seconds=500),
    ).sort_values(["ts", "lv"], kind="stable")
    np.testing.assert_allclose(
        out["rv_right"].to_numpy(dtype=float),
        golden["rv"].to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )
