"""As-of join vs pandas merge_asof (backward, inclusive)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

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


def test_asof_null_payload_not_scavenged(spark):
    """If the MATCHED right row carries a NULL payload value, the result
    must hold that NULL (merge_asof semantics) — not a non-null value
    scavenged from an older right row; and multiple payload columns must
    all come from the same matched row."""
    left = pd.DataFrame(
        {"k": [1, 1], "ts": pd.to_datetime([300, 900], unit="s"),
         "lv": [0.1, 0.2]}
    )
    right = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime([100, 200], unit="s"),
            "rv": [7.0, None],        # matched row (ts=200) has NULL rv
            "rw": [None, 8.0],        # ...but non-null rw
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts="ts",
            right_cols=["rv", "rw"],
        )
        .orderBy("ts")
        .toPandas()
    )
    # both left rows match right ts=200 -> rv NULL, rw 8.0, never rv=7.0
    assert out["rv_right"].isna().all()
    assert (out["rw_right"] == 8.0).all()
    assert (out["ts_right"] == pd.Timestamp("1970-01-01 00:03:20")).all()


def test_asof_tolerance_gates_matched_row_only(spark):
    """The tolerance gate keys on the matched row's ts: an out-of-tolerance
    match nulls ALL carried columns, even when an older (also out-of-
    tolerance) row had non-null values."""
    left = pd.DataFrame(
        {"k": [1], "ts": pd.to_datetime([1000], unit="s"), "lv": [0.5]}
    )
    right = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime([100, 400], unit="s"),
            "rv": [7.0, None],
        }
    )
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        ts="ts",
        right_cols=["rv"],
        tolerance_seconds=700,
    ).toPandas()
    # matched row ts=400 (gap 600s) is within 700s -> carried, rv is its
    # NULL; the older row (gap 900s) must not leak its 7.0
    assert out["rv_right"].isna().all()
    assert (out["ts_right"] == pd.Timestamp("1970-01-01 00:06:40")).all()
    out2 = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        ts="ts",
        right_cols=["rv"],
        tolerance_seconds=100,
    ).toPandas()
    # matched row now out of tolerance -> everything nulled, no leak of 7.0
    assert out2["rv_right"].isna().all()
    assert out2["ts_right"].isna().all()


def test_asof_nearest_matches_pandas(spark):
    left, right = _frames()
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts="ts",
            right_cols=["rv"],
            direction="nearest",
        )
        .toPandas()
        .sort_values(["ts", "k", "lv"], kind="stable")
        .reset_index(drop=True)
    )
    golden = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right,
        on="ts",
        by="k",
        direction="nearest",
        suffixes=("", "_right"),
    ).sort_values(["ts", "k", "lv"], kind="stable").reset_index(drop=True)
    # pandas nearest resolves exact-distance ties backward too
    assert np.allclose(
        out["rv_right"].to_numpy(dtype=float),
        golden["rv"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_asof_nearest_tolerance_and_ties(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "ts": pd.to_datetime([100, 200, 1000], unit="s"),
            "lv": [1.0, 2.0, 3.0],
        }
    )
    # 90 is 10s before the first left row; 110 is 10s after -> tie, the
    # backward match (90) must win.  1000-350=650s > tolerance -> NULL.
    right = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "ts": pd.to_datetime([90, 110, 350], unit="s"),
            "rv": [9.0, 11.0, 35.0],
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts="ts",
            right_cols=["rv"],
            direction="nearest",
            tolerance_seconds=600,
        )
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert out.loc[0, "rv_right"] == 9.0  # tie (10s both ways) -> backward
    # 200s row: backward 110 (90s gap) beats forward 350 (150s gap)
    assert out.loc[1, "rv_right"] == 11.0
    assert pd.isna(out.loc[2, "rv_right"])  # 650s gap > 600s tolerance


def test_asof_tolerance_subsecond_consistency(spark):
    """Backward/forward gate on the microsecond gap, matching nearest:
    a match 1800.5s away under tolerance_seconds=1800 is nulled in ALL
    directions (second-truncated unix_timestamp would keep it)."""
    left = spark.createDataFrame(
        [("A", "2024-01-01 10:30:00.5")], "sym string, ts string"
    ).select("sym", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 1.0)],
        "sym string, ts string, px double",
    ).select("sym", F.col("ts").cast("timestamp").alias("ts"), "px")

    for direction, lhs, rhs in (
        ("backward", left, right),
        ("nearest", left, right),
        ("forward", right.drop("px"), left.withColumn("px", F.lit(2.0))),
    ):
        out = asof_join(
            lhs, rhs, on="sym", ts="ts",
            tolerance_seconds=1800, direction=direction,
        ).collect()
        assert len(out) == 1
        assert out[0]["px_right"] is None, direction
