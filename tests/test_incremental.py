"""Incremental bar refresh (plans/incremental.py): parity + isolation.

The two claims that make the incremental path trustworthy at scale:
(1) initial-load + late-tick refresh converges to exactly the bars a
full rebuild produces; (2) the refresh rewrites ONLY touched date
partitions — proven by deleting an untouched partition and observing
the refresh leaves it absent.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.bars import build_bars
from quant_market_data_pipeline_spark.plans.incremental import (
    refresh_bars_incremental,
)
from quant_market_data_pipeline_spark.sources.sink import write_partitioned
from quant_market_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ticks(spark):
    return load_table(spark, "events", SF_DIR).select(
        F.col("event_type").alias("symbol"),
        "ts",
        F.col("value").alias("price"),
        "event_id",
    )


def _bars_frame(df):
    return build_bars(
        df, key="symbol", ts="ts", price="price", width="5 minutes",
        tiebreak="event_id",
    )


def test_incremental_refresh_matches_full_rebuild(spark, tmp_path):
    ticks = _ticks(spark).cache()
    days = sorted(
        r[0] for r in ticks.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    late_day = days[len(days) // 2]
    # hold out half the ticks of one mid-range day as "late"
    late = ticks.filter(
        (F.to_date("ts") == F.lit(late_day)) & (F.col("event_id") % 2 == 0)
    )
    initial = ticks.exceptAll(late)

    tick_lake = str(tmp_path / "ticks")
    bar_lake = str(tmp_path / "bars")
    initial.withColumn("trading_date", F.to_date("ts")).write.partitionBy(
        "trading_date"
    ).parquet(tick_lake)
    write_partitioned(
        _bars_frame(initial).withColumn("trading_date", F.to_date("bar_ts")),
        bar_lake,
        ts_col=None,
    )

    summary = refresh_bars_incremental(
        spark, tick_lake, bar_lake, late, tiebreak="event_id"
    )
    assert summary["dates"] == [str(late_day)]
    assert summary["n_late"] == late.count() > 0

    refreshed = spark.read.parquet(bar_lake).drop("trading_date")
    full = _bars_frame(ticks)
    assert refreshed.count() == full.count()
    assert refreshed.exceptAll(full).count() == 0
    assert full.exceptAll(refreshed).count() == 0


def test_incremental_refresh_leaves_untouched_partitions_alone(
    spark, tmp_path
):
    ticks = _ticks(spark).cache()
    days = sorted(
        r[0] for r in ticks.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    late_day, untouched_day = days[0], days[-1]
    assert late_day != untouched_day

    tick_lake = str(tmp_path / "ticks")
    bar_lake = str(tmp_path / "bars")
    ticks.withColumn("trading_date", F.to_date("ts")).write.partitionBy(
        "trading_date"
    ).parquet(tick_lake)
    write_partitioned(
        _bars_frame(ticks).withColumn("trading_date", F.to_date("bar_ts")),
        bar_lake,
        ts_col=None,
    )

    # vandalize an untouched partition: delete it outright
    victim = Path(bar_lake) / f"trading_date={untouched_day}"
    assert victim.exists()
    shutil.rmtree(victim)

    late = ticks.filter(F.to_date("ts") == F.lit(late_day)).limit(50)
    refresh_bars_incremental(
        spark, tick_lake, bar_lake, late, tiebreak="event_id"
    )

    # a full-rebuild writer would have restored the deleted day; the
    # incremental path must not have touched it
    assert not victim.exists()
    touched = Path(bar_lake) / f"trading_date={late_day}"
    assert touched.exists()


def test_empty_late_frame_is_noop(spark, tmp_path):
    late = _ticks(spark).filter(F.lit(False))
    summary = refresh_bars_incremental(
        spark, str(tmp_path / "t"), str(tmp_path / "b"), late
    )
    assert summary == {"n_late": 0, "dates": [], "n_bars": 0}
