"""Partition-overwrite mode provenance + DELETE semantics regressions.

Round-4 driver failure (`incremental_bar_refresh_e2e`): the dynamic
partition-overwrite conf lived in the session factory's STATIC conf set,
so a session the engine did not create (the correctness driver's) ran the
partition-overwrite sinks in Spark's default STATIC mode — wiping every
untouched partition.  These tests pin the fix from both ends:

1. `configure_runtime` — the only hook that runs on an external session —
   now sets `partitionOverwriteMode=dynamic` (it is runtime-mutable);
2. every partition-overwrite sink refuses to run in static mode instead
   of silently destroying data;
3. `refresh_bars_incremental` preserves untouched partitions on a
   driver-shaped session (bare conf + configure_runtime only).

Plus the two DELETE-semantics bugs from the round-4 advisory:
4. a partition whose EVERY row matches the predicate is actually erased
   (dynamic overwrite alone would leave its old files: zero output rows
   means zero partitions replaced);
5. rows where the predicate evaluates to NULL survive (SQL DELETE only
   removes WHERE-TRUE rows), in rewritten and untouched partitions alike.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.session import configure_runtime

OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


@pytest.fixture()
def driver_shaped(spark):
    """Emulate the correctness driver's session: the conf is unset (Spark
    default = static) until configure_runtime is applied.  Restores the
    engine conf afterwards so other tests are unaffected."""
    spark.conf.unset(OVERWRITE_MODE)
    yield spark
    configure_runtime(spark)


def _lake(spark, path: str, n_days: int = 3, rows_per_day: int = 8) -> None:
    rows = [
        (d * rows_per_day + i, dt.date(2024, 1, 1 + d), (i % 4) * 100 or None)
        for d in range(n_days)
        for i in range(rows_per_day)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, trading_date date, user_id bigint"
    )
    df.write.partitionBy("trading_date").parquet(path)


def test_configure_runtime_sets_dynamic_overwrite(driver_shaped):
    assert driver_shaped.conf.get(OVERWRITE_MODE, "static") == "static"
    configure_runtime(driver_shaped)
    assert driver_shaped.conf.get(OVERWRITE_MODE) == "dynamic"


def test_sinks_refuse_static_mode(driver_shaped, tmp_path):
    from quant_market_data_pipeline_spark.sources.sink import (
        compact_partitions,
        delete_rows,
        upsert_rows,
        write_partitioned,
    )

    lake = str(tmp_path / "lake")
    configure_runtime(driver_shaped)  # build the fixture in dynamic mode
    _lake(driver_shaped, lake)
    df = driver_shaped.read.parquet(lake)

    driver_shaped.conf.unset(OVERWRITE_MODE)
    with pytest.raises(RuntimeError, match="dynamic"):
        write_partitioned(df, lake, ts_col=None)
    with pytest.raises(RuntimeError, match="dynamic"):
        compact_partitions(driver_shaped, lake)
    with pytest.raises(RuntimeError, match="dynamic"):
        upsert_rows(driver_shaped, lake, df.limit(1), keys=["event_id"])
    with pytest.raises(RuntimeError, match="dynamic"):
        delete_rows(driver_shaped, lake, F.col("user_id") == 100)
    # the static-mode lake is untouched: all three days still present
    assert driver_shaped.read.parquet(lake).count() == 24


def test_incremental_refresh_on_driver_shaped_session(
    driver_shaped, tmp_path
):
    """The exact round-4 failure: external session + configure_runtime
    must leave untouched bar partitions alone."""
    from quant_market_data_pipeline_spark.plans.incremental import (
        refresh_bars_incremental,
    )

    spark = configure_runtime(driver_shaped)
    ticks = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1 + d, 10, 0, i % 60), "A", 1.0 + i)
            for d in range(3)
            for i in range(20)
        ],
        "event_id bigint, ts timestamp, symbol string, price double",
    )
    tick_lake = str(tmp_path / "ticks")
    bar_lake = str(tmp_path / "bars")
    ticks.withColumn("trading_date", F.to_date("ts")).write.partitionBy(
        "trading_date"
    ).parquet(tick_lake)
    from quant_market_data_pipeline_spark.operators.bars import build_bars
    from quant_market_data_pipeline_spark.sources.sink import (
        write_partitioned,
    )

    bars = build_bars(
        ticks, key="symbol", ts="ts", price="price", width="5 minutes",
        tiebreak="event_id",
    ).withColumn("trading_date", F.to_date("bar_ts"))
    write_partitioned(bars, bar_lake, ts_col=None)
    n_days_before = len(
        [p for p in Path(bar_lake).iterdir() if p.name.startswith("trading")]
    )
    assert n_days_before == 3

    late = ticks.filter(F.to_date("ts") == dt.date(2024, 1, 2)).limit(5)
    refresh_bars_incremental(
        spark, tick_lake, bar_lake, late, tiebreak="event_id"
    )
    days_after = [
        p.name
        for p in Path(bar_lake).iterdir()
        if p.name.startswith("trading")
    ]
    # static mode would have wiped 2024-01-01 and 2024-01-03
    assert sorted(days_after) == [
        "trading_date=2024-01-01",
        "trading_date=2024-01-02",
        "trading_date=2024-01-03",
    ]


def test_delete_rows_erases_fully_matching_partition(spark, tmp_path):
    from quant_market_data_pipeline_spark.sources.sink import delete_rows

    lake = str(tmp_path / "lake")
    _lake(spark, lake)
    # every 2024-01-02 row matches: event_id 8..15
    touched = delete_rows(
        spark, lake, (F.col("event_id") >= 8) & (F.col("event_id") < 16)
    )
    assert [str(t) for t in touched] == ["2024-01-02"]
    assert not (Path(lake) / "trading_date=2024-01-02").exists()
    left = spark.read.parquet(lake)
    assert left.count() == 16
    assert left.filter(F.col("trading_date") == "2024-01-02").count() == 0


def test_delete_rows_keeps_null_predicate_rows(spark, tmp_path):
    from quant_market_data_pipeline_spark.sources.sink import delete_rows

    lake = str(tmp_path / "lake")
    _lake(spark, lake)  # user_id NULL where i % 4 == 0 (2 per day)
    before_nulls = (
        spark.read.parquet(lake).filter(F.col("user_id").isNull()).count()
    )
    assert before_nulls == 6
    # predicate is NULL for NULL user_id rows — SQL DELETE keeps them
    delete_rows(spark, lake, F.col("user_id") % 200 == 0)
    after = spark.read.parquet(lake)
    assert after.filter(F.col("user_id").isNull()).count() == before_nulls
    assert after.filter(F.col("user_id") == 200).count() == 0
    assert after.filter(F.col("user_id") == 100).count() == 6


def test_expire_partitions_via_hadoop_fs_uri(spark, tmp_path):
    """expire_partitions routes through the Hadoop FileSystem API: an
    explicit file:/ URI (not an OS path) must work end to end."""
    from quant_market_data_pipeline_spark.sources.sink import (
        expire_partitions,
    )

    lake = str(tmp_path / "lake")
    _lake(spark, lake)
    removed = expire_partitions(
        spark, "file://" + lake, dt.date(2024, 1, 3)
    )
    assert removed == ["2024-01-01", "2024-01-02"]
    assert (Path(lake) / "trading_date=2024-01-03").exists()
    assert not (Path(lake) / "trading_date=2024-01-01").exists()


def test_delete_rows_escaped_partition_values(spark, tmp_path):
    """Fully-emptied partitions whose values need Hive path escaping
    (spaces, colons, percent) are actually removed — the directory name
    must be derived via the same escaping the writer used, not a bare
    f-string (round-5 advisory)."""
    from quant_market_data_pipeline_spark.sources.sink import delete_rows

    lake = str(tmp_path / "lake")
    rows = [
        (1, "a b", 10),
        (2, "a b", 20),
        (3, "x:y", 30),
        (4, "p%q", 40),
    ]
    spark.createDataFrame(
        rows, "event_id bigint, src string, v bigint"
    ).write.partitionBy("src").parquet(lake)
    # escaped directory names exist on disk (Spark escapes : and % but
    # not spaces — the fix routes through the SAME JVM escapePathName)
    names = {p.name for p in Path(lake).iterdir() if p.is_dir()}
    assert "src=x%3Ay" in names and "src=p%25q" in names
    touched = delete_rows(
        spark, lake, F.col("src").isin(["a b", "x:y"]), partition_col="src"
    )
    assert sorted(touched) == ["a b", "x:y"]
    left = spark.read.parquet(lake)
    assert left.count() == 1
    assert left.select("src").first()[0] == "p%q"
    # the emptied escaped directories are gone
    remaining = {p.name for p in Path(lake).iterdir() if p.is_dir()}
    assert len(remaining) == 1


def test_delete_rows_null_partition_value(spark, tmp_path):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__; a delete
    touching (or fully emptying) that partition must find it — isin()
    never matches NULL, and the directory name is not f'{col}=None'."""
    from quant_market_data_pipeline_spark.sources.sink import delete_rows

    lake = str(tmp_path / "lake")
    rows = [(1, "s1", 10), (2, "s1", 20), (3, None, 99), (4, None, 5)]
    spark.createDataFrame(
        rows, "event_id bigint, src string, v bigint"
    ).write.partitionBy("src").parquet(lake)
    assert (Path(lake) / "src=__HIVE_DEFAULT_PARTITION__").exists()
    delete_rows(spark, lake, F.col("v") > 50, partition_col="src")
    left = spark.read.parquet(lake)
    # the NULL partition was rewritten (not wiped, not missed): row v=5 kept
    assert left.filter(F.col("src").isNull()).count() == 1
    assert left.count() == 3
    # now empty it entirely -> directory removed
    delete_rows(spark, lake, F.col("src").isNull(), partition_col="src")
    assert not (Path(lake) / "src=__HIVE_DEFAULT_PARTITION__").exists()
    assert spark.read.parquet(lake).count() == 2


def test_surgical_rewrite_parallelism(spark, tmp_path):
    """A multi-partition rewrite hash-partitions by the partition column
    into min(touched, shuffle partitions) buckets — parallel write tasks —
    while keeping one data file per partition directory."""
    from quant_market_data_pipeline_spark.sources.sink import (
        _rewrite_parallelism,
        delete_rows,
    )

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _rewrite_parallelism(spark, 1) == 1
    assert _rewrite_parallelism(spark, 7) == min(7, cap)
    assert _rewrite_parallelism(spark, 10**6) == cap

    lake = str(tmp_path / "lake")
    _lake(spark, lake, n_days=3)
    delete_rows(spark, lake, F.col("event_id") % 2 == 0)
    for d in (1, 2, 3):
        part = Path(lake) / f"trading_date=2024-01-0{d}"
        files = [p for p in part.iterdir() if p.suffix == ".parquet"]
        assert len(files) == 1, f"expected 1 file in {part}, got {files}"
    assert spark.read.parquet(lake).count() == 12
