"""Bronze JSON source (explicit schema, PERMISSIVE quarantine) and the
idempotent partition-overwrite parquet sink."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.sources.json_bronze import (
    corrupt_records,
    explode_to_bars,
    read_raw_json,
)
from quant_market_data_pipeline_spark.sources.sink import (
    read_partitioned,
    write_partitioned,
)

PAYLOAD = {
    "symbol": "MSFT",
    "timeframe": "5Min",
    "source": "alpaca",
    "feed": "iex",
    "start_utc": "2024-05-01T00:00:00+00:00",
    "end_utc": "2024-05-02T00:00:00+00:00",
    "bars": [
        {
            "timestamp": "2024-05-01T13:30:00+00:00",
            "open": 400.1234,
            "high": 401.5,
            "low": 399.9,
            "close": 401.0001,
            "volume": 12345,
        },
        {
            "timestamp": "2024-05-01T13:35:00+00:00",
            "open": 401.0,
            "high": 402.0,
            "low": 400.5,
            "close": None,  # dropped by the null-gate (P4)
            "volume": 1000,
        },
    ],
}


def test_bronze_roundtrip_and_quarantine(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    (raw_dir / "MSFT_intraday_5min.json").write_text(
        json.dumps(PAYLOAD, indent=2)
    )
    (raw_dir / "BROKEN_intraday_5min.json").write_text("{not json at all")

    raw = read_raw_json(spark, str(raw_dir))
    assert corrupt_records(raw).count() == 1

    bars = explode_to_bars(raw)
    rows = {r["timestamp"]: r for r in bars.collect()}
    # null-close bar dropped; survivor typed and parsed as UTC
    assert len(rows) == 1
    ts = dt.datetime(2024, 5, 1, 13, 30)
    assert ts in rows
    row = rows[ts]
    assert str(row["close"]) == "401.0001"  # Decimal(15,4)
    assert row["volume"] == 12345
    assert dict(bars.dtypes)["close"] == "decimal(15,4)"


def test_partition_overwrite_is_idempotent_per_day(spark, tmp_path):
    path = str(tmp_path / "lake")
    d1, d2 = dt.date(2024, 5, 1), dt.date(2024, 5, 2)

    def frame(day, close):
        return spark.createDataFrame(
            [("MSFT", dt.datetime.combine(day, dt.time(13, 30)), close)],
            "symbol string, timestamp timestamp, close double",
        )

    write_partitioned(frame(d1, 1.0).union(frame(d2, 2.0)), path)
    # re-run day 2 with corrected data: day 1 must be untouched
    write_partitioned(frame(d2, 99.0), path)

    out = {
        r["trading_date"]: r["close"]
        for r in read_partitioned(spark, path).collect()
    }
    assert out == {d1: 1.0, d2: 99.0}


def test_partition_pruning_in_plan(spark, tmp_path):
    path = str(tmp_path / "lake2")
    base = dt.datetime(2024, 5, 1, 13, 30)
    df = spark.createDataFrame(
        [
            ("MSFT", base + dt.timedelta(days=i), float(i))
            for i in range(5)
        ],
        "symbol string, timestamp timestamp, close double",
    )
    write_partitioned(df, path)
    scan = read_partitioned(spark, path).filter(
        F.col("trading_date") == dt.date(2024, 5, 3)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert scan.count() == 1


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from quant_market_data_pipeline_spark.sources.sink import (
        compact_partitions,
    )

    path = str(tmp_path / "lake3")
    base = dt.datetime(2024, 5, 1, 13, 30)
    df = spark.createDataFrame(
        [
            ("MSFT", base + dt.timedelta(days=d, minutes=m), float(d * 100 + m))
            for d in range(3)
            for m in range(20)
        ],
        "symbol string, timestamp timestamp, close double",
    )
    # fragment: many files per partition
    frag = df.withColumn("trading_date", F.to_date("timestamp")).repartition(8)
    frag.write.mode("overwrite").partitionBy("trading_date").parquet(path)

    import glob

    def n_files():
        return len(glob.glob(f"{path}/trading_date=*/*.parquet"))

    before_rows = spark.read.parquet(path).count()
    assert n_files() > 3
    compact_partitions(spark, path)
    assert n_files() == 3  # one file per day
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.groupBy().sum("close").first()[0] == df.groupBy().sum(
        "close"
    ).first()[0]


def test_upsert_rows_replaces_and_inserts(spark, tmp_path):
    from quant_market_data_pipeline_spark.sources.sink import (
        upsert_rows,
        write_partitioned,
    )

    path = str(tmp_path / "lake4")
    t0 = dt.datetime(2024, 5, 1, 13, 30)
    t1 = dt.datetime(2024, 5, 2, 13, 30)
    base = spark.createDataFrame(
        [("MSFT", t0, 1.0), ("AAPL", t0, 2.0), ("MSFT", t1, 3.0)],
        "symbol string, timestamp timestamp, close double",
    )
    write_partitioned(base, path)

    updates = spark.createDataFrame(
        [("MSFT", t0, 99.0), ("TSLA", t0, 42.0)],  # update + insert, day 1
        "symbol string, timestamp timestamp, close double",
    )
    upsert_rows(spark, path, updates, keys=["symbol", "timestamp"])

    out = {
        (r["symbol"], r["timestamp"]): r["close"]
        for r in spark.read.parquet(path).collect()
    }
    assert out == {
        ("MSFT", t0): 99.0,  # replaced
        ("AAPL", t0): 2.0,   # untouched same partition
        ("TSLA", t0): 42.0,  # inserted
        ("MSFT", t1): 3.0,   # untouched other partition
    }


def test_bronze_schema_drift_tolerated(spark, tmp_path):
    """Extra unknown fields are dropped, missing optional fields null —
    PERMISSIVE + explicit schema keeps old readers working."""
    drifted = dict(PAYLOAD)
    drifted["new_api_field"] = {"nested": True}  # unknown extra
    drifted = {k: v for k, v in drifted.items() if k != "feed"}  # missing
    raw_dir = tmp_path / "raw2"
    raw_dir.mkdir()
    (raw_dir / "MSFT_intraday_5min.json").write_text(json.dumps(drifted))

    raw = read_raw_json(spark, str(raw_dir))
    assert corrupt_records(raw).count() == 0
    row = raw.first()
    assert row["feed"] is None  # missing optional -> null
    bars = explode_to_bars(raw)
    assert bars.count() == 1  # same null-gate behavior as the clean doc


def test_csv_bronze_roundtrip(spark, tmp_path):
    from quant_market_data_pipeline_spark.sources.json_bronze import (
        CORRUPT_COL,
        csv_bars_to_silver,
        read_csv_bars,
    )

    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    (csv_dir / "bars.csv").write_text(
        "symbol,timestamp,open,high,low,close,volume\n"
        "MSFT,2024-05-01T13:30:00+00:00,400.1,401.5,399.9,401.0001,12345\n"
        "MSFT,2024-05-01T13:35:00+00:00,401.0,402.0,400.5,,1000\n"  # null close
        "BROKEN,not-a-timestamp,x,y,z,w,NaNv\n"  # malformed row
    )
    raw = read_csv_bars(spark, str(csv_dir))
    assert raw.cache().filter(F.col(CORRUPT_COL).isNotNull()).count() == 1
    silver = csv_bars_to_silver(raw)
    rows = silver.collect()
    assert len(rows) == 1
    assert str(rows[0]["close"]) == "401.0001"
    assert dict(silver.dtypes)["close"] == "decimal(15,4)"


def test_orc_lake_roundtrip(spark, tmp_path):
    """ORC as an alternative columnar lake format: partitioned write +
    predicate-pushdown read parity with the parquet path."""
    path = str(tmp_path / "orc_lake")
    base = dt.datetime(2024, 5, 1, 13, 30)
    df = spark.createDataFrame(
        [("MSFT", base + dt.timedelta(days=i), float(i)) for i in range(4)],
        "symbol string, timestamp timestamp, close double",
    ).withColumn("trading_date", F.to_date("timestamp"))
    df.write.mode("overwrite").partitionBy("trading_date").orc(path)

    back = spark.read.orc(path)
    assert back.count() == 4
    one_day = back.filter(F.col("trading_date") == dt.date(2024, 5, 3))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruning works on ORC too
    assert one_day.count() == 1


def test_read_jdbc_option_wiring(spark):
    """S4 read adapter: argument validation + option wiring up to the JDBC
    layer (no live database in-container: reaching the driver-resolution
    error proves the reader was built and invoked)."""
    import pytest

    from quant_market_data_pipeline_spark.sources.sink import read_jdbc

    with pytest.raises(ValueError, match="not both"):
        read_jdbc(
            spark,
            "jdbc:postgresql://localhost/x",
            "t",
            predicates=["a=1"],
            partition_column="id",
        )
    with pytest.raises(ValueError, match="requires lower_bound"):
        read_jdbc(
            spark,
            "jdbc:postgresql://localhost/x",
            "t",
            partition_column="id",
        )
    # full wiring: fails only at JVM driver/connection resolution
    with pytest.raises(Exception) as ei:
        read_jdbc(
            spark,
            "jdbc:postgresql://localhost:1/__nope__",
            "(SELECT 1 AS x) t",
            predicates=["x = 1", "x = 2"],
        )
    msg = str(ei.value)
    assert "postgresql" in msg.lower() or "driver" in msg.lower() or (
        "connect" in msg.lower()
    )
