"""E1 daily ETL end-to-end: raw JSON docs -> lake + DQ verdict."""

from __future__ import annotations

import datetime as dt
import json
import math

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.plans.daily_etl import run_daily_etl

UTC = dt.timezone.utc


def _payload(symbol: str, base_price: float, skip: set[int]) -> dict:
    """Two trading days (2024-05-01/02, Wed+Thu) of 5-min RTH bars in UTC
    (ET+4 in May): 13:30..19:25 UTC = 09:30..15:25 ET -> 72 bars/day."""
    bars = []
    for day in (1, 2):
        start = dt.datetime(2024, 5, day, 13, 30, tzinfo=UTC)
        for i in range(72):
            if (day, i) in [(d, s) for d in (1, 2) for s in skip]:
                continue
            ts = start + dt.timedelta(minutes=5 * i)
            px = base_price + 0.1 * i + day
            bars.append(
                {
                    "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%S+00:00"),
                    "open": px,
                    "high": px + 0.5,
                    "low": px - 0.5,
                    "close": px,
                    "volume": 100 + i,
                }
            )
    return {
        "symbol": symbol,
        "timeframe": "5Min",
        "source": "synthetic",
        "feed": "test",
        "start_utc": "2024-05-01T00:00:00+00:00",
        "end_utc": "2024-05-03T00:00:00+00:00",
        "bars": bars,
    }


def test_daily_etl_end_to_end(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    # leg B misses one bar on each day -> 71 bars -> WARN at tolerance 2
    (raw / "AAA_intraday_5min.json").write_text(
        json.dumps(_payload("AAA", 100.0, skip=set()))
    )
    (raw / "BBB_intraday_5min.json").write_text(
        json.dumps(_payload("BBB", 50.0, skip={10}))
    )

    out = str(tmp_path / "lake")
    summary = run_daily_etl(
        spark,
        str(raw),
        out,
        pairs=[("AAA", "BBB")],
        expected_bars=72,
        tolerance=2,
    )

    assert summary["ok"] is True
    assert summary["run_status"] == "WARN"  # the missing bars, tolerated
    # inner pair alignment drops the bar missing on leg B: 71/day, 2 legs
    assert summary["rows"] == 2 * 2 * 71
    assert summary["n_checks"] == 4  # 2 symbols x 2 days
    assert summary["n_warn"] == 4  # 71 < 72 on every (symbol, day)
    assert summary["max_missing"] == 1

    lake = spark.read.parquet(out)
    assert set(
        r["trading_date"].isoformat() for r in lake.select("trading_date").distinct().collect()
    ) == {"2024-05-01", "2024-05-02"}

    # z-score spot check: constant log-spread drift -> finite z after warmup
    row = (
        lake.filter(
            (F.col("symbol") == "AAA")
            & (F.col("timestamp") == dt.datetime(2024, 5, 1, 18, 30))
        )
        .select("spread", "z_score")
        .first()
    )
    i = (18 * 60 + 30 - (13 * 60 + 30)) // 5  # bar index 60
    want_spread = math.log(100.0 + 0.1 * i + 1) - math.log(50.0 + 0.1 * i + 1)
    assert abs(row["spread"] - want_spread) < 1e-9
    assert row["z_score"] is not None

    # idempotence: re-run overwrites the same partitions, no duplication
    n_before = lake.count()
    summary2 = run_daily_etl(
        spark, str(raw), out, pairs=[("AAA", "BBB")],
        expected_bars=72, tolerance=2,
    )
    assert summary2["rows"] == summary["rows"]
    assert spark.read.parquet(out).count() == n_before


def test_fake_fetcher_lands_bronze_contract(spark, tmp_path):
    """S1 seam: the landing adapter writes documents the bronze scan reads
    cleanly (no corrupt records), idempotently (re-land replaces)."""
    from quant_market_data_pipeline_spark.sources.ingest import (
        FakeBarsFetcher,
    )
    from quant_market_data_pipeline_spark.sources.json_bronze import (
        CORRUPT_COL,
        explode_to_bars,
        read_raw_json,
    )

    landing = str(tmp_path / "landing")
    fetcher = FakeBarsFetcher(bars_per_day=78)
    days = [dt.date(2024, 1, 8)]
    paths = fetcher.land(landing, ["AAA", "BBB"], days)
    assert len(paths) == 2
    paths2 = fetcher.land(landing, ["AAA", "BBB"], days)  # idempotent
    assert sorted(paths) == sorted(paths2)

    raw = read_raw_json(spark, landing).cache()
    try:
        assert raw.filter(F.col(CORRUPT_COL).isNotNull()).count() == 0
        bars = explode_to_bars(raw)
        assert bars.count() == 2 * 78
        assert {
            r["symbol"] for r in bars.select("symbol").distinct().collect()
        } == {"AAA", "BBB"}
    finally:
        raw.unpersist()


def test_daily_etl_cli_exit_code_contract(spark, tmp_path, capsys):
    """E1 orchestration contract: the CLI prints one JSON summary line and
    exits 0 on a passing run (what an external scheduler gates on)."""
    from quant_market_data_pipeline_spark.plans.daily_etl import (
        exit_code,
        main,
    )
    from quant_market_data_pipeline_spark.sources.ingest import (
        FakeBarsFetcher,
    )

    landing = str(tmp_path / "landing")
    FakeBarsFetcher(bars_per_day=78).land(
        landing, ["AAA", "BBB"], [dt.date(2024, 1, 8)]
    )
    rc = main(
        [
            landing,
            str(tmp_path / "lake"),
            "--pairs",
            "AAA:BBB",
            "--expected-bars",
            "78",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert rc == 0
    assert summary["run_status"] in ("OK", "WARN")
    # gate semantics: FAIL -> 1, WARN degrades but proceeds
    assert exit_code({"ok": False}) == 1
    assert exit_code({"ok": True}) == 0
