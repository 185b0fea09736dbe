"""DQ operators flag exactly the injected defects (SURVEY §5 test plan):
gaps -> anti-join audit + completeness FAIL; dupes -> dedup; after-hours
rows -> RTH filter; early close -> calendar check annotation."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.dq import (
    calendar_completeness_report,
    completeness_report,
    run_summary,
)
from quant_market_data_pipeline_spark.operators.grid import (
    expand_per_key,
    missing_rows,
    time_grid,
)
from quant_market_data_pipeline_spark.operators.rth import filter_rth


def _bars(spark, gaps=(), symbol="AAA", day="2024-01-08"):
    """78 RTH 5-min bars (13:30..21:25 UTC in January = 09:30..15:55 ET)
    minus the gap indices."""
    start = pd.Timestamp(f"{day} 14:30:00")  # 09:30 ET, EST (UTC-5)
    rows = [
        {"symbol": symbol, "timestamp": start + pd.Timedelta(minutes=5 * i),
         "close": 100.0 + i}
        for i in range(78)
        if i not in gaps
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_antijoin_flags_exactly_injected_gaps(spark):
    gaps = {7, 19, 55}
    bars = _bars(spark, gaps=gaps)
    bounds = bars.agg(
        F.min("timestamp").alias("grid_start"), F.max("timestamp").alias("grid_end")
    )
    grid = time_grid(bounds)
    expected = expand_per_key(grid, bars.select("symbol").distinct())
    missing = missing_rows(expected, bars, ["symbol", "timestamp"]).collect()
    got_idx = {
        int((r["timestamp"] - dt.datetime(2024, 1, 8, 14, 30)).total_seconds() // 300)
        for r in missing
    }
    assert got_idx == gaps


def test_completeness_severity(spark):
    ok = completeness_report(_bars(spark), expected_bars=78).collect()[0]
    assert (ok["status"], ok["missing_bars"]) == ("OK", 0)
    warn = completeness_report(_bars(spark, gaps={1, 2}), expected_bars=78).collect()[0]
    assert (warn["status"], warn["missing_bars"]) == ("WARN", 2)
    fail = completeness_report(_bars(spark, gaps={1, 2, 3}), expected_bars=78).collect()[0]
    assert (fail["status"], fail["missing_bars"]) == ("FAIL", 3)


def test_calendar_report_branches(spark):
    bars = _bars(spark).unionByName(_bars(spark, day="2024-01-09", gaps=set(range(39, 78))))
    # Calendar knows 01-08 (full) and 01-09 as a 13:00 ET early close
    # ((960-570)//5 = 78 vs (780-570)//5 = 42 expected bars).
    calendar = spark.createDataFrame(
        pd.DataFrame(
            [
                {"trading_date": dt.date(2024, 1, 8), "open_minutes": 570,
                 "close_minutes": 960},
                {"trading_date": dt.date(2024, 1, 9), "open_minutes": 570,
                 "close_minutes": 780},
            ]
        )
    )
    rep = {r["trading_date"]: r for r in
           calendar_completeness_report(bars, calendar).collect()}
    assert rep[dt.date(2024, 1, 8)]["status"] == "PASS"
    assert not rep[dt.date(2024, 1, 8)]["early_close"]
    # 39 bars actual vs 42 expected -> missing 3 > tolerance 2 -> FAIL
    assert rep[dt.date(2024, 1, 9)]["status"] == "FAIL"
    assert rep[dt.date(2024, 1, 9)]["early_close"]

    # Day absent from calendar -> NO_CALENDAR branch.
    stray = _bars(spark, day="2024-01-10")
    rep2 = calendar_completeness_report(stray, calendar).collect()
    assert {r["status"] for r in rep2 if r["trading_date"] == dt.date(2024, 1, 10)} == {
        "NO_CALENDAR"
    }

    # Under-count within tolerance stays PASS (no WARN tier in the
    # reference gate), but ANY over-count is TOO_MANY.
    near_full = _bars(spark, gaps={1, 2})  # 76 vs 78 expected, tol 2
    assert calendar_completeness_report(near_full, calendar).collect()[0][
        "status"
    ] == "PASS"
    leaked = _bars(spark, day="2024-01-09")  # 78 bars vs 42 expected
    rep3 = {r["trading_date"]: r for r in
            calendar_completeness_report(leaked, calendar).collect()}
    assert rep3[dt.date(2024, 1, 9)]["status"] == "TOO_MANY"


def test_run_summary_calendar_grades(spark):
    """TOO_MANY counts as fail-grade, NO_CALENDAR as warn-grade, and
    run_summary tolerates reports without a missing_bars column."""
    calendar = spark.createDataFrame(
        pd.DataFrame(
            [{"trading_date": dt.date(2024, 1, 9), "open_minutes": 570,
              "close_minutes": 780}]
        )
    )
    rep = calendar_completeness_report(
        _bars(spark, day="2024-01-09")  # 78 vs 42 -> TOO_MANY
        .unionByName(_bars(spark, day="2024-01-10", symbol="BBB")),  # stray
        calendar,
    )
    s = run_summary(rep).collect()[0]
    assert (s["n_checks"], s["n_ok"], s["n_warn"], s["n_fail"]) == (2, 0, 1, 1)
    assert s["run_status"] == "FAIL"
    assert s["max_missing"] is None


def test_run_summary_tallies(spark):
    rep = completeness_report(
        _bars(spark).unionByName(_bars(spark, gaps={1, 2}, symbol="BBB")),
        expected_bars=78,
    )
    s = run_summary(rep).collect()[0]
    assert (s["n_checks"], s["n_ok"], s["n_warn"], s["n_fail"]) == (2, 1, 1, 0)
    assert s["max_missing"] == 2


def test_rth_filter_dst_safety(spark):
    """Same UTC wall hour is RTH in winter and after-hours in summer."""
    rows = pd.DataFrame(
        [
            # 14:30 UTC on an EST Monday = 09:30 ET -> kept
            {"symbol": "A", "timestamp": pd.Timestamp("2024-01-08 14:30:00")},
            # 14:30 UTC on an EDT Monday = 10:30 ET -> kept (inside RTH)
            {"symbol": "A", "timestamp": pd.Timestamp("2024-07-08 14:30:00")},
            # 13:30 UTC EDT Monday = 09:30 ET -> kept
            {"symbol": "A", "timestamp": pd.Timestamp("2024-07-08 13:30:00")},
            # 13:30 UTC EST Monday = 08:30 ET -> dropped (pre-market)
            {"symbol": "A", "timestamp": pd.Timestamp("2024-01-08 13:30:00")},
            # Saturday -> dropped
            {"symbol": "A", "timestamp": pd.Timestamp("2024-01-06 15:00:00")},
            # 20:55 UTC EST = 15:55 ET -> kept (last bar)
            {"symbol": "A", "timestamp": pd.Timestamp("2024-01-08 20:55:00")},
            # 21:00 UTC EST = 16:00 ET -> dropped (close)
            {"symbol": "A", "timestamp": pd.Timestamp("2024-01-08 21:00:00")},
        ]
    )
    kept = filter_rth(spark.createDataFrame(rows)).collect()
    got = sorted(str(r["timestamp"]) for r in kept)
    assert got == [
        "2024-01-08 14:30:00",
        "2024-01-08 20:55:00",
        "2024-07-08 13:30:00",
        "2024-07-08 14:30:00",
    ]


def test_write_with_observation_zero_extra_pass_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from quant_market_data_pipeline_spark.operators.dq import (
        write_with_observation,
    )
    from quant_market_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "value"
    )
    got = write_with_observation(
        ev,
        str(tmp_path / "lake"),
        metrics={
            "n_rows": F.count(F.lit(1)),
            "n_null_value": F.count_if(F.col("value").isNull()),
            "min_ts": F.min("ts"),
            "max_ts": F.max("ts"),
        },
        ts_col="ts",
    )
    # metrics observed during the write match an independent aggregation
    direct = ev.agg(
        F.count(F.lit(1)),
        F.count_if(F.col("value").isNull()),
        F.min("ts"),
        F.max("ts"),
    ).first()
    assert got["n_rows"] == direct[0]
    assert got["n_null_value"] == direct[1]
    assert got["min_ts"] == direct[2] and got["max_ts"] == direct[3]
    # and the written lake is complete
    assert spark.read.parquet(str(tmp_path / "lake")).count() == got["n_rows"]
