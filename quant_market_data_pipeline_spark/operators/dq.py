"""Data-quality operators: completeness, severity, calendar check.

The reference runs these as driver-side psycopg2 loops
(/root/reference/project/validate_data.py:138-216,
/root/reference/validate_calendar_alpaca.py:188-253).  The engine
re-expresses them as pure DataFrame aggregations (SURVEY §2.4 A1-A6, §2.3
J4) so they distribute:

- A1 per-(symbol, trading day) bar counts
- A2 global/grouped min-max
- A5 conditional aggregation (ok/warn/fail tallies, max-missing)
- A6 severity classification: missing==0 -> OK, <=tolerance -> WARN,
  else FAIL (validate_data.py:174-185); the calendar variant also flags
  *too many* bars = extended-hours leakage
  (validate_calendar_alpaca.py:226-233)
- J4 broadcast left join against the calendar dimension, null -> WARN
  branch for days absent from the calendar
  (validate_calendar_alpaca.py:208-218)

Expected bars standardizes on the calendar formula
``(close - open) // bar_minutes`` (validate_calendar_alpaca.py:49-55); the
divergent dynamic formula at validate_data.py:122-124 is intentionally NOT
replicated (SURVEY §7 hard part d).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def per_day_counts(
    df: DataFrame, key: str = "symbol", ts: str = "timestamp"
) -> DataFrame:
    """A1: bar count per (key, trading_date)."""
    return df.groupBy(
        F.col(key), F.to_date(F.col(ts)).alias("trading_date")
    ).agg(F.count(F.lit(1)).alias("bar_count"))


def severity(
    missing: Column, tolerance: int = 2, ok: str = "OK", warn: str = "WARN", fail: str = "FAIL"
) -> Column:
    """A6 classification chain (validate_data.py:174-185)."""
    return (
        F.when(missing <= 0, F.lit(ok))
        .when(missing <= tolerance, F.lit(warn))
        .otherwise(F.lit(fail))
    )


def completeness_report(
    df: DataFrame,
    expected_bars: int,
    key: str = "symbol",
    ts: str = "timestamp",
    tolerance: int = 2,
) -> DataFrame:
    """Fixed-expectation completeness: counts + severity per (key, day).

    ``missing_bars`` floors at 0 via GREATEST (P17, validate_data.py:153).
    """
    counts = per_day_counts(df, key, ts)
    missing = F.greatest(F.lit(0), F.lit(expected_bars) - F.col("bar_count"))
    return counts.select(
        F.col(key),
        "trading_date",
        "bar_count",
        F.lit(expected_bars).alias("expected_bars"),
        missing.alias("missing_bars"),
        severity(missing, tolerance).alias("status"),
    )


def calendar_completeness_report(
    df: DataFrame,
    calendar: DataFrame,
    key: str = "symbol",
    ts: str = "timestamp",
    tolerance: int = 2,
    bar_minutes: int = 5,
) -> DataFrame:
    """Calendar-aware completeness (validate_calendar_alpaca.py:188-245).

    ``calendar`` columns: trading_date DATE, open_minutes INT, close_minutes
    INT (minute-of-day).  Expected = (close-open) // bar_minutes.  Days
    absent from the calendar -> status NO_CALENDAR (WARN branch ``:208-218``);
    ANY over-count -> TOO_MANY (extended-hours leakage fails the reference
    gate, ``:230-233``); under-counts within tolerance stay PASS (the
    reference has no WARN tier for in-calendar days); early closes
    annotated when the session is shorter than 390 minutes (``:236-237``).
    """
    counts = per_day_counts(df, key, ts)
    cal = calendar.withColumn(
        "expected_bars",
        ((F.col("close_minutes") - F.col("open_minutes")) / bar_minutes).cast("int"),
    ).withColumn(
        "early_close", (F.col("close_minutes") - F.col("open_minutes")) < 390
    )
    joined = counts.join(F.broadcast(cal), "trading_date", "left")
    missing = F.col("expected_bars") - F.col("bar_count")
    # Exactly the reference gate (validate_calendar_alpaca.py:224-233):
    # under-counts within tolerance stay PASS (there is no WARN tier for
    # in-calendar days), but ANY over-count is extended-hours leakage and
    # fail-grade (TOO_MANY); days the calendar doesn't know are warn-grade.
    status = (
        F.when(F.col("expected_bars").isNull(), F.lit("NO_CALENDAR"))
        .when(missing > tolerance, F.lit("FAIL"))
        .when(F.col("bar_count") > F.col("expected_bars"), F.lit("TOO_MANY"))
        .otherwise(F.lit("PASS"))
    )
    return joined.select(
        F.col(key),
        "trading_date",
        "bar_count",
        "expected_bars",
        status.alias("status"),
        F.coalesce(F.col("early_close"), F.lit(False)).alias("early_close"),
    )


def run_summary(report: DataFrame, status: str = "status") -> DataFrame:
    """A5: one-row conditional-aggregation summary of a report frame.

    Replaces the reference's driver-side fold over fetched rows
    (validate_data.py:163-200) with ``sum(when(...))`` — map-side partial
    aggregation, no data to the driver until the single result row.
    """
    s = F.col(status)
    # Every status an engine report can emit lands in a tally: TOO_MANY is
    # fail-grade (reference treats over-counts as FAIL), NO_CALENDAR is
    # warn-grade (reference's not-in-calendar WARN) — nothing inflates
    # n_checks without degrading the badge.
    aggs = [
        F.count(F.lit(1)).alias("n_checks"),
        F.sum(F.when(s.isin("OK", "PASS"), 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(s.isin("WARN", "NO_CALENDAR"), 1).otherwise(0)).alias(
            "n_warn"
        ),
        F.sum(F.when(s.isin("FAIL", "TOO_MANY"), 1).otherwise(0)).alias(
            "n_fail"
        ),
    ]
    # Calendar reports carry no missing_bars column; stay tolerant.
    if "missing_bars" in report.columns:
        aggs.append(F.max("missing_bars").alias("max_missing"))
    else:
        aggs.append(F.lit(None).cast("long").alias("max_missing"))
    agg = report.agg(*aggs)
    # The badge the reference prints + exit-codes on (validate_data.py:
    # 218-227): any FAIL fails the run; else any WARN degrades it.
    return agg.withColumn(
        "run_status",
        F.when(F.col("n_fail") > 0, "FAIL")
        .when(F.col("n_warn") > 0, "WARN")
        .otherwise("OK"),
    )


def write_with_observation(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    partition_col: str = "trading_date",
    ts_col: str | None = "timestamp",
) -> dict:
    """Partitioned write with free DQ metrics via ``Observation``.

    The reference audits loads by re-running count() actions over the
    same frame (``/root/reference/project/transform_data.py:50,68,118,194``
    — four extra scans per run; SURVEY §7f flags it as the quirk not to
    replicate).  ``df.observe`` is the Spark-native fix: metric
    expressions are accumulated BY the write job itself, so row counts /
    null tallies / min-max bounds cost zero additional passes — at 100 TB
    the difference between auditing a load and re-running it.

    Returns the observed metric dict after the write action completes.
    """
    from pyspark.sql import Observation

    obs = Observation("dq_write")
    observed = df.observe(
        obs, *[c.alias(name) for name, c in metrics.items()]
    )
    from quant_market_data_pipeline_spark.sources.sink import (
        write_partitioned,
    )

    write_partitioned(
        observed, path, partition_col=partition_col, ts_col=ts_col
    )
    return obs.get
