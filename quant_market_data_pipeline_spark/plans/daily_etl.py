"""The reference's daily ETL run (E1), end-to-end on engine operators.

Reproduces ``/root/reference/project/transform_data.py:183-212`` (the
Airflow ``transform`` task) as one composable function: bronze JSON scan
-> clean/cast (P1-P4) -> RTH filter (P5-P8) -> pair align + log-spread
(J1, P9) -> rolling z-score with min-periods gate (W1-W5, P10) -> leg
projection with sign flip (P11, U1) -> idempotent partitioned lake write
(replacing the destructive JDBC overwrite at ``:199-209``), then the DQ
gate (``validate_data.py`` semantics) computed from the SAME frame —
exit-code contract included.

Differences from the reference, by design:
- one plan end-to-end (no per-pair driver loop, no repeated uncached
  ``count()`` actions — SURVEY §4 anti-patterns);
- the write is per-partition idempotent, so re-running a day is safe;
- the DQ gate runs as DataFrame aggregation, not psycopg2 row loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.dq import (
    completeness_report,
    run_summary,
)
from quant_market_data_pipeline_spark.operators.pair import (
    align_pair,
    fold_pairs,
    project_legs,
    with_log_spread,
)
from quant_market_data_pipeline_spark.operators.rolling import (
    with_rolling_zscore,
)
from quant_market_data_pipeline_spark.operators.rth import filter_rth
from quant_market_data_pipeline_spark.sources.json_bronze import (
    explode_to_bars,
    read_raw_json,
)
from quant_market_data_pipeline_spark.sources.sink import write_partitioned


def run_daily_etl(
    spark: SparkSession,
    raw_dir: str,
    out_path: str,
    pairs: list[tuple[str, str]],
    expected_bars: int = 78,
    tolerance: int = 2,
    rth: bool = True,
) -> dict:
    """Execute the full daily pipeline; returns the DQ summary row as a
    dict plus the gate verdict (``ok`` False == the reference's exit 1).
    """
    raw = read_raw_json(spark, raw_dir)
    bars = explode_to_bars(raw)
    if rth:
        bars = filter_rth(bars, ts="timestamp")

    def leg_frame(sym: str) -> DataFrame:
        return bars.filter(F.col("symbol") == sym).select(
            "timestamp", F.col("close").cast("double").alias("close")
        )

    frames: list[DataFrame] = []
    for s1, s2 in pairs:
        aligned = align_pair(leg_frame(s1), leg_frame(s2), ts="timestamp")
        spread = with_log_spread(aligned).withColumn(
            "pair_name", F.lit(f"{s1}_{s2}")
        )
        scored = with_rolling_zscore(
            spread, partition_by=["pair_name"], order_by=["timestamp"]
        )
        frames.append(project_legs(scored, s1, s2, leg_cols=("close",)))
    result = fold_pairs(frames)

    # Guard then idempotent write (transform_data.py:194-209, minus the
    # constraint-dropping full overwrite).
    if result.isEmpty():
        return {"ok": False, "reason": "empty result", "rows": 0}
    write_partitioned(result, out_path, ts_col="timestamp")

    report = completeness_report(
        result, expected_bars=expected_bars, tolerance=tolerance
    )
    summary = run_summary(report).first().asDict()
    summary["ok"] = summary["run_status"] != "FAIL"
    summary["rows"] = result.count()
    return summary
