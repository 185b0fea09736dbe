"""Trailing-window analytics: rolling mean / stddev / count / z-score.

Re-expresses /root/reference/project/transform_data.py:145-154 —

- W1 frame spec ``partitionBy(pair).orderBy(ts).rowsBetween(-(n-1), 0)``
- W2/W3/W4 rolling mean, sample stddev (n-1), count
- W5 z-score ``(spread - mean) / stddev`` null-gated when the window holds
  fewer than ``min_periods`` rows (P10, ``:146,152-153``)

Plus ranking / lag / lead helpers the reference lacks but pair research
needs (SURVEY §2.5 note).

Scale: one shuffle on the partition key, then a sort within partitions; the
rows-frame runs in a single pass.  Partition key cardinality (pair count)
bounds parallelism — for few pairs over deep history, the engine caller can
sub-partition by (pair, month) and stitch, but at reference semantics the
plain window is correct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def trailing_window(
    partition_by: list[str], order_by: list[str], n: int = 60
) -> WindowSpec:
    """N-row trailing frame including the current row (W1)."""
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-(n - 1), 0)
    )


def with_rolling_zscore(
    df: DataFrame,
    value: str = "spread",
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    n: int = 60,
    min_periods: int = 30,
    out: str = "z_score",
    keep_intermediate: bool = False,
) -> DataFrame:
    """Rolling z-score with a min-periods gate (W1-W5 + P10).

    ``stddev`` is the *sample* standard deviation (ddof=1), matching Spark's
    and the reference's ``F.stddev`` (transform_data.py:150); a DuckDB
    oracle must use ``stddev_samp``.  Division is NULLIF-guarded so a
    zero-variance window yields NULL, not an error/inf.
    """
    partition_by = partition_by or ["pair_name"]
    order_by = order_by or ["timestamp"]
    w = trailing_window(partition_by, order_by, n)
    mean_c = F.mean(value).over(w)
    std_c = F.stddev(value).over(w)
    cnt_c = F.count(F.lit(1)).over(w)
    z = (F.col(value) - mean_c) / F.nullif(std_c, F.lit(0.0))
    df = (
        df.withColumn("rolling_mean", mean_c)
        .withColumn("rolling_std", std_c)
        .withColumn("window_size", cnt_c)
        .withColumn(
            out,
            F.when(F.col("window_size") >= min_periods, z).otherwise(F.lit(None)),
        )
    )
    if not keep_intermediate:
        df = df.drop("rolling_mean", "rolling_std")
    return df


def ordered_window(partition_by: list[str], order_by: list[str]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_row_number(
    df: DataFrame, partition_by: list[str], order_by: list[Column | str], out: str = "rn"
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out, F.row_number().over(w))


def with_lag_lead(
    df: DataFrame,
    value: str,
    partition_by: list[str],
    order_by: list[str],
    offset: int = 1,
) -> DataFrame:
    """Previous/next value per key — the bar-to-bar return primitive."""
    w = ordered_window(partition_by, order_by)
    return df.withColumn(f"{value}_lag", F.lag(value, offset).over(w)).withColumn(
        f"{value}_lead", F.lead(value, offset).over(w)
    )
