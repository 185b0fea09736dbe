"""Expected-timestamp grid + anti-join audit (the set-difference oracle).

Re-expresses /root/reference/audit_pipeline.py:168-198 —

- P18 dense grid: ``sequence(session_start, session_end, INTERVAL w)`` +
  ``explode`` (``:168-181``)
- J2  ``crossJoin(broadcast(symbols))`` to expand the grid per symbol
  (``:185-186``)
- J3  left **anti** join (expected - actual) on (symbol, timestamp)
  (``:189-198``) -> exact missing-bar report

Scale: the grid is generated, never materialized at rest — sequence/explode
is pure codegen.  The symbols side is broadcast (small dim).  The anti join
shuffles on the composite key; with actuals bucketed/partitioned by
symbol-date the shuffle prunes to matching partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_grid(
    bounds: DataFrame,
    start: str = "grid_start",
    end: str = "grid_end",
    width: str = "5 minutes",
    out: str = "timestamp",
) -> DataFrame:
    """Explode [start, end] into a dense inclusive timestamp grid per row.

    ``bounds`` is one-or-more rows of (start, end) — e.g. per trading
    session — so a year of sessions generates in parallel, unlike the
    reference's single min/max driver-side pair (audit_pipeline.py:105-114).
    """
    keep = [c for c in bounds.columns if c not in (start, end)]
    return bounds.select(
        *keep,
        F.explode(
            F.sequence(F.col(start), F.col(end), F.expr(f"INTERVAL {width}"))
        ).alias(out),
    )


def expand_per_key(grid: DataFrame, keys: DataFrame) -> DataFrame:
    """Grid x small key dimension via broadcast cross join (J2)."""
    return grid.crossJoin(F.broadcast(keys))


def missing_rows(
    expected: DataFrame, actual: DataFrame, on: list[str]
) -> DataFrame:
    """Expected - actual on the composite key: left anti join (J3)."""
    return expected.join(actual, on, "left_anti")
