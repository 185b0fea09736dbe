"""Pair alignment: the stat-arb spine of the reference.

Re-expresses /root/reference/project/transform_data.py:101-180 —

- J1  pair alignment inner equi-join on exact timestamp (``:121-141``)
- P9  log-spread ``ln(close1) - ln(close2)`` (``:139``)
- P11 leg projection with sign-flipped spread/z-score for leg 2
      (``:156-178``)
- U1  ``unionByName`` stacking the two legs (``:180``) and folding many
      pairs into one frame (``:187-192``)

Scale notes: the alignment join shuffles both sides on ``ts`` only if
neither is broadcastable; for same-source pairs the engine filters one
cached, pre-partitioned frame twice so the two legs share a scan.  The
join key (ts) is unskewed by construction (one row per (symbol, ts)).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_pair(
    left: DataFrame,
    right: DataFrame,
    ts: str = "timestamp",
    value: str = "close",
    suffixes: tuple[str, str] = ("1", "2"),
) -> DataFrame:
    """Inner-join two single-symbol frames on exact timestamp equality.

    Mirrors transform_data.py:121-141: the inner join implicitly intersects
    the two time axes (bars present for both legs only).  Non-ts columns are
    suffixed.  Returns one row per shared timestamp.
    """
    s1, s2 = suffixes
    lcols = [F.col(f"l.{c}").alias(f"{c}{s1}") for c in left.columns if c != ts]
    rcols = [F.col(f"r.{c}").alias(f"{c}{s2}") for c in right.columns if c != ts]
    return (
        left.alias("l")
        .join(right.alias("r"), F.col(f"l.{ts}") == F.col(f"r.{ts}"), "inner")
        .select(F.col(f"l.{ts}").alias(ts), *lcols, *rcols)
    )


def with_log_spread(
    aligned: DataFrame,
    value1: str = "close1",
    value2: str = "close2",
    out: str = "spread",
) -> DataFrame:
    """``spread = ln(v1) - ln(v2)`` (natural log, transform_data.py:139)."""
    return aligned.withColumn(out, F.log(F.col(value1)) - F.log(F.col(value2)))


def project_legs(
    pair: DataFrame,
    symbol1: str,
    symbol2: str,
    ts: str = "timestamp",
    spread: str = "spread",
    z_score: str = "z_score",
    leg_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Stack the pair frame into long format: one row per (symbol, ts).

    Leg 2 gets ``spread * -1`` and ``z_score * -1``
    (transform_data.py:176-177); ``leg_cols`` are per-leg columns whose
    ``{col}1`` / ``{col}2`` variants map to the same output name
    (transform_data.py:156-175).
    """

    def leg(sym: str, sfx: str, sign: int) -> DataFrame:
        cols = [F.lit(sym).alias("symbol"), F.col(ts).alias(ts)]
        cols += [F.col(f"{c}{sfx}").alias(c) for c in leg_cols]
        cols += [
            (F.col(spread) * sign).alias(spread),
            (F.col(z_score) * sign).alias(z_score),
        ]
        return pair.select(*cols)

    return leg(symbol1, "1", 1).unionByName(leg(symbol2, "2", -1))


def fold_pairs(frames: list[DataFrame]) -> DataFrame:
    """Union all pair frames into one table (transform_data.py:187-192)."""
    return reduce(DataFrame.unionByName, frames)
