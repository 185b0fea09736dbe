"""Serving edge: the interactive-explorer query surface.

Replaces the reference's SQL-string serving layer
(``/root/reference/app.py:24-61``: cached DISTINCT symbol list,
parameterized symbol + time-range query, ORDER BY, last-200 preview, and
the pandas ET display conversion at ``:55-59``) with the same DataFrame
operators.  Predicates are plain column filters, so against a
date-partitioned lake table they prune partitions before any IO — the
pushdown ``app.py`` performed by hand-building SQL.

pandas appears ONLY at the very edge (``to_display_pandas``): the
timezone conversion is a DISPLAY concern; canonical data stays naive UTC
(SURVEY §1.2).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symbol_list(df: DataFrame, symbol: str = "symbol") -> list[str]:
    """Distinct sorted symbols (app.py:24-29)."""
    return [r[0] for r in df.select(symbol).distinct().orderBy(symbol).collect()]


def range_query(
    df: DataFrame,
    symbol_value: str,
    start: dt.datetime | None = None,
    end: dt.datetime | None = None,
    symbol: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Equality + optional inclusive time-range predicate, time-ordered
    (app.py:31-47 — P15/P16/O2)."""
    out = df.filter(F.col(symbol) == symbol_value)
    if start is not None:
        out = out.filter(F.col(ts) >= F.lit(start))
    if end is not None:
        out = out.filter(F.col(ts) <= F.lit(end))
    return out.orderBy(ts)


def tail_preview(df: DataFrame, n: int = 200, ts: str = "timestamp") -> DataFrame:
    """Last ``n`` rows by time, re-sorted ascending (app.py:166 — O3)."""
    return df.orderBy(F.col(ts).desc()).limit(n).orderBy(ts)


def to_display_pandas(
    df: DataFrame, ts: str = "timestamp", tz: str = "America/New_York"
) -> pd.DataFrame:
    """Edge conversion for plotting: UTC -> exchange tz, tz-naive for the
    chart library (app.py:55-59 — P20).  The ONLY place pandas tz
    handling exists; storage stays naive UTC."""
    pdf = df.toPandas()
    if len(pdf):
        pdf[ts] = (
            pdf[ts].dt.tz_localize("UTC").dt.tz_convert(tz).dt.tz_localize(None)
        )
    return pdf
