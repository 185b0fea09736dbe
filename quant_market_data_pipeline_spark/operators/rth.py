"""Regular-trading-hours filter — exact reference semantics.

Re-expresses /root/reference/project/transform_data.py:72-98 —

- P5 UTC -> America/New_York conversion *only for filtering*; the stored
  canonical timestamp stays UTC (DST-safe, ``:80``)
- P6 dayofweek / hour / minute helper columns (``:82-86``)
- P7 the predicate: weekday ``dow IN (2..6)`` (Spark dayofweek: 1=Sunday)
  AND bar start between 09:30 and 15:55 ET inclusive (``:89-93``) —
  i.e. bars *starting* strictly inside the 09:30-16:00 session, last bar
  starts at 15:55 for 5-min bars
- P8 helper-column drop (``:95-98``)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RTH_TZ = "America/New_York"
WEEKDAYS = [2, 3, 4, 5, 6]  # Mon..Fri in Spark dayofweek (1=Sunday)


def rth_predicate(
    ts_local: Column,
    open_minutes: int = 9 * 60 + 30,
    last_bar_minutes: int = 15 * 60 + 55,
) -> Column:
    """Weekday AND open <= bar-start minute-of-day <= last-bar."""
    minute_of_day = F.hour(ts_local) * 60 + F.minute(ts_local)
    return (
        F.dayofweek(ts_local).isin(WEEKDAYS)
        & (minute_of_day >= open_minutes)
        & (minute_of_day <= last_bar_minutes)
    )


def filter_rth(
    df: DataFrame,
    ts: str = "timestamp",
    tz: str = RTH_TZ,
    open_minutes: int = 9 * 60 + 30,
    last_bar_minutes: int = 15 * 60 + 55,
) -> DataFrame:
    """Keep bars whose *local-exchange-time* start is inside RTH.

    The conversion result is used only inside the predicate — the output
    schema is unchanged and canonical timestamps remain UTC
    (transform_data.py:80 comment: DST-safe).
    """
    local = F.from_utc_timestamp(F.col(ts), tz)
    return df.filter(rth_predicate(local, open_minutes, last_bar_minutes))
