"""Operator library — the reference's operator surface, generalized.

Each module re-expresses one family from SURVEY.md §2 as composable
DataFrame transformations (no driver loops, no UDFs):

- ``clean``    — explode / typed projection / timestamp parse / null-drop /
                 dedup (P1-P4, dedup contract from schema.py:42)
- ``rth``      — regular-trading-hours filter (P5-P8)
- ``bars``     — tick -> OHLCV bar builder (generalizes the fixed 5-min grid)
- ``pair``     — pair alignment join, log-spread, leg projection (J1, P9-P11, U1)
- ``rolling``  — trailing-window analytics incl. z-score (W1-W5) + ranking/lag
- ``grid``     — expected-timestamp grid, cross join, anti-join audit (P18, J2, J3)
- ``dq``       — completeness counts, severity classification, calendar check
                 (A1-A6, J4)
- ``asof``     — tolerance-based as-of join (engine extension, SURVEY §2.3)
"""
