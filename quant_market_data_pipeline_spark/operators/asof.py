"""As-of join — tolerance-based temporal alignment (engine extension).

The reference's pair alignment is the degenerate as-of join (exact 5-min
grid equality, SURVEY §2.3).  A real market-data engine needs the general
form: for each left row, the most recent right row at-or-before its
timestamp (optionally within a tolerance), per key.

Spark has no built-in as-of join.  A naive implementation — range
theta-join + row_number — explodes to O(|L| * window) pairs.  The engine
uses the union + last(ignorenulls) trick instead (SURVEY §4): tag both
sides, union, sort within key partitions once, and carry the last seen
right-side values forward onto left rows.  Cost: ONE shuffle on the key —
identical asymptotics to a regular sort-merge join, no pair explosion,
no skew amplification.  This is the classic scalable formulation (cf.
Flink's event-time join and pandas.merge_asof semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row: the nearest right row per ``on`` key, as a left
    join (no match -> NULLs).

    ``direction`` (pandas ``merge_asof`` semantics, inclusive):
    - ``backward``: latest right with ``right.ts <= left.ts`` (DuckDB
      ``ASOF JOIN ... ON r.ts <= l.ts``);
    - ``forward``: earliest right with ``right.ts >= left.ts`` — same
      plan traversed in descending order (the extra cost is one local
      re-sort, not a new shuffle);
    - ``nearest``: whichever of the two is closer in absolute time
      (backward wins exact ties).  Both candidate matches come from the
      SAME keyed exchange — the physical plan is one shuffle feeding two
      window sorts (asc + desc), so nearest costs one extra local sort,
      not a second join.

    All right-side payload columns come from ONE matched right row (they
    are carried as a single struct, exactly pandas ``merge_asof``
    semantics): if the matched row holds a NULL payload value, the result
    holds that NULL — never a value scavenged from an older row.  When two
    right rows share a timestamp, the tie breaks deterministically on the
    payload struct ordering (greatest payload wins in either direction).

    ``tolerance_seconds``: matches farther than the tolerance are nulled.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]

    lhs = left.withColumn("__side", F.lit(1))
    rhs = right.select(
        F.col(on),
        F.col(ts),
        *[F.col(c) for c in right_cols],
    ).withColumn("__side", F.lit(0))

    # Align schemas for the union: left keeps its payload, right-side value
    # columns become nullable carriers on both sides.
    for c in right_cols:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs_aligned = rhs.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, ts)],
        F.col(on),
        F.col(ts),
        F.col("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    lhs_aligned = lhs.select(
        *[F.col(c) for c in left.columns if c not in (on, ts)],
        F.col(on),
        F.col(ts),
        F.col("__side"),
        *[F.col(f"__r_{c}") for c in right_cols],
    )

    unioned = lhs_aligned.unionByName(rhs_aligned)

    # The whole right row rides as ONE struct so matched_ts and every
    # payload value stay row-consistent (per-column last(ignorenulls)
    # would scavenge non-null values from OLDER right rows whenever the
    # matched row holds a NULL — and let stale values leak through the
    # tolerance gate).
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col(ts).alias("__matched_ts"),
            *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        ),
    )
    unioned = unioned.withColumn("__r_payload", payload)

    # Right rows sort before left rows at equal ts (__side 0 < 1), so an
    # exact-timestamp right row IS visible to the left row — inclusive
    # semantics in both directions.  Forward = the same scan descending.
    # The payload struct is the deterministic tiebreak between right rows
    # sharing a timestamp (its first field is ts, so the tie breaks on
    # the payload values themselves; the greatest struct wins).
    order_asc = [F.col(ts).asc(), F.col("__side").asc(), F.col("__r_payload").asc()]
    order_desc = [F.col(ts).desc(), F.col("__side").asc(), F.col("__r_payload").asc()]

    def _running_match(order):
        w = (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__r_payload", ignorenulls=True).over(w)

    if direction == "nearest":
        # Two running matches over ONE keyed exchange (same partitionBy,
        # different orderBy -> Catalyst plans one shuffle + two sorts),
        # then pick the closer candidate per row; backward wins ties.
        with_both = unioned.withColumn(
            "__mb", _running_match(order_asc)
        ).withColumn("__mf", _running_match(order_desc))
        gap_b = F.unix_micros(F.col(ts)) - F.unix_micros(
            F.col("__mb")["__matched_ts"]
        )
        gap_f = F.unix_micros(F.col("__mf")["__matched_ts"]) - F.unix_micros(
            F.col(ts)
        )
        chosen = (
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(gap_f < gap_b, F.col("__mf"))
            .otherwise(F.col("__mb"))
        )
        out = (
            with_both.withColumn("__m", chosen)
            .filter(F.col("__side") == 1)
            .select(
                "*",
                *[F.col("__m")[c].alias(f"{c}{suffix}") for c in right_cols],
                F.col("__m")["__matched_ts"].alias(f"{ts}{suffix}"),
            )
            .drop("__mb", "__mf")
        )
        if tolerance_seconds is not None:
            gap_us = F.abs(
                F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{ts}{suffix}"))
            )
            in_tol = F.col(f"{ts}{suffix}").isNotNull() & (
                gap_us <= tolerance_seconds * 1_000_000
            )
            for c in right_cols:
                out = out.withColumn(
                    f"{c}{suffix}", F.when(in_tol, F.col(f"{c}{suffix}"))
                )
            out = out.withColumn(
                f"{ts}{suffix}", F.when(in_tol, F.col(f"{ts}{suffix}"))
            )
        return out.drop(
            "__side", "__m", "__r_payload", *[f"__r_{c}" for c in right_cols]
        )

    matched = _running_match(
        order_asc if direction == "backward" else order_desc
    )

    out = (
        unioned.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(
            "*",
            *[F.col("__m")[c].alias(f"{c}{suffix}") for c in right_cols],
            F.col("__m")["__matched_ts"].alias(f"{ts}{suffix}"),
        )
    )

    if tolerance_seconds is not None:
        # Microsecond-precision gap, matching the nearest branch exactly:
        # unix_timestamp() truncates to seconds, which would KEEP a match
        # whose true gap is tolerance + 0.5s (e.g. 1800.5s vs 1800).
        gap = F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{ts}{suffix}"))
        if direction == "forward":
            gap = -gap
        in_tol = F.col(f"{ts}{suffix}").isNotNull() & (
            gap <= tolerance_seconds * 1_000_000
        )
        for c in right_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.when(in_tol, F.col(f"{c}{suffix}"))
            )
        out = out.withColumn(f"{ts}{suffix}", F.when(in_tol, F.col(f"{ts}{suffix}")))

    return out.drop("__side", "__m", "__r_payload", *[f"__r_{c}" for c in right_cols])
