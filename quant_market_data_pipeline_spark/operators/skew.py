"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled by the session factory) handles most
runtime skew in sort-merge joins.  Two cases still need explicit salting
at 100 TB, both provided here:

- ``salted_aggregate``: a single hot group key (one symbol = 40% of
  ticks) serializes the final aggregation.  Two-phase: hash-partial over
  (key, salt), then merge the partials over (key) — the classic
  combine-hierarchy trick; correct for any algebraic aggregate given its
  merge expressions.
- ``salted_join``: a shuffle join where ONE side's key distribution is
  heavily skewed and the other side is too big to broadcast.  The skewed
  side gets a random salt in [0, n); the other side is replicated n ways
  (explode over the salt range); the join key becomes (key, salt).
  Row-level result identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, n: int, deterministic_col: str | None = None) -> DataFrame:
    """Add a salt column in [0, n).  ``deterministic_col``: derive the salt
    from a hash of that column (reproducible runs, e.g. for tests) instead
    of per-row randomness."""
    if deterministic_col is not None:
        salt = F.pmod(F.hash(deterministic_col), F.lit(n))
    else:
        salt = (F.rand() * n).cast("int")
    return df.withColumn(SALT, salt)


def replicate_for_salt(df: DataFrame, n: int) -> DataFrame:
    """Explode the other join side across every salt value."""
    return df.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    deterministic_col: str | None = None,
) -> DataFrame:
    """Equi-join with the skewed side salted n ways.

    ``other`` grows n_salts-fold (keep it the smaller side); each salted
    partition holds ~1/n of the hot key's rows, so the hot key's work
    spreads over n tasks instead of one straggler.
    """
    s = with_salt(skewed, n_salts, deterministic_col)
    o = replicate_for_salt(other, n_salts)
    return s.join(o, on + [SALT], how).drop(SALT)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation over salted keys for hot-key groupBys.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1, keyed
    by keys+salt).  ``merge_aggs``: name -> aggregate over the phase-1
    partials (phase 2, keyed by keys), referencing phase-1 names.
    E.g. sum: partial ``sum(x) as s`` then merge ``sum(s) as s``;
    count: partial count -> merge sum; avg: carry (sum, count) partials.
    """
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(*keys, SALT)
        .agg(*[c.alias(name) for name, c in partial_aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )
