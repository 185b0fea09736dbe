"""Cross-engine exact aggregate combinators.

Floating-point SUM/AVG over a shuffled frame is order-dependent: the same
query returns last-ulp-different doubles run to run (and engine to engine),
and ``round(sum(double), 4)`` can flip the 4th decimal when the accumulated
error crosses a rounding boundary (observed at money scale: sums ~1e9 with
4-decimal rounding).  The oracle gate compares value hashes, so results
must be BIT-IDENTICAL between Spark and DuckDB.

The discipline (mirrored in every oracle SQL string):

1. Money/rate columns (doubles that carry <= 2 decimal digits) are cast to
   tight decimals BEFORE arithmetic — the cast is tie-free for such values,
   so both engines produce the same decimal.
2. Sums/products run in decimal: exact rational arithmetic, associative and
   commutative, hence partition-order-insensitive.
3. The final value is rescaled to a fixed scale in DECIMAL space (HALF_UP
   == DuckDB's half-away-from-zero for the positive money domain) and only
   THEN cast to double.  The scaled integer stays < 2^53 at oracle scale,
   so the decimal->double conversion is a single correctly-rounded step in
   both engines.
4. Decimal never reaches the result schema: DuckDB's pandas bridge turns
   DECIMAL (and HUGEINT) into float64 while Spark yields Decimal/int64
   objects — same value, different hash.  Ints are emitted as BIGINT, exact
   reals as DOUBLE.

Precisions are chosen so no Spark product/sum exceeds precision 38 (no
precision-loss rescale): money(12,2) * rate(5,2) -> (18,4); * rate(5,2)
-> (24,6); sum adds 10.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # 2-decimal money double, |x| < 1e10
RATE = "decimal(4,2)"  # 2-decimal rate, |x| <= 99.99 (tax/discount << 1)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: Column | str) -> Column:
    """Tie-free decimal view of a 2-decimal money double."""
    return _col(c).cast(MONEY)


def one_minus(rate: Column | str) -> Column:
    """(1 - rate) as decimal(5,2) — e.g. the TPC-H discount factor."""
    return F.lit(1).cast("decimal(3,2)") - _col(rate).cast(RATE)


def one_plus(rate: Column | str) -> Column:
    """(1 + rate) as decimal(5,2) — e.g. the TPC-H tax factor."""
    return F.lit(1).cast("decimal(3,2)") + _col(rate).cast(RATE)


def fin(c: Column, scale: int = 4) -> Column:
    """Rescale an exact decimal to `scale` and emit as double.

    `scale` MUST be >= the expression's natural decimal scale so the
    rescale is lossless: a lossy down-scale hits rounding ties (exact
    ...5 digits), where Spark rounds HALF_UP but DuckDB half-to-even.
    """
    return c.cast(f"decimal(38,{scale})").cast("double")


def money_sum(expr: Column | str, scale: int = 4) -> Column:
    """Order-insensitive SUM of a money expression, emitted as double."""
    e = money(expr) if isinstance(expr, str) else expr
    return fin(F.sum(e), scale)


def money_avg(expr: Column | str, scale: int = 4) -> Column:
    """Exact-sum / count average, emitted as double.

    Both engines compute the identical decimal sum, rescale, cast to
    double, then perform one double division by the group count — a
    deterministic two-step, unlike accumulate-as-you-go AVG.
    """
    e = money(expr) if isinstance(expr, str) else expr
    return fin(F.sum(e), scale) / F.count(F.lit(1))


# --- DuckDB SQL fragment builders (keep oracles textually in sync) -------


def sql_money(x: str) -> str:
    return f"CAST({x} AS DECIMAL(12,2))"


def sql_one_minus(rate: str) -> str:
    return f"(CAST(1 AS DECIMAL(3,2)) - CAST({rate} AS DECIMAL(4,2)))"


def sql_one_plus(rate: str) -> str:
    return f"(CAST(1 AS DECIMAL(3,2)) + CAST({rate} AS DECIMAL(4,2)))"


def sql_fin(x: str, scale: int = 4) -> str:
    """Exact decimal result emitted as double — via a STRING hop.

    DuckDB's direct wide-DECIMAL -> DOUBLE cast computes
    (hugeint unscaled) / 10^scale in floating point, which is NOT
    correctly rounded once the unscaled value exceeds 2^53 — at
    grown sf1.0 the Q1 sum_charge (unscaled ~3.2e16 at scale 6) came
    back one ulp off Spark's BigDecimal.doubleValue() and failed the
    strict gate; the same decimal sums matched exactly.  Routing the
    conversion through a string uses strtod, which is correctly
    rounded, so both engines emit the nearest double of the identical
    exact decimal at ANY magnitude.  STRING, not VARCHAR: some
    oracle texts double as Spark SQL (GROUPING SETS), and Spark
    rejects bare VARCHAR; both engines accept STRING.
    """
    return f"CAST(CAST(CAST({x} AS DECIMAL(38,{scale})) AS STRING) AS DOUBLE)"


def sql_money_sum(x: str, scale: int = 4) -> str:
    return sql_fin(f"sum({sql_money(x)})", scale)


def sql_money_avg(x: str, scale: int = 4) -> str:
    return f"({sql_fin(f'sum({sql_money(x)})', scale)} / count(*))"
