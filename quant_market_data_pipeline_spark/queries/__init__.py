"""Query registry: named queries with DuckDB oracle twins.

Every operator family from SURVEY.md §2 (and the LLM-data extensions) is
exposed as a named query: a callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent ANSI-SQL string the DuckDB oracle runs
on the same parquet tables.  ``__spark_entry__.py`` re-exports this
registry to the correctness driver.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates that are sensitive to summation order are rounded to
  a fixed precision on BOTH sides (the comparison is on rounded values);
- timestamps are naive UTC on both sides (session tz pinned to UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: fills REGISTRY)."""
    from quant_market_data_pipeline_spark.queries import (  # noqa: F401
        core,
        llm,
        relational,
        tpch,
    )

    return REGISTRY
