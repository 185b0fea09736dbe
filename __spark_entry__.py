"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual implementations live in ``quant_market_data_pipeline_spark``;
this module is a thin re-export of its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's E1 spine (tick scan -> 5-min bars -> pair align ->
    log-spread -> rolling z-score -> stacked legs) on the events table.
    """
    from quant_market_data_pipeline_spark.plans.flagship import pair_zscore
    from quant_market_data_pipeline_spark.session import configure_runtime
    from quant_market_data_pipeline_spark.sources.tables import load_table

    configure_runtime(spark)
    events = load_table(spark, "events", "/root/testdata/sf0.001")
    return pair_zscore(events, [("click", "view"), ("purchase", "signup")])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from quant_market_data_pipeline_spark.queries import load_all

    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get a
    rows-only check)."""
    from quant_market_data_pipeline_spark.queries import load_all

    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
