"""quant_market_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``MashooqRS/quant-market-data-pipeline``
(batch market-data ETL: 5-minute OHLCV bars -> pair alignment -> rolling
z-score -> data-quality gates), generalized into a reusable operator library
plus the large-scale training-data operators (dedup, similarity search,
multimodal plumbing, text analysis) that a 100 TB lakehouse pipeline needs.

Design principles (see SURVEY.md §4, §7):

- Declarative DataFrame/SQL plans everywhere; Catalyst + Tungsten pick the
  physical strategy.  No RDDs, no driver-side row loops.
- UDF-free on the reference surface — every reference operator maps to
  built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen).
  Arrow-batched ``pandas_udf`` / ``mapInPandas`` only for the multimodal
  extension where per-cell binary decoding is genuinely unexpressible.
- Session timezone pinned to UTC (naive-UTC canonical timestamps, mirroring
  the reference's ``audit_pipeline.py:81-82``).
- Small dimensions broadcast; big joins/aggregations shuffle on their keys
  with AQE enabled for runtime coalescing and skew handling.
"""

from quant_market_data_pipeline_spark.session import configure_runtime, get_spark

__all__ = ["configure_runtime", "get_spark"]

__version__ = "0.1.0"
