"""Source connectors: testdata parquet tables, bronze JSON bars, sinks."""

from quant_market_data_pipeline_spark.sources.tables import load_table, load_tables

__all__ = ["load_table", "load_tables"]
