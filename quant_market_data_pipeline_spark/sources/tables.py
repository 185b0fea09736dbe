"""Parquet table loaders for the driver testdata star schema.

Columnar parquet at rest: the scan carries ``ReadSchema`` for just the
referenced columns (Catalyst prunes) and filters are pushed to the reader
as ``PushedFilters``.

Timestamp handling: the driver's parquet stores INT64 TIMESTAMP(NANOS)
columns, which Spark does not read natively (PARQUET_TYPE_ILLEGAL).  The
loader reads them as raw nanosecond longs
(``spark.sql.legacy.parquet.nanosAsLong``, runtime-settable) and converts
with integer division ``DIV 1000`` -> ``timestamp_micros`` — a *truncation*
toward zero, byte-identical to DuckDB's nanos->micros narrowing (verified
against ``epoch_us`` on the same rows), so oracle value-hashes agree.
Double division would corrupt: 1.7e18 ns exceeds a double's 2^53 exact-int
range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Nanosecond-timestamp columns per table (everything else reads natively).
_NANO_TS_COLS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one testdata table (``region`` .. ``embeddings``) as a DataFrame.

    Timestamps come back as TimestampType at microsecond precision with
    session-tz UTC -> naive-UTC semantics (mirroring
    /root/reference/audit_pipeline.py:81-82).
    """
    from pyspark.sql import types as T

    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    ts_cols = _NANO_TS_COLS.get(name, [])
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ts_cols:
        if c not in df.columns:  # column-subset fixtures are legitimate
            continue
        dtype = df.schema[c].dataType
        if isinstance(dtype, T.LongType):
            # INT64 TIMESTAMP(NANOS) read raw: truncate to micros.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        elif isinstance(dtype, T.TimestampNTZType):
            # Micros NTZ: cast to session-tz timestamp (identity under UTC).
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, names: list[str], sf_dir: str | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def repartition_for_compute(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to cluster parallelism for CPU-bound pipelines.

    A small parquet table arrives as one split -> every downstream
    map-side expression (md5 shingle hashing, regex tokenization, vector
    math) runs on ONE core no matter how many exist; measured 5x on the
    sf0.1 MinHash bench (3.5s -> 0.7s on local[32]).  When the scan
    already has >= defaultParallelism splits — i.e. any real at-scale
    table — this returns the input unchanged, so no shuffle is added at
    100 TB.  The round-robin exchange it adds in the small case moves the
    *raw* rows (pre-explosion), the cheapest point to rebalance.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # inputFiles() is a metadata-only probe (no RDD plan conversion); a
    # scan with >= target files already parallelizes without help.
    n_files = len(df.inputFiles())
    if 0 < n_files < target:
        return df.repartition(target)
    return df
