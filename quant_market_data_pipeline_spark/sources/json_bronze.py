"""Bronze layer: raw market-data JSON documents -> typed silver rows.

The reference lands one pretty-printed JSON document per symbol
(``/root/reference/project/ingest_data.py:80-106``: ``{symbol, timeframe,
source, feed, start_utc, end_utc, bars: [...]}``) and reads it back with
schema inference (``project/transform_data.py:36-43``).  This engine reads
the same shape with an EXPLICIT StructType (inference at scale = an extra
full pass over the data + schema drift hazards) in PERMISSIVE mode with a
corrupt-record column, then explodes/casts to the silver bar schema
(``transform_data.py:46-69``).

Multiline JSON forces one task per whole file — acceptable for the
reference's per-symbol documents, NOT for 100 TB bronze; ``read_jsonl``
reads the splittable line-delimited form the at-scale pipeline should
land instead (same payload schema, one bar-batch per line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

BAR_STRUCT = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),  # ISO-8601 with offset
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ]
)

RAW_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timeframe", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("feed", T.StringType()),
        T.StructField("start_utc", T.StringType()),
        T.StructField("end_utc", T.StringType()),
        T.StructField("bars", T.ArrayType(BAR_STRUCT)),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)

# ISO-8601 with offset, e.g. 2024-05-01T13:30:00+00:00
# (transform_data.py:52-53).
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def read_raw_json(spark: SparkSession, path: str) -> DataFrame:
    """Read per-symbol multiline JSON documents (the reference's bronze).

    PERMISSIVE + corrupt-record column: malformed documents surface as
    rows with ``_corrupt_record`` set instead of failing the job
    (transform_data.py:36-43 relied on the same mode, minus the capture).
    """
    return (
        spark.read.schema(RAW_PAYLOAD_SCHEMA)
        .option("multiline", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Splittable line-delimited variant — the at-scale bronze format."""
    return (
        spark.read.schema(RAW_PAYLOAD_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def corrupt_records(raw: DataFrame) -> DataFrame:
    """Quarantine stream: documents that failed to parse.

    Spark refuses plans whose column set prunes down to ONLY the internal
    corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    documented workaround is caching the parsed frame, which also lets the
    silver path reuse the parse instead of re-reading the files."""
    return raw.cache().filter(F.col(CORRUPT_COL).isNotNull()).select(
        "symbol", CORRUPT_COL
    )


def explode_to_bars(raw: DataFrame) -> DataFrame:
    """Bronze documents -> one typed row per bar (silver).

    Mirrors clean_data (transform_data.py:46-69): explode the nested
    array (P1), parse ISO timestamps (P3), cast prices to Decimal(15,4)
    and volume to int (P2, schema.py:33-39), drop rows missing the
    essentials (P4).
    """
    dec = T.DecimalType(15, 4)
    bars = raw.filter(F.col(CORRUPT_COL).isNull()).select(
        "symbol", F.explode("bars").alias("bar")
    )
    return (
        bars.select(
            "symbol",
            F.to_timestamp(F.col("bar.timestamp"), TS_FORMAT).alias("timestamp"),
            F.col("bar.open").cast(dec).alias("open"),
            F.col("bar.high").cast(dec).alias("high"),
            F.col("bar.low").cast(dec).alias("low"),
            F.col("bar.close").cast(dec).alias("close"),
            F.col("bar.volume").cast("int").alias("volume"),
        )
        .na.drop(subset=["close", "timestamp"])
    )


CSV_BAR_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # ISO-8601 with offset
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_csv_bars(spark: SparkSession, path: str) -> DataFrame:
    """CSV bronze variant: one bar per line (header, explicit schema,
    PERMISSIVE + corrupt-record quarantine).  CSV is splittable, so a
    single huge file still parallelizes — unlike the multiline-JSON
    documents, which cost one task per file."""
    return (
        spark.read.schema(CSV_BAR_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def csv_bars_to_silver(raw: DataFrame) -> DataFrame:
    """CSV rows -> typed silver bars (same casts/null-gate as the JSON
    path, minus the explode — CSV is already one bar per row)."""
    dec = T.DecimalType(15, 4)
    return (
        raw.filter(F.col(CORRUPT_COL).isNull())
        .select(
            "symbol",
            F.to_timestamp("timestamp", TS_FORMAT).alias("timestamp"),
            F.col("open").cast(dec).alias("open"),
            F.col("high").cast(dec).alias("high"),
            F.col("low").cast(dec).alias("low"),
            F.col("close").cast(dec).alias("close"),
            F.col("volume").cast("int").alias("volume"),
        )
        .na.drop(subset=["close", "timestamp"])
    )
