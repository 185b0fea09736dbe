"""Bronze -> silver cleaning: explode, typed projection, parse, dedup.

Re-expresses /root/reference/project/transform_data.py:46-69 —

- P1 explode the nested ``bars`` array (``:49``)
- P3 ISO-8601 timestamp parse, pattern ``yyyy-MM-dd'T'HH:mm:ssXXX`` (``:52-53``)
- P2 typed projection: Decimal(15,4) prices, int volume, lit symbol (``:55-64``)
- P4 null-drop on (close, timestamp) (``:65``)

plus the dedup operator making the reference's UNIQUE(symbol, timestamp)
DDL invariant (/root/reference/schema.py:42) an explicit transformation —
the reference only "enforces" it by full-overwrite loads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.schemas import PRICE_DECIMAL

ISO_OFFSET_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def explode_bars(raw: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """One row per bar from the nested payload (P1)."""
    return raw.select(F.col(symbol_col), F.explode("bars").alias("bar"))


def clean_bars(raw: DataFrame) -> DataFrame:
    """Full bronze->silver clean for one-or-many-symbol raw payloads.

    Unlike the reference (one symbol per call, symbol via ``F.lit``,
    transform_data.py:101-116), this is vectorized over all symbols in the
    scan — the per-pair driver loop disappears.
    """
    bars = explode_bars(raw)
    return (
        bars.select(
            F.col("symbol"),
            F.to_timestamp(F.col("bar.timestamp"), ISO_OFFSET_FMT).alias("timestamp"),
            F.col("bar.open").cast(PRICE_DECIMAL).alias("open"),
            F.col("bar.high").cast(PRICE_DECIMAL).alias("high"),
            F.col("bar.low").cast(PRICE_DECIMAL).alias("low"),
            F.col("bar.close").cast(PRICE_DECIMAL).alias("close"),
            F.col("bar.volume").cast("int").alias("volume"),
        )
        .na.drop(subset=["close", "timestamp"])
    )


def dedup_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keep one arbitrary row per key — the UNIQUE(symbol,timestamp) op."""
    return df.dropDuplicates(keys)


def dedup_keys_deterministic(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """Keep the first row per key under an explicit ordering.

    ``dropDuplicates`` keeps an arbitrary row; when reproducibility matters
    (oracle comparisons, idempotent reloads) pick the winner explicitly.
    One shuffle on ``keys``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
