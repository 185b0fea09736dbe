"""Explicit schemas for every table the engine touches.

The reference mixes inferred schemas (raw JSON scan,
``/root/reference/project/transform_data.py:36-43``) with fixed DDL
(``/root/reference/schema.py:28-44``) and one explicit StructType
(``/root/reference/audit_pipeline.py:154-160``).  Engine rule (SURVEY §1.3):
explicit ``StructType`` everywhere; PERMISSIVE + corrupt-record column for
untrusted JSON.  At 100 TB, schema inference is a full extra pass over the
data — never acceptable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Bronze: raw bar payload — one JSON document per symbol with a nested array
# of bar structs (mirrors /root/reference/project/ingest_data.py:71-90).
# ---------------------------------------------------------------------------
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

RAW_BARS_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timeframe", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("feed", T.StringType()),
        T.StructField("start_utc", T.StringType()),
        T.StructField("end_utc", T.StringType()),
        T.StructField("bars", T.ArrayType(BAR_STRUCT)),
        # PERMISSIVE-mode capture of malformed documents (engine addition).
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Silver/gold: the analytics table (mirrors /root/reference/schema.py:28-44;
# NUMERIC(15,4) prices, naive-UTC timestamp, UNIQUE(symbol, timestamp)).
# The SERIAL surrogate id is dropped — never read in the reference.
# ---------------------------------------------------------------------------
PRICE_DECIMAL = T.DecimalType(15, 4)

INTRADAY_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), nullable=False),
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("open", PRICE_DECIMAL),
        T.StructField("high", PRICE_DECIMAL),
        T.StructField("low", PRICE_DECIMAL),
        T.StructField("close", PRICE_DECIMAL),
        T.StructField("volume", T.IntegerType()),
        T.StructField("spread", PRICE_DECIMAL),
        T.StructField("z_score", PRICE_DECIMAL),
    ]
)

# ---------------------------------------------------------------------------
# Trading-calendar dimension (mirrors Alpaca /v2/calendar rows as built at
# /root/reference/audit_pipeline.py:154-160).
# ---------------------------------------------------------------------------
CALENDAR_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType(), nullable=False),  # YYYY-MM-DD
        T.StructField("open", T.StringType(), nullable=False),  # HH:MM ET
        T.StructField("close", T.StringType(), nullable=False),  # HH:MM ET
    ]
)

# Calendar with UTC session bounds resolved (engine keeps this distributed
# via to_utc_timestamp instead of the reference's driver-side zoneinfo loop,
# /root/reference/audit_pipeline.py:123-152).
SESSION_BOUNDS_SCHEMA = T.StructType(
    [
        T.StructField("trading_date", T.DateType(), nullable=False),
        T.StructField("session_open_utc", T.TimestampType(), nullable=False),
        T.StructField("session_close_utc", T.TimestampType(), nullable=False),
        T.StructField("last_bar_start_utc", T.TimestampType(), nullable=False),
        T.StructField("expected_bars", T.IntegerType(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# DQ report tables (mirror /root/reference/project/validate_data.py:67-93,
# /root/reference/validate_calendar_alpaca.py:104-125,
# /root/reference/audit_pipeline.py:204-219).
# ---------------------------------------------------------------------------
QUALITY_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("trading_date", T.DateType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("bar_count", T.LongType()),
        T.StructField("expected_bars", T.IntegerType()),
        T.StructField("missing_bars", T.LongType()),
        T.StructField("status", T.StringType()),  # OK | WARN | FAIL
        T.StructField("notes", T.StringType()),
    ]
)

MISSING_BARS_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("trading_date", T.DateType()),
    ]
)

# ---------------------------------------------------------------------------
# Multimodal extension: opaque binary payload + typed metadata (engine
# addition; see llm/multimodal.py).
# ---------------------------------------------------------------------------
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided star schema at /root/testdata/sf*/ (FIXTURES.md Group B).
# Explicit schemas let the Parquet scan skip footer-merge inference and give
# the correctness harness a stable contract.
# ---------------------------------------------------------------------------
TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
