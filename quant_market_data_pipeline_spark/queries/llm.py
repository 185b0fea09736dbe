"""LLM training-data pipeline queries: text analysis, dedup, similarity.

All built-ins (regexp, md5, higher-order array functions) — no Python in
the hot path.  The md5-based hashing primitives are chosen deliberately:
both Spark and DuckDB expose bit-identical ``md5`` hex strings, so even the
randomized-flavored algorithms (MinHash, SimHash, hyperplane LSH) are fully
deterministic and oracle-checkable (see functions/texthash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.llm.text import (
    normalized_text,
    quality_columns,
    tokens_column,
)
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import configure_runtime
from quant_market_data_pipeline_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, "documents", sf_dir)


# ---------------------------------------------------------------------------
# Text analysis: token counts, quality stats.
# ---------------------------------------------------------------------------
@register(
    "text_stats",
    oracle="""
SELECT doc_id,
       length(text) AS n_char,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
       len(regexp_extract_all(text, '[0-9]')) AS n_digits,
       round(CAST(length(text) AS DOUBLE)
             / NULLIF(len(regexp_extract_all(text, '\\S+')), 0), 6)
         AS chars_per_token
FROM documents
""",
    doc="Whitespace tokenization + punctuation/digit ratios — the quality-"
    "scoring primitives, all JVM-side regexp.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    stats = quality_columns(d, text="text")
    return stats.select(
        "doc_id",
        "n_char",
        "n_tokens",
        "n_punct",
        "n_digits",
        F.round("chars_per_token", 6).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Document fingerprint + exact dedup on normalized content.
# ---------------------------------------------------------------------------
@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
FROM documents
""",
    doc="Content fingerprint: md5 of whitespace-collapsed lowercase text.",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select("doc_id", F.md5(normalized_text("text")).alias("fingerprint"))


@register(
    "dedup_exact_docs",
    oracle="""
WITH fp AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM documents
)
SELECT fingerprint, min(doc_id) AS canonical_doc_id, count(*) AS n_copies
FROM fp GROUP BY fingerprint
""",
    doc="Exact dedup: hash-groupBy on the content fingerprint; canonical "
    "row = min doc_id (deterministic).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.md5(normalized_text("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Language ID: stopword-hit heuristic over a broadcast lexicon.
# ---------------------------------------------------------------------------
@register(
    "token_lang_profile",
    oracle="""
SELECT lang, source,
       count(*) AS n_docs,
       sum(len(regexp_extract_all(text, '\\S+'))) AS total_tokens,
       round(avg(CAST(length(text) AS DOUBLE)), 6) AS avg_chars
FROM documents GROUP BY lang, source
""",
    doc="Corpus profile per (lang, source): doc/token/char rollup.",
)
def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_column("text"))).alias("total_tokens"),
        F.round(F.avg(F.length("text").cast("double")), 6).alias("avg_chars"),
    )
