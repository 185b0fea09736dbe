"""Text-analysis primitives: tokenization, normalization, quality stats.

Everything is built-in column expressions (regexp_*, length, size) —
JVM-side, whole-stage codegen, no Python.  At 100 TB of text these run at
scan speed; the only shuffle is whatever aggregation the caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"
PUNCT_RE = r"[\p{Punct}]"
DIGIT_RE = r"[0-9]"


def normalized_text(text: Column | str) -> Column:
    """Whitespace-collapsed, trimmed, lowercased content (for fingerprints)."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def tokens_column(text: Column | str) -> Column:
    """Whitespace tokens as an array<string> (empty array for blank text)."""
    # split on whitespace; filter the empty-string artifacts split produces
    # at the boundaries.
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def quality_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach quality-scoring stats: char/token/punct/digit counts.

    ``chars_per_token`` NULLs (not errors) on empty documents.
    """
    c = F.col(text)
    n_tokens = F.size(tokens_column(c))
    return (
        df.withColumn("n_char", F.length(c))
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_punct", F.regexp_count(c, F.lit(PUNCT_RE)))
        .withColumn("n_digits", F.regexp_count(c, F.lit(DIGIT_RE)))
        .withColumn(
            "chars_per_token",
            F.length(c).cast("double") / F.nullif(n_tokens, F.lit(0)).cast("double"),
        )
    )
