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


def test_hot_band_split_lossless(spark):
    """The r10 hot-band refinement must return EXACTLY the cold-path
    pair set: sub-banding 45 bits into 4 disjoint pieces pigeonholes
    any <= 3-bit difference, so no qualifying pair can be lost.  The
    fixture plants one hot band-0 bucket (60 fingerprints sharing band
    0) full of near-dup chains plus random-ish cold classes."""
    from pyspark.sql import functions as F

    from quant_market_data_pipeline_spark.llm.dedup import (
        simhash60_neardup_pairs,
    )

    shared_b0 = 0x1234  # common band-0 value for the hot bucket
    fps = []
    base = (0x5A5A5 << 15) | shared_b0
    for i in range(60):
        # chains at hamming 1..3 from a handful of anchors, all in the
        # hot bucket (band 0 identical, diffs in upper bits)
        fp = base ^ ((i % 7) << (15 + (i % 40)))
        fps.append((i, fp | (i // 20) << 57))
    # cold classes: scattered fingerprints, some hamming-<=3 pairs
    for i in range(200):
        fps.append((1000 + i, (i * 0x9E3779B97F4A7C15) & ((1 << 60) - 1)))
    df = spark.createDataFrame(fps, "doc_id long, simhash long")

    def pairset(threshold):
        out = simhash60_neardup_pairs(
            df, max_hamming=3, hot_band_threshold=threshold
        )
        return {(r.doc_lo, r.doc_hi, r.hamming) for r in out.collect()}

    hot_path = pairset(4)  # forces the split on every populated bucket
    cold_path = pairset(10**9)  # reference: pure cold join
    assert hot_path == cold_path
    assert len(cold_path) > 0  # the fixture actually exercises pairs
