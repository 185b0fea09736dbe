"""Parity + property tests for the round-4 ANN machinery: the per-bucket
gemm scorer, the md5-ordered neighbor cap, and the Arrow bucket UDF.

The contract under test: swapping the interpreted zip_with/aggregate
cosine for the cogrouped-gemm path (and the expression hyperplane fold
for the vectorized one) must be a pure performance change — identical
output rows at every salt setting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.llm.similarity import (
    as_double,
    bucket_sample_cap,
    cosine,
    gemm_pair_scores,
    lsh_bucket,
    lsh_bucket_arrow,
    lsh_cosine_topk,
    lsh_multitable_topk,
)
from quant_market_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR).cache()


def test_bucket_arrow_matches_expression(spark, emb):
    """The gemm sign bits must equal the sequential-fold sign bits."""
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    both = vecs.select(
        "vec_id",
        lsh_bucket(F.col("v"), 4, 64).alias("expr_bucket"),
        lsh_bucket_arrow(4, 64)(F.col("v")).alias("arrow_bucket"),
        lsh_bucket(F.col("v"), 8, 64, offset=8).alias("expr_b1"),
        lsh_bucket_arrow(8, 64, offset=8)(F.col("v")).alias("arrow_b1"),
    )
    bad = both.filter(
        (F.col("expr_bucket") != F.col("arrow_bucket"))
        | (F.col("expr_b1") != F.col("arrow_b1"))
    )
    assert bad.count() == 0


def test_gemm_scores_match_interpreted_cosine(spark, emb):
    """gemm_pair_scores == the join+zip_with cosine after round(6), for
    every (query, neighbor) pair, at several salt settings."""
    vecs = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", lsh_bucket_arrow(4, 64)(F.col("v")))
    a = vecs.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    b = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "bucket"
    )
    want = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "bucket",
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    for salts in (1, 3, 8):
        got = gemm_pair_scores(a, b, ["bucket"], query_salts=salts).select(
            "bucket",
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_bucket_sample_cap_properties(spark, emb):
    """Cap keeps min(|bucket|, cap) rows per bucket, and the kept set is
    the md5-order prefix — a deterministic function of ids only."""
    vecs = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", lsh_bucket_arrow(2, 64)(F.col("v")))
    cap = 5
    capped = bucket_sample_cap(vecs, ["bucket"], "vec_id", cap)
    sizes = (
        vecs.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(
            capped.groupBy("bucket").agg(F.count(F.lit(1)).alias("k")),
            "bucket",
        )
    )
    bad = sizes.filter(
        F.col("k") != F.least(F.col("n"), F.lit(cap))
    )
    assert bad.count() == 0
    # determinism: same input -> same kept ids
    again = bucket_sample_cap(vecs, ["bucket"], "vec_id", cap)
    assert capped.select("vec_id").exceptAll(again.select("vec_id")).count() == 0


def test_capped_topk_is_topk_over_capped_candidates(spark, emb):
    """lsh_cosine_topk(neighbor_cap=c) == brute-force ranking restricted
    to the capped neighbor set (the documented recall semantics)."""
    cap, k = 4, 2
    got = lsh_cosine_topk(emb, planes=2, dim=64, k=k, neighbor_cap=cap)

    vecs = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), 2, 64))
    capped = bucket_sample_cap(vecs, ["bucket"], "vec_id", cap)
    a = vecs.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    b = capped.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "bucket"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    want = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_multitable_salts_invariant(spark, emb):
    """query_salts is a pure execution knob for the multi-table path."""
    r1 = lsh_multitable_topk(
        emb, tables=2, planes=4, dim=64, k=2, neighbor_cap=8, query_salts=1
    )
    r4 = lsh_multitable_topk(
        emb, tables=2, planes=4, dim=64, k=2, neighbor_cap=8, query_salts=4
    )
    assert r1.count() == r4.count()
    assert r1.exceptAll(r4).count() == 0
