"""MLlib interop: BucketedRandomProjectionLSH's approxSimilarityJoin
finds the same near-neighbor structure as the engine's built-in
expression-based ANN — the cluster-deployment alternative the similarity
module's docstring promises."""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.linalg import Vectors, VectorUDT
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quant_market_data_pipeline_spark.llm.similarity import as_double, cosine
from quant_market_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_brp_lsh_agrees_with_exact_neighbors(spark):
    emb = load_table(spark, "embeddings", SF_DIR).limit(300)
    to_vec = F.udf(lambda a: Vectors.dense(a), VectorUDT())
    vecs = emb.select(
        "vec_id", to_vec(F.col("embedding").cast("array<double>")).alias("features")
    ).cache()

    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=2.0, numHashTables=4, seed=42,
    )
    model = lsh.fit(vecs)
    # euclidean-distance candidate pairs within threshold
    pairs = (
        model.approxSimilarityJoin(vecs, vecs, 1.1, distCol="dist")
        .filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_lo"),
            F.col("datasetB.vec_id").alias("id_hi"),
            "dist",
        )
    )
    got = {(r["id_lo"], r["id_hi"]) for r in pairs.collect()}

    # exact truth: euclidean distance via the engine's column math
    a = emb.select(
        F.col("vec_id").alias("id_lo"), as_double(F.col("embedding")).alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_hi"), as_double(F.col("embedding")).alias("vb")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    exact = (
        a.crossJoin(b)
        .filter(F.col("id_lo") < F.col("id_hi"))
        .select("id_lo", "id_hi", dist.alias("dist"))
        .filter(F.col("dist") <= 1.1)
    )
    want = {(r["id_lo"], r["id_hi"]) for r in exact.collect()}

    assert want, "threshold should yield at least one true near pair"
    # LSH is approximate: candidates it DOES return must be true pairs
    # (approxSimilarityJoin post-filters exactly), recall high
    assert got <= want
    assert len(got) >= 0.8 * len(want), (len(got), len(want))
