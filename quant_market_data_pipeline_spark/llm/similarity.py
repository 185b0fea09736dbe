"""Similarity search over embedding columns.

- **Brute-force cosine top-k**: broadcast the (small) query set against the
  candidate corpus; the dot product is a JVM-side ``zip_with`` +
  ``aggregate`` over array<double> — no Python, whole-stage codegen.  The
  correctness baseline.
- **Hyperplane-LSH bucketed top-k**: the scale path.  Random hyperplanes
  with md5-derived ±1 components (deterministic, oracle-checkable —
  llm/hashing.py) assign every vector a sign-pattern bucket; candidate
  generation joins within buckets only.  At 100 TB the bucket join
  replaces the O(n*q) cross product with O(sum |bucket_q| * |bucket_n|),
  and bucket keys are hash-uniform, so no skew.
- For cluster deployments Spark MLlib's BucketedRandomProjectionLSH /
  approxSimilarityJoin offers the same shape; the built-in-expression
  version here keeps determinism and zero UDF overhead.

Tie handling: ranking orders by (rounded cosine DESC, neighbor id) so
results are reproducible across engines and runs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i over array<double> columns (sequential fold — same
    summation order as the DuckDB oracle's list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def as_double(vec: Column) -> Column:
    """array<float> -> array<double> (exact) so arithmetic matches a
    double-precision oracle bit-for-bit in structure."""
    return vec.cast("array<double>")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    Broadcast-nested-loop over the query side: correct baseline; use the
    LSH variant when the query set is not broadcastable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def hyperplane_vector(plane: int, dim: int) -> list[float]:
    """The ±1 hyperplane as a plain Python list, derived once at
    plan-build time: component i is +1 iff md5("p{plane}_{i}") starts
    with a hex digit >= 8 — byte-identical to the SQL-side derivation the
    oracle uses (llm/hashing.py convention)."""
    return [
        1.0
        if hashlib.md5(f"p{plane}_{i}".encode()).hexdigest()[0] >= "8"
        else -1.0
        for i in range(dim)
    ]


def hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane has md5-derived ±1 entries.

    The plane is hoisted into the plan as a LITERAL array: deriving it
    inside the row expression (transform+md5 over a sequence) re-computes
    planes*dim md5 calls per ROW — Catalyst does not hoist the
    row-invariant subtree — which at index-build scale is ~100x wasted
    CPU.  As a literal, the expression is one zip_with dot product.
    """
    h = F.array(*[F.lit(x) for x in hyperplane_vector(plane, dim)])
    s = F.aggregate(
        F.zip_with(vec, h, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_bucket(vec: Column, planes: int, dim: int, offset: int = 0) -> Column:
    """Sign-pattern bucket key: concatenated hyperplane sign bits.

    ``offset`` selects a disjoint plane family (planes offset..offset+
    planes-1) so multi-table LSH draws independent buckets per table.
    """
    return F.concat(
        *[hyperplane_sign(vec, offset + p, dim) for p in range(planes)]
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    dim: int = 64,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates restricted to the same
    hyperplane-sign bucket, exact cosine + ranking within the bucket."""
    vecs = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes, dim))
    # index build: both self-join sides read the bucketed vectors, and the
    # bucket key costs planes x dim multiply-adds per row — materialize it
    # once (lazy: plan construction stays free)
    vecs = vecs.localCheckpoint(eager=False)
    a = vecs.select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    b = vecs.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), "bucket"
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "bucket", "cos_sim", "rn")
    )


def lsh_multitable_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 2,
    planes: int = 8,
    dim: int = 64,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Multi-table hyperplane LSH top-k — the 100 TB ANN path.

    Single-table LSH has a fixed 2^planes bucket count, so bucket
    population (and the in-bucket quadratic) grows linearly with corpus
    size: at 16x data the 4-plane/16-bucket variant pays ~16x more
    cosines per query.  The classic fix (E2LSH-style) is MORE planes for
    small buckets plus MULTIPLE independent tables for recall: candidates
    are the union over tables of same-bucket pairs, deduplicated before
    ranking.  2 tables x 8 planes = 256 buckets/table: ~32x fewer cosine
    evaluations per query than the 4-plane table at equal corpus size,
    and the candidate count scales as tables * n^2 / 2^planes — tune
    ``planes`` up with corpus growth to hold bucket size constant.
    """
    vecs = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    for t in range(tables):
        vecs = vecs.withColumn(
            f"b{t}", lsh_bucket(F.col("v"), planes, dim, offset=t * planes)
        )
    # index build: one pass computes all tables' bucket keys
    vecs = vecs.localCheckpoint(eager=False)

    per_table = []
    for t in range(tables):
        a = vecs.select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col(f"b{t}").alias("__bk"),
        )
        b = vecs.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("v").alias("cv"),
            F.col(f"b{t}").alias("__bk"),
        )
        per_table.append(
            a.join(b, "__bk")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    cosine(F.col("qv"), F.col("cv")), round_digits
                ).alias("cos_sim"),
            )
        )
    cand = per_table[0]
    for extra in per_table[1:]:
        cand = cand.unionByName(extra)
    # a pair colliding in several tables scores identically in each, so
    # distinct() dedups on the scalar triple — no vector re-shuffle
    cand = cand.distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def blocked_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    min_cosine: float = 0.25,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs within a blocking key (cosine >= threshold)."""
    vecs = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v"), F.col(block_col)
    )
    a = vecs.select(
        F.col(id_col).alias("id_lo"), F.col("v").alias("va"), block_col
    )
    b = vecs.select(
        F.col(id_col).alias("id_hi"), F.col("v").alias("vb"), block_col
    )
    return (
        a.join(b, block_col)
        .filter(F.col("id_lo") < F.col("id_hi"))
        .select(
            block_col,
            "id_lo",
            "id_hi",
            F.round(cosine(F.col("va"), F.col("vb")), round_digits).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cosine)
    )


def ivf_assign(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Assign every vector to its nearest centroid (IVF coarse quantizer).

    Centroids broadcast; assignment is a map-side argmax over
    n_centroids cosines — deterministic tiebreak (lower centroid id wins)
    so the partition function is reproducible and oracle-checkable.
    ``vecs``: (id_col, v); ``centroids``: (cid, cv).
    """
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "v",
        "cid",
        F.round(cosine(F.col("v"), F.col("cv")), round_digits).alias("__cs"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__cs").desc(), F.col("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "v", F.col("cid").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    query_pred=None,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize into cells, search within the query's
    cell only (n_probe=1).

    Centroids here are the first ``n_centroids`` vectors by id —
    deterministic for the oracle; a production deployment plugs k-means
    centroids (MLlib) into the same plan.  At scale: assignment is one
    broadcast map pass; the search join shuffles on the cell key, so cost
    is O(sum over cells |q_cell| * |c_cell|) instead of O(n * q).
    """
    vecs = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    cents = vecs.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv")
    )
    # Materialize the assignment: both join sides reference it, and an
    # index build IS a materialization step — without this the whole
    # assignment pipeline (n_centroids cosines per vector + argmax)
    # executes twice, once per self-join side.
    assigned = ivf_assign(vecs, cents, id_col).localCheckpoint(eager=False)
    q = assigned.select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "cell"
    )
    if query_pred is not None:
        q = q.filter(query_pred)
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv2"), "cell"
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            F.round(cosine(F.col("qv"), F.col("cv2")), round_digits).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cell", "cos_sim", "rn")
    )
