"""Round-10: corpus-adaptive hyperplane-LSH plane count.

The r9 judge measured recall@3 = 0.0 at the x16 corpus for both
fixed-plane ANN configs (docscale_recall, BENCH_r09).  The r10 fix
scales planes with log2(n) to hold bucket population at ~64; these
tests pin the integer-pure derivation, its DuckDB scalar-subquery twin
(the strict oracle gate depends on the two agreeing for EVERY n), and
the stride-12 plane-family layout the oracle's prefix construction
addresses.
"""

from __future__ import annotations

import duckdb
import pytest

from quant_market_data_pipeline_spark.llm.similarity import (
    LSH_PLANE_STRIDE,
    LSH_PLANES_HI,
    LSH_PLANES_LO,
    LSH_TARGET_POP,
    adaptive_planes,
)


def test_adaptive_planes_fixture_scales():
    # the four corpus sizes the engine actually meets
    assert adaptive_planes(500) == 4  # sf0.001 / sf0.01 (lo clamp)
    assert adaptive_planes(2000) == 5  # sf0.1
    assert adaptive_planes(32000) == 9  # x16 docscale probe
    assert adaptive_planes(64 * (1 << 12) + 1) == 12  # hi clamp


def test_adaptive_planes_invariants():
    prev = 0
    for n in [1, 2, 63, 64, 1024, 1025, 2048, 2049, 10**6, 10**9]:
        p = adaptive_planes(n)
        assert LSH_PLANES_LO <= p <= LSH_PLANES_HI
        assert p >= prev  # monotone in n
        prev = p
        # defining property: p is the SMALLEST plane count whose bucket
        # space keeps mean population <= target (within the clamp)
        if p < LSH_PLANES_HI:
            assert LSH_TARGET_POP * (1 << p) >= n
        if p > LSH_PLANES_LO:
            assert LSH_TARGET_POP * (1 << (p - 1)) < n


def test_sql_twin_matches_python_everywhere():
    """The oracle derives planes_eff from count(*) with a
    generate_series scalar subquery; a single n where the two engines
    disagree silently breaks every LSH strict compare at that SF."""
    from quant_market_data_pipeline_spark.queries.llm import _PE_SQL

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT)")
    # exhaustive across every clamp region + all power-of-two boundaries
    ns = (
        [1, 2, 500, 2000, 32000]
        + [64 * (1 << p) for p in range(3, 14)]
        + [64 * (1 << p) + 1 for p in range(3, 14)]
        + [64 * (1 << p) - 1 for p in range(3, 14)]
    )
    for n in ns:
        con.execute("DELETE FROM embeddings")
        con.execute(f"INSERT INTO embeddings SELECT range FROM range({n})")
        (sql_p,) = con.execute(f"SELECT {_PE_SQL}").fetchone()
        assert sql_p == adaptive_planes(n), (n, sql_p, adaptive_planes(n))


def test_multitable_uses_stride_12_families(spark):
    """Table t must draw planes t*12..t*12+p-1 (NOT t*p..): the oracle
    prefixes each family's full 12-bit string, so an offset drift
    produces silently-different buckets on one engine only."""
    import pandas as pd

    from pyspark.sql import functions as F

    from quant_market_data_pipeline_spark.llm.similarity import (
        as_double,
        lsh_bucket_arrow,
        lsh_multitable_topk,
    )

    assert LSH_PLANE_STRIDE == 12

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(40),
                "embedding": [
                    [float((i * 7 + j * 3) % 11 - 5) for j in range(64)]
                    for i in range(40)
                ],
            }
        )
    )
    # n=40 -> lo clamp, planes_eff = 4
    out = lsh_multitable_topk(emb, tables=2, dim=64, k=2, neighbor_cap=8)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}

    # independent reconstruction with explicit stride-12 offsets
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    b0 = lsh_bucket_arrow(4, 64, offset=0)(F.col("v"))
    b1 = lsh_bucket_arrow(4, 64, offset=12)(F.col("v"))
    ref = vecs.select("vec_id", b0.alias("b0"), b1.alias("b1")).toPandas()
    import numpy as np

    vmap = {
        int(r.vec_id): np.asarray(r.v, dtype=np.float64)
        for r in vecs.collect()
    }
    import hashlib

    cand = set()
    for t in ("b0", "b1"):
        for bkt, grp in ref.groupby(t):
            ids = sorted(
                grp.vec_id,
                key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
            )[:8]
            for q in grp.vec_id:
                for nb in ids:
                    if nb != q:
                        cand.add((int(q), int(nb)))
    exp = set()
    by_q: dict[int, list] = {}
    for q, nb in cand:
        a, b = vmap[q], vmap[nb]
        den = float(np.linalg.norm(a) * np.linalg.norm(b))
        cs = round(float(a @ b) / den, 6) if den else float("nan")
        by_q.setdefault(q, []).append((-cs, nb))
    for q, lst in by_q.items():
        for _, nb in sorted(lst)[:2]:
            exp.add((q, nb))
    assert got == exp
