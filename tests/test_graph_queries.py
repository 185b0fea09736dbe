"""Graph propagation query properties (queries/graph.py)."""

from __future__ import annotations

from quant_market_data_pipeline_spark.queries.graph import (
    q_pagerank_one_iter,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_one_iter_properties(spark):
    rows = q_pagerank_one_iter(spark, SF_DIR).collect()
    assert rows
    # rank column is 1..n in pagerank-desc order with deterministic ties
    ranks = [r.rank for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    prs = [r.pagerank for r in rows]
    assert prs == sorted(prs, reverse=True)
    for r in rows:
        # damping floor: pr >= 0.15 for any node with in-edges
        assert r.pagerank >= 0.15
