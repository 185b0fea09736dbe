"""Round-9 query invariants: the properties the docstrings promise.

Each test drives the REAL registered query at sf0.001 and checks the
algorithm-level invariant that the DuckDB oracle (an implementation
twin) cannot certify on its own:

- Count-Min sketches NEVER undercount (one-sided error).
- Bloom filters NEVER produce false negatives.
- The MinHash-LSH search API retrieves each query's source document
  at rank 1 (the queries are planted prefixes of corpus members).
- GARCH(1,1) matches an independent sequential-Python replication
  and stays within its stationary bounds.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def registry():
    from quant_market_data_pipeline_spark.queries import load_all

    return load_all()


def test_countmin_never_undercounts(spark, registry):
    rows = (
        registry["countmin_heavy_hitters"]
        .spark(spark, SF_DIR)
        .collect()
    )
    assert rows, "heavy-hitter audit returned no rows"
    for r in rows:
        assert r.overestimate >= 0, (
            f"CMS undercounted {r.token!r}: est {r.cms_estimate} < "
            f"exact {r.exact_count}"
        )
        assert r.cms_estimate == r.exact_count + r.overestimate


def test_bloom_no_false_negatives(spark, registry):
    row = (
        registry["bloom_filter_join_audit"]
        .spark(spark, SF_DIR)
        .collect()[0]
    )
    assert row.n_false_neg == 0, "Bloom filter dropped a member key"
    assert row.n_bloom_pass >= row.n_member
    assert row.n_false_pos == row.n_bloom_pass - row.n_member
    assert 0.0 < row.fill_ratio < 1.0


def test_minhash_search_retrieves_source_doc(spark, registry):
    rows = (
        registry["minhash_search_topk"].spark(spark, SF_DIR).collect()
    )
    assert rows
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, hits in by_query.items():
        hits.sort(key=lambda r: r.rank)
        ranks = [r.rank for r in hits]
        assert ranks == list(range(1, len(ranks) + 1))
        # the query is a 40-token prefix of doc `qid`: the source doc
        # must collide in >= 1 band and win the agreement ranking
        assert hits[0].doc_id == qid, (
            f"query {qid}: top hit {hits[0].doc_id}, not the source"
        )
        ests = [r.est_jaccard for r in hits]
        assert ests == sorted(ests, reverse=True)
        assert all(0.0 <= e <= 1.0 for e in ests)


def test_garch_matches_sequential_replication(spark, registry):
    from quant_market_data_pipeline_spark.queries.execution import (
        _G_ALPHA,
        _G_BETA,
        _G_OMEGA,
        _G_V0,
        _daily_rets,
    )

    got = {
        (r.symbol, r.trading_day): r.garch_vol
        for r in registry["garch_11_vol"].spark(spark, SF_DIR).collect()
    }
    rets = sorted(
        _daily_rets(spark, SF_DIR)
        .select("symbol", "trading_day", "r")
        .collect(),
        key=lambda r: (r.symbol, r.trading_day),
    )
    assert got and len(got) == len(rets)
    v = None
    prev = None
    last_sym = None
    for r in rets:
        if r.symbol != last_sym:
            v, prev, last_sym = None, None, r.symbol
        v = _G_V0 if v is None else _G_OMEGA + _G_ALPHA * (prev * prev) + _G_BETA * v
        prev = r.r
        assert math.isclose(
            got[(r.symbol, r.trading_day)],
            round(math.sqrt(v), 6),
            abs_tol=1e-9,
        ), (r.symbol, r.trading_day)
