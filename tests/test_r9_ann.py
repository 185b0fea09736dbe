"""Round-9 ANN tuning pins: the recall-vs-cost sweep and the IVF retune.

The DuckDB gate covers oracle equivalence; these tests pin the sweep's
internal consistency — the monotonicity a correct config grid must show
(more tables / a larger cap can only ADD candidates; more planes can
only REMOVE them) and cross-query agreement between the sweep's IVF
formulation (base-filter over one scored sample) and the production
``ivf_topk`` pipeline that ``ann_ivf_recall_audit`` measures.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sweep_rows(spark):
    from quant_market_data_pipeline_spark.queries.curation import (
        q_ann_tuning_sweep,
    )

    rows = q_ann_tuning_sweep(spark, SF_DIR).collect()
    return {(r.family, r.cfg): r for r in rows}


def test_sweep_covers_full_grid(sweep_rows):
    from quant_market_data_pipeline_spark.queries.curation import (
        _ANN_SWEEP_CAPS,
        _ANN_SWEEP_CELLS,
        _ANN_SWEEP_PLANES,
        _ANN_SWEEP_PROBES,
        _ANN_SWEEP_TABLES,
    )

    n_lsh = (
        len(_ANN_SWEEP_TABLES) * len(_ANN_SWEEP_PLANES) * len(_ANN_SWEEP_CAPS)
    )
    n_ivf = len(_ANN_SWEEP_CELLS) * len(_ANN_SWEEP_PROBES)
    assert len(sweep_rows) == n_lsh + n_ivf
    for r in sweep_rows.values():
        assert r.n_cand >= 0
        assert 0.0 <= r.recall_at_3 <= 1.0


def test_sweep_lsh_monotone_in_tables_and_cap(sweep_rows):
    """Candidates are a UNION over tables and a per-bucket sample up to
    cap, so n_cand and recall are non-decreasing in T (fixed p, cap) and
    n_cand is non-decreasing in cap (fixed T, p)."""
    from quant_market_data_pipeline_spark.queries.curation import (
        _ANN_SWEEP_CAPS,
        _ANN_SWEEP_PLANES,
        _ANN_SWEEP_TABLES,
    )

    for p in _ANN_SWEEP_PLANES:
        for cap in _ANN_SWEEP_CAPS:
            seq = [
                sweep_rows[("lsh", f"t{T}_p{p}_cap{cap}")]
                for T in sorted(_ANN_SWEEP_TABLES)
            ]
            for a, b in zip(seq, seq[1:]):
                assert b.n_cand >= a.n_cand
                assert b.recall_at_3 >= a.recall_at_3 - 1e-9
    for T in _ANN_SWEEP_TABLES:
        for p in _ANN_SWEEP_PLANES:
            seq = [
                sweep_rows[("lsh", f"t{T}_p{p}_cap{cap}")]
                for cap in sorted(_ANN_SWEEP_CAPS)
            ]
            for a, b in zip(seq, seq[1:]):
                assert b.n_cand >= a.n_cand


def test_sweep_lsh_planes_shrink_candidates(sweep_rows):
    """A longer sign prefix is a strictly finer bucketing: every p+2-bit
    collision is a p-bit collision, so (uncapped) candidates shrink as
    planes grow.  With the cap the sampled sets may differ, so pin the
    UNCAPPED-equivalent largest cap only."""
    from quant_market_data_pipeline_spark.queries.curation import (
        _ANN_SWEEP_CAPS,
        _ANN_SWEEP_PLANES,
        _ANN_SWEEP_TABLES,
    )

    cap = max(_ANN_SWEEP_CAPS)
    for T in _ANN_SWEEP_TABLES:
        seq = [
            sweep_rows[("lsh", f"t{T}_p{p}_cap{cap}")]
            for p in sorted(_ANN_SWEEP_PLANES)
        ]
        for a, b in zip(seq, seq[1:]):
            assert b.n_cand <= a.n_cand


def test_sweep_ivf_monotone_in_probes(sweep_rows):
    """Probing more cells only adds candidates (and recall)."""
    from quant_market_data_pipeline_spark.queries.curation import (
        _ANN_SWEEP_CELLS,
        _ANN_SWEEP_PROBES,
    )

    for C in _ANN_SWEEP_CELLS:
        seq = [
            sweep_rows[("ivf", f"c{C}_np{np_}")]
            for np_ in sorted(_ANN_SWEEP_PROBES)
        ]
        for a, b in zip(seq, seq[1:]):
            assert b.n_cand >= a.n_cand
            assert b.recall_at_3 >= a.recall_at_3 - 1e-9


def test_sweep_ivf_agrees_with_production_audit(spark, sweep_rows):
    """The sweep's (32 cells, 2 probes) point and the production
    ann_ivf_recall_audit measure the SAME config through two independent
    formulations (base-filter vs ivf_topk's probe join) — their
    micro-averaged recalls must agree exactly."""
    from quant_market_data_pipeline_spark.queries.llm import (
        _IVF_CELLS,
        _IVF_PROBE,
        q_ann_ivf_recall_audit,
    )

    audit = q_ann_ivf_recall_audit(spark, SF_DIR).collect()
    hits = sum(r.n_hit for r in audit)
    total = sum(r.n_exact for r in audit)
    sweep = sweep_rows[("ivf", f"c{_IVF_CELLS}_np{_IVF_PROBE}")]
    assert abs(sweep.recall_at_3 - hits / total) < 1e-6


def test_ivf_multiprobe_superset_improves_best_neighbor(spark):
    """np=2's candidate set contains np=1's (same cells ranked the same
    way), so each query's best found cosine can only improve."""
    from pyspark.sql import functions as F

    from quant_market_data_pipeline_spark.llm.similarity import ivf_topk
    from quant_market_data_pipeline_spark.queries.llm import _embeddings

    emb = _embeddings(spark, SF_DIR)
    pred = F.col("query_id") < 20

    def best(np_):
        rows = (
            ivf_topk(emb, n_centroids=32, query_pred=pred, k=1, n_probe=np_)
            .collect()
        )
        return {r.query_id: r.cos_sim for r in rows}

    b1, b2 = best(1), best(2)
    assert set(b1) <= set(b2)  # a probed query can only gain candidates
    for q, c1 in b1.items():
        assert b2[q] >= c1 - 1e-9
