"""Corpus-preparation analytics properties (queries/textprep.py)."""

from __future__ import annotations

from quant_market_data_pipeline_spark.queries.textprep import (
    q_containment_pairs,
    q_embedding_cluster_quality,
    q_quality_threshold_sweep,
    q_tokenizer_fertility,
)

SF_DIR = "/root/testdata/sf0.001"


def test_threshold_sweep_monotone(spark):
    rows = {
        r.min_chars: r for r in q_quality_threshold_sweep(spark, SF_DIR).collect()
    }
    thresholds = sorted(rows)
    assert len(thresholds) == 6
    for lo, hi in zip(thresholds, thresholds[1:]):
        # stricter gate can only shrink survival and token retention
        assert rows[hi].n_surviving <= rows[lo].n_surviving
        assert rows[hi].token_retention <= rows[lo].token_retention + 1e-9
        assert 0.0 <= rows[hi].survival_rate <= 1.0


def test_fertility_positive_and_words_bound_pieces(spark):
    rows = q_tokenizer_fertility(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.chars_per_piece > 0
        # BPE pre-tokenizer splits inside words, never merges across
        # whitespace => at least one piece per word
        assert r.pieces_per_word >= 1.0


def test_containment_dominates_jaccard_and_twins_score_one(spark):
    rows = q_containment_pairs(spark, SF_DIR).collect()
    assert rows, "planted truncation twins must produce pairs"
    saw_full = False
    for r in rows:
        assert r.containment >= r.jaccard - 1e-9
        assert 0.6 <= r.containment <= 1.0 + 1e-9
        if r.containment >= 0.999999:
            saw_full = True
    # a 10-token-truncated twin's shingle set is a subset of its source:
    # at least one pair must have containment exactly 1
    assert saw_full


def test_cluster_quality_bounds(spark):
    rows = q_embedding_cluster_quality(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_vecs >= 1
        assert -1.0001 <= r.mean_own_cos <= 1.0001
        assert 0.0 <= r.frac_cohesive <= 1.0


def test_dedup_rate_bounds(spark):
    from quant_market_data_pipeline_spark.queries.textprep import (
        q_dedup_rate_by_source,
    )

    rows = q_dedup_rate_by_source(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert 0.0 <= r.dup_rate <= 1.0


def test_stable_enumeration_is_contiguous_and_ordered(spark):
    from quant_market_data_pipeline_spark.queries.textprep import (
        q_stable_doc_enumeration,
    )

    rows = q_stable_doc_enumeration(spark, SF_DIR).collect()
    assert rows
    ids = sorted(r.global_id for r in rows)
    assert ids == list(range(1, len(rows) + 1))
    by_gid = sorted(rows, key=lambda r: r.global_id)
    keys = [(r.source, r.doc_id) for r in by_gid]
    assert keys == sorted(keys)


def test_vocab_coverage_curve_monotone(spark):
    from quant_market_data_pipeline_spark.queries.textprep import (
        _COV_KS,
        q_vocab_coverage_curve,
    )

    rows = sorted(
        q_vocab_coverage_curve(spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == sorted(_COV_KS)
    prev_cov, prev_tok = 0.0, 0
    for r in rows:
        assert r.vocab_used <= r.k
        assert 0 < r.coverage <= 1.0
        assert r.coverage >= prev_cov
        assert r.covered_tokens >= prev_tok
        prev_cov, prev_tok = r.coverage, r.covered_tokens
