"""Invariants for the quant indicators and corpus-release queries.

Oracle equivalence is covered by the DuckDB gate; these pin the semantic
bounds the SQL compare can't state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.queries.llm import (
    q_decontamination,
    q_per_source_quality,
    q_train_split,
)
from quant_market_data_pipeline_spark.queries.quant import (
    q_bollinger_bands,
    q_intraday_seasonality,
    q_rsi_14,
)
from quant_market_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bollinger_band_ordering_and_breakout(spark):
    rows = q_bollinger_bands(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.lower_band <= r.mid <= r.upper_band
        # breakout flag agrees with the (rounded) band columns up to the
        # rounding slack of 1e-6 on each side
        if r.breakout == 1:
            assert r.close >= r.upper_band - 2e-6
        elif r.breakout == -1:
            assert r.close <= r.lower_band + 2e-6


def test_rsi_bounds(spark):
    stats = q_rsi_14(spark, SF_DIR).agg(
        F.min("rsi"), F.max("rsi"), F.count(F.lit(1))
    ).first()
    assert stats[2] > 0
    assert 0.0 <= stats[0] and stats[1] <= 100.0


def test_seasonality_covers_all_hours(spark):
    rows = q_intraday_seasonality(spark, SF_DIR).collect()
    hods = {r.hod for r in rows}
    assert hods <= set(range(24))
    # the fixture tick stream is around-the-clock: expect full coverage
    assert len(hods) == 24


def test_train_split_partitions_corpus(spark):
    rows = q_train_split(spark, SF_DIR).collect()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    frac = {r.split: r.n_docs / n_docs for r in rows}
    assert abs(frac.get("train", 0) - 0.8) < 0.1  # md5 buckets ~uniform
    assert set(frac) == {"train", "val", "test"}


def test_decontamination_excludes_eval_and_bounds(spark):
    rows = q_decontamination(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.source != "src0"
        assert 0 <= r.n_contaminated <= r.n_docs


def test_per_source_quality_fractions(spark):
    rows = q_per_source_quality(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.short_frac <= 1.0
        assert r.avg_tokens > 0 and r.n_langs >= 1


def test_source_overlap_matrix_shape(spark):
    from quant_market_data_pipeline_spark.queries.llm import q_source_overlap

    rows = q_source_overlap(spark, SF_DIR).collect()
    assert rows
    n_sources = (
        load_table(spark, "documents", SF_DIR).select("source").distinct().count()
    )
    assert len(rows) <= n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b  # upper triangle only
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_shared >= 1


def test_bollinger_matches_pandas_golden(spark):
    import numpy as np

    spark_rows = {
        (r.symbol, r.bar_ts): r
        for r in q_bollinger_bands(spark, SF_DIR).collect()
    }
    assert spark_rows
    from quant_market_data_pipeline_spark.queries.quant import _bars_close

    pdf = (
        _bars_close(spark, SF_DIR)
        .orderBy("symbol", "bar_ts")
        .toPandas()
    )
    for sym, g in pdf.groupby("symbol"):
        closes = g["close"].to_numpy()
        ts = list(g["bar_ts"])
        for i in range(19, len(closes)):
            win = closes[i - 19 : i + 1]
            mid = win.mean()
            sd = win.std(ddof=1)
            row = spark_rows[(sym, ts[i])]
            assert abs(row.mid - round(mid, 6)) <= 1e-6
            assert abs(row.upper_band - round(mid + 2 * sd, 6)) <= 1e-6
            assert abs(row.lower_band - round(mid - 2 * sd, 6)) <= 1e-6


def test_rsi_matches_pandas_golden(spark):
    import numpy as np

    spark_rows = {
        (r.symbol, r.bar_ts): r.rsi for r in q_rsi_14(spark, SF_DIR).collect()
    }
    assert spark_rows
    from quant_market_data_pipeline_spark.queries.quant import _bars_close

    pdf = (
        _bars_close(spark, SF_DIR).orderBy("symbol", "bar_ts").toPandas()
    )
    n_checked = 0
    for sym, g in pdf.groupby("symbol"):
        diffs = g["close"].diff().dropna().to_numpy()
        ts = list(g["bar_ts"])[1:]
        gains = np.where(diffs > 0, diffs, 0.0)
        losses = np.where(diffs < 0, -diffs, 0.0)
        for i in range(13, len(diffs)):
            ag = gains[i - 13 : i + 1].mean()
            al = losses[i - 13 : i + 1].mean()
            expect = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
            got = spark_rows[(sym, ts[i])]
            assert abs(got - round(expect, 6)) <= 1e-5
            n_checked += 1
    assert n_checked > 100


def test_funnel_is_monotone(spark):
    from quant_market_data_pipeline_spark.queries.core import (
        q_funnel_conversion,
    )

    row = q_funnel_conversion(spark, SF_DIR).first()
    assert row.n_view >= row.n_click >= row.n_purchase >= 0
    assert 0.0 <= row.view_to_purchase <= row.view_to_click <= 1.0


def test_cohort_week0_retention_is_full(spark):
    from quant_market_data_pipeline_spark.queries.core import (
        q_cohort_retention,
    )

    rows = q_cohort_retention(spark, SF_DIR).collect()
    assert rows
    week0 = [r for r in rows if r.week_offset == 0]
    assert week0
    # every user is active in their own first-seen week by construction
    for r in week0:
        assert r.n_active == r.cohort_size and r.retention == 1.0
    for r in rows:
        assert r.week_offset >= 0 and 0.0 < r.retention <= 1.0


def test_simhash60_twins_found_and_blocking_lossless(spark):
    from quant_market_data_pipeline_spark.queries.llm import q_simhash60
    from quant_market_data_pipeline_spark.sources.tables import load_table

    # twin ids are offset by max(doc_id)+1 (collision-proof at any SF)
    off = (
        load_table(spark, "documents", SF_DIR)
        .agg({"doc_id": "max"})
        .first()[0]
        + 1
    )
    rows = q_simhash60(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.hamming <= 3
    # the planted truncation twins dominate the pairs: near-identical
    # token multisets land within 3 bits
    twin_pairs = sum(1 for r in rows if r.doc_hi == r.doc_lo + off)
    assert twin_pairs >= 0.5 * len(rows)


def test_simhash60_lane_packing_matches_naive_bit_counts():
    """The lane-spread trick (nib * MULT) & MASK must place bit j of the
    nibble at lane position 16*j for all 16 nibble values, and summed
    lanes must equal naive per-bit counts."""
    from quant_market_data_pipeline_spark.llm.dedup import (
        _LANE_MASK,
        _LANE_MULT,
    )

    for nib in range(16):
        spread = (nib * _LANE_MULT) & _LANE_MASK
        for j in range(4):
            assert (spread >> (16 * j)) & 0xFFFF == (nib >> j) & 1
    # accumulated lanes count ones exactly (no cross-lane carries below
    # 65536 tokens)
    import random

    rng = random.Random(7)
    nibs = [rng.randrange(16) for _ in range(10_000)]
    acc = 0
    for nib in nibs:
        acc += (nib * _LANE_MULT) & _LANE_MASK
    for j in range(4):
        assert (acc >> (16 * j)) & 0xFFFF == sum(
            (nib >> j) & 1 for nib in nibs
        )


def test_simhash60_fingerprints_lane_packed_two_stage(spark):
    """The fingerprint stage plans exactly two exchanges — the per-doc
    vocabulary rollup on (doc_id, tok) (so each distinct token hashes
    once per doc) and the per-doc vote aggregate on doc_id — both
    partial-aggregated map-side, with the votes carried as 15
    lane-packed longs + count, not 60 per-bit buffers."""
    import re

    from quant_market_data_pipeline_spark.llm.dedup import (
        simhash60_fingerprints,
    )
    from quant_market_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    plan = (
        simhash60_fingerprints(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 2
    assert any("tok" in k for k in keys)  # vocab rollup exchange
    assert any("tok" not in k for k in keys)  # per-doc vote exchange
    assert "partial_sum" in plan  # map-side combine active
    # 15 lane sums + token count, not 60 per-bit counters
    assert plan.count("partial_sum") <= 16


def test_pair_halflife_mean_reverting_fixture(spark):
    from quant_market_data_pipeline_spark.queries.quant import (
        q_pair_halflife,
    )

    rows = q_pair_halflife(spark, SF_DIR).collect()
    assert {r.pair_name for r in rows} == {"click_view", "purchase_signup"}
    for r in rows:
        # synthetic spreads mean-revert: AR(1) slope negative, so the
        # half-life is defined and positive
        assert r.ar1_slope < 0
        assert r.halflife_bars is not None and r.halflife_bars > 0
        assert r.n_obs > 5
