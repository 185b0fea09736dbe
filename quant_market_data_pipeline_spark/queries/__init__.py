"""Query registry: named queries with DuckDB oracle twins.

Every operator family from SURVEY.md §2 (and the LLM-data extensions) is
exposed as a named query: a callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent ANSI-SQL string the DuckDB oracle runs
on the same parquet tables.  ``__spark_entry__.py`` re-exports this
registry to the correctness driver.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates that are sensitive to summation order are rounded to
  a fixed precision on BOTH sides (the comparison is on rounded values);
- timestamps are naive UTC on both sides (session tz pinned to UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry.

    Re-registering an existing name raises: a silent overwrite would
    let a new query SHADOW an old implementation while inheriting its
    green correctness history — registry corruption no gate would see.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(
                f"query {name!r} is already registered "
                f"(by {REGISTRY[name].spark.__module__}."
                f"{REGISTRY[name].spark.__qualname__}); duplicate "
                "registration would silently shadow it — pick a new name"
            )
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Registry iteration order doubles as the correctness-gate priority: a
# driver that verifies a prefix of the registry must see (a) queries whose
# oracle entries are new or recently fixed, (b) every query whose module
# was touched this round, before queries that already carry a green
# verdict from a prior round.
#
# ROTATION POLICY (steady state, every query driver-green cumulatively):
# each round's window = (a) queries NEW this round, (b) queries whose
# implementation, shared operator, or oracle was TOUCHED this round, and
# (c) a STALENESS-WEIGHTED re-confirmation sample over the untouched
# remainder, sized to fill every remaining driver slot (k = 50 - |a| -
# |b|; raised from a fixed 20 in r10 — a shorter list just cedes slots
# to registration order, which re-checks fresh queries while stale ones
# wait).  The sample guards against silent oracle drift that a
# touched-only window would miss.  r9 change (round-8 judge
# directive #5): the sample was a uniform seeded draw (md5("r{N}:" +
# name)), under which a never-touched query's expected re-check latency
# is unbounded; it is now ordered by rounds-since-last-driver-
# verification (oldest CORRECTNESS_r*.json verdict first), with the same
# md5 key only as the tiebreak within an equally-stale cohort.
# tools/staleness_sample.py recomputes the sample from the committed
# artifacts; tests/test_r9_infra.py pins section (c) against it.
_R9_NEW = [
    # the ANN recall-vs-cost grid (judge directive #1)
    "ann_tuning_sweep",
    # r9 operator batch
    "gopher_quality_flags",
    "cornish_fisher_var",
    "countmin_heavy_hitters",
    "minhash_search_topk",
    "bloom_filter_join_audit",
    "garch_11_vol",
]
_R9_TOUCHED = [
    # IVF retune 8 cells x 1 probe -> 32 x 2 (measured by the sweep);
    # ivf_topk gained the n_probe knob
    "ann_ivf_topk",
    "ann_ivf_recall_audit",
    # integer milli-score bin key replaces the rounded-double group key
    # (ADVICE r8: cross-engine representation boundary on a join key)
    "curriculum_stage_plan",
    # oracle restated in aggregated-division form (ADVICE r8: per-touch
    # vs per-type division rounds differently at ulp level)
    "attribution_time_decay",
    # heaps_beta +0.0 signed-zero collapse (found by the GROWN sf1.0
    # strict run: saturated vocab makes the slope a rounding-level zero)
    "heaps_law_fit",
    # three more grown-sf1.0 strict-run catches (all latent at small
    # SFs): label-packing radix 16 -> 64 (25 grown labels corrupted
    # ids), RANGE frame key unified to microsecond-exact unix_micros/
    # epoch_us (Spark truncated seconds vs DuckDB fractional epoch()),
    # and sql_fin's DuckDB decimal->double cast routed via VARCHAR
    # (direct cast is not correctly rounded past 2^53 unscaled;
    # pricing_summary is the representative caller — the helper change
    # is value-neutral at driver SF for every other caller, verified
    # by the full LOCAL sf0.001/sf0.1 strict re-runs)
    "hard_negative_mining",
    "range_frame_rolling_sum",
    "pricing_summary",
    # NOTE: session.materialize_corpus gained a persist-before-checkpoint
    # guard on the RELIABLE path (ADVICE r8 medium); with no checkpoint
    # dir configured — every driver/test/bench run — the local fallback
    # is byte-identical, so its ~50 callers are NOT window-inflated.
]
# (c) staleness-weighted sample, recomputed by
#     `python tools/staleness_sample.py 9 - 20` with (a)+(b) as stdin:
#     19 queries last verified in r1, one in r2 (the two oldest cohorts)
_R9_SAMPLE = [
    # recomputed after the grown-sf1.0 catches moved
    # range_frame_rolling_sum into (b): the next-stalest query
    # (max_drawdown, r2 cohort) takes its slot
    "token_count_bpe",
    "udtf_sentence_split",
    "winnow_fingerprints",
    "lang_id_heuristic",
    "doc_fingerprint",
    "knn_cosine_topk",
    "text_stats",
    "pair_comovement_stats",
    "media_resize_plan",
    "embedding_neardup_pairs",
    "calendar_completeness",
    "window_value_functions",
    "user_event_sequence",
    "dedup_exact_docs",
    "simhash_fingerprints",
    "value_histogram",
    "calendar_dim_join",
    "json_props_extract",
    "semi_join_heavy_orders",
    "max_drawdown",
]
# --- round 10 window -----------------------------------------------------
# r10 policy refinement: the sample fills EVERY driver slot the
# touched/new sections leave free (k = 50 - |a| - |b| = 39, vs the old
# fixed 20) — the driver verifies the first 50 of load_all(), so a
# shorter priority list just cedes slots to registration order, which
# re-checks fresh queries while stale ones wait.  This round drains the
# ENTIRE r2 cohort (33 queries) plus the 6 stalest of r3.
_R10_NEW = [
    "hll_distinct_audit",
    "quantile_histogram_audit",
    "stream_hll_distinct_e2e",
    "waiting_supplier_q21",
]
_R10_TOUCHED = [
    # corpus-adaptive hyperplane-LSH plane count (judge directive #2):
    # prefix-nested 12-bit families, stride-12 offsets, adaptive planes
    "ann_lsh_topk",
    "ann_lsh_mt_topk",
    "ann_recall_audit",
    "ann_mt_recall_audit",
    "hard_negative_mining",
    # 16-bit operating-range fail-fast guard (judge directive #4)
    "simhash_neardup_pairs",
    # lossless hot-band split (judge directive #6)
    "simhash60_neardup_pairs",
    # NOTE: bloom_filter_join_audit's oracle template now interpolates
    # _BF_LANE_BITS instead of a literal 63 (ADVICE r9) — the generated
    # SQL is byte-identical (proven at commit 85da8e5), so it is NOT
    # window-inflated; same for the check_oracle PROVENANCE line.
]
# (c) staleness-weighted sample, recomputed by
#     `python tools/staleness_sample.py 10 - 39` with (a)+(b) as stdin:
#     all 33 queries last driver-verified in r2, then the 6 stalest of
#     the r3 cohort (md5("r10:"+name) tiebreak within equal staleness)
_R10_SAMPLE = [
    "label_centroids",
    "pandas_udf_quality_score",
    "rollup_regional_revenue",
    "bars_rollup_1h",
    "intersect_buyer_event_users",
    "pivot_status_revenue",
    "token_lang_profile",
    "quality_filter_verdicts",
    "edit_distance_pairs",
    "forecast_revenue_change",
    "dq_run_summary",
    "stratified_sample_docs",
    "window_rank_suite",
    "nested_explode_bars",
    "explode_outer_shingles",
    "large_volume_orders",
    "shipping_priority",
    "returned_item_revenue",
    "order_priority_check",
    "range_join_view_purchase",
    "except_all_multiset",
    "above_avg_orders",
    "pii_redaction",
    "percentiles_quantity",
    "grouping_sets_revenue",
    "decimal_cast_sums",
    "dedup_keep_list",
    "full_outer_nation_coverage",
    "bar_returns_daily_vol",
    "except_churned_customers",
    "cumulative_monthly_revenue",
    "distinct_agg_parts",
    "cube_status_priority",
    "train_split_assignment",
    "grouped_agg_median_value",
    "idle_rich_customers",
    "approx_distinct_users",
    "promo_revenue_ratio",
    "bigram_conditional_probs",
]
# --- round 11 window -------------------------------------------------------
# Full-slot policy (r10): the window covers the driver's entire 50-query
# prefix — (a) new, (b) touched, (c) staleness-weighted fill.
_R11_NEW = [
    # incremental quantile-histogram maintenance (judge directive #4)
    "stream_quantile_e2e",
    # query-directed multi-probe LSH (judge directive #5): x16 recall
    # 1.0 at ~48 mean candidates/query
    "ann_lsh_mp_topk",
    "ann_mp_recall_audit",
    # skew-safe Q21 aggregate rewrite (stretch #8: AQE cannot split the
    # BUILD side of LeftSemi/LeftAnti — measured on a 2M-row hot order)
    "waiting_supplier_q21_skewsafe",
    # KMV / theta-sketch set ops (r11): the intersection-capable
    # cardinality sketch HLL has no register algebra for
    "kmv_set_ops_audit",
    # sorted-neighborhood near-dup pairs (r11): the fourth candidate-
    # generation family (bounded (w-1)*n candidates by construction)
    "snm_neardup_pairs",
    # incremental Count-Min maintenance (r11): third streamed sketch,
    # completing the merge-algebra trio (max / sum / sum)
    "stream_countmin_e2e",
    # z-order vs linear layout skipping audit (r11): measured file/row
    # pruning for a 2D box predicate under both layouts
    "zorder_skipping_audit",
    # incremental Bloom maintenance (r11): fourth streamed sketch,
    # fourth merge algebra (OR) — zero false negatives pinned
    "stream_bloom_e2e",
]
_R11_TOUCHED = [
    # ADVICE r10 (high): _HLL_NUM 2^43 -> 2^44 — every raw-branch HLL
    # estimate was exactly half; values change on BOTH engines, so the
    # driver must re-hash these
    "hll_distinct_audit",
    "stream_hll_distinct_e2e",
    # batch quantile audit: oracle now interpolates the shared
    # qh_bin_sql fragment (same SQL semantics, re-verified)
    "quantile_histogram_audit",
]
# (c) staleness-weighted sample, recomputed by
#     `python tools/staleness_sample.py 11 - 38` with (a)+(b) as stdin:
#     the full remaining r3 cohort (24) + the 14 stalest of r4 (the 5
#     slots the new r11 queries displaced come off the YOUNGEST tail)
_R11_SAMPLE = [
    "customer_order_distribution",
    "bpe_merge_candidates",
    "column_profile_lineitem",
    "k_anonymity_audit",
    "salted_hot_key_stats",
    "snapshot_diff_customers",
    "ewma_bounded",
    "nation_year_revenue",
    "sequence_packing_bins",
    "bollinger_bands",
    "rsi_14",
    "user_sessions_batch",
    "benford_totalprice_audit",
    "top_supplier_revenue",
    "stream_attribution_e2e",
    "vocab_top_ngrams",
    "decontamination_report",
    "revenue_mom_growth",
    "funnel_conversion",
    "per_source_quality",
    "market_share_q8",
    "sql_lateral_top2_orders",
    "group_concat_types",
    "variant_props_metrics",
    "garman_klass_vol",
    "dedup_rate_by_source",
    "rfm_segments",
    "winsorized_value_stats",
    "atr_14",
    "twap_daily",
    "copurchase_lift",
    "sharpe_sortino_daily",
    "approx_percentile_prices",
    "stochastic_14_3",
    "bm25_keyword_search",
    "price_decile_profile",
    "vwap_daily",
    "kyle_lambda_daily",
]
# --- round 12 window -------------------------------------------------------
_R12_NEW = [
    # incremental MinHash maintenance (judge directive #5): the fifth
    # streamed sketch, completing the merge algebras with element-wise
    # MIN; candidate set strict-equal to minhash_lsh_pairs (same oracle)
    "stream_minhash_e2e",
    # multi-pass sorted-neighborhood dedup (judge stretch #7): planted
    # re-rendering twins (prefix destroyed, suffix preserved) measured
    # reachable ONLY by the rotated suffix key — the per-pair
    # (pass1, pass2, family) output is the datapoint
    "snm_neardup_pairs_2pass",
    # incremental KMV/theta maintenance: the sixth streamed sketch and
    # the last distinct merge SHAPE (k-min-of-union order statistic) —
    # the one whose merged state supports intersection estimates
    "stream_kmv_e2e",
    # product quantization — the ANN memory tier: 64x compression
    # priced by the per-subspace reconstruction error and the
    # two-stage (ADC -> exact re-rank) recall audit
    "pq_reconstruction_report",
    "pq_adc_recall_audit",
    # IVF+PQ composed — the production index shape: cell pruning, ADC
    # over codes, exact re-rank; recall + n_cand price the whole
    # composition against the full-corpus exact ground truth
    "ann_ivfpq_recall_audit",
]
_R12_TOUCHED = [
    # ADVICE r11: read_amplification zero-guard (nullif / F.when) on
    # both engines — re-verified
    "zorder_skipping_audit",
    # corpus/oracle construction extracted into shared fragments
    # (lsh_corpus_shingled / MINHASH_LSH_ORACLE) for stream_minhash_e2e;
    # semantics identical, source touched, so the driver re-hashes it
    "minhash_lsh_pairs",
    # hash extracted into the shared kmv_hv_expr/_sql fragments for
    # stream_kmv_e2e; semantics identical, source touched, re-hashed
    "kmv_set_ops_audit",
]
# (c) staleness-weighted sample, recomputed by
#     `python tools/staleness_sample.py 12 - 41` with (a)+(b) as stdin:
#     the ENTIRE remaining r4 cohort (23 — judge Missing #3: drained)
#     + the 18 stalest of r5
_R12_SAMPLE = [
    "xsection_momentum_spread",
    "partitioned_lake_day_scan",
    "beta_vs_market",
    "quality_threshold_sweep",
    "embedding_cluster_quality",
    "rolling_beta_60",
    "token_entropy_by_source",
    "tick_rule_imbalance",
    "chisq_lang_source",
    "rolling_distinct_users_7d",
    "doc_lm_surprise",
    "zipf_slope_by_source",
    "bucketed_join_priority_revenue",
    "scd2_user_state_history",
    "tokenizer_fertility",
    "doc_chunk_plan",
    "amihud_illiquidity",
    "source_mix_plan",
    "bigram_pmi",
    "stream_sessionize_e2e",
    "pair_halflife",
    "stable_doc_enumeration",
    "deterministic_group_sample",
    "event_markov_transitions",
    "session_path_topk",
    "cusum_count_drift",
    "schema_evolution_scan_e2e",
    "psi_price_drift",
    "key_skew_gini",
    "underwater_streaks",
    "in_session_funnel",
    "referential_integrity_audit",
    "stream_zscore_e2e",
    "weighted_sample_docs",
    "embedding_quant_report",
    "vwap_slippage_tca",
    "feature_hashing_long",
    "hhi_supplier_concentration",
    "peak_concurrency_daily",
    "freshness_staleness_audit",
    "hybrid_rrf_fusion",
]
# --- round 13 window -------------------------------------------------------
_R13_NEW = [
    # k-means-trained PQ codebooks (judge directive #3): 5 Lloyd
    # iterations unrolled as a chained CTE on the oracle side, the
    # MLlib-style driver loop on the engine side — recall uplift and
    # the monotone distortion cut priced next to the id-sliced seed
    "pq_trained_recall_audit",
    "pq_trained_distortion_report",
    # adaptive IVF+PQ (judge directive #4): cells = ceil(sqrt(n))
    # derived from the data in both engines, refine cap scales with
    # n_cand — grown-sf1.0 recall 0.23 (fixed 32 cells) -> 0.933
    "ann_ivfpq_adaptive_recall_audit",
    # residual PQ / IVFADC proper: PQ of v - centroid(cell) with
    # per-(query, probed-cell) lookup tables; both encodings priced
    # against one shared ground truth — the corpus-dependent trade
    # measured, not assumed (residual wins where flat collapsed)
    "pq_residual_distortion_report",
    "ann_ivfpq_residual_recall_audit",
    # SQ8 scalar quantization — the middle memory tier (64 B/vector):
    # per-dimension 8-bit linear quantization, recall ~1.0 with NO
    # re-rank stage; completes the raw/SQ8/PQ quantization menu
    "sq8_recall_audit",
]
_R13_TOUCHED = [
    # shingle case-folding unification (judge directive #6): every
    # member of the shared lowered shingle/minhash constructions —
    # oracle and engine changed together, so the driver re-hashes all
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "jaccard_pairs_df_capped",
    "neardup_calibration",
    "minhash_search_topk",
    "minhash_recall_audit",
    "minhash_band_sweep",
    "containment_neardup_pairs",
    "stream_minhash_e2e",
]
# (c) staleness-weighted sample, recomputed by
#     `python tools/staleness_sample.py 13 - 34` with (a)+(b) as stdin:
#     the ENTIRE r5 remnant (7) + the ENTIRE r6 cohort (22 — judge
#     directive #5: both drained) + the 5 stalest of r7
_R13_SAMPLE = [
    "langid_confusion",
    "overnight_intraday_split",
    "loo_target_encoding",
    "primary_key_audit",
    "forecast_backtest_mape",
    "mad_outlier_ticks",
    "tick_size_conformance",
    "anomaly_zscore_counts",
    "obv_daily",
    "intraday_seasonality",
    "gap_fill_ffill",
    "regional_revenue",
    "position_pnl_daily",
    "asof_join_nearest",
    "cohort_retention",
    "small_qty_avg_revenue",
    "retention_expiry_e2e",
    "meanrev_backtest_5min",
    "compaction_e2e",
    "unpivot_ohlc",
    "realized_vol_signature",
    "nation_trade_volume",
    "window_rank_topn",
    "brand_supplier_stats",
    "user_erasure_e2e",
    "temporal_features",
    "session_window_stats",
    "return_autocorr",
    "asof_join_forward",
    "repetition_profile",
    "boilerplate_prefix_report",
    "event_study_car",
    "dup_span_coverage",
    "yang_zhang_vol",
]
# --- round 14 window -------------------------------------------------------
_R14_NEW = [
    # trained IVF coarse quantizer (judge directive #2): the r13 Lloyd
    # machinery at the 64-dim coarse level, with cell-population skew
    # under BOTH the id-sliced seed and the trained centroids reported
    # next to recall — the cells~sqrt(n) balance premise measured
    "ann_ivfpq_trained_recall_audit",
    # streamed vector-index maintenance (judge directive #5): per-batch
    # SQ8 encode + IVF assign with frozen index params via foreachBatch,
    # strict-pinned incremental == batch through the shared encoder
    "stream_vector_index_e2e",
    # OPQ-style rotation (judge stretch #7): fixed seeded near-
    # orthonormal rotation before subspace split, Lloyd-trained in
    # rotated space, priced against unrotated trained PQ on one
    # raw-space ground truth
    "opq_rotation_recall_audit",
]
_R14_TOUCHED = [
    # every streaming e2e query: per-query scratch creation moved into
    # _query_scratch (ADVICE r13 — pid-root mtime now reflects liveness
    # so the 24h sweep backstop cannot delete a live run's scratch)
    "stream_bars_5min_e2e",
    "stream_attribution_e2e",
    "stream_sessionize_e2e",
    "stream_zscore_e2e",
    "stream_crash_recovery_e2e",
    "stream_zscore_crash_e2e",
    "stream_rsi_e2e",
    "stream_vpin_e2e",
    "stream_hll_distinct_e2e",
    "stream_quantile_e2e",
    "stream_countmin_e2e",
    "stream_bloom_e2e",
    "stream_minhash_e2e",
    "stream_kmv_e2e",
    # SQ8 encoder factored into llm/similarity.py sq8_dim_stats/codes/
    # recon + SQ8_*_CTE fragments (shared with the streamed encoder)
    "sq8_recall_audit",
    # broadcast pin on the (symbol, day) VWAP dimension join — the r13
    # drift flag's mechanism (AQE threshold flip BHJ <-> SMJ)
    "vwap_slippage_tca",
]
# (c) staleness-weighted sample, recomputed by
#     `python tools/staleness_sample.py 14 - 31` with (a)+(b) as stdin:
#     the ENTIRE remaining r7 cohort (31 — judge directive #3: drained)
_R14_SAMPLE = [
    "media_codec_roundtrip",
    "corwin_schultz_spread",
    "js_divergence_sources",
    "hurst_rs_exponent",
    "binaryfile_media_scan_e2e",
    "embedding_outlier_scores",
    "vocab_coverage_curve",
    "pii_scrub_audit",
    "unigram_negative_sampling_table",
    "signal_rank_ic",
    "bracket_revenue",
    "purged_kfold_splits",
    "variance_ratio_test",
    "sampling_temperature_mix",
    "incremental_bar_refresh_e2e",
    "min_variance_pair_weights",
    "newey_west_tstat",
    "media_frame_sample",
    "triple_barrier_labels",
    "media_features",
    "var_historical_es",
    "vpin_toxicity",
    "matryoshka_overlap_audit",
    "roll_spread_estimator",
    "vol_regime_transitions",
    "macd_12_26_9",
    "bipower_jump_stats",
    "stl_decomposition_daily",
    "fama_macbeth_momentum",
    "ks_source_drift",
    "pca_power_iteration",
]
_PRIORITY = _R14_NEW + _R14_TOUCHED + _R14_SAMPLE


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: fills REGISTRY).

    Returns the registry re-ordered so priority queries (new/fixed oracle
    entries, bench headliners) come first; everything else follows in
    registration order with a green round-1 verdict already on file.
    """
    from quant_market_data_pipeline_spark.queries import (  # noqa: F401
        core,
        curation,
        drift,
        execution,
        graph,
        llm,
        pipeline_ops,
        quant,
        relational,
        risk,
        streaming_e2e,
        textprep,
        tpch,
    )

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
