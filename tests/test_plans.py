"""Physical-plan assertions: the scale properties the engine promises.

These tests pin the *plan shape*, not timings — the properties that decide
whether a query survives a 100x scale-up: dimension joins stay broadcast
(no all-to-all shuffle of the fact), filters and column pruning reach the
parquet scan, aggregation is partial (map-side combine), and per-doc
pipelines add no shuffle beyond the declared rebalance.
"""

from __future__ import annotations

import re

from quant_market_data_pipeline_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    # other test modules cache the shared fixtures; a matching cached plan
    # would replace the parquet scan with InMemoryRelation and hide the
    # pushdown/pruning evidence these tests assert on
    spark.catalog.clearCache()
    reg = load_all()
    df = reg[name].spark(spark, SF_DIR)
    # cached-plan descriptions under InMemoryRelation are how the cache
    # was BUILT, not scans the plan executes — strip before counting
    from quant_market_data_pipeline_spark.plans.inspect import (
        executed_plan_str,
    )

    return executed_plan_str(df)


def test_flagship_single_agg_shuffle_and_broadcast(spark):
    plan = _plan(spark, "flagship_pair_zscore")
    # leg membership joins map-side; no sort-merge join anywhere
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    # one agg shuffle + one window shuffle + AQE reads; never more
    assert plan.count("Exchange hashpartitioning") <= 2
    # tick scan prunes to the referenced columns only
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "ts",
        "event_type",
        "value",
        "event_id",
    }


def test_dim_joins_broadcast_and_partial_agg(spark):
    plan = _plan(spark, "regional_revenue")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    # partial + final hash aggregation (map-side combine before shuffle)
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull" in plan


def test_selective_predicate_reaches_scan(spark):
    plan = _plan(spark, "semi_join_heavy_orders")
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(l_quantity,45", plan)
    assert "LeftSemi" in plan


def test_winnowing_is_shuffle_free_beyond_rebalance(spark):
    plan = _plan(spark, "winnow_fingerprints")
    # per-doc sketching must not shuffle: only the declared round-robin
    # rebalance (absent on at-scale inputs) may appear
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange roundrobin") <= 1
    assert "Join" not in plan


def test_column_pruning_text_stats(spark):
    plan = _plan(spark, "text_stats")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, cols  # n_chars/lang/source pruned


def test_whole_stage_codegen_active(spark):
    # codegen stages render as "*(n) Operator" — only visible once AQE
    # finalizes the plan, so execute first
    reg = load_all()
    for q in ("pricing_summary", "regional_revenue"):
        df = reg[q].spark(spark, SF_DIR)
        df.collect()  # count() would plan a separate query execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, q
        assert re.search(r"\*\(\d+\)", plan), q


def test_no_cartesian_product_in_any_query(spark):
    """Global safety net: no registered query may plan an unconstrained
    CartesianProduct — the accidental-cross-join failure mode that is
    invisible at sf0.01 and fatal at 100 TB.  (Intentional small-side
    cross joins appear as BroadcastNestedLoopJoin and are allowed.)"""
    spark.catalog.clearCache()
    reg = load_all()
    offenders = []
    for name, spec in sorted(reg.items()):
        plan = spec.spark(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == [], offenders


def test_promo_broadcasts_part_and_pushes_shipdate(spark):
    plan = _plan(spark, "promo_revenue_ratio")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1
    # the ship-date range reaches the lineitem scan as pushed filters
    assert re.search(
        r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_shipdate", plan
    )


def test_decontamination_prunes_source_at_scan(spark):
    plan = _plan(spark, "decontamination_report")
    # eval-slice and train-slice predicates both reach parquet
    assert "EqualTo(source,src0)" in plan
    assert "Not(EqualTo(source,src0))" in plan
    assert "CartesianProduct" not in plan


def test_bollinger_single_window_exchange(spark):
    plan = _plan(spark, "bollinger_bands")
    # bar build shuffles on (symbol, bucket); the indicator window reuses
    # a symbol-keyed exchange — nothing else may shuffle
    assert plan.count("Exchange hashpartitioning") <= 2
    assert plan.count("Window") == 1


def test_cohort_join_shapes(spark):
    plan = _plan(spark, "cohort_retention")
    # cohort-size dim joins broadcast; user-keyed joins may shuffle
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_top_supplier_window_over_post_aggregate_frame(spark):
    plan = _plan(spark, "top_supplier_revenue")
    # the global-max window runs over the per-supplier aggregate (tiny),
    # never over the fact: exactly one agg shuffle feeds the window
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan


def test_market_share_q8_join_shapes(spark):
    plan = _plan(spark, "market_share_q8")
    # every dimension (part/supplier/customer/nation x2/region) broadcasts;
    # only the lineitem-orders fact join may shuffle
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_sessions_single_exchange(spark):
    plan = _plan(spark, "user_sessions_batch")
    # lag-window, running-sum window and the per-session aggregate all
    # reuse ONE user_id hash exchange — the property that makes
    # sessionization one shuffle over billions of events
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_ewma_single_window_over_bar_aggregate(spark):
    plan = _plan(spark, "ewma_bounded")
    # K lag terms + row_number share one window spec -> one Window op;
    # bar agg shuffle + symbol window exchange, nothing else
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bpe_topk_no_global_sort(spark):
    plan = _plan(spark, "bpe_merge_candidates")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_sequence_packing_one_shard_exchange(spark):
    plan = _plan(spark, "sequence_packing_bins")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_snapshot_diff_single_scan_no_join(spark):
    plan = _plan(spark, "snapshot_diff_customers")
    # both snapshots fold into one conditional aggregate: no join, one
    # custkey exchange, partial+final agg
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2


def test_k_anonymity_partial_agg(spark):
    plan = _plan(spark, "k_anonymity_audit")
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_is_shuffle_free_on_the_join_key(spark):
    """Bucketed layout co-locates the orders-lineitem join: with both
    sides written bucketBy(8, orderkey), the join needs NO Exchange on
    the join key -- the 100 TB layout-once / join-many pattern.
    Broadcast is disabled so the small test fixture exercises the same
    SortMergeJoin a fact-fact join plans at scale."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "bucketed_join_priority_revenue")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("SelectedBucketsCount: 8 out of 8") == 2
    assert "SortMergeJoin" in plan
    assert not re.search(
        r"Exchange hashpartitioning\((o_orderkey|l_orderkey)", plan
    )
    # the only exchange is the final per-priority aggregate
    assert plan.count("Exchange hashpartitioning") == 1


def test_partitioned_lake_scan_prunes_at_plan_time(spark):
    """The one-day query against the date-partitioned lake resolves its
    predicate against the directory tree: PartitionFilters carries the
    date equality, PushedFilters stays empty (nothing left to evaluate
    row-wise), and only the matching partition directory is scanned."""
    plan = _plan(spark, "partitioned_lake_day_scan")
    scan = plan[plan.index("FileScan") :]
    head = scan[: scan.index("ReadSchema")]
    assert "PartitionFilters: [" in head
    assert "2024-01-15" in head
    assert "PushedFilters: []" in head


def test_stable_enumeration_no_global_sort_on_fact(spark):
    plan = _plan(spark, "stable_doc_enumeration")
    # the single-partition exchange (global prefix-sum window) must exist
    # exactly once — and only for the |sources|-row counts frame; the
    # documents-sized side is windowed per source and joined broadcast
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastHashJoin" in plan
    assert re.search(r"hashpartitioning\(source", plan)


def test_pagerank_topk_no_global_sort(spark):
    plan = _plan(spark, "pagerank_one_iter")
    assert "TakeOrderedAndProject" in plan


def test_garman_klass_pushdown_and_partial_agg(spark):
    plan = _plan(spark, "garman_klass_vol")
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(value,0", plan)
    assert plan.count("HashAggregate") >= 2  # map-side partials


def test_threshold_sweep_single_scan(spark):
    plan = _plan(spark, "quality_threshold_sweep")
    # one documents scan feeds the whole six-threshold grid
    assert plan.count("FileScan parquet") == 1
    assert "Generate explode" in plan


def test_backtest_single_symbol_exchange(spark):
    plan = _plan(spark, "meanrev_backtest_5min")
    # bar agg + window + final agg share the symbol hash partitioning:
    # at most 2 hash exchanges (bar build on (symbol,bucket), window on
    # symbol, whose sort the final agg partials reuse)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_ks_drift_single_fact_agg(spark):
    # the corpus reduces ONCE: a checkpointed (source, n_chars) count
    # frame; the ECDF grid and the pair join run broadcast on that
    # dimension frame — no parquet re-scan, no sort-merge join
    plan = _plan(spark, "ks_source_drift")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 0
    # the materialized (persist-with-lineage) dimension frame is what
    # every branch reads
    assert "InMemoryTableScan" in plan


def test_psi_boundaries_broadcast_not_recomputed(spark):
    # the 1-row quantile-boundary frame broadcasts back to the fact scan;
    # bucket assignment is an in-row array filter, no per-row join
    plan = _plan(spark, "psi_price_drift")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_hhi_supplier_dim_broadcast(spark):
    plan = _plan(spark, "hhi_supplier_concentration")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # supplier + nation dims
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_mad_medians_broadcast_back(spark):
    # per-symbol median/MAD frames are dimension-sized broadcasts;
    # the fact table is never shuffled on a wide key
    plan = _plan(spark, "mad_outlier_ticks")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_triangle_census_no_cartesian(spark):
    plan = _plan(spark, "copurchase_triangles")
    assert "CartesianProduct" not in plan


def test_rrf_legs_are_topk_not_global_sort(spark):
    # both retrieval legs reduce via TakeOrderedAndProject before any
    # single-partition rank window
    plan = _plan(spark, "hybrid_rrf_fusion")
    assert plan.count("TakeOrderedAndProject") >= 2


def test_shingle_novelty_two_uniform_shuffles(spark):
    # first-seen agg + join-back, both keyed on the shingle string —
    # no pairwise/cartesian work anywhere
    plan = _plan(spark, "shingle_novelty")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_feature_hashing_vocab_rollup_partial_agg(spark):
    # per-doc vocab rollup partial-aggregates map-side before either
    # exchange; no join anywhere in the plan
    plan = _plan(spark, "feature_hashing_long")
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 levels
    assert "Join" not in plan


def test_loo_encoding_marginals_broadcast(spark):
    # category marginals come from a hash-agg and broadcast back —
    # never a window partitioned by the 5-value category key
    plan = _plan(spark, "loo_target_encoding")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_peak_concurrency_no_global_sort_on_deltas(spark):
    # the global running sum is sharded by day + offset broadcast; the
    # only single-partition exchange handles the #days-row offset frame
    plan = _plan(spark, "peak_concurrency_daily")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tca_single_tick_rule_window(spark):
    # one symbol-keyed window classifies ticks; the VWAP table is a
    # (symbol, day) aggregate joined back — never a second tick scan
    # shuffle beyond the agg + window exchanges
    plan = _plan(spark, "vwap_slippage_tca")
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan


def test_underwater_streaks_single_symbol_exchange(spark):
    # daily agg, peak window, island window, run agg and the final agg
    # all reuse the symbol partitioning: at most 2 hash exchanges
    plan = _plan(spark, "underwater_streaks")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_calibration_pairs_broadcast_into_shingle_join(spark):
    # the fingerprint-bounded candidate list broadcasts; exact Jaccard
    # work is bounded by candidate shingle rows, not corpus pairs
    plan = _plan(spark, "neardup_calibration")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_session_paths_one_user_exchange_then_topk(spark):
    # sessionization + step arrays reuse one user exchange; top-20 is
    # TakeOrderedAndProject, never a global sort of all paths
    plan = _plan(spark, "session_path_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_quant_report_no_joins_in_row_math(spark):
    # quantization + error math is all in-row array arithmetic: the only
    # shuffle is the #labels-row aggregate
    plan = _plan(spark, "embedding_quant_report")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_forecast_backtest_single_symbol_exchange(spark):
    plan = _plan(spark, "forecast_backtest_mape")
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") <= 2


def test_position_pnl_single_symbol_exchange(spark):
    # tick-rule lag, both running sums and the daily rollup share ONE
    # symbol-keyed exchange; no joins anywhere
    plan = _plan(spark, "position_pnl_daily")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# --- round-5/6 additions: spreads, tail risk, drift complements, mixing,
#     nearest as-of, stdlib codec ---------------------------------------


def test_asof_nearest_one_exchange_two_sorts(spark):
    """nearest = backward + forward candidates over ONE keyed exchange:
    the plan must show a single hashpartitioning shuffle feeding two
    window sorts (asc + desc) — never a second join or shuffle."""
    plan = _plan(spark, "asof_join_nearest")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_vol_signature_one_scan_two_exchanges(spark):
    """3 sampling widths from ONE tick scan (map-side array explode):
    one agg exchange on (width, symbol, bucket) + one window exchange on
    (width, symbol) — widths multiply rows map-side, not pipeline runs."""
    plan = _plan(spark, "realized_vol_signature")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_roll_and_cs_spreads_single_symbol_pipeline(spark):
    """Both spread estimators reduce ticks to bars once, then window on
    the symbol key: two exchanges (bar agg + window), no joins."""
    for name in ("roll_spread_estimator", "corwin_schultz_spread"):
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == 2, name
        assert "Join" not in plan, name


def test_var_quantile_frame_broadcasts(spark):
    """Historical VaR/ES: the per-symbol quantile cut joins back to the
    returns as a BROADCAST (the quantile frame is |symbols| rows) — the
    fact side is never sort-merge-shuffled against it."""
    plan = _plan(spark, "var_historical_es")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan


def test_js_divergence_dimension_joins_broadcast(spark):
    """JS divergence reduces the corpus ONCE to (source, bin) counts;
    the grid fill and the pair join both run broadcast on that
    dimension-sized frame — no sort-merge join anywhere."""
    plan = _plan(spark, "js_divergence_sources")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # the corpus scan happens ONCE (materialized (source,bin) reduction);
    # the final plan reads only the in-memory dimension frame
    assert plan.count("Scan parquet") == 0
    assert "InMemoryTableScan" in plan


def test_cusum_single_fact_reduction(spark):
    """CUSUM drift: the fact reduces once to (type, day) counts; the
    cumulative bridge runs on that dimension frame (two exchanges: agg
    + window), no joins back to the fact."""
    plan = _plan(spark, "cusum_count_drift")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_temperature_mix_bounded_global_aggs(spark):
    """Temperature mixing: one corpus hash-agg to the |sources| frame;
    the 2 global normalizers + broadcast cross joins run on that frame
    (SinglePartition exchanges are dimension-sized by construction)."""
    plan = _plan(spark, "sampling_temperature_mix")
    # corpus scanned once (materialized |sources| reduction); the final
    # plan reads only the in-memory dimension frame
    assert plan.count("Scan parquet") == 0
    assert "InMemoryTableScan" in plan
    assert plan.count("Exchange SinglePartition") <= 3
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan


def test_media_codec_narrow_pipeline(spark):
    """Codec round-trip is generate -> decode, both Arrow-batched narrow
    stages: NO shuffle of any kind in the plan."""
    plan = _plan(spark, "media_codec_roundtrip")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bench_plan_fingerprint_stable_across_runs(spark):
    """The bench regression gate relies on plan fingerprints to separate
    AQE plan flaps from environment noise — a fingerprint that differs
    between two executions of the SAME query would poison that evidence.
    Pins the normalization (exprIds, lambda/CSE counters, stage ids)."""
    from bench import _plan_fingerprint

    reg = load_all()
    for name in ("text_stats", "ks_source_drift"):
        fps = []
        for _ in range(2):
            spark.catalog.clearCache()
            df = reg[name].spark(spark, SF_DIR)
            df.count()
            fps.append(_plan_fingerprint(df))
        assert fps[0] is not None and fps[0] == fps[1], (name, fps)


def test_plans_md_marker_table_covers_registry():
    """PLANS.md must carry a plan-evidence row for EVERY registered query
    (round-7 directive: ~half the registry previously had no greppable
    pushdown/shuffle record, so a silent plan regression in an uncovered
    query — e.g. a broadcast becoming sort-merge — left no diff).  The
    marker table is regenerated by tools/explain_report.py; this test
    fails when a query is added without regenerating."""
    import os
    import re as _re

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md")
    with open(path) as f:
        text = f.read()
    section = text.split("## Registry plan markers", 1)
    assert len(section) == 2, "marker table section missing from PLANS.md"
    rows = _re.findall(r"^\| (\w+) \| ", section[1], flags=_re.M)
    table_names = set(rows) - {"query"}
    reg_names = set(load_all())
    missing = sorted(reg_names - table_names)
    stale = sorted(table_names - reg_names)
    assert not missing, f"queries without a marker row: {missing}"
    assert not stale, f"marker rows for unregistered queries: {stale}"
    # no row may have errored during generation
    assert "| ERROR |" not in section[1]


def test_triple_barrier_windowed_no_join(spark):
    """Triple-barrier labeling: the future high/low path rides ONE
    bounded window frame over the daily agg — no self-join, no range
    join, and the barrier scan is in-row array logic."""
    plan = _plan(spark, "triple_barrier_labels")
    assert "Join" not in plan
    # daily OHLC agg + window: two exchanges, both on the symbol key
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Window") >= 1


def test_yang_zhang_two_exchanges_no_join(spark):
    """Yang-Zhang vol: OHLC agg + one symbol-key window for lag(close);
    the moment agg rides the window partitioning."""
    plan = _plan(spark, "yang_zhang_vol")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_vocab_coverage_single_corpus_scan_topk(spark):
    """Coverage curve: ONE documents scan builds the materialized vocab
    frame; the global cut is TakeOrdered (per-partition heaps, no global
    sort exchange); the k-grid and total are broadcast."""
    plan = _plan(spark, "vocab_coverage_curve")
    # the corpus scan lives inside the materialized vocab frame
    # (executed_plan_str strips InMemoryRelation build subtrees); the
    # consuming plan must NOT re-scan the parquet outside the cache,
    # and both consumers read the cached frame
    assert plan.count("documents.parquet") == 0
    assert plan.count("InMemoryTableScan") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# --- round-7 additions: microstructure toxicity, jump stats, rank IC --


def test_vpin_single_symbol_exchange(spark):
    """VPIN: tick-rule lag + enumeration, the bucket rollup and the
    rolling VPIN window all share ONE symbol-keyed exchange (the rename
    to `symbol` happens before the window so alias-aware partitioning
    carries through the groupBy on (symbol, bucket_id))."""
    plan = _plan(spark, "vpin_toxicity")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_bipower_single_day_exchange(spark):
    """Bipower jump stats: return lag, adjacent-product lag and the day
    rollup share ONE (symbol, trading_day) exchange — no joins, one tick
    scan."""
    plan = _plan(spark, "bipower_jump_stats")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_rank_ic_dimension_only_cross_section(spark):
    """Rank IC: the tick fact reduces once in the (symbol, day) OHLC
    rollup; the signal/forward windows and the two cross-sectional rank
    windows run on the daily dimension frame (3 exchanges total), never
    re-scanning or joining the fact."""
    plan = _plan(spark, "signal_rank_ic")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 3
    assert "Join" not in plan


def test_attribution_no_self_join_one_user_exchange(spark):
    """Time-decay attribution: the oracle is a purchase x touch range
    join; the Spark plan must instead be ONE user-keyed window over a
    single event scan (trailing collect + in-row normalize) — no join
    operator of any kind, two exchanges total (window + final rollup)."""
    plan = _plan(spark, "attribution_time_decay")
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_hurst_block_windows_share_symbol_exchange(spark):
    """R/S analysis: the 3 block sizes explode the daily DIMENSION frame
    map-side; the block windows cluster on (symbol, sz, blk), which
    hash(symbol) satisfies — so beyond the OHLC rollup there is exactly
    ONE more exchange, and no join for the size grid."""
    plan = _plan(spark, "hurst_rs_exponent")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_event_study_single_fact_reduction_broadcast_only(spark):
    """Event-study CAR: the tick fact reduces ONCE into the materialized
    daily-return frame; market mean and sigma cuts join back broadcast —
    the final plan reads only the in-memory dimension frame and contains
    no sort-merge join."""
    plan = _plan(spark, "event_study_car")
    assert plan.count("Scan parquet") == 0
    assert "InMemoryTableScan" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 3


def test_dup_span_collapse_before_gram_exchange(spark):
    """Substring-dedup report: grams build in-row (no window), collapse
    to (doc, gram, k) with partial agg before any gram-keyed exchange,
    and the dup-set joins back without a cartesian; the whole pipeline
    is 4 exchanges."""
    plan = _plan(spark, "dup_span_coverage")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 4
    assert plan.count("Scan parquet") <= 2


def test_min_variance_materialized_dim_broadcast_pair_join(spark):
    """Pair min-variance: the tick fact reduces ONCE into the
    materialized daily-return frame; the pair alignment is a broadcast
    self-join of that dimension frame — zero parquet scans and zero
    shuffles in the final plan."""
    plan = _plan(spark, "min_variance_pair_weights")
    assert plan.count("Scan parquet") == 0
    assert "InMemoryTableScan" in plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_stl_seasonal_window_rides_symbol_exchange(spark):
    """STL decomposition: the (symbol, dow) seasonal window clusters on
    a superset of hash(symbol), so the whole decomposition adds exactly
    ONE exchange beyond the OHLC rollup — and no joins."""
    plan = _plan(spark, "stl_decomposition_daily")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_embedding_outliers_broadcast_stats_topk(spark):
    """Embedding outlier audit: the 64-row dimension-stats frame
    collapses to one broadcast row (the only exchange is its partial
    agg); scoring is in-row array math and the top-20 is a
    TakeOrderedAndProject, never a global sort."""
    plan = _plan(spark, "embedding_outlier_scores")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") <= 2


def test_ann_recall_audit_no_cartesian_no_smj(spark):
    """Recall audit: the exact side is the SAMPLED broadcast-nested-loop
    baseline (bounded by the 20-query contract), the LSH side the capped
    bucket join, and the compare joins broadcast — never a cartesian of
    the corpus with itself, never a sort-merge join."""
    plan = _plan(spark, "ann_recall_audit")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_minhash_recall_audit_broadcast_only(spark):
    """MinHash recall audit: sampled inverted-index exact side + the
    production banded LSH side, sizes and the candidate set join back
    broadcast — no sort-merge join, no cartesian."""
    plan = _plan(spark, "minhash_recall_audit")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_vol_regime_median_broadcast_back(spark):
    """Vol regimes: the per-symbol median frame joins back BROADCAST on
    the daily dimension frame; the transition lag rides the symbol
    window — no sort-merge join, one tick scan per consumer at most."""
    plan = _plan(spark, "vol_regime_transitions")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in plan


def test_r8_two_pass_reductions_scan_fact_once(spark):
    """Every r8 query whose math needs a second pass over its reduction
    (two-pass moments, universe gates, histogram join-backs, group
    membership joins) materializes the reduction — the final plan reads
    the cache/checkpoint, never a second parquet scan of the fact."""
    for name in (
        "ljung_box_returns",
        "realized_skew_kurtosis",
        "dow_seasonality_welch",
        "portfolio_turnover_cost",
        "kalman_hedge_beta",
        "curriculum_stage_plan",
        "dataset_card_by_source",
        "quality_dup_interaction",
        "tail_dependence_pairs",
        "heaps_law_fit",
        "bigram_entropy_rate",
        "shard_dedup_leakage",
    ):
        plan = _plan(spark, name)
        assert plan.count("Scan parquet") == 0, (name, plan[:2000])
        assert "SortMergeJoin" not in plan, name
    # band sweep: the signature build is checkpointed (zero re-scans),
    # but the 1-row twin-offset/sample-count aggregate legitimately
    # scans the pruned doc_id column once
    plan = _plan(spark, "minhash_band_sweep")
    assert plan.count("Scan parquet") <= 1, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_r8_single_pass_queries_one_scan_no_join(spark):
    """The single-consumer r8 reductions stay un-materialized: exactly
    one fact scan, join-free (or broadcast-only) plans."""
    for name, max_scans in (
        ("runs_test_updown", 1),
        ("ewma_vol_riskmetrics", 1),
        ("tick_clock_bars", 1),
        ("token_gini_concentration", 1),
        ("ic_decay_horizons", 1),
        ("kelly_sizing_daily", 1),
        ("almgren_chriss_schedule", 1),
    ):
        plan = _plan(spark, name)
        assert plan.count("Scan parquet") == max_scans, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
