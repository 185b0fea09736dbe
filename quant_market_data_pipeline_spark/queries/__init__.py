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
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Registry iteration order doubles as the correctness-gate priority: a
# driver that verifies a prefix of the registry must see (a) queries whose
# oracle entries are new or recently fixed, (b) every bench headliner,
# before queries that already carry a green verdict from a prior round.
_PRIORITY = [
    # --- round-4 window.  Everything checked in r1-r3 left the window
    #     (coverage is cumulative across rounds); what remains is (a)
    #     the late-r3 indicator suite the r3 window never reached, (b)
    #     queries whose OUTPUT changed this round, (c) new round-4
    #     operators.  All are locally strict-green at sf0.01 and sf0.1.
    # (a) indicator suite, committed after the r3 snapshot — never
    #     driver-checked
    "vwap_daily",
    "atr_14",
    "stochastic_14_3",
    "obv_daily",
    "macd_12_26_9",
    "beta_vs_market",
    # (b) changed round 4 — green verdicts must refresh:
    # ANN queries now cap the neighbor side per bucket (md5-ordered
    # probe limit; llm/similarity.py bucket_sample_cap) and score via
    # the per-bucket gemm — result sets changed with the cap
    "ann_lsh_topk",
    "ann_lsh_mt_topk",
    # sketch percentiles upgraded rows-only -> hash-checked (exact
    # values + within-tolerance booleans, approx_distinct_users style)
    "approx_percentile_prices",
    # MinHash family switched to one-md5 + k modular mixes (16x less
    # hashing CPU on the shingle stream) — signatures and pair sets
    # changed, verdicts must refresh
    "minhash_signatures",
    # (c) new round 4
    "twap_daily",
    "anomaly_zscore_counts",
    "rfm_segments",
    "price_decile_profile",
    "bigram_pmi",
    "source_mix_plan",
    "doc_chunk_plan",
    "stream_sessionize_e2e",
    # (c continued) added later in round 4
    "pair_halflife",
    "doc_lm_surprise",
    "copurchase_lift",
    "bucketed_join_priority_revenue",
    "winsorized_value_stats",
    "rolling_beta_60",
    "chisq_lang_source",
    "partitioned_lake_day_scan",
    "deterministic_group_sample",
    "token_entropy_by_source",
    "tick_rule_imbalance",
    "amihud_illiquidity",
    "zipf_slope_by_source",
    "scd2_user_state_history",
    "rolling_distinct_users_7d",
    "bm25_keyword_search",
    # (c continued) risk & strategy analytics suite
    "garman_klass_vol",
    "sharpe_sortino_daily",
    "return_autocorr",
    "xsection_momentum_spread",
    "engle_granger_pair",
    "meanrev_backtest_5min",
    # (c continued) corpus-preparation analytics
    "quality_threshold_sweep",
    "tokenizer_fertility",
    "containment_neardup_pairs",
    "embedding_cluster_quality",
    # (c continued) graph propagation + lake-maintenance e2e
    "pagerank_one_iter",
    "incremental_bar_refresh_e2e",
    # (c continued) final round-4 batch: microstructure + governance
    "lead_lag_xcorr",
    "kyle_lambda_daily",
    "dedup_rate_by_source",
    "stable_doc_enumeration",
    # (bench headliners rotate back into the window only while there is
    #  room after the never-checked set; this round the 50 slots are all
    #  new/changed queries — every headliner already carries a cumulative
    #  green driver verdict from r1-r3, so dropping out is safe)
    #
    # ROUND-5 ROTATION NOTE: the 33 round-4c/4d queries registered after
    # this window was frozen (drift.py: ks_source_drift psi_price_drift
    # hhi_supplier_concentration mad_outlier_ticks
    # event_markov_transitions key_skew_gini; graph.py:
    # copurchase_triangles; textprep.py: hybrid_rrf_fusion
    # shingle_novelty feature_hashing_long; pipeline_ops.py:
    # loo_target_encoding peak_concurrency_daily; quant.py:
    # overnight_intraday_split vwap_slippage_tca underwater_streaks;
    # llm.py: neardup_calibration langid_confusion; plus round-4d:
    # forecast_backtest_mape embedding_quant_report session_path_topk
    # schema_evolution_scan_e2e stream_zscore_e2e compaction_e2e
    # position_pnl_daily binaryfile_media_scan_e2e user_erasure_e2e
    # retention_expiry_e2e freshness_staleness_audit
    # referential_integrity_audit primary_key_audit weighted_sample_docs
    # in_session_funnel tick_size_conformance)
    # are locally strict-green at both SFs
    # (CORRECTNESS_LOCAL_*.json) and should head the r5 window.
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: fills REGISTRY).

    Returns the registry re-ordered so priority queries (new/fixed oracle
    entries, bench headliners) come first; everything else follows in
    registration order with a green round-1 verdict already on file.
    """
    from quant_market_data_pipeline_spark.queries import (  # noqa: F401
        core,
        drift,
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
