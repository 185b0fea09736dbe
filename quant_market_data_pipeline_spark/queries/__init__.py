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
# (c) a seeded random 20-query re-confirmation sample over the untouched
# remainder (sort by md5("r{N}:" + name), take 20) — the sample guards
# against silent oracle drift that a touched-only window would miss.
_PRIORITY = [
    # --- round-7 window ---------------------------------------------
    # (a) new this round: the mid-flight-kill / checkpoint-replay gates
    # (bars chain + applyInPandasWithState ring-buffer state)
    "stream_crash_recovery_e2e",
    "stream_zscore_crash_e2e",
    "stream_rsi_e2e",
    #     plus the microstructure-toxicity / jump / signal-quality trio
    "vpin_toxicity",
    "bipower_jump_stats",
    "signal_rank_ic",
    #     and the research-layer trio: rescaled-range Hurst, event-study
    #     CAR, time-decay multi-touch attribution (join-free window form)
    "hurst_rs_exponent",
    "event_study_car",
    "attribution_time_decay",
    #     and the exact-substring dedup report (Lee et al. 13-grams)
    "dup_span_coverage",
    #     plus the portfolio/seasonality/embedding-quality trio
    "min_variance_pair_weights",
    "stl_decomposition_daily",
    "embedding_outlier_scores",
    #     and the ANN index-quality measurement (recall@3 vs exact)
    "ann_recall_audit",
    #     plus the streaming VPIN state machine (tick-rule last price,
    #     open-bucket fill and oi ring all carry across micro-batches)
    "stream_vpin_e2e",
    #     and the MinHash-LSH recall audit (exact-Jaccard ground truth)
    "minhash_recall_audit",
    #     and the 2-state volatility-regime Markov diagnostic
    "vol_regime_transitions",
    #     plus the planted-PII redaction audit, the dedup ACTION stage,
    #     cross-doc boilerplate detection and the variance-ratio test
    "pii_scrub_audit",
    "dedup_keeper_manifest",
    "boilerplate_prefix_report",
    "variance_ratio_test",
    "yang_zhang_vol",
    "triple_barrier_labels",
    "vocab_coverage_curve",
    #     plus roll_spread_estimator: covariance reworked onto exact
    #     decimal sums after a round-to-6 boundary flake at sf0.001
    "roll_spread_estimator",
    #     and the late-r7 additions: leakage-free CV split assignment,
    #     contrastive hard negatives, plus the quote-free high-low
    #     spread estimator the earlier r7 window missed
    "purged_kfold_splits",
    "hard_negative_mining",
    "corwin_schultz_spread",
    #     and the training-prep trio: distributed power iteration,
    #     HAC-robust significance, negative-sampling distribution
    "pca_power_iteration",
    "newey_west_tstat",
    "unigram_negative_sampling_table",
    "matryoshka_overlap_audit",
    "fama_macbeth_momentum",
    # (b) touched this round / targeted by the round-6 directives:
    #     - ANN pair: exits `weak` via the dispersion-proof bench gate
    #       (min-of-3 flags + plan fingerprints); re-confirm correctness
    "ann_lsh_mt_topk",
    "ann_ivf_topk",
    #     - localCheckpoint -> materialize_dim (persist-with-lineage)
    "ks_source_drift",
    "js_divergence_sources",
    "sampling_temperature_mix",
    "var_historical_es",
    #     - multimodal: sub-byte WAV guard + chunked frame sampling
    "media_features",
    "media_frame_sample",
    "media_codec_roundtrip",
    "binaryfile_media_scan_e2e",
    # (c) seeded re-confirmation sample (md5("r7:" + name), first 20 of
    #     the untouched remainder)
    "severity_classification",
    "stream_bars_5min_e2e",
    "topk_latest",
    "macd_12_26_9",
    "bracket_revenue",
    "repetition_profile",
    "incremental_bar_refresh_e2e",
    "above_avg_orders",
    "doc_lm_surprise",
    "window_rank_topn",
    "bar_returns_daily_vol",
    "variant_props_metrics",
    "bpe_merge_candidates",
    "market_share_q8",
    "dedup_first_per_bucket",
    "max_drawdown",
    "pandas_udf_quality_score",
    "shingle_novelty",
    "tfidf_top_terms",
    "salted_hot_key_stats",
]


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
