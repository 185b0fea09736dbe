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
    # --- round-5 window.  Everything checked in r1-r4 left the window
    #     (coverage is cumulative across rounds).  This window closes the
    #     driver-coverage gap: the 33 round-4c/4d queries registered
    #     after the r4 window froze, the round-4 red row (fixed), and
    #     queries whose oracle/output changed this round.
    # (a) the three BENCH headliners that shipped without a driver
    #     verdict (round-4 judge directive: they lead the window)
    "ks_source_drift",  # + oracle fix: double-cast n_a*n_b (overflow)
    "peak_concurrency_daily",
    "vwap_slippage_tca",
    # (b) the round-4 red row: partitionOverwriteMode=dynamic moved to
    #     _RUNTIME_CONF so the driver's external session runs the
    #     partition-overwrite sinks in dynamic mode (session.py), with
    #     static-mode guard asserts in every sink (sources/sink.py)
    "incremental_bar_refresh_e2e",
    # (c) lake-maintenance / governance e2e gates — same sinks as (b),
    #     so they are its regression net; user_erasure additionally
    #     covers the delete_rows fixes (fully-matched partition removal
    #     + SQL NULL-predicate DELETE semantics), retention_expiry the
    #     Hadoop-FileSystem expiry path, compaction + binaryfile their
    #     round-4 advisory oracle fixes
    "user_erasure_e2e",
    "retention_expiry_e2e",
    "compaction_e2e",
    "schema_evolution_scan_e2e",
    "binaryfile_media_scan_e2e",
    # (d) remaining never-driver-checked round-4c/4d queries
    "psi_price_drift",
    "hhi_supplier_concentration",
    "mad_outlier_ticks",
    "event_markov_transitions",
    "key_skew_gini",
    "copurchase_triangles",
    "hybrid_rrf_fusion",
    "shingle_novelty",
    "feature_hashing_long",
    "loo_target_encoding",
    "overnight_intraday_split",
    "underwater_streaks",
    "neardup_calibration",
    "langid_confusion",
    "forecast_backtest_mape",
    "embedding_quant_report",
    "session_path_topk",
    "stream_zscore_e2e",
    "position_pnl_daily",
    "freshness_staleness_audit",
    "referential_integrity_audit",
    "primary_key_audit",
    "weighted_sample_docs",
    "in_session_funnel",
    "tick_size_conformance",
    # (e) oracle upgraded rows-only -> hash-checked (WITH RECURSIVE
    #     reachability twin) after the r4 window froze — needs its first
    #     hash-checked driver verdict
    "dedup_components",
    # (f) new round-5 queries: microstructure spread estimators, tail
    #     risk, drift complements, training-data mixing, nearest as-of
    "roll_spread_estimator",
    "corwin_schultz_spread",
    "realized_vol_signature",
    "var_historical_es",
    "sampling_temperature_mix",
    "js_divergence_sources",
    "cusum_count_drift",
    "asof_join_nearest",
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
