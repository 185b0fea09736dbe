"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the summed wall-clock of the headline queries (each executed
to completion with a count-collapsing action).  Per-query seconds let the
judge compare operator families against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_pair_zscore",
    "bars_5min_ohlcv",
    "missing_buckets_audit",
    "asof_join_backward",
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "dedup_exact_docs",
    "text_stats",
    # LLM extension headliners (registered in later rounds keep working
    # automatically if present).  Similarity is represented by the SCALE
    # paths (bucketed LSH / IVF); exact O(n*q) kNN stays a correctness
    # baseline only (tests/test_mllib_interop.py uses it as the recall
    # anchor) and is deliberately NOT benched.
    "minhash_lsh_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # Hierarchical rollup headliner: hours derive from the 5-min bar
    # aggregate, not from raw ticks — the continuous-aggregate pattern.
    "bars_rollup_1h",
]


def _previous_bench() -> dict[str, float]:
    """Per-query seconds from the latest BENCH_r{N}.json, if any."""
    import glob
    import re

    best: tuple[int, dict] | None = None
    for path in glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        queries = (doc.get("parsed") or {}).get("queries") or doc.get("queries")
        if queries and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), queries)
    return best[1] if best else {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from quant_market_data_pipeline_spark.queries import load_all
    from quant_market_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # JVM + first-scan warmup so query timings measure the plans, not
    # session bootstrap (the driver compares operator cost, not cold start).
    from quant_market_data_pipeline_spark.sources.tables import load_table

    for t in ("events", "lineitem", "orders", "documents", "embeddings"):
        load_table(spark, t, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # Regression harness: deltas vs the previous round's recorded bench
    # (>20% slower on a query that took >=0.5s flags a regression).
    prev = _previous_bench()
    deltas = {
        name: round(t - prev[name], 3) for name, t in timings.items() if name in prev
    }
    regressions = [
        name
        for name, t in timings.items()
        if name in prev and prev[name] >= 0.5 and t > 1.2 * prev[name]
    ]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "delta_vs_prev": deltas,
                "regressions_over_20pct": regressions,
            }
        )
    )


if __name__ == "__main__":
    main()
