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
    # automatically if present).
    "minhash_lsh_pairs",
    "knn_cosine_topk",
]


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
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
