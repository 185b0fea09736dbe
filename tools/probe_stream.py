"""Streaming e2e cost-structure probe (r15, VERDICT item 7): time each
stream_* query at two scale factors.  A wall that barely moves between
sf0.001 and sf0.1 (100x the data) is micro-batch fixed cost (trigger
scheduling, state-store commits, checkpoint fsyncs, landing-dir setup),
not data work — the per-operator table that says whether batch-side
tuning can matter at all.

Usage: python tools/probe_stream.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

STREAM_QUERIES = [
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
    "stream_vector_index_e2e",
]


def main() -> None:
    names = sys.argv[1:] or STREAM_QUERIES

    from quant_market_data_pipeline_spark.queries import load_all
    from quant_market_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe_stream")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    print("calib_start:", calib())
    print(f"{'query':34s} {'sf0.001':>8s} {'sf0.1':>8s} {'ratio':>6s}")
    for name in names:
        spec = registry[name]
        walls = {}
        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.spark(spark, sf).count()
            walls[sf] = round(time.perf_counter() - t0, 3)
        r = walls["/root/testdata/sf0.1"] / max(
            walls["/root/testdata/sf0.001"], 1e-9
        )
        print(
            f"{name:34s} {walls['/root/testdata/sf0.001']:8.3f} "
            f"{walls['/root/testdata/sf0.1']:8.3f} {r:6.2f}"
        )
    print("calib_end:", calib())


if __name__ == "__main__":
    main()
