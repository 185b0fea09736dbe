"""A/B bisect probe for the regional_revenue r9 regression (judge
directive #3).  Times a small headline subset exactly the way bench.py
does (1 cold + 3 warm, clearCache + System.gc between runs, median of
warm) against whichever repo tree is first on sys.path — run it once
from each tree, interleaved, to split code-linked cost from host drift.

Usage: python tools/bisect_probe.py <repo_root> [query ...]
Prints one JSON line {"root": ..., "queries": {name: {"median":
..., "min": ..., "runs": [...]}}, "calib": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    names = sys.argv[2:] or [
        "regional_revenue",
        "flagship_pair_zscore",
        "pricing_summary",
        "text_stats",
    ]
    sys.path.insert(0, root)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from quant_market_data_pipeline_spark.queries import load_all
    from quant_market_data_pipeline_spark.session import get_spark
    from quant_market_data_pipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="bisect_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for t in ("events", "lineitem", "orders", "documents", "embeddings"):
        load_table(spark, t, sf_dir).count()

    # same calibration loop shape as bench._calibrate: a fixed CPU-bound
    # spark job whose wall time tracks machine speed
    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    out: dict = {"root": root, "queries": {}, "calib_before": calib()}
    for name in names:
        spec = registry[name]
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        df = spec.spark(spark, sf_dir)
        df.count()  # cold
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.count()
            runs.append(round(time.perf_counter() - t0, 3))
        out["queries"][name] = {
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
            "runs": runs,
        }
    out["calib_after"] = calib()
    print("BISECT " + json.dumps(out))


if __name__ == "__main__":
    main()
