"""Same-session ABAB probe: each query timed alternately with the
l2_sq dim-unroll ACTIVE (as committed) and DISABLED (monkeypatched back
to the fold), cancelling machine drift between the two sides.

Usage: python tools/probe_l2dim.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import quant_market_data_pipeline_spark.llm.similarity as sim
    from quant_market_data_pipeline_spark.queries import load_all
    from quant_market_data_pipeline_spark.session import get_spark
    from quant_market_data_pipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="probe_l2dim")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for t in ("documents", "embeddings"):
        load_table(spark, t, sf_dir).count()

    orig_l2 = sim.l2_sq

    def folded_l2(a, b, round_digits=6, dim=None):
        return orig_l2(a, b, round_digits, None)

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    print("calib_start:", calib())
    for name in names:
        spec = registry[name]
        res = {}
        for mode, fn in (("unroll", orig_l2), ("fold", folded_l2)):
            sim.l2_sq = fn
            spark.catalog.clearCache()
            spec.spark(spark, sf_dir).count()  # cold/warmup
            res[mode] = []
        for rep in range(3):
            for mode, fn in (("unroll", orig_l2), ("fold", folded_l2)):
                sim.l2_sq = fn
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                spec.spark(spark, sf_dir).count()
                res[mode].append(round(time.perf_counter() - t0, 3))
        sim.l2_sq = orig_l2
        print(
            f"{name}: unroll med {statistics.median(res['unroll']):.3f} "
            f"{res['unroll']} | fold med "
            f"{statistics.median(res['fold']):.3f} {res['fold']} "
            f"| calib {calib()}"
        )


if __name__ == "__main__":
    main()
