"""Microbenchmark: interpreted zip_with/aggregate fold vs an unrolled
left-associated expression chain (whole-stage-codegen-able) for dot and
l2_sq over array<double> — the guide §4 "cut interpreted-HOF CPU"
hypothesis for round 15.

Checks BIT-IDENTITY first (the unrolled chain must reproduce the fold's
doubles exactly — same ops, same order), then times both on a synthetic
pair volume comparable to the audit cross-joins.

Usage: python tools/probe_unroll.py [n_rows] [dim]
"""

from __future__ import annotations

import functools
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.session import get_spark


def fold_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def unrolled_dot(a, b, dim):
    return functools.reduce(
        lambda acc, i: acc + F.get(a, i) * F.get(b, i),
        range(dim),
        F.lit(0.0),
    )


def fold_l2(a, b):
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def unrolled_l2(a, b, dim):
    def term(i):
        d = F.get(a, i) - F.get(b, i)
        return d * d

    return F.round(
        functools.reduce(
            lambda acc, i: acc + term(i), range(dim), F.lit(0.0)
        ),
        6,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="probe_unroll")
    spark.sparkContext.setLogLevel("ERROR")

    mk = lambda seed: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.sin(F.col("id") * (i + F.lit(1.0)) + F.lit(float(seed)))
        ),
    )
    base = (
        spark.range(0, n, 1, 32)
        .select("id", mk(1).alias("a"), mk(2).alias("b"))
    )
    base = base.persist()
    base.count()

    # --- bit-identity gate -------------------------------------------------
    bad = (
        base.select(
            fold_dot(F.col("a"), F.col("b")).alias("f"),
            unrolled_dot(F.col("a"), F.col("b"), dim).alias("u"),
            fold_l2(F.col("a"), F.col("b")).alias("fl"),
            unrolled_l2(F.col("a"), F.col("b"), dim).alias("ul"),
        )
        .filter(
            (F.col("f") != F.col("u")) | (F.col("fl") != F.col("ul"))
        )
        .limit(5)
        .collect()
    )
    print("bit_identity:", "FAIL " + str(bad) if bad else "OK")

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def timeit(label, col):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            base.select(F.sum(col).alias("s")).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            f"{label}: median {statistics.median(runs):.3f}"
            f" runs {runs} calib {calib()}"
        )

    print("calib_start:", calib())
    for _ in range(2):
        timeit("fold_dot    ", fold_dot(F.col("a"), F.col("b")))
        timeit("unrolled_dot", unrolled_dot(F.col("a"), F.col("b"), dim))
        timeit("fold_l2     ", fold_l2(F.col("a"), F.col("b")))
        timeit("unrolled_l2 ", unrolled_l2(F.col("a"), F.col("b"), dim))


if __name__ == "__main__":
    main()
