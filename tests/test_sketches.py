"""Sketch estimates bounded against their exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hll_within_rsd(spark):
    ev = load_table(spark, "events", SF_DIR)
    got = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(got) > 0
    for r in got:
        # rsd=0.01 -> generous 5% envelope (small-range correction zone)
        assert abs(r["est"] - r["exact"]) <= max(2, 0.05 * r["exact"]), r


def test_approx_percentile_close_to_exact(spark):
    orders = load_table(spark, "orders", SF_DIR)
    rows = orders.groupBy("o_orderstatus").agg(
        F.approx_percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), 10000
        ).alias("approx"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
    ).collect()
    assert len(rows) > 0
    for r in rows:
        a50, a90 = r["approx"]
        # GK with accuracy=10000 is near-exact at this scale
        assert abs(a50 - r["p50"]) <= 0.01 * abs(r["p50"]) + 1e-6
        assert abs(a90 - r["p90"]) <= 0.01 * abs(r["p90"]) + 1e-6
