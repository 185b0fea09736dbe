"""Bucketed tables co-locate join keys at WRITE time: a join between two
tables bucketed on the same key by the same bucket count needs NO exchange
— the shuffle is paid once at load, then every subsequent join is free.
The at-100-TB pattern for repeatedly-joined fact tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    orders = load_table(spark, "orders", SF_DIR)
    li = load_table(spark, "lineitem", SF_DIR)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        # force the shuffle-join path so the assertion is about bucketing,
        # not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("sum_qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself consumes bucketed scans directly: the only
        # exchange allowed is the one ABOVE the join for the final groupBy
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange hashpartitioning" not in join_part
        # results still correct vs the plain join
        want = (
            orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .collect()
        )
        got = {r["o_orderstatus"]: r["sum_qty"] for r in joined.collect()}
        for r in want:
            assert abs(got[r["o_orderstatus"]] - r["sum_qty"]) < 1e-6
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
