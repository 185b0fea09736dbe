"""Invariants for the round-2 TPC-H shapes (queries/tpch.py).

Oracle equivalence is covered by the DuckDB gate; these pin cross-query
conservation laws the SQL compare can't state (distribution mass, argmax
consistency, anti-join complement counts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.queries.tpch import (
    q_bracket_revenue,
    q_custdist,
    q_idle_rich,
    q_promo_revenue,
    q_top_supplier,
)
from quant_market_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_custdist_conserves_orders_and_customers(spark):
    dist = q_custdist(spark, SF_DIR).collect()
    n_customers = load_table(spark, "customer", SF_DIR).count()
    n_orders = load_table(spark, "orders", SF_DIR).count()
    assert sum(r.custdist for r in dist) == n_customers
    # every order belongs to an existing customer in the fixture, so the
    # weighted distribution mass recovers the order count exactly
    assert sum(r.c_count * r.custdist for r in dist) == n_orders


def test_top_supplier_is_argmax_of_independent_rollup(spark):
    top = q_top_supplier(spark, SF_DIR).collect()
    assert top
    revs = {r.total_revenue for r in top}
    assert len(revs) == 1  # ties all carry the identical max revenue
    li = load_table(spark, "lineitem", SF_DIR).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # plain-double recompute brackets the exact-decimal result
    best = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
        .agg(F.max("r"))
        .first()[0]
    )
    assert abs(revs.pop() - best) < 1e-2


def test_idle_rich_customers_complement_counts(spark):
    res = q_idle_rich(spark, SF_DIR)
    total = res.agg(F.sum("numcust")).first()[0] or 0
    cust = load_table(spark, "customer", SF_DIR)
    orders = load_table(spark, "orders", SF_DIR)
    with_orders = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
        .count()
    )
    # idle customers can never exceed the orderless population
    assert total <= cust.count() - with_orders


def test_promo_ratio_bounds_and_coverage(spark):
    rows = q_promo_revenue(spark, SF_DIR).collect()
    assert len(rows) == 12  # every ship month of 1997 has lineitems
    for r in rows:
        assert 0.0 <= r.promo_revenue <= r.total_revenue
        assert 0.0 <= r.promo_pct <= 100.0


def test_bracket_revenue_monotone_in_brackets(spark):
    row = q_bracket_revenue(spark, SF_DIR).first()
    assert row.n_items > 0 and row.revenue > 0
    # the disjunction can only keep a subset of the joined fact
    li_n = load_table(spark, "lineitem", SF_DIR).count()
    assert row.n_items < li_n


def test_q21_shape_semi_anti_no_nested_loop(spark):
    """waiting_supplier_q21's correlated EXISTS / NOT EXISTS must plan
    as a LeftSemi and a LeftAnti join keyed on l_orderkey (suppkey
    inequality as residual), with NO nested-loop join anywhere — the
    property that keeps the sole-blame shape hash-partitionable at
    100 TB."""
    from quant_market_data_pipeline_spark.queries import load_all

    df = load_all()["waiting_supplier_q21"].spark(
        spark, "/root/testdata/sf0.001"
    )
    df.count()  # executed plan (AQE-final)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
