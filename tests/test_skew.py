"""Salted join / aggregate == their unsalted twins (row-level parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def test_salted_join_parity(spark, events):
    # hot key: event_type 'click' dominates; join to a per-type dim
    dim = events.select("event_type").distinct().withColumn(
        "type_tag", F.upper("event_type")
    )
    plain = events.join(dim, ["event_type"]).select("event_id", "type_tag")
    salted = salted_join(
        events, dim, on=["event_type"], n_salts=4,
        deterministic_col="event_id",
    ).select("event_id", "type_tag")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_aggregate_parity(spark, events):
    plain = (
        events.groupBy("event_type")
        .agg(
            F.sum("value").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max("value").alias("mx"),
        )
    )
    salted = salted_aggregate(
        events,
        keys=["event_type"],
        partial_aggs={
            "total": F.sum("value"),
            "n": F.count(F.lit(1)),
            "mx": F.max("value"),
        },
        merge_aggs={
            "total": F.sum("total"),
            "n": F.sum("n"),
            "mx": F.max("mx"),
        },
        n_salts=4,
    )
    got = {r["event_type"]: r for r in salted.collect()}
    for r in plain.collect():
        g = got[r["event_type"]]
        assert g["n"] == r["n"]
        assert g["mx"] == r["mx"]
        assert abs(g["total"] - r["total"]) < 1e-6 * max(1.0, abs(r["total"]))
