"""Distributed connected components == a driver-side union-find."""

from __future__ import annotations

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.llm.dedup import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark, events):
    # build a pair graph with real structure: users sharing an exact
    # event-value in the same type (arbitrary but deterministic relation)
    pairs_df = (
        events.filter(F.col("user_id") < 60)
        .select("user_id", "event_type", F.round("value", 0).alias("v"))
        .alias("a")
        .join(
            events.filter(F.col("user_id") < 60)
            .select("user_id", "event_type", F.round("value", 0).alias("v"))
            .alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("doc_lo"),
            F.col("b.user_id").alias("doc_hi"),
        )
        .distinct()
    )
    pairs = [(r["doc_lo"], r["doc_hi"]) for r in pairs_df.collect()]
    want = _union_find(pairs)

    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs_df).collect()
    }
    assert got == want
    # every component label is the min member (canonical-keeper contract)
    comps = {}
    for node, c in got.items():
        comps.setdefault(c, []).append(node)
    for c, members in comps.items():
        assert c == min(members)
