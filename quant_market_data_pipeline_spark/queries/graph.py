"""Graph propagation and lake-maintenance e2e gates.

`pagerank_one_iter` adds the iterative-graph-algorithm family (one
deterministic power-iteration step, the building block dedup_components'
label propagation loops): edge generation is bounded by cart size, the
propagation is two hash-aggregations — the exact shape GraphX/Pregel
compiles to, expressed as plain DataFrame ops.

`incremental_bar_refresh_e2e` driver-gates the continuous-aggregate
maintenance plan (plans/incremental.py): late ticks must refresh ONLY
their touched partitions, and the refreshed lake must be byte-equal to a
full rebuild.  The reference full-table-overwrites on every run
(/root/reference/project/transform_data.py); the incremental path is what
survives 100 TB.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.plans.incremental import (
    refresh_bars_incremental,
)
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import (
    configure_runtime,
    materialize_corpus,
)
from quant_market_data_pipeline_spark.sources.sink import write_partitioned
from quant_market_data_pipeline_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# One PageRank power-iteration step over the co-purchase graph.
# ---------------------------------------------------------------------------
@register(
    "pagerank_one_iter",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey != b.l_partkey
  GROUP BY 1, 2
), outdeg AS (
  SELECT src, sum(w) AS total_w FROM edges GROUP BY src
), pr AS (
  SELECT e.dst AS part_key,
         round(0.15 + 0.85 * sum(e.w / d.total_w), 6) AS pagerank
  FROM edges e JOIN outdeg d ON e.src = d.src
  GROUP BY e.dst
)
SELECT part_key, pagerank,
       row_number() OVER (ORDER BY pagerank DESC, part_key) AS rank
FROM pr
ORDER BY pagerank DESC, part_key
LIMIT 100
""",
    doc="One deterministic PageRank power-iteration step (damping 0.85, "
    "uniform start pr0=1) over the part co-purchase graph.  Edge "
    "generation self-joins the distinct (order, part) edge list on "
    "orderkey — the per-key quadratic is bounded by cart size, exactly "
    "the bound every scalable graph build needs.  The step itself is "
    "two hash shuffles (out-degree agg on src, contribution agg on dst) "
    "— the Pregel superstep shape; a full PageRank loops this with the "
    "materialize_corpus-per-round convention dedup_components uses.  "
    "Top-100 plans as TakeOrderedAndProject, no global sort.",
)
def q_pagerank_one_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = materialize_corpus(li)  # both self-join sides
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    edges = materialize_corpus(edges)  # outdeg + contribution
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("total_w"))
    pr = (
        edges.join(outdeg, "src")
        .groupBy(F.col("dst").alias("part_key"))
        .agg(
            F.round(
                0.15 + 0.85 * F.sum(F.col("w") / F.col("total_w")), 6
            ).alias("pagerank")
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pagerank").desc(), "part_key")
    return (
        pr.withColumn("rank", F.row_number().over(w))
        .orderBy(F.col("pagerank").desc(), "part_key")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Incremental bar-lake refresh, end to end against a full-rebuild oracle.
# ---------------------------------------------------------------------------
_SCRATCH = Path(__file__).resolve().parents[2] / ".incr_e2e"
_LATE_DAY = "2024-01-15"


@register(
    "incremental_bar_refresh_e2e",
    oracle=f"""
SELECT event_type AS symbol,
       time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
       arg_min(value, ts) AS open, max(value) AS high,
       min(value) AS low, arg_max(value, ts) AS close,
       CAST(count(*) AS BIGINT) AS volume
FROM events
GROUP BY 1, 2
""",
    doc="Driver gate for the incremental continuous-aggregate plan "
    "(plans/incremental.py): the tick lake lands WITHOUT day "
    f"{_LATE_DAY}, the bar lake is built from it, then the missing "
    "day arrives late and refresh_bars_incremental folds it in — "
    "appending only that partition and dynamic-partition-overwriting "
    "only that day's bars (touched-date pruning; "
    "tests/test_incremental.py pins that untouched partitions keep "
    "their files).  The returned lake must equal the full batch "
    "rebuild over ALL ticks — the oracle — proving the incremental "
    "path converges to batch semantics.  Cost scales with the late "
    "span, never table size.",
)
def q_incremental_refresh_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    ticks = load_table(spark, "events", sf_dir).select(
        "event_id",
        "ts",
        F.col("event_type").alias("symbol"),
        F.col("value").alias("price"),
    )
    late_day = F.lit(_LATE_DAY).cast("date")
    on_time = ticks.filter(F.to_date("ts") != late_day)
    late = ticks.filter(F.to_date("ts") == late_day)

    base = _SCRATCH / Path(sf_dir.rstrip("/")).name
    shutil.rmtree(base, ignore_errors=True)
    tick_lake = str(base / "ticks")
    bar_lake = str(base / "bars")

    from quant_market_data_pipeline_spark.operators.bars import build_bars

    on_time.withColumn("trading_date", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("trading_date").parquet(tick_lake)
    initial = build_bars(
        spark.read.parquet(tick_lake),
        key="symbol",
        ts="ts",
        price="price",
        width="5 minutes",
        tiebreak="event_id",
    )
    write_partitioned(initial, bar_lake, ts_col="bar_ts")

    refresh_bars_incremental(
        spark,
        tick_lake,
        bar_lake,
        late,
        key="symbol",
        ts="ts",
        price="price",
        width="5 minutes",
        tiebreak="event_id",
    )
    return spark.read.parquet(bar_lake).select(
        "symbol", "bar_ts", "open", "high", "low", "close",
        F.col("volume").cast("bigint").alias("volume"),
    )


# ---------------------------------------------------------------------------
# Triangle census + global clustering coefficient of the co-purchase graph.
# ---------------------------------------------------------------------------
@register(
    "copurchase_triangles",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS lo, b.l_partkey AS hi
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
), deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT lo AS v FROM edges UNION ALL SELECT hi FROM edges) u
  GROUP BY 1
), tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.lo = e1.hi
  JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
)
SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT sum(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
       n_triangles,
       round(CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0
                  THEN 3.0 * n_triangles
                       / (SELECT sum(d * (d - 1) / 2) FROM deg)
                  ELSE 0.0 END, 6) AS global_clustering
FROM tri
""",
    doc="Triangle census of the support-thresholded co-purchase graph "
    "(edges = part pairs bought together in >= 2 orders) plus the "
    "global clustering coefficient 3*triangles/wedges.  Scale design: "
    "the support-2 cut is what makes triangle counting tractable on a "
    "transaction graph — raw co-occurrence edges grow with cart-size^2 "
    "x orders, while support-thresholded edges converge to the stable "
    "product-affinity graph; the enumeration joins keep every edge in "
    "canonical lo<hi orientation so each triangle counts exactly once "
    "(the standard distributed triangle algorithm; a degree-ordered "
    "orientation drops the worst-case join fan-out to O(E^1.5) at "
    "scale).  Wedges come from the degree aggregate, not a join.",
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = materialize_corpus(li)  # both self-join sides
    a = li.select("l_orderkey", F.col("l_partkey").alias("lo"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("hi"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("lo") < F.col("hi"))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .drop("support")
    )
    edges = materialize_corpus(edges)  # three join legs + degrees
    deg = (
        edges.select(F.col("lo").alias("v"))
        .unionAll(edges.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias(
            "n_wedges"
        )
    )
    n_edges = edges.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )
    e1 = edges.select(F.col("lo").alias("va"), F.col("hi").alias("vb"))
    e2 = edges.select(F.col("lo").alias("vb"), F.col("hi").alias("vc"))
    e3 = edges.select(F.col("lo").alias("va"), F.col("hi").alias("vc"))
    tri = (
        e1.join(e2, "vb")
        .join(e3, ["va", "vc"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        tri.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(wedges))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("global_clustering"),
        )
    )


# ---------------------------------------------------------------------------
# Lake schema evolution, end to end: old readers' files + new columns.
# ---------------------------------------------------------------------------
_EVO_SCRATCH = Path(__file__).resolve().parents[2] / ".schema_evo"


@register(
    "schema_evolution_scan_e2e",
    oracle="""
SELECT CASE WHEN event_id % 2 = 1 THEN 'v2' END AS source_feed,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(event_id) AS BIGINT) AS min_id,
       CAST(max(event_id) AS BIGINT) AS max_id
FROM events GROUP BY 1
""",
    doc="Driver gate for lake schema evolution: half the events land as "
    "v1 files (event_id, ts, value), the other half as v2 files with "
    "an added source_feed column; one mergeSchema read reconciles the "
    "directory — v1 rows surface with NULL source_feed, no rewrite of "
    "old files, which is the only affordable evolution policy at "
    "100 TB (a backfill rewrite of petabytes per added column is not). "
    " The oracle derives the same split from event parity on the flat "
    "table.  Footer-schema merging costs one metadata pass at plan "
    "time; row data is read once.",
)
def q_schema_evolution_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "value"
    )
    base = _EVO_SCRATCH / Path(sf_dir.rstrip("/")).name
    shutil.rmtree(base, ignore_errors=True)
    lake = str(base / "events_lake")
    v1 = ev.filter(F.col("event_id") % 2 == 0)
    v2 = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "source_feed", F.lit("v2")
    )
    v1.write.mode("append").parquet(lake)
    v2.write.mode("append").parquet(lake)
    merged = spark.read.option("mergeSchema", "true").parquet(lake)
    return merged.groupBy("source_feed").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction, end to end: data is byte-identical, files shrink.
# ---------------------------------------------------------------------------
_COMPACT_SCRATCH = Path(__file__).resolve().parents[2] / ".compact_e2e"


@register(
    "compaction_e2e",
    oracle="""
SELECT CAST(ts AS DATE) AS trading_date,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(event_id) AS BIGINT) AS min_id,
       CAST(max(event_id) AS BIGINT) AS max_id,
       TRUE AS files_reduced
FROM events GROUP BY 1
""",
    doc="Driver gate for lake-maintenance compaction "
    "(sources/sink.py:compact_partitions): the tick lake lands "
    "deliberately fragmented (16 shuffled files per day partition — the "
    "shape streaming sinks accrete), compaction rewrites each day to "
    "ONE file via the same dynamic partition overwrite the writers use, "
    "and the gate checks BOTH properties: per-day data is unchanged "
    "(count/min/max vs the flat-table oracle) and every partition's "
    "file count actually dropped (files_reduced, asserted per day from "
    "the directory listing).  Small-file debt is the silent scan tax "
    "at 100 TB — per-file open/footer costs dominate once partitions "
    "fragment into thousands of files.",
)
def q_compaction_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from quant_market_data_pipeline_spark.sources.sink import (
        compact_partitions,
    )

    configure_runtime(spark)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", F.to_date("ts").alias("trading_date")
    )
    base = _COMPACT_SCRATCH / Path(sf_dir.rstrip("/")).name
    shutil.rmtree(base, ignore_errors=True)
    lake = str(base / "ticks")
    ev.repartition(16).write.partitionBy("trading_date").parquet(lake)

    def _files_per_day() -> dict[str, int]:
        out = {}
        for d in os.listdir(lake):
            if d.startswith("trading_date="):
                out[d] = sum(
                    1
                    for f in os.listdir(os.path.join(lake, d))
                    if f.endswith(".parquet")
                )
        return out

    before = _files_per_day()
    compact_partitions(
        spark, lake, partition_col="trading_date", files_per_partition=1
    )
    after = _files_per_day()
    # a day that landed as a single file compacts 1 -> 1; "reduced"
    # means the count dropped OR was already at the target floor
    reduced = {
        d.split("=", 1)[1]: after[d] < before[d] or before[d] <= 1
        for d in before
    }
    reduced_df = spark.createDataFrame(
        [(k, v) for k, v in sorted(reduced.items())],
        "trading_date string, files_reduced boolean",
    ).select(
        F.col("trading_date").cast("date").alias("trading_date"),
        "files_reduced",
    )
    return (
        spark.read.parquet(lake)
        .groupBy("trading_date")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("event_id").cast("bigint").alias("min_id"),
            F.max("event_id").cast("bigint").alias("max_id"),
        )
        .join(F.broadcast(reduced_df), "trading_date")
    )


# ---------------------------------------------------------------------------
# Binary-file media landing scan, end to end.
# ---------------------------------------------------------------------------
_MEDIA_SCRATCH = Path(__file__).resolve().parents[2] / ".media_e2e"


@register(
    "binaryfile_media_scan_e2e",
    oracle="""
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS h
FROM documents WHERE doc_id < 50
""",
    doc="Driver gate for the binary media-ingest source: 50 landing blobs "
    "(one per document, content = the doc's UTF-8 bytes — a stand-in "
    "for image/audio payloads) are read back through Spark's "
    "``binaryFile`` format, ids parsed from filenames, and per-blob "
    "byte length + md5 checked against the documents table.  This is "
    "the ingest seam the multimodal queries (media_features / "
    "media_frame_sample) consume downstream: at 100 TB the binaryFile "
    "source lists and reads blobs distributively, metadata "
    "(path/length/modtime) comes from the listing without touching "
    "content, and the content column feeds Arrow-batched decoders.",
)
def q_binaryfile_media_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    base = _MEDIA_SCRATCH / Path(sf_dir.rstrip("/")).name
    shutil.rmtree(base, ignore_errors=True)
    media = base / "media"
    media.mkdir(parents=True)
    for row in docs.collect():  # 50 tiny blobs: landing setup, not a plan
        (media / f"{row['doc_id']:06d}.bin").write_bytes(
            row["text"].encode("utf-8")
        )
    blobs = spark.read.format("binaryFile").load(str(media))
    return blobs.select(
        F.regexp_extract(
            F.col("path"), r"(\d+)\.bin$", 1
        ).cast("bigint").alias("doc_id"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("h"),
    )


# ---------------------------------------------------------------------------
# GDPR user erasure + retention expiry, end to end.
# ---------------------------------------------------------------------------
_GOV_SCRATCH = Path(__file__).resolve().parents[2] / ".governance_e2e"


@register(
    "user_erasure_e2e",
    oracle="""
SELECT CAST(ts AS DATE) AS trading_date,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE user_id IS NULL OR user_id % 100 != 0
GROUP BY 1
""",
    doc="Driver gate for right-to-be-forgotten deletes "
    "(sources/sink.py:delete_rows): the tick lake lands partitioned by "
    "day, every user with user_id %% 100 == 0 is erased, and the "
    "surviving lake is checked per day against the flat-table oracle.  "
    "The delete rewrites ONLY partitions that contain matching rows "
    "(touched-partition dynamic overwrite — the surgical-delete bound "
    "that makes per-user erasure affordable on a petabyte lake), with "
    "the same 10k-partition sanity cap as upsert_rows.",
)
def q_user_erasure_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.sources.sink import delete_rows

    configure_runtime(spark)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", F.to_date("ts").alias("trading_date")
    )
    base = _GOV_SCRATCH / (Path(sf_dir.rstrip("/")).name + "_erase")
    shutil.rmtree(base, ignore_errors=True)
    lake = str(base / "events")
    ev.write.partitionBy("trading_date").parquet(lake)

    delete_rows(
        spark, lake, F.col("user_id") % 100 == 0, partition_col="trading_date"
    )
    return (
        spark.read.parquet(lake)
        .groupBy("trading_date")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@register(
    "retention_expiry_e2e",
    oracle="""
WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events)
SELECT CAST(ts AS DATE) AS trading_date,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events CROSS JOIN span
WHERE CAST(ts AS DATE) >= d0 + INTERVAL 7 DAY
GROUP BY 1
""",
    doc="Driver gate for scheduled retention "
    "(sources/sink.py:expire_partitions): the day-partitioned tick lake "
    "drops every partition older than min_day + 7 via directory-level "
    "removal — O(#partitions) metadata work, zero row IO, the only "
    "retention mechanism that stays affordable as the lake grows — and "
    "the surviving lake hash-checks against the date-filtered oracle.",
)
def q_retention_expiry_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    from quant_market_data_pipeline_spark.sources.sink import (
        expire_partitions,
    )

    configure_runtime(spark)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", F.to_date("ts").alias("trading_date")
    )
    base = _GOV_SCRATCH / (Path(sf_dir.rstrip("/")).name + "_retain")
    shutil.rmtree(base, ignore_errors=True)
    lake = str(base / "events")
    ev.write.partitionBy("trading_date").parquet(lake)

    d0 = ev.agg(F.min("trading_date")).collect()[0][0]
    cutoff = d0 + dt.timedelta(days=7)
    expire_partitions(spark, lake, cutoff, partition_col="trading_date")
    return (
        spark.read.parquet(lake)
        .groupBy("trading_date")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
