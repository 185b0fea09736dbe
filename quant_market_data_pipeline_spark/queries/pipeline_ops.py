"""Large-scale data-pipeline operators (round 3 additions).

The shapes a production training-data / analytics pipeline needs beyond
the reference's own surface and the round-1/2 LLM extensions:

- gap-based sessionization (the canonical event-stream feature builder);
- bounded-lookback EWMA (the batch twin of the streaming Wilder RSI
  recursion — truncated to K terms so it is window-expressible and
  oracle-checkable);
- BPE merge-candidate counting (one step of tokenizer training);
- sequence packing (documents -> fixed-size context-window bins, the
  last batch step before an LLM training run);
- snapshot reconciliation (CDC-style diff of two as-of aggregates);
- k-anonymity audit (release gate over quasi-identifier group sizes).

Every query follows the exactness discipline (functions/exact.py): money
through decimal, BIGINT casts on count-ish oracle columns, float
formulas built from ONE Python literal so both engines parse the same
double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.functions.exact import (
    money_sum,
    sql_money_sum,
)
from quant_market_data_pipeline_spark.llm.hashing import (
    seeded_md5_long,
    word_tokens,
)
from quant_market_data_pipeline_spark.operators.bars import build_bars
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.session import (
    configure_runtime,
    materialize_corpus,
)
from quant_market_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session.  One shuffle on
# user_id; the two window passes and the final groupBy all reuse the same
# hash partitioning, so Catalyst plans a single exchange — the property
# that makes this viable over billions of events.
# ---------------------------------------------------------------------------
@register(
    "user_sessions_batch",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM ordered
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events
FROM sess
GROUP BY 1, 2
""",
    doc="Gap-based sessionization (30-minute inactivity): lag -> new-"
    "session flag -> running sum = session id -> per-session aggregates. "
    "The batch twin of streaming/stateful.py sessionize; (ts, event_id) "
    "ordering makes ids deterministic.  Reference analog: the per-day "
    "bar grouping of project/transform_data.py:61-70 generalized to "
    "data-driven boundaries.",
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(is_new).over(run).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Bounded-lookback EWMA over 5-min bar closes.  The infinite recursion
# ewma_t = a*x_t + (1-a)*ewma_{t-1} is not window-expressible; truncating
# to K terms (weight remainder renormalized) is, and the truncation error
# is (1-a)^K < 0.011 of the oldest state.  Coefficients are Python float
# literals injected into BOTH engines, so the arithmetic is bit-identical.
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.2
_EWMA_K = 10
_EWMA_COEFFS = [
    _EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** i for i in range(_EWMA_K)
]
_EWMA_DENOM = 1.0 - (1.0 - _EWMA_ALPHA) ** _EWMA_K

_EWMA_SQL_TERMS = " + ".join(
    f"{c!r} * lag(close, {i}) OVER w" for i, c in enumerate(_EWMA_COEFFS)
)

@register(
    "ewma_bounded",
    oracle=f"""
WITH bars AS (
  SELECT event_type AS symbol,
         time_bucket(INTERVAL '5 minutes', ts) AS bar_ts,
         arg_max(value, ts) AS close
  FROM events
  GROUP BY 1, 2
), terms AS (
  SELECT symbol, bar_ts,
         ({_EWMA_SQL_TERMS}) / {_EWMA_DENOM!r} AS ewma,
         row_number() OVER w AS rn
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts)
)
SELECT symbol, bar_ts, round(ewma, 6) AS ewma_close
FROM terms WHERE rn > {_EWMA_K}
""",
    doc=f"Bounded EWMA (alpha={_EWMA_ALPHA}, K={_EWMA_K} lags, "
    "renormalized) of 5-min bar closes per symbol: the window-"
    "expressible batch twin of the streaming Wilder-RSI recursion "
    "(streaming/stateful.py) — K lag terms over one sort within the "
    "symbol partition, no state, no Python.  Rows without full lookback "
    "are dropped (rn > K) so every output is the exact K-term sum.",
)
def q_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bars = build_bars(
        ev, key="event_type", ts="ts", price="value",
        width="5 minutes", tiebreak="event_id",
    ).select(F.col("event_type").alias("symbol"), "bar_ts", "close")
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    terms = None
    for i, c in enumerate(_EWMA_COEFFS):
        t = F.lit(c) * F.lag("close", i).over(w)
        terms = t if terms is None else terms + t
    out = bars.select(
        "symbol",
        "bar_ts",
        (terms / F.lit(_EWMA_DENOM)).alias("ewma"),
        F.row_number().over(w).alias("rn"),
    )
    return out.filter(F.col("rn") > _EWMA_K).select(
        "symbol", "bar_ts", F.round("ewma", 6).alias("ewma_close")
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate counting: one step of byte-pair-encoding tokenizer
# training.  Word-frequency compression first (the classic trick: pair
# counts weight by word frequency, so the explode runs over DISTINCT
# words, not the corpus) — at 100 TB the distinct-word table is orders of
# magnitude smaller than the token stream.
# ---------------------------------------------------------------------------
@register(
    "bpe_merge_candidates",
    oracle="""
WITH words AS (
  SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS w
  FROM documents
), wf AS (
  SELECT w, count(*) AS freq FROM words GROUP BY w
), pairs AS (
  SELECT unnest([substr(w, i, 2) for i in generate_series(1, len(w) - 1)])
           AS pair,
         freq
  FROM wf WHERE len(w) >= 2
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT 50
""",
    doc="BPE tokenizer-training step: top-50 adjacent character pairs "
    "weighted by word frequency.  Distinct-word compression bounds the "
    "explode (|vocab| << |corpus tokens|); top-k plans as "
    "TakeOrderedAndProject — no global sort.",
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)")
        ).alias("w0")
    ).select(F.lower("w0").alias("w"))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Sequence packing: documents -> fixed-size context-window bins.  Global
# packing is inherently sequential, so the scalable form packs within a
# shard (source) — each shard's running offset is an independent window,
# and shards pack in parallel.
# ---------------------------------------------------------------------------
@register(
    "sequence_packing_bins",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM toks
)
SELECT doc_id, source, n_tokens, start_offset,
       start_offset // 2048 AS bin_id
FROM packed
""",
    doc="Training-run sequence packing: concat-then-chunk assignment of "
    "documents to 2048-token context bins, per source shard (running "
    "token offset via one window cumsum; bin = offset div 2048).  "
    "Per-shard packing is the parallelizable form — a global pack would "
    "serialize on one partition at 100 TB.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(word_tokens("text")).cast("long").alias("n_tokens"),
    )
    run = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.sum("n_tokens").over(run) - F.col("n_tokens")).alias("start_offset"),
    )
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        F.expr("start_offset div 2048").alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation (CDC diff): per-customer order aggregates as of
# two cutoff dates, classified added/changed/unchanged.  The oracle uses
# the textbook two-snapshot FULL OUTER JOIN; the Spark plan folds both
# snapshots into ONE scan with conditional aggregates — one shuffle
# instead of three, same rows.
# ---------------------------------------------------------------------------
@register(
    "snapshot_diff_customers",
    oracle=f"""
WITH a AS (
  SELECT o_custkey AS custkey, count(*) AS n_orders,
         {sql_money_sum('o_totalprice')} AS revenue
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1
), b AS (
  SELECT o_custkey AS custkey, count(*) AS n_orders,
         {sql_money_sum('o_totalprice')} AS revenue
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
)
SELECT b.custkey AS custkey,
       CASE WHEN a.custkey IS NULL THEN 'added'
            WHEN a.n_orders <> b.n_orders OR a.revenue <> b.revenue
              THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       coalesce(a.n_orders, 0) AS n_orders_prev,
       b.n_orders AS n_orders_curr,
       coalesce(a.revenue, 0.0) AS revenue_prev,
       b.revenue AS revenue_curr
FROM b LEFT JOIN a ON a.custkey = b.custkey
""",
    doc="CDC-style snapshot reconciliation: per-customer (n_orders, "
    "revenue) as of 1997-01-01 vs 1998-01-01, rows classified added/"
    "changed/unchanged.  The early snapshot is a subset of the late one, "
    "so Spark computes BOTH from one scan via conditional aggregates "
    "(sum(when(date<cutoff,...))) — one shuffle on custkey vs the "
    "oracle's three; exact-decimal revenue makes the change flag "
    "deterministic.",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    in_a = F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    agg = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("n_orders_prev"),
        F.count(F.lit(1)).alias("n_orders_curr"),
        money_sum(
            F.when(in_a, F.col("o_totalprice")).otherwise(F.lit(0.0))
        ).alias("revenue_prev"),
        money_sum("o_totalprice").alias("revenue_curr"),
    )
    return agg.select(
        "custkey",
        F.when(F.col("n_orders_prev") == 0, "added")
        .when(
            (F.col("n_orders_prev") != F.col("n_orders_curr"))
            | (F.col("revenue_prev") != F.col("revenue_curr")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        "n_orders_prev",
        "n_orders_curr",
        "revenue_prev",
        "revenue_curr",
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: group sizes over quasi-identifiers — the release
# gate that must pass before a per-user table ships.  One hash aggregate;
# the quasi-identifier tuple is the shuffle key.
# ---------------------------------------------------------------------------
@register(
    "k_anonymity_audit",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS acctbal_band,
       count(*) AS group_size,
       count(*) >= 5 AS k_ok
FROM customer
GROUP BY 1, 2, 3
""",
    doc="k-anonymity release audit (k=5) over the quasi-identifier tuple "
    "(nation, market segment, account-balance band): per-group size and "
    "pass flag; groups with k_ok=false must be generalized or suppressed "
    "before release.  The privacy-side complement of the PII redaction "
    "query.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000.0)
            .cast("long")
            .alias("acctbal_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "acctbal_band",
            "group_size",
            (F.col("group_size") >= 5).alias("k_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Benford leading-digit audit: fraud/corruption DQ screen over money
# columns.  Digit extraction goes through exact integer/string ops (never
# log10 of a double — libm rounding is not guaranteed identical across
# engines); the Benford expectation is a 10-digit literal injected into
# both plans.
# ---------------------------------------------------------------------------
_BENFORD = {
    1: 0.3010299957, 2: 0.1760912591, 3: 0.1249387366,
    4: 0.096910013, 5: 0.079181246, 6: 0.0669467896,
    7: 0.057991947, 8: 0.0511525224, 9: 0.0457574906,
}
_BENFORD_SQL_CASE = "CASE leading_digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items()
) + " END"


@register(
    "benford_totalprice_audit",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INTEGER) AS leading_digit
  FROM orders WHERE o_totalprice >= 1
), counts AS (
  SELECT leading_digit, count(*) AS n_orders FROM digits GROUP BY 1
)
SELECT leading_digit, n_orders,
       round(n_orders * 1.0 / sum(n_orders) OVER (), 6) AS actual_pct,
       {_BENFORD_SQL_CASE} AS benford_pct,
       round(abs(n_orders * 1.0 / sum(n_orders) OVER ()
                 - {_BENFORD_SQL_CASE}), 6) AS abs_dev
FROM counts
""",
    doc="Benford's-law DQ screen: leading-digit distribution of order "
    "totals vs the log10(1+1/d) expectation, with absolute deviation "
    "per digit.  One hash aggregate to 9 rows, then a global window "
    "over those 9 — the fraud/synthetic-data smoke test auditors run "
    "over money columns.",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("leading_digit")
    )
    counts = digits.groupBy("leading_digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = Window.partitionBy()
    expected = F.lit(None).cast("double")
    benford = None
    for d, p in _BENFORD.items():
        clause = F.when(F.col("leading_digit") == d, F.lit(p))
        benford = clause if benford is None else benford.when(
            F.col("leading_digit") == d, F.lit(p)
        )
    actual = F.col("n_orders") * F.lit(1.0) / F.sum("n_orders").over(total)
    return counts.select(
        "leading_digit",
        "n_orders",
        F.round(actual, 6).alias("actual_pct"),
        benford.alias("benford_pct"),
        F.round(F.abs(actual - benford), 6).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# Source-mix resampling plan: hit target per-source shares with a
# deterministic hash gate, sized by the scarcest source.
# ---------------------------------------------------------------------------
@register(
    "source_mix_plan",
    oracle="""
WITH w AS (
  SELECT source, count(*) AS n_docs,
         1 + (('0x' || substr(md5('mix|' || source), 1, 15))::BIGINT % 3)
           AS weight
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(weight) AS BIGINT) AS sum_w FROM w
), shares AS (
  SELECT source, n_docs, weight,
         CAST(weight AS DOUBLE) / sum_w AS share
  FROM w, tot
), feas AS (
  SELECT min(n_docs / share) AS n_out FROM shares
), plan AS (
  SELECT source, n_docs, weight, share,
         least(1.0, n_out * share / n_docs) AS keep_frac
  FROM shares, feas
), gated AS (
  SELECT d.source, p.n_docs, p.weight, p.share, p.keep_frac,
         CASE WHEN ('0x' || substr(md5('keep|' || CAST(doc_id AS VARCHAR)),
                                   1, 15))::BIGINT % 1000000
                   < p.keep_frac * 1000000.0
              THEN 1 ELSE 0 END AS kept
  FROM documents d JOIN plan p ON p.source = d.source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, weight,
       round(share, 6) AS target_share,
       round(keep_frac, 6) AS keep_frac,
       CAST(sum(kept) AS BIGINT) AS n_kept
FROM gated
GROUP BY source, n_docs, weight, share, keep_frac
""",
    doc="Data-mixing plan for a training run: md5-derived per-source "
    "target weights, feasible output size N_out = min_s(n_s / share_s) "
    "(the scarcest source caps the corpus — no source oversamples), "
    "keep fraction per source, then a seeded-hash keep gate per doc.  "
    "Everything is executor-recomputable (train_split_assignment "
    "discipline): no RNG state, any worker can re-derive any doc's "
    "verdict; the plan itself is a |sources|-row broadcast, the gate is "
    "map-side.  The hash-vs-threshold comparison is done in exact "
    "integer-vs-double form identically on both engines.",
)
def q_source_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = w.withColumn(
        "weight", F.lit(1) + seeded_md5_long("mix", F.col("source")) % 3
    )
    tot = w.agg(F.sum("weight").alias("sum_w"))
    shares = w.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("weight").cast("double") / F.col("sum_w")
    )
    feas = shares.agg(
        F.min(F.col("n_docs") / F.col("share")).alias("n_out")
    )
    plan = shares.crossJoin(F.broadcast(feas)).withColumn(
        "keep_frac",
        F.least(
            F.lit(1.0),
            F.col("n_out") * F.col("share") / F.col("n_docs"),
        ),
    )
    gate = (
        seeded_md5_long("keep", F.col("doc_id").cast("string")) % 1000000
    ).cast("double") < F.col("keep_frac") * 1000000.0
    gated = docs.join(
        F.broadcast(plan.select("source", "n_docs", "weight", "share", "keep_frac")),
        "source",
    ).select(
        "source",
        "n_docs",
        "weight",
        "share",
        "keep_frac",
        F.when(gate, 1).otherwise(0).alias("kept"),
    )
    return gated.groupBy(
        "source", "n_docs", "weight", "share", "keep_frac"
    ).agg(F.sum("kept").alias("n_kept")).select(
        "source",
        "n_docs",
        "weight",
        F.round("share", 6).alias("target_share"),
        F.round("keep_frac", 6).alias("keep_frac"),
        "n_kept",
    )


# ---------------------------------------------------------------------------
# Context-window chunking: overlapping fixed-size token chunks per doc.
# ---------------------------------------------------------------------------
@register(
    "doc_chunk_plan",
    oracle="""
WITH toks AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '\\S+')) AS n
  FROM documents
), starts AS (
  SELECT doc_id, n, unnest(range(0, n, 96)) AS tok_start
  FROM toks WHERE n >= 1
)
SELECT doc_id, tok_start // 96 AS chunk_idx, tok_start,
       least(tok_start + 128, n) AS tok_end,
       least(tok_start + 128, n) - tok_start AS n_tok
FROM starts
""",
    doc="Context-window chunk plan (chunk 128 tokens, stride 96 = 32-token "
    "overlap — the RAG/pretraining windowing step): chunk starts are a "
    "stride sequence over the token count, exploded map-side — no "
    "shuffle at all, the whole plan is embarrassingly parallel over "
    "docs.  Token positions only (the plan is joined back to token "
    "arrays by the consumer): rows stay 5 scalars wide however long the "
    "documents are.  Empty docs emit no chunks on both sides.",
)
def q_doc_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(word_tokens(F.lower("text"))).alias("n")
    ).filter(F.col("n") >= 1)
    starts = toks.select(
        "doc_id",
        "n",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(96))
        ).alias("chunk_idx", "tok_start"),
    )
    tok_end = F.least(F.col("tok_start") + 128, F.col("n"))
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("tok_start").cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
        (tok_end - F.col("tok_start")).cast("long").alias("n_tok"),
    )


# ---------------------------------------------------------------------------
# SCD2 state history (change-capture intervals from an event stream).
# ---------------------------------------------------------------------------
@register(
    "scd2_user_state_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
), changes AS (
  SELECT user_id, ts AS valid_from, event_type AS state
  FROM ordered WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         IS NULL AS is_current
FROM changes
""",
    doc="Type-2 slowly-changing-dimension build from a change stream: "
    "collapse consecutive repeats (lag filter), then each surviving "
    "transition opens an interval closed by the next one (lead), with "
    "the open interval flagged current — the standard warehouse "
    "history table, derived without MERGE.  Both windows ride ONE "
    "user-partitioned exchange (lag and lead share the sort); the "
    "repeat filter drops rows BEFORE the second window touches them.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(
            F.col("prev").isNull() | (F.col("event_type") != F.col("prev"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Trailing-7-day distinct users per day (windowed COUNT DISTINCT).
# ---------------------------------------------------------------------------
@register(
    "rolling_distinct_users_7d",
    oracle="""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM du)
SELECT days.d AS trading_day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS users_7d
FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY 1
""",
    doc="Trailing-7-day active users per day — the windowed COUNT "
    "DISTINCT that plain window frames cannot express (DISTINCT is "
    "not frame-decomposable).  Strategy: dedup to (day, user) first "
    "(the only corpus-sized shuffle; #days x #users upper bound), "
    "then a bounded 7-way day-range fan joins each daily cohort onto "
    "the trailing week and one distinct-agg per day closes it.  The "
    "fan factor is the window length, not data size, so cost stays "
    "linear; the HLL sketch variant (approx_distinct_users) is the "
    "mergeable alternative when exactness can relax.",
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct().select(F.col("d").alias("day"))
    return (
        du.join(
            F.broadcast(days),
            (F.col("d") <= F.col("day"))
            & (F.col("d") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy(F.col("day").alias("trading_day"))
        .agg(F.count_distinct("user_id").alias("users_7d"))
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding of order priority.
# ---------------------------------------------------------------------------
@register(
    "loo_target_encoding",
    oracle="""
WITH marg AS (
  SELECT o_orderpriority,
         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderpriority,
       round(CAST(CAST(m.s - CAST(o.o_totalprice AS DECIMAL(12,2))
                       AS DECIMAL(38,4)) AS DOUBLE)
             / nullif(m.n - 1, 0), 6) AS loo_mean_price
FROM orders o JOIN marg m USING (o_orderpriority)
""",
    doc="Leave-one-out target encoding of the order-priority category "
    "against order value: each row's encoding is the category mean "
    "COMPUTED WITHOUT THAT ROW ((sum - own) / (n - 1)) — the standard "
    "leakage-safe way to feed a high-cardinality categorical to a "
    "model.  Scale shape: category marginals come from ONE hash-agg "
    "(map-side partial, so the 5-value category key never concentrates "
    "rows on 5 reducers — the naive window-over-category version DOES "
    "and is exactly the skew this avoids) and broadcast back; sums are "
    "exact decimals per the engine's money discipline, one double "
    "division at the end; singleton categories yield NULL via the "
    "n-1 guard.",
)
def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.functions.exact import money

    o = _t(spark, sf_dir, "orders")
    marg = o.groupBy("o_orderpriority").agg(
        F.sum(money("o_totalprice")).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return o.join(F.broadcast(marg), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            (F.col("s") - money("o_totalprice"))
            .cast("decimal(38,4)")
            .cast("double")
            / F.nullif(F.col("n") - 1, F.lit(0)),
            6,
        ).alias("loo_mean_price"),
    )


# ---------------------------------------------------------------------------
# Peak concurrent sessions per day (sweep line, no global sort).
# ---------------------------------------------------------------------------
@register(
    "peak_concurrency_daily",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id,
         ts
  FROM ordered
), spans AS (
  SELECT min(ts) AS s, max(ts) AS e
  FROM sess GROUP BY user_id, session_id
), deltas AS (
  SELECT s AS ts, 1 AS delta FROM spans
  UNION ALL
  SELECT e AS ts, -1 AS delta FROM spans
), running AS (
  SELECT ts, delta,
         sum(delta) OVER (ORDER BY ts, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
)
SELECT CAST(ts AS DATE) AS day,
       CAST(max(conc) AS BIGINT) AS peak_concurrency,
       CAST(count(CASE WHEN delta = 1 THEN 1 END) AS BIGINT)
         AS n_sessions_started
FROM running
GROUP BY 1
""",
    doc="Peak concurrent user sessions per day — the capacity-planning "
    "number — via the sweep-line pattern: each 30-min-gap session "
    "(user_sessions_batch's sessionization) emits +1 at its start and "
    "-1 at its end; the running sum of deltas ordered by (ts, starts-"
    "before-ends) is the live concurrency, and its per-day max is the "
    "answer.  Sessions cross midnight, so the running sum must be "
    "GLOBAL — but a single-partition window over all deltas would be "
    "the classic scale trap; instead the engine reuses the sharded-"
    "prefix pattern (stable_doc_enumeration): per-day delta totals -> "
    "prefix offsets via a window over the #days-row frame -> broadcast "
    "back, and each day scans only its own deltas.  The oracle is the "
    "naive global window.  Equal (ts, delta) rows are interchangeable "
    "under the cumsum, so the per-day max is deterministic.",
)
def q_peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.select(
        "user_id", "ts", F.sum(is_new).over(run).alias("session_id")
    )
    spans = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    # r14 optimization round: the previous start/end unionAll planned the
    # whole session-window subtree (scan + user window + span agg) once
    # PER BRANCH; an explode of the two inline structs emits both sweep
    # deltas from one subtree.  The narrow (ts, delta, day) frame is then
    # materialized because two consumers (the per-day offset dimension
    # and the in-day running sum) would otherwise each re-run it.
    deltas = materialize_corpus(
        spans.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("s").alias("ts"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.col("e").alias("ts"), F.lit(-1).alias("delta")
                    ),
                )
            ).alias("__d")
        )
        .select(F.col("__d.ts").alias("ts"), F.col("__d.delta").alias("delta"))
        .withColumn("day", F.to_date("ts"))
    )
    # sharded prefix: per-day totals -> offsets over the #days frame
    day_tot = deltas.groupBy("day").agg(F.sum("delta").alias("dtot"))
    woff = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = day_tot.select(
        "day", F.coalesce(F.sum("dtot").over(woff), F.lit(0)).alias("off")
    )
    wday = Window.partitionBy("day").orderBy(
        "ts", F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = deltas.join(F.broadcast(offsets), "day").select(
        "day",
        "delta",
        (F.col("off") + F.sum("delta").over(wday)).alias("conc"),
    )
    return running.groupBy("day").agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.count(F.when(F.col("delta") == 1, F.lit(1)))
        .cast("bigint")
        .alias("n_sessions_started"),
    )


# ---------------------------------------------------------------------------
# Session path mining: most common 3-step event paths.
# ---------------------------------------------------------------------------
@register(
    "session_path_topk",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM ordered
), seqs AS (
  SELECT user_id, session_id,
         array_agg(event_type ORDER BY ts, event_id) AS steps
  FROM sess GROUP BY 1, 2
), paths AS (
  SELECT unnest([array_to_string(steps[i:i+2], '>')
                 for i in generate_series(1, len(steps) - 2)]) AS path
  FROM seqs
), counts AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n FROM paths GROUP BY 1
)
SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rank
FROM (SELECT * FROM counts ORDER BY n DESC, path LIMIT 20)
""",
    doc="Behavioral path mining: the 20 most common 3-step event-type "
    "paths across 30-minute sessions — what UX/growth teams pull to "
    "see how users actually traverse the product.  Scale shape: "
    "sessionization + the per-session step array reuse ONE user_id "
    "exchange; 3-gram path extraction is the in-row shingle transform "
    "(word_shingles' guarded sequence form); the path rollup shuffles "
    "#distinct-paths rows and top-20 plans as TakeOrderedAndProject — "
    "no global sort; the rank window runs on the 20-row result.",
)
def q_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(is_new).over(run).alias("session_id"),
    )
    seqs = sess.groupBy("user_id", "session_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s.getField("event_type"),
        ).alias("steps")
    )
    n = F.size("steps")
    grams = F.when(
        n - 2 >= 1,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(">", F.slice("steps", i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        seqs.select(F.explode(grams).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), "path").limit(20)
    wr = Window.orderBy(F.col("n").desc(), "path")
    return top.withColumn("rank", F.row_number().over(wr))


# ---------------------------------------------------------------------------
# In-session funnel: conversion only counts inside one session.
# ---------------------------------------------------------------------------
@register(
    "in_session_funnel",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM ordered
), flags AS (
  SELECT user_id, session_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
  FROM sess GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(saw) AS BIGINT) AS n_with_view,
       CAST(sum(CASE WHEN saw = 1 AND bought = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted,
       round(CAST(sum(CASE WHEN saw = 1 AND bought = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / nullif(sum(saw), 0), 6)
         AS session_conversion
FROM flags
""",
    doc="Session-scoped funnel: a view converts only if a purchase "
    "happens in the SAME 30-minute session — the product-analytics "
    "metric that separates intent from coincidence (the unsessionized "
    "funnel_conversion credits purchases days later).  Composes the "
    "engine's sessionization with conditional flags: the lag window, "
    "running-sum session ids and the per-session flag aggregate all "
    "reuse ONE user exchange; the final fold is a 1-row reduce.",
)
def q_in_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.select(
        "user_id",
        "event_type",
        F.sum(is_new).over(run).alias("session_id"),
    )
    flags = sess.groupBy("user_id", "session_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("saw"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("bought"),
    )
    conv = F.sum(
        F.when((F.col("saw") == 1) & (F.col("bought") == 1), 1).otherwise(0)
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("saw").cast("bigint").alias("n_with_view"),
        conv.cast("bigint").alias("n_converted"),
        F.round(
            conv.cast("double") / F.nullif(F.sum("saw"), F.lit(0)), 6
        ).alias("session_conversion"),
    )


# ---------------------------------------------------------------------------
# Purged k-fold CV assignment with embargo (de Prado, "Advances in
# Financial Machine Learning" ch.7): the leakage-free cross-validation
# split a time-series model over this lake needs.
# ---------------------------------------------------------------------------
@register(
    "purged_kfold_splits",
    oracle="""
WITH days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS trading_day FROM events
), folded AS (
  SELECT trading_day,
         CAST(ntile(5) OVER (ORDER BY trading_day) AS BIGINT) AS fold
  FROM days
), bounds AS (
  SELECT fold AS eval_fold, min(trading_day) AS lo, max(trading_day) AS hi
  FROM folded GROUP BY fold
)
SELECT f.trading_day, b.eval_fold,
       CASE WHEN f.fold = b.eval_fold THEN 'test'
            WHEN f.trading_day BETWEEN b.lo - 3 AND b.hi + 3 THEN 'purged'
            ELSE 'train' END AS role
FROM folded f CROSS JOIN bounds b
""",
    doc="Purged k-fold with embargo for time-series cross-validation "
    "(de Prado ch.7): plain k-fold leaks because observations adjacent "
    "to the test block share overlapping label horizons with it, so "
    "every day within the 3-day embargo band around a fold's "
    "[min, max] range is PURGED from that fold's training set (both "
    "sides: before the block guards overlapping lookback features, "
    "after guards overlapping forward labels).  Output is the full "
    "(day x eval_fold) role matrix a CV harness joins against the "
    "feature table.  Determinism: pure date arithmetic and ntile over "
    "a total order (distinct days) — no floats anywhere.  Scale "
    "shape: the day dimension is calendar-bounded (~250 rows/year "
    "even for a 100 TB tick lake), so the single-partition ntile "
    "window and the 5-row bounds broadcast are both trivially cheap; "
    "the one real shuffle is the DISTINCT day reduction, which "
    "map-side partials collapse to |days| rows per task.",
)
def q_purged_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("trading_day"))
        .distinct()
    )
    # single-partition window: safe because days is a calendar-bounded
    # dimension (see docstring), the same rationale as sequence_grid
    folded = days.withColumn(
        "fold",
        F.ntile(5).over(Window.orderBy("trading_day")).cast("bigint"),
    )
    bounds = folded.groupBy(F.col("fold").alias("eval_fold")).agg(
        F.min("trading_day").alias("lo"), F.max("trading_day").alias("hi")
    )
    role = (
        F.when(F.col("fold") == F.col("eval_fold"), "test")
        .when(
            F.col("trading_day").between(
                F.date_sub("lo", 3), F.date_add("hi", 3)
            ),
            "purged",
        )
        .otherwise("train")
    )
    return folded.crossJoin(F.broadcast(bounds)).select(
        "trading_day", "eval_fold", role.alias("role")
    )


# ---------------------------------------------------------------------------
# Spark-4 Python DataSource surface (format("synthbars"), sources/pyds.py).
# ---------------------------------------------------------------------------
_PYDS_ROWS = 2000
_PYDS_2_60 = "1152921504606846976.0"  # 2^60, the md5-unit denominator


@register(
    "pyds_synth_bars",
    oracle=f"""
WITH ids AS (
  SELECT unnest(generate_series(0, {_PYDS_ROWS - 1})) AS i
), bars AS (
  SELECT ['click','error','purchase','signup','view'][(i % 5) + 1]
           AS symbol,
         100.0 + 50.0 * (('0x' || substr(md5('px|' || i::VARCHAR), 1, 15))
                         ::BIGINT / {_PYDS_2_60}) AS close,
         1 + CAST(floor((('0x' || substr(md5('vol|' || i::VARCHAR), 1, 15))
                  ::BIGINT / {_PYDS_2_60}) * 1000.0) AS BIGINT) AS volume
  FROM ids
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_bars,
       CAST(sum(volume) AS BIGINT) AS total_volume,
       round(avg(close), 6) AS avg_close,
       round(min(close), 6) AS min_close,
       round(max(close), 6) AS max_close
FROM bars GROUP BY symbol
""",
    doc="Spark-4 Python DataSource surface: format('synthbars') is a "
    "custom pyspark.sql.datasource.DataSource (sources/pyds.py) whose "
    "batch reader slices the tick-id keyspace into InputPartitions "
    "(range parallelism, no driver bottleneck) and generates every "
    "field deterministically from the seeded-md5 family — so the "
    "DuckDB oracle re-derives the IDENTICAL rows from generate_series "
    "+ md5 arithmetic and the whole plugin (partitioning, Arrow "
    "transfer, schema) is value-gated end-to-end, the same discipline "
    "as the JDBC/landing seams.  The source also ships a "
    "SimpleDataSourceStreamReader whose offsets are tick-id ranges "
    "(exactly-once replay is a pure function of the offsets; "
    "tests/test_pyds.py drives it through a real streaming query).",
)
def q_pyds_synth_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.sources.pyds import (
        register_synthbars,
    )

    register_synthbars(spark)
    bars = (
        spark.read.format("synthbars")
        .option("rows", str(_PYDS_ROWS))
        .option("rowsPerPartition", "250")
        .load()
    )
    return bars.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bars"),
        F.sum("volume").cast("bigint").alias("total_volume"),
        F.round(F.avg("close"), 6).alias("avg_close"),
        F.round(F.min("close"), 6).alias("min_close"),
        F.round(F.max("close"), 6).alias("max_close"),
    )


# ---------------------------------------------------------------------------
# Z-order vs linear data-layout skipping audit (r11).  At 100 TB the
# dominant cost lever is not the plan but WHICH FILES the scan opens:
# engines prune files whose footer min/max zone maps miss the
# predicate.  A linear sort gives perfect pruning on ONE column and
# none on the others; a Morton/Z-order interleave spreads locality
# across dimensions so multi-column box predicates prune on BOTH —
# the trade behind Delta/Iceberg's OPTIMIZE ZORDER.  This audit
# MEASURES that trade on the fixture instead of asserting it: bin the
# two dims (the shared qh_bin fragment), assign each row to a file
# under both layouts (top 6 bits of the 16-bit Morton code vs top 6
# bits of the x bin), compute per-file zone maps, and report how many
# files + rows a mid-range 2D box predicate must scan under each.
# ---------------------------------------------------------------------------
_Z_BITS = 8  # 256 bins/dim -> 16-bit Morton code
_Z_FILE_SHIFT = 10  # 16-bit z >> 10 = 64 files (linear twin: xb >> 2)
_Z_BOX = (96, 159)  # mid-range box on both bin axes (~6% selectivity)


def _z_sql(xb: str, yb: str) -> str:
    """DuckDB fragment: 16-bit Morton interleave of two 8-bit bins."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({xb} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({yb} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def _z_expr(xb, yb):
    """Spark twin of _z_sql — identical integer arithmetic."""
    z = F.lit(0)
    for i in range(_Z_BITS):
        z = z + F.shiftright(xb, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i)
        )
        z = z + F.shiftright(yb, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
    return z


def _zorder_oracle() -> str:
    from quant_market_data_pipeline_spark.queries.relational import (
        qh_bin_sql,
    )

    lo, hi = _Z_BOX
    in_box = (
        f"max_xb >= {lo} AND min_xb <= {hi} "
        f"AND max_yb >= {lo} AND min_yb <= {hi}"
    )
    return f"""
WITH stats AS (
  SELECT min(l_extendedprice::DOUBLE) AS xlo,
         max(l_extendedprice::DOUBLE) AS xhi,
         min(l_quantity::DOUBLE) AS ylo,
         max(l_quantity::DOUBLE) AS yhi,
         count(*)::BIGINT AS rows_total
  FROM lineitem
), binned AS (
  SELECT {qh_bin_sql("l_extendedprice::DOUBLE", "s.xlo", "s.xhi")} AS xb,
         {qh_bin_sql("l_quantity::DOUBLE", "s.ylo", "s.yhi")} AS yb
  FROM lineitem, stats s
), matched AS (
  SELECT count(*)::BIGINT AS rows_matched FROM binned
  WHERE xb BETWEEN {lo} AND {hi} AND yb BETWEEN {lo} AND {hi}
), tagged AS (
  SELECT 'zorder' AS layout, {_z_sql("xb", "yb")} >> {_Z_FILE_SHIFT}
           AS file_id, xb, yb
  FROM binned
  UNION ALL
  SELECT 'linear', xb >> 2, xb, yb FROM binned
), files AS (
  SELECT layout, file_id,
         min(xb) AS min_xb, max(xb) AS max_xb,
         min(yb) AS min_yb, max(yb) AS max_yb,
         count(*)::BIGINT AS cnt
  FROM tagged GROUP BY 1, 2
), agg AS (
  SELECT layout, count(*)::BIGINT AS n_files,
         sum(CASE WHEN {in_box} THEN 1 ELSE 0 END)::BIGINT
           AS files_scanned,
         sum(CASE WHEN {in_box} THEN cnt ELSE 0 END)::BIGINT
           AS rows_scanned
  FROM files GROUP BY 1
)
SELECT a.layout, a.n_files, a.files_scanned, a.rows_scanned,
       s.rows_total, m.rows_matched,
       round(1.0 - a.files_scanned::DOUBLE / a.n_files::DOUBLE, 4)
         AS file_skip_ratio,
       round(a.rows_scanned::DOUBLE / nullif(m.rows_matched, 0)::DOUBLE, 4)
         AS read_amplification
FROM agg a, stats s, matched m
ORDER BY a.layout
"""


@register(
    "zorder_skipping_audit",
    oracle=_zorder_oracle(),
    doc="Data-layout skipping audit: lineitem rows are assigned to 64 "
    "'files' under a LINEAR layout (sorted by the price bin alone) and "
    "a Z-ORDER layout (top bits of the 16-bit Morton interleave of the "
    "price and quantity bins — the shared qh_bin fragment bins both "
    "dims), per-file min/max zone maps are computed, and a mid-range "
    "2D box predicate (~6% selectivity) is priced under each: files "
    "scanned, rows scanned, file-skip ratio, and read amplification "
    "(rows scanned / rows matched).  Linear prunes perfectly on price "
    "and not at all on quantity; Morton prunes on both — the measured "
    "version of the claim behind OPTIMIZE ZORDER.  Scale shape: one "
    "2-column scan feeds the binning (stats broadcast), the layout "
    "explode is x2, and the zone-map aggregation partial-aggregates "
    "map-side into <=128 (layout, file) groups; every estimate is "
    "integer arithmetic + one rounded double division, so both engines "
    "emit identical bits.  At 100 TB the zone maps come free from "
    "parquet footers — this audit recomputes them to MEASURE layout "
    "quality before a rewrite job commits to it.",
)
def q_zorder_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.queries.relational import (
        qh_bin_expr,
    )

    lo, hi = _Z_BOX
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x"),
        F.col("l_quantity").cast("double").alias("y"),
    )
    stats = li.agg(
        F.min("x").alias("xlo"),
        F.max("x").alias("xhi"),
        F.min("y").alias("ylo"),
        F.max("y").alias("yhi"),
        F.count(F.lit(1)).cast("bigint").alias("rows_total"),
    )
    binned = li.crossJoin(F.broadcast(stats)).select(
        qh_bin_expr(F.col("x"), F.col("xlo"), F.col("xhi")).alias("xb"),
        qh_bin_expr(F.col("y"), F.col("ylo"), F.col("yhi")).alias("yb"),
    )
    matched = binned.filter(
        F.col("xb").between(lo, hi) & F.col("yb").between(lo, hi)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    tagged = binned.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(
                        _z_expr(F.col("xb"), F.col("yb")), _Z_FILE_SHIFT
                    ).alias("file_id"),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.shiftright(F.col("xb"), 2).alias("file_id"),
                ),
            )
        ).alias("t"),
        "xb",
        "yb",
    ).select("t.layout", "t.file_id", "xb", "yb")
    files = tagged.groupBy("layout", "file_id").agg(
        F.min("xb").alias("min_xb"),
        F.max("xb").alias("max_xb"),
        F.min("yb").alias("min_yb"),
        F.max("yb").alias("max_yb"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    in_box = (
        (F.col("max_xb") >= lo)
        & (F.col("min_xb") <= hi)
        & (F.col("max_yb") >= lo)
        & (F.col("min_yb") <= hi)
    )
    agg = files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.when(in_box, 1).otherwise(0)).cast("bigint").alias(
            "files_scanned"
        ),
        F.sum(F.when(in_box, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
    )
    return (
        agg.crossJoin(F.broadcast(stats.select("rows_total")))
        .crossJoin(F.broadcast(matched))
        .select(
            "layout",
            "n_files",
            "files_scanned",
            "rows_scanned",
            "rows_total",
            "rows_matched",
            F.round(
                F.lit(1.0)
                - F.col("files_scanned").cast("double")
                / F.col("n_files").cast("double"),
                4,
            ).alias("file_skip_ratio"),
            # null (not an error) when the box matches zero rows — the
            # F.when twin of the oracle's nullif (ADVICE r11): both
            # engines agree on the degenerate fixture by construction
            F.round(
                F.col("rows_scanned").cast("double")
                / F.when(
                    F.col("rows_matched") > 0,
                    F.col("rows_matched").cast("double"),
                ),
                4,
            ).alias("read_amplification"),
        )
        .orderBy("layout")
    )
