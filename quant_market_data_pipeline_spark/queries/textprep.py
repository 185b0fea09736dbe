"""Corpus-preparation analytics: threshold sweeps, tokenizer fertility,
containment dedup, embedding-cluster quality.

Round-4 additions to the training-data-pipeline surface (queries/llm.py).
Common scale rule: every sweep/audit is ONE corpus scan with the grid or
the comparison realized as an in-row array / broadcast join — never one
scan per threshold and never an all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.llm.similarity import as_double, cosine
from quant_market_data_pipeline_spark.queries import register
from quant_market_data_pipeline_spark.queries.llm import (
    _BPE_PAT,
    _PLANTED_SHINGLE_CTE,
    _docs_wide,
    _embeddings,
    _planted_shingled,
)
from quant_market_data_pipeline_spark.session import (
    materialize_corpus,
    materialize_dim,
)

# ---------------------------------------------------------------------------
# Quality-gate threshold sweep: one scan, the whole operating curve.
# ---------------------------------------------------------------------------
_THRESHOLDS = [40, 80, 120, 160, 200, 240]


@register(
    "quality_threshold_sweep",
    oracle=f"""
WITH stats AS (
  SELECT doc_id, length(text) AS n_char,
         len(regexp_extract_all(text, '{_BPE_PAT}')) AS n_bpe
  FROM documents
), grid AS (
  SELECT s.*, t.thr
  FROM stats s, unnest([{", ".join(str(t) for t in _THRESHOLDS)}]) AS t(thr)
)
SELECT thr AS min_chars,
       CAST(count(CASE WHEN n_char >= thr THEN 1 END) AS BIGINT)
         AS n_surviving,
       round(CAST(count(CASE WHEN n_char >= thr THEN 1 END) AS DOUBLE)
             / count(*), 4) AS survival_rate,
       round(CAST(sum(CASE WHEN n_char >= thr THEN n_bpe ELSE 0 END)
                  AS DOUBLE) / NULLIF(sum(n_bpe), 0), 4)
         AS token_retention
FROM grid GROUP BY thr
""",
    doc="Filter-calibration sweep: survival rate and retained-token share "
    "of a min-length gate at six thresholds, from ONE corpus scan — the "
    "grid is an in-row array explode, so choosing a filter operating "
    "point costs one pass at 100 TB instead of one pass per candidate "
    "threshold.  The per-threshold agg shuffles 6 x |sources| tiny rows.",
)
def q_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_wide(spark, sf_dir)
    stats = d.select(
        F.length("text").alias("n_char"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)).alias(
            "n_bpe"
        ),
    )
    grid = stats.select(
        "n_char",
        "n_bpe",
        F.explode(
            F.array(*[F.lit(t) for t in _THRESHOLDS])
        ).alias("min_chars"),
    )
    survive = F.col("n_char") >= F.col("min_chars")
    return grid.groupBy("min_chars").agg(
        F.count(F.when(survive, F.lit(1))).cast("bigint").alias(
            "n_surviving"
        ),
        F.round(
            F.count(F.when(survive, F.lit(1))).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("survival_rate"),
        F.round(
            F.sum(F.when(survive, F.col("n_bpe")).otherwise(0)).cast("double")
            / F.nullif(F.sum("n_bpe"), F.lit(0)),
            4,
        ).alias("token_retention"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility: chars per BPE piece, pieces per word, by segment.
# ---------------------------------------------------------------------------
@register(
    "tokenizer_fertility",
    oracle=f"""
WITH stats AS (
  SELECT lang, source, length(text) AS n_char,
         len(regexp_extract_all(text, '{_BPE_PAT}')) AS n_bpe,
         len(regexp_extract_all(text, '\\S+')) AS n_words
  FROM documents
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(n_char) AS DOUBLE) / NULLIF(sum(n_bpe), 0), 4)
         AS chars_per_piece,
       round(CAST(sum(n_bpe) AS DOUBLE) / NULLIF(sum(n_words), 0), 4)
         AS pieces_per_word
FROM stats GROUP BY 1, 2
""",
    doc="Tokenizer-fertility audit by (lang, source): corpus-level chars "
    "per BPE-style piece and pieces per whitespace word — the standard "
    "check that a tokenizer does not over-fragment a language segment "
    "before a training run is budgeted.  One scan, one tiny-key agg; "
    "the regexp piece counting is the same JVM pre-tokenizer rule as "
    "token_count_bpe.",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_wide(spark, sf_dir)
    stats = d.select(
        "lang",
        "source",
        F.length("text").alias("n_char"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)).alias(
            "n_bpe"
        ),
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).alias("n_words"),
    )
    return stats.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum("n_char").cast("double") / F.nullif(F.sum("n_bpe"), F.lit(0)),
            4,
        ).alias("chars_per_piece"),
        F.round(
            F.sum("n_bpe").cast("double") / F.nullif(F.sum("n_words"), F.lit(0)),
            4,
        ).alias("pieces_per_word"),
    )


# ---------------------------------------------------------------------------
# Containment near-dup pairs: catches truncation/subset copies that
# Jaccard under-scores.
# ---------------------------------------------------------------------------
@register(
    "containment_neardup_pairs",
    oracle=f"""
WITH {_PLANTED_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS n_shared
  FROM sh a JOIN sh b
    ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_lo, doc_hi, n_shared,
       round(n_shared / least(sa.sz, sb.sz), 6) AS containment,
       round(n_shared / (sa.sz + sb.sz - n_shared), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_lo
JOIN sizes sb ON sb.doc_id = doc_hi
WHERE round(n_shared / least(sa.sz, sb.sz), 6) >= 0.6
""",
    doc="Asymmetric-containment near-dup pairs: |A n B| / min(|A|, |B|) "
    "over the source-blocked inverted-index join — the right metric for "
    "truncation/subset copies (a doc fully contained in a longer one "
    "scores containment 1.0 while Jaccard dilutes toward |A|/|B|).  "
    "Same bounded candidate generation as ngram_jaccard_pairs: pairs "
    "materialize only through shared shingles within a source block, "
    "never an all-pairs join.  The planted truncation twins are exactly "
    "the case containment catches and Jaccard misses.",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.llm.hashing import seeded_md5_long

    # 60-bit hashed shingle keys (jaccard_pairs' convention): the
    # checkpointed index and both join sides carry longs, not strings
    sh = _planted_shingled(spark, sf_dir).select(
        "doc_id", "source", seeded_md5_long("cont", F.col("sh")).alias("sh")
    )
    sh = materialize_corpus(sh)  # both join sides + sizes
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(
        F.col("doc_id").alias("doc_lo"), "source", F.col("sh").alias("s")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_hi"), "source", F.col("sh").alias("s")
    )
    inter = (
        a.join(b, ["source", "s"])
        .filter(F.col("doc_lo") < F.col("doc_hi"))
        .groupBy("doc_lo", "doc_hi")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_lo"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_hi"), F.col("sz").alias("szb"))
    cont = F.round(
        F.col("n_shared") / F.least("sza", "szb"), 6
    )
    return (
        inter.join(sa, "doc_lo")
        .join(sb, "doc_hi")
        .select(
            "doc_lo",
            "doc_hi",
            "n_shared",
            cont.alias("containment"),
            F.round(
                F.col("n_shared")
                / (F.col("sza") + F.col("szb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= 0.6)
    )


# ---------------------------------------------------------------------------
# Embedding-cluster quality: per-label cohesion vs nearest other centroid.
# ---------------------------------------------------------------------------
@register(
    "embedding_cluster_quality",
    oracle="""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), elems AS (
  SELECT label, i AS pos, avg(embedding[i]::DOUBLE) AS m
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
  GROUP BY 1, 2
), cents AS (
  SELECT label AS clabel, list(m ORDER BY pos) AS cv FROM elems GROUP BY 1
), scored AS (
  SELECT vec_id, label, clabel,
         round(list_dot_product(v, cv) /
               nullif(sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(cv, cv)), 0.0), 6) AS cs
  FROM vecs CROSS JOIN cents
), pervec AS (
  SELECT vec_id, label,
         max(CASE WHEN label = clabel THEN cs END) AS own_cos,
         max(CASE WHEN label != clabel THEN cs END) AS best_other
  FROM scored GROUP BY 1, 2
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(own_cos), 4) AS mean_own_cos,
       round(avg(own_cos - best_other), 4) AS mean_margin,
       round(CAST(count(CASE WHEN own_cos > best_other THEN 1 END)
                  AS DOUBLE) / count(*), 4) AS frac_cohesive
FROM pervec GROUP BY label
""",
    doc="Silhouette-lite cluster audit for a labeled embedding corpus: "
    "cosine of every vector to its own label centroid vs the best other "
    "centroid, aggregated per label (mean cohesion, mean margin, "
    "fraction on the right side).  Centroids: one posexplode agg on "
    "(label, pos) then an array rebuild — |labels| rows, broadcast to "
    "the scoring join, so the only data-sized operations are one scan "
    "to build centroids and one scan to score.  Cosines are rounded to "
    "6dp on both engines BEFORE the own-vs-other comparison (filter-"
    "stage rule).",
)
def q_embedding_cluster_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _embeddings(spark, sf_dir).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    elems = emb.select(
        "label", F.posexplode("v").alias("pos", "val")
    )
    cents = (
        elems.groupBy("label", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("cv")
        )
        .select(F.col("label").alias("clabel"), "cv")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("cs"),
    )
    pervec = scored.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("label") == F.col("clabel"), F.col("cs"))
        ).alias("own_cos"),
        F.max(
            F.when(F.col("label") != F.col("clabel"), F.col("cs"))
        ).alias("best_other"),
    )
    return pervec.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.avg("own_cos"), 4).alias("mean_own_cos"),
        F.round(F.avg(F.col("own_cos") - F.col("best_other")), 4).alias(
            "mean_margin"
        ),
        F.round(
            F.count(
                F.when(F.col("own_cos") > F.col("best_other"), F.lit(1))
            ).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("frac_cohesive"),
    )


# ---------------------------------------------------------------------------
# Exact-duplication governance report per source.
# ---------------------------------------------------------------------------
@register(
    "dedup_rate_by_source",
    oracle="""
WITH hashed AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
), grp AS (
  SELECT h, count(*) AS n_copies FROM hashed GROUP BY h
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN g.n_copies >= 2 THEN 1 END) AS BIGINT)
         AS n_dup_docs,
       round(CAST(count(CASE WHEN g.n_copies >= 2 THEN 1 END) AS DOUBLE)
             / count(*), 4) AS dup_rate
FROM hashed d JOIN grp g ON d.h = g.h
GROUP BY source
""",
    doc="Corpus-governance duplication report: per source, the fraction "
    "of documents whose exact text hash occurs 2+ times ANYWHERE in the "
    "corpus (cross-source copies count against both sources).  The "
    "copy count is a COUNT OVER (PARTITION BY hash) window — ONE fact "
    "shuffle on the uniform md5 key (vs the groupBy + join-back shape's "
    "two) — followed by the tiny per-source agg.  No skew at any corpus "
    "size.  This is the summary a crawl operator watches per ingest "
    "batch; the doc-level keep/drop list is dedup_keep_list.",
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_wide(spark, sf_dir).select(
        "source", F.md5("text").alias("h")
    )
    counted = d.withColumn(
        "n_copies", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    dup = F.count(F.when(F.col("n_copies") >= 2, F.lit(1)))
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        dup.cast("bigint").alias("n_dup_docs"),
        F.round(
            dup.cast("double") / F.count(F.lit(1)), 4
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# Stable global enumeration without a global sort.
# ---------------------------------------------------------------------------
@register(
    "stable_doc_enumeration",
    oracle="""
SELECT doc_id, source,
       row_number() OVER (ORDER BY source, doc_id) AS global_id
FROM documents
""",
    doc="Contiguous global ids ordered by (source, doc_id) WITHOUT the "
    "single-partition global sort row_number() OVER (ORDER BY ...) "
    "compiles to: per-source counts (a |sources|-row agg) turn into "
    "prefix offsets via a window over the tiny side, broadcast back, "
    "and each source numbers its own partition independently — "
    "global_id = source_offset + per-source row_number.  The heavy "
    "window runs partitioned by source; only the offset table (rows = "
    "|sources|) ever sees a single-partition exchange.  This is the "
    "sharded-enumeration pattern every exported training corpus needs "
    "(stable example ids), and the oracle is the naive global window.",
)
def q_stable_doc_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_wide(spark, sf_dir).select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    # prefix offsets over the |sources|-row frame: the only global sort
    # in the plan runs on a dimension-sized input
    woff = (
        Window.orderBy("source").rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    offsets = counts.select(
        "source",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("offset"),
    )
    wsrc = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.join(F.broadcast(offsets), "source")
        .select(
            "doc_id",
            "source",
            (F.col("offset") + F.row_number().over(wsrc)).alias("global_id"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and dense cosine.
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_DEPTH = 50  # per-retriever candidate depth before fusion


@register(
    "hybrid_rrf_fusion",
    oracle=None,  # assembled below after the llm module's constants import
    doc="placeholder — oracle attached at import time",
)
def q_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.queries.llm import q_bm25_search

    # lexical leg: BM25 scores (already rounded 6dp), top-DEPTH by
    # (score desc, id) — plans as TakeOrderedAndProject, then the rank
    # window runs on the DEPTH-row result
    lex = (
        q_bm25_search(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    wl = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex_ranked = lex.select(
        "doc_id", F.row_number().over(wl).alias("r_lex")
    )

    # dense leg: cosine of every corpus vector against the fixed query
    # vector (vec_id 0) — 1-row broadcast, JVM dot product, top-DEPTH
    emb = _embeddings(spark, sf_dir).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv")
    )
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    wd = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    dense_ranked = dense.select(
        "doc_id", F.row_number().over(wd).alias("r_dense")
    )

    # reciprocal-rank fusion: a missing leg contributes 0
    fused = lex_ranked.join(dense_ranked, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("r_lex", F.lit(0)).cast("bigint").alias("lex_rank"),
        F.coalesce("r_dense", F.lit(0)).cast("bigint").alias("dense_rank"),
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_dense")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= 20)
        .select("doc_id", "lex_rank", "dense_rank", "rrf_score", "fused_rank")
    )


def _attach_rrf_oracle() -> None:
    from quant_market_data_pipeline_spark.queries import REGISTRY, QuerySpec
    from quant_market_data_pipeline_spark.queries.llm import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )

    sql = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS tokens
  FROM documents
), dl AS (
  SELECT doc_id, len(tokens) AS dl FROM toks
), stats AS (
  SELECT avg(dl) AS avgdl, count(*) AS n FROM dl
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(tokens) AS w FROM toks) t
  WHERE w IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
  GROUP BY 1, 2
), dfreq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), bm25 AS (
  SELECT tf.doc_id AS doc_id,
         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * {_BM25_K1 + 1.0})
                   / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl / avgdl))), 6) AS bm25
  FROM tf JOIN dfreq USING (w)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY 1
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
  FROM (SELECT * FROM bm25 ORDER BY bm25 DESC, doc_id LIMIT {_RRF_DEPTH})
), qv AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), cos AS (
  SELECT vec_id AS doc_id,
         round(list_dot_product(v, qv)
               / nullif(sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(qv, qv)), 0.0), 6)
           AS cos_sim
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id != 0) e
  CROSS JOIN qv
), dense AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS r_dense
  FROM (SELECT * FROM cos ORDER BY cos_sim DESC, doc_id
        LIMIT {_RRF_DEPTH})
), fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         CAST(coalesce(l.r_lex, 0) AS BIGINT) AS lex_rank,
         CAST(coalesce(d.r_dense, 0) AS BIGINT) AS dense_rank,
         round(coalesce(1.0 / ({_RRF_K} + l.r_lex), 0.0)
               + coalesce(1.0 / ({_RRF_K} + d.r_dense), 0.0), 6)
           AS rrf_score
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank, rrf_score,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS fused_rank
FROM fused
QUALIFY fused_rank <= 20
"""
    REGISTRY["hybrid_rrf_fusion"] = QuerySpec(
        name="hybrid_rrf_fusion",
        spark=q_hybrid_rrf_fusion,
        oracle=sql,
        doc="Hybrid RAG retrieval: reciprocal-rank fusion (k=60) of the "
        "BM25 lexical top-50 and the dense cosine top-50 for a fixed "
        "query (terms + query vector vec_id 0), fused as "
        "sum 1/(60+rank) with missing legs contributing 0 — the "
        "standard two-tower retrieval merge.  Scale shape: each leg "
        "reduces to its top-DEPTH via TakeOrderedAndProject (no global "
        "sort); rank windows and the fusion join run on <= 50-row "
        "frames.  The lexical leg reuses bm25_keyword_search's "
        "postings plan; the dense leg is the 1-query broadcast cosine.",
    )


_attach_rrf_oracle()


# ---------------------------------------------------------------------------
# Shingle novelty: how much of each doc is first-seen content?
# ---------------------------------------------------------------------------
@register(
    "shingle_novelty",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tokens FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5('nov|' || sh), 1, 15))::BIGINT AS h
  FROM (
    SELECT doc_id,
           unnest([array_to_string(tokens[i:i+2], ' ')
                   for i in generate_series(1, len(tokens) - 2)]) AS sh
    FROM toks)
), first_seen AS (
  SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(CASE WHEN s.doc_id = f.first_doc THEN 1 END) AS BIGINT)
         AS n_novel,
       round(CAST(count(CASE WHEN s.doc_id = f.first_doc THEN 1 END)
                  AS DOUBLE) / count(*), 6) AS novelty_rate
FROM sh s JOIN first_seen f ON s.h = f.h
GROUP BY s.doc_id
""",
    doc="Per-document novelty score: the fraction of a doc's distinct "
    "3-gram shingles whose corpus-wide FIRST occurrence (min doc_id — "
    "the ingest-order proxy) is this doc.  Low-novelty documents are "
    "recombinations of already-seen content — the curriculum/dedup "
    "signal between exact dedup (all-or-nothing) and MinHash (pairwise)."
    "  Scale shape: one shingle explode (in-row distinct), one "
    "first-seen agg on the uniform shingle key, one join back on the "
    "same key — two shuffles, both skew-free; no pairwise work at all, "
    "so it scales where pair-generation near-dup methods need banding.",
)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.llm.dedup import doc_shingles

    from quant_market_data_pipeline_spark.llm.hashing import seeded_md5_long

    d = _docs_wide(spark, sf_dir)
    # hash each shingle to its 60-bit seeded-md5 long BEFORE the shuffles:
    # the checkpointed frame, both shuffle keys and the join comparison
    # carry 8-byte longs instead of ~30-byte strings (measured: the
    # string form's executor-store pressure made x16 wall swing 6-30 s;
    # the hashed form is stable).  md5 is bit-identical in the oracle,
    # so any (astronomically rare) collision merges the same shingles
    # on both engines — the comparison cannot diverge.
    sh = doc_shingles(d, n=3, distinct=True).select(
        "doc_id", seeded_md5_long("nov", F.col("sh")).alias("h")
    )
    sh = materialize_corpus(sh)  # first-seen agg + join-back side
    first = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = F.count(
        F.when(F.col("doc_id") == F.col("first_doc"), F.lit(1))
    )
    return (
        sh.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            F.round(novel.cast("double") / F.count(F.lit(1)), 6).alias(
                "novelty_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Hashing-trick feature vectors (long form).
# ---------------------------------------------------------------------------
_FH_BUCKETS = 64


@register(
    "feature_hashing_long",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
  FROM documents
), vocab AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
), hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5('fh|' || tok), 1, 15))::BIGINT
           % {_FH_BUCKETS} AS bucket,
         CASE WHEN substr(md5('fhs|' || tok), 1, 1) >= '8'
              THEN cnt ELSE -cnt END AS signed_cnt
  FROM vocab
)
SELECT doc_id, bucket,
       CAST(sum(signed_cnt) AS BIGINT) AS weight
FROM hashed GROUP BY 1, 2
""",
    doc="Hashing-trick featurization (Weinberger et al.): each token maps "
    "to one of 64 buckets by hash, with a second hash choosing the sign "
    "(the unbiased variant), weights = signed token counts.  Emitted in "
    "LONG form (doc, bucket, weight) — the layout that joins, aggregates "
    "and matrix-multiplies well in a distributed engine (and the driver "
    "gate hashes scalar cells, not arrays).  Scale shape: per-doc vocab "
    "rollup partial-aggregates map-side (one hash per DISTINCT token "
    "per doc, same cut as simhash60), then one (doc, bucket) hash-agg; "
    "no vocabulary table, no fit step — the property that makes the "
    "trick the standard for streaming/of-core featurization.  Hashes "
    "are the engine's seeded-md5 family, bit-identical in the oracle.",
)
def q_feature_hashing_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.llm.hashing import (
        md5_sign,
        seeded_md5_long,
        word_tokens,
    )

    d = _docs_wide(spark, sf_dir)
    vocab = (
        d.select(
            "doc_id",
            F.explode(word_tokens(F.lower("text"))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hashed = vocab.select(
        "doc_id",
        (seeded_md5_long("fh", F.col("tok")) % _FH_BUCKETS).alias("bucket"),
        (md5_sign("fhs", F.col("tok")) * F.col("cnt")).alias("signed_cnt"),
    )
    return hashed.groupBy("doc_id", "bucket").agg(
        F.sum("signed_cnt").cast("bigint").alias("weight")
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization feasibility report.
# ---------------------------------------------------------------------------
@register(
    "embedding_quant_report",
    oracle="""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         (SELECT max(abs(x)) FROM unnest(embedding::DOUBLE[]) AS t(x))
           AS maxabs
  FROM embeddings
), quant AS (
  SELECT vec_id, label, v, maxabs,
         list_transform(v, x -> floor(x / maxabs * 127 + 0.5)
                               * maxabs / 127) AS vq
  FROM vecs WHERE maxabs > 0
), err AS (
  SELECT label,
         round(sqrt(list_sum(list_transform(
                 list_zip(v, vq), p -> (p[1] - p[2]) * (p[1] - p[2]))))
               / nullif(sqrt(list_sum(list_transform(v, x -> x * x))),
                        0.0), 6) AS rel_l2,
         round(list_dot_product(v, vq)
               / nullif(sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(vq, vq)), 0.0), 6)
           AS cos_pres
  FROM quant
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(rel_l2), 4) AS mean_rel_l2,
       round(avg(cos_pres), 4) AS mean_cos,
       round(min(cos_pres), 6) AS min_cos
FROM err GROUP BY label
""",
    doc="Vector-compression feasibility report: symmetric per-vector int8 "
    "quantization (scale = maxabs/127, round-half-up via floor(x+0.5) "
    "so both engines tie-break identically — never the engines' "
    "native round, which is HALF_UP in Spark and half-even in DuckDB), "
    "then the relative L2 reconstruction error and cosine preservation "
    "per label — the go/no-go audit before an ANN index drops to int8 "
    "(4x memory cut).  Scale shape: everything is in-row array math "
    "until the #labels-row aggregate; zero joins, zero extra shuffles.",
)
def q_embedding_quant_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings(spark, sf_dir).select(
        "label", as_double(F.col("embedding")).alias("v")
    )
    maxabs = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    vecs = emb.select("label", "v", maxabs.alias("maxabs")).filter(
        F.col("maxabs") > 0
    )
    vq = F.transform(
        F.col("v"),
        lambda x: F.floor(x / F.col("maxabs") * 127 + 0.5)
        * F.col("maxabs")
        / 127,
    )
    quant = vecs.select("label", "v", vq.alias("vq"))
    sq_err = F.aggregate(
        F.zip_with(F.col("v"), F.col("vq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq_v = F.aggregate(
        F.transform(F.col("v"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    err = quant.select(
        "label",
        F.round(
            F.sqrt(sq_err) / F.nullif(F.sqrt(sq_v), F.lit(0.0)), 6
        ).alias("rel_l2"),
        F.round(cosine(F.col("v"), F.col("vq")), 6).alias("cos_pres"),
    )
    return err.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.avg("rel_l2"), 4).alias("mean_rel_l2"),
        F.round(F.avg("cos_pres"), 4).alias("mean_cos"),
        F.round(F.min("cos_pres"), 6).alias("min_cos"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis-Spirakis, md5 randomness).
# ---------------------------------------------------------------------------
@register(
    "weighted_sample_docs",
    oracle="""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ln(CAST(('0x' || substr(md5('ws|' || doc_id::VARCHAR), 1, 15))
                 ::BIGINT AS DOUBLE) / 1152921504606846976.0)
           / n_chars AS es_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       row_number() OVER (ORDER BY es_key DESC, doc_id) AS draw_rank
FROM (SELECT * FROM keyed ORDER BY es_key DESC, doc_id LIMIT 50)
""",
    doc="Distributed weighted sampling without replacement "
    "(Efraimidis-Spirakis): each doc draws u = md5-uniform in (0,1) and "
    "keys on ln(u)/weight; the top-k keys ARE a weight-proportional "
    "sample — the standard way to sample 'proportional to length/"
    "quality' across a sharded corpus in ONE pass with NO coordination "
    "(every executor computes keys independently, TakeOrderedAndProject "
    "merges).  Randomness is the engine's seeded-md5 family: "
    "deterministic, replayable, oracle-checkable — a reshuffled rerun "
    "draws the SAME sample, which is exactly what a reproducible "
    "training-data pipeline needs.",
)
def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.llm.hashing import seeded_md5_long

    d = _docs_wide(spark, sf_dir).filter(F.col("n_chars") > 0)
    u = seeded_md5_long("ws", F.col("doc_id").cast("string")).cast(
        "double"
    ) / F.lit(float(1 << 60))
    keyed = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        (F.log(u) / F.col("n_chars")).alias("es_key"),
    )
    top = keyed.orderBy(F.col("es_key").desc(), "doc_id").limit(50)
    wr = Window.orderBy(F.col("es_key").desc(), "doc_id")
    return top.withColumn("draw_rank", F.row_number().over(wr)).select(
        "doc_id", "weight", "draw_rank"
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing weights (training-data sampling plan).
# ---------------------------------------------------------------------------
@register(
    "sampling_temperature_mix",
    oracle="""
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), raw AS (
  SELECT source, n_docs,
         CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS p_raw,
         sum(n_docs) OVER () AS n_total
  FROM counts
), scaled AS (
  SELECT source, n_docs, p_raw, n_total,
         pow(p_raw, 0.7) / sum(pow(p_raw, 0.7)) OVER () AS p_sampled
  FROM raw
)
SELECT source, n_docs,
       round(p_raw, 6) AS p_raw,
       round(p_sampled, 6) AS p_sampled,
       round(p_sampled / p_raw, 4) AS boost,
       CAST(round(p_sampled * n_total, 0) AS BIGINT) AS epoch_docs
FROM scaled
""",
    doc="Temperature-scaled sampling mix over corpus sources (the "
    "multilingual-LM rebalancing rule, tau=0.7: q_s proportional to "
    "p_s^tau): per-source raw share, resampled share, boost factor and "
    "the per-epoch document budget that mix implies.  One corpus "
    "hash-agg reduces to the |sources| frame; every window below runs "
    "on that dimension-sized frame, so the 100 TB cost is the count "
    "scan.  Low-resource sources get boost > 1, dominant ones < 1 — "
    "the knob that trades corpus fidelity against source diversity.",
)
def q_sampling_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_wide(spark, sf_dir)
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    # the corpus reduces ONCE to the |sources| frame; materialize it so
    # the two normalizer aggs + the final projection don't each re-run
    # the corpus scan (4 scans otherwise).  persist-with-lineage, not
    # localCheckpoint: survives executor loss.
    counts = materialize_dim(counts)
    # totals via a broadcast cross join, not an over-() window: the frame
    # is |sources| rows, but the pattern stays single-partition-free
    tot = counts.groupBy().agg(F.sum("n_docs").alias("n_total"))
    probs = counts.crossJoin(F.broadcast(tot)).withColumn(
        "p_raw", F.col("n_docs").cast("double") / F.col("n_total")
    )
    ztot = probs.groupBy().agg(
        F.sum(F.pow("p_raw", F.lit(0.7))).alias("z")
    )
    mixed = probs.crossJoin(F.broadcast(ztot)).withColumn(
        "p_sampled", F.pow("p_raw", F.lit(0.7)) / F.col("z")
    )
    return mixed.select(
        "source",
        "n_docs",
        F.round("p_raw", 6).alias("p_raw"),
        F.round("p_sampled", 6).alias("p_sampled"),
        F.round(F.col("p_sampled") / F.col("p_raw"), 4).alias("boost"),
        F.round(F.col("p_sampled") * F.col("n_total"), 0)
        .cast("bigint")
        .alias("epoch_docs"),
    )


# ---------------------------------------------------------------------------
# PII detection + redaction audit (planted PII, exact-count gate).
# ---------------------------------------------------------------------------
_PII_EMAIL = "[a-z0-9]+@[a-z]+\\.[a-z]+"


@register(
    "pii_scrub_audit",
    oracle=f"""
WITH planted AS (
  SELECT source,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or u' || CAST(doc_id AS VARCHAR)
                        || '@mail.net'
              ELSE text END AS t
  FROM documents
), scrubbed AS (
  SELECT source, t,
         len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_pii,
         regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g') AS masked
  FROM planted
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN n_pii > 0 THEN 1 END) AS BIGINT)
         AS docs_with_pii,
       CAST(sum(n_pii) AS BIGINT) AS total_matches,
       CAST(sum(len(t) - len(masked)) AS BIGINT) AS chars_redacted,
       CAST(sum(len(regexp_extract_all(masked, '{_PII_EMAIL}')) ) AS BIGINT)
         AS residual_matches
FROM scrubbed
GROUP BY source
""",
    doc="PII redaction audit — the compliance pass every training-data "
    "pipeline runs before a corpus ships: detect emails, mask them, and "
    "prove the masked text is clean (residual_matches must be 0).  The "
    "fixture corpus is synthetic word-salad, so deterministic PII is "
    "PLANTED first (two addresses per doc_id%3==0 doc, derived from the "
    "id) — the gate then checks EXACT detected/redacted counts per "
    "source, not just plumbing.  Scale shape: regexp_count and "
    "regexp_replace are in-row JVM expressions (no UDF); the query is "
    "one narrow projection + one hash-agg on |sources| — the 100 TB "
    "cost is the text scan itself, which a real scrub pass has to pay "
    "anyway.  The regex sticks to a dialect-neutral subset (Java regex "
    "on Spark, RE2 in the DuckDB twin).",
)
def q_pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.queries.llm import _docs

    d = _docs(spark, sf_dir)
    planted = d.select(
        "source",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or u"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.net"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    scrubbed = planted.select(
        "source",
        "t",
        F.regexp_count("t", F.lit(_PII_EMAIL)).alias("n_pii"),
        F.regexp_replace("t", _PII_EMAIL, "[EMAIL]").alias("masked"),
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("n_pii") > 0, 1)).cast("bigint").alias(
            "docs_with_pii"
        ),
        F.sum("n_pii").cast("bigint").alias("total_matches"),
        F.sum(F.length("t") - F.length("masked"))
        .cast("bigint")
        .alias("chars_redacted"),
        F.sum(F.regexp_count("masked", F.lit(_PII_EMAIL)))
        .cast("bigint")
        .alias("residual_matches"),
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate detection (planted banners, exact-count gate).
# ---------------------------------------------------------------------------
@register(
    "boilerplate_prefix_report",
    oracle="""
WITH planted AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 4 = 0
              THEN 'standard copyright banner of ' || source
                   || ' all rights reserved ' || text
              ELSE text END AS t
  FROM documents
), prefixed AS (
  SELECT doc_id, source,
         md5(array_to_string(
           list_slice(regexp_extract_all(t, '\\S+'), 1, 8), ' ')) AS pfx
  FROM planted
), pcounts AS (
  SELECT source, pfx, CAST(count(*) AS BIGINT) AS cnt
  FROM prefixed GROUP BY 1, 2
)
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN cnt >= 5 THEN 1 END) AS BIGINT)
         AS n_boilerplate_prefixes,
       CAST(sum(CASE WHEN cnt >= 5 THEN cnt ELSE 0 END) AS BIGINT)
         AS n_docs_with_boilerplate,
       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS max_prefix_share
FROM pcounts
GROUP BY source
""",
    doc="Cross-document boilerplate detection — the C4/RefinedWeb-style "
    "cleaning stage the per-doc repetition_profile cannot see: a "
    "template banner shared by thousands of a domain's pages is unique "
    "WITHIN each doc but dominates ACROSS docs.  Documents hash their "
    "8-token prefix; prefixes shared by >= 5 docs of a source are "
    "boilerplate.  The synthetic corpus is word-salad, so a "
    "deterministic per-source banner is PLANTED on doc_id%4==0 first — "
    "the gate then checks exact per-source boilerplate counts and the "
    "dominant prefix share.  Scale shape: one text scan -> md5 of an "
    "8-token slice (in-row) -> hash-agg on (source, prefix) -> "
    "|sources| rollup; the 100 TB cost is the scan plus one "
    "bounded-key shuffle.",
)
def q_boilerplate_prefix_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from quant_market_data_pipeline_spark.queries.llm import _docs

    d = _docs(spark, sf_dir)
    planted = d.select(
        "source",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("standard copyright banner of "),
                F.col("source"),
                F.lit(" all rights reserved "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    prefixed = planted.select(
        "source",
        F.md5(
            F.array_join(
                F.slice(F.regexp_extract_all("t", F.lit(r"\S+"), 0), 1, 8),
                " ",
            )
        ).alias("pfx"),
    )
    pcounts = prefixed.groupBy("source", "pfx").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    boiler = F.col("cnt") >= 5
    return pcounts.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.count(F.when(boiler, 1)).cast("bigint").alias(
            "n_boilerplate_prefixes"
        ),
        F.sum(F.when(boiler, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_with_boilerplate"),
        F.round(
            F.max("cnt").cast("double") / F.sum("cnt"), 6
        ).alias("max_prefix_share"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: corpus share covered by the top-k tokens.
# ---------------------------------------------------------------------------
_COV_KS = [5, 10, 20, 50, 1000, 10000]


@register(
    "vocab_coverage_curve",
    oracle=f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
  FROM documents
), freq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY tok
), total AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM freq
), ranked AS (
  SELECT tok, cnt,
         row_number() OVER (ORDER BY cnt DESC, tok) AS rn
  FROM freq
  QUALIFY rn <= {max(_COV_KS)}
)
SELECT k,
       CAST(max(rn) AS BIGINT) AS vocab_used,
       CAST(sum(cnt) AS BIGINT) AS covered_tokens,
       round(CAST(sum(cnt) AS DOUBLE) / max(n_total), 6) AS coverage
FROM ranked
CROSS JOIN total
CROSS JOIN (SELECT unnest([{", ".join(str(k) for k in _COV_KS)}]) AS k)
WHERE rn <= k
GROUP BY k
""",
    doc="Vocabulary coverage curve — the tokenizer-design diagnostic: "
    "what share of all corpus token OCCURRENCES do the top-k most "
    "frequent types cover, for k in {100..10000}?  Decides the vocab "
    "size a BPE/WordPiece build needs before training it.  Scale "
    "shape: one corpus scan into a (token -> count) hash-agg with "
    "map-side partials, materialized (persist-with-lineage) so the "
    "two consumers — the global occurrence total and the top-k cut — "
    "reuse the vocab frame instead of re-scanning the corpus; the "
    "global top-10000 is a distributed "
    "TakeOrdered (orderBy+limit, per-partition heaps, NO global sort "
    "and no full-vocab single-partition window); the cumulative "
    "ranking then runs on the 10k-row dimension frame and the k-grid "
    "is a broadcast cross join.  Ties broken (count DESC, token) so "
    "the curve is deterministic on both engines.",
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.llm.hashing import word_tokens

    d = _docs_wide(spark, sf_dir)
    # vocab is dimension-sized; materialize it so the corpus is scanned
    # ONCE and both consumers (global total, top-k) reuse the cached frame
    freq = materialize_dim(
        d.select(F.explode(word_tokens(F.lower("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")),
        partitions=8,
    )
    total = freq.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    top = freq.orderBy(F.col("cnt").desc(), "tok").limit(max(_COV_KS))
    ranked = top.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), "tok")),
    )
    ks = d.sparkSession.createDataFrame([(k,) for k in _COV_KS], "k int")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.max("rn").cast("bigint").alias("vocab_used"),
            F.sum("cnt").cast("bigint").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "vocab_used",
            "covered_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("n_total"), 6
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# word2vec-style unigram negative-sampling table: P(w) ~ count(w)^0.75
# with cumulative ranges — the lookup structure an embedding trainer
# samples negatives from (Mikolov et al. 2013 smoothing).
# ---------------------------------------------------------------------------
@register(
    "unigram_negative_sampling_table",
    oracle="""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS token
  FROM documents
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY token
), powed AS (
  SELECT token, cnt, pow(cnt, 0.75) AS w FROM counts
), tot AS (SELECT sum(w) AS tw FROM powed),
probs AS (
  SELECT token, cnt, round(w / tw, 8) AS p FROM powed CROSS JOIN tot
)
SELECT token, cnt, p,
       round(sum(p) OVER (ORDER BY cnt DESC, token
                          ROWS UNBOUNDED PRECEDING) - p, 8) AS cum_lo,
       round(sum(p) OVER (ORDER BY cnt DESC, token
                          ROWS UNBOUNDED PRECEDING), 8) AS cum_hi
FROM probs
""",
    doc="Negative-sampling distribution for embedding training: the "
    "word2vec unigram^0.75 smoothing (Mikolov et al. 2013) flattens "
    "the Zipf head so frequent words are not over-sampled, and the "
    "[cum_lo, cum_hi) ranges turn one uniform draw into a token via "
    "binary search — the table a trainer broadcasts to every worker.  "
    "Determinism follows the filter-stage rule: each p is rounded to "
    "8dp BEFORE the cumulative sum, and the cumulative window's "
    "(cnt DESC, token) order fixes the addition sequence, so cum_* "
    "is bit-identical on both engines (cum_lo is cum_hi - p, the "
    "same expression both sides); pow() 1-ulp drift is 10 orders "
    "below the 1e-8 quantum.  Scale shape: the token count is the "
    "only corpus-sized shuffle (map-side partials); everything after "
    "runs on the vocab DIMENSION (~1e6-1e7 rows even at 100 TB) — "
    "the single-partition cumulative window is the same bounded-dim "
    "rationale as sequence_grid, and the total is a broadcast "
    "scalar.",
)
def q_unigram_negative_sampling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from quant_market_data_pipeline_spark.llm.hashing import word_tokens

    d = _docs_wide(spark, sf_dir)
    counts = (
        d.select(F.explode(word_tokens(F.lower("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    powed = counts.withColumn("w", F.pow("cnt", F.lit(0.75)))
    tot = powed.agg(F.sum("w").alias("tw"))
    probs = powed.crossJoin(F.broadcast(tot)).select(
        "token", "cnt", F.round(F.col("w") / F.col("tw"), 8).alias("p")
    )
    wcum = (
        Window.orderBy(F.col("cnt").desc(), "token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("p").over(wcum)
    return probs.select(
        "token",
        "cnt",
        "p",
        F.round(cum - F.col("p"), 8).alias("cum_lo"),
        F.round(cum, 8).alias("cum_hi"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters with measured overestimate (r9).
# ---------------------------------------------------------------------------
_CMS_ROWS = 4
_CMS_WIDTH = 64
_CMS_TOPK = 20


def cms_bucket_sql(r: str, val: str) -> str:
    """DuckDB fragment: CMS bucket for hash-row expr ``r`` and value
    expr ``val`` — ONE definition shared by the batch heavy-hitter
    oracle and the streaming maintenance oracle (stream_countmin_e2e),
    so the two cannot drift apart (the qh_bin_sql / hll register-
    function discipline)."""
    return (
        f"('0x' || substr(md5({r}::VARCHAR || '|' || {val}), 1, 15))"
        f"::BIGINT % {_CMS_WIDTH}"
    )


def cms_bucket_expr(r: int, val) -> object:
    """Spark twin of cms_bucket_sql — the register function of the
    Count-Min sketch.  A pure per-row map, so per-micro-batch (row,
    bucket) count partials SUM-merge to exactly the batch sketch."""
    from quant_market_data_pipeline_spark.llm.hashing import (
        seeded_md5_long,
    )

    return F.pmod(seeded_md5_long(r, val), F.lit(_CMS_WIDTH))


@register(
    "countmin_heavy_hitters",
    oracle=f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS w
  FROM documents
), hashed AS (
  SELECT w, r.r, {cms_bucket_sql("r.r", "w")} AS bucket
  FROM tok, unnest([{", ".join(str(r) for r in range(_CMS_ROWS))}])
    AS r(r)
), cms AS (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
  FROM hashed GROUP BY r, bucket
), exact AS (
  SELECT w, CAST(count(*) AS BIGINT) AS exact_count FROM tok GROUP BY w
), top AS (
  SELECT w, exact_count FROM (
    SELECT *, row_number() OVER (
      ORDER BY exact_count DESC, w) AS rn
    FROM exact) WHERE rn <= {_CMS_TOPK}
), est AS (
  SELECT t.w, t.exact_count, min(cms.c) AS cms_estimate
  FROM top t, unnest([{", ".join(str(r) for r in range(_CMS_ROWS))}])
    AS r(r)
  JOIN cms ON cms.r = r.r
   AND cms.bucket = {cms_bucket_sql("r.r", "t.w")}
  GROUP BY t.w, t.exact_count
)
SELECT w AS token, exact_count, cms_estimate,
       CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
FROM est
""",
    doc=f"Count-Min sketch accuracy audit: a {_CMS_ROWS}x{_CMS_WIDTH} "
    "CMS over the token stream (seeded-md5 row hashes — the engine's "
    "deterministic hash-family convention, llm/hashing.py), then for "
    f"the top-{_CMS_TOPK} exact heavy hitters the sketch estimate "
    "(min over rows) next to the true count and the one-sided "
    "overestimate (CMS never undercounts — the invariant the test "
    "pins).  THE streaming-frequency primitive at 100 TB: the sketch "
    "is a fixed 256-cell map-side-combinable state regardless of "
    "vocabulary size, so the token exchange carries (row, bucket) "
    "pairs, never the vocabulary; the exact side here exists only to "
    "measure the error a consumer would accept.  Scale shape: one "
    "corpus scan fans out x4 row replicas, one 256-group aggregation; "
    "the audit join is top-k x 4 rows against a broadcast sketch.",
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quant_market_data_pipeline_spark.llm.hashing import word_tokens

    d = _docs_wide(spark, sf_dir)
    tok = d.select(
        F.explode(word_tokens(F.lower("text"))).alias("w")
    )
    # one scan feeds the sketch build AND the exact heavy-hitter side
    tok = materialize_corpus(tok)
    # shared register function (cms_bucket_expr/_sql): ONE definition
    # for this audit and the streaming maintenance (stream_countmin_e2e)
    bucket = cms_bucket_expr

    hashed = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        bucket(r, F.col("w")).alias("bucket"),
                    )
                    for r in range(_CMS_ROWS)
                ]
            )
        ).alias("h")
    ).select("h.r", "h.bucket")
    cms = hashed.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    exact = tok.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    top = (
        exact.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("exact_count").desc(), "w")
            ),
        )
        .filter(F.col("rn") <= _CMS_TOPK)
        .drop("rn")
    )
    probes = top.select(
        "w",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        bucket(r, F.col("w")).alias("bucket"),
                    )
                    for r in range(_CMS_ROWS)
                ]
            )
        ).alias("h"),
    ).select("w", "exact_count", "h.r", "h.bucket")
    est = probes.join(F.broadcast(cms), ["r", "bucket"]).groupBy(
        "w", "exact_count"
    ).agg(F.min("c").alias("cms_estimate"))
    return est.select(
        F.col("w").alias("token"),
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count"))
        .cast("bigint")
        .alias("overestimate"),
    )
