"""Keyword search (BM25 top-k) and numeric profiling over the driver
tables — the retrieval/profiling tail of a training-data pipeline
(BASELINE north star; complements the dedup/similarity family).

Cross-engine determinism: scores use ONLY IEEE +,-,*,/ on doubles (the
classic BM25 ``ln`` idf is replaced by its rational odds argument
``(N - df + 0.5)/(df + 0.5)`` — the same monotone ranking, no
transcendental whose last ulp differs between libm builds), and every
score is floored to integer micros before the order-independent sum.
The scoring expression is ONE shared SQL string evaluated by both Spark
(`F.expr`) and DuckDB, so association order is identical by
construction.

Scale: per-term tf/dl are array ops on the token array — zero explode,
zero data shuffle.  Corpus statistics (N, avgdl, per-term df) collapse
into ONE 1-row aggregate that broadcasts back onto the scan, so the
only exchanges are 1-row stat partials and the top-k
(TakeOrderedAndProject — local heaps, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

#: The standing query: a small term set, matched as one disjunctive
#: BM25 query (k1 = 1.2, b = 0.75), top 10 documents.
TERMS = ("spark", "join", "vector", "merge")
TOP_K = 10


def _term_score_sql(t: str) -> str:
    """BM25 term contribution in integer micros — identical text for
    Spark and DuckDB (same parenthesization ⇒ same IEEE rounding)."""
    tf = f"CAST(tf_{t} AS DOUBLE)"
    idf = f"((CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5))"
    tfn = f"(({tf} * 2.2) / ({tf} + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))"
    return (
        f"CASE WHEN tf_{t} > 0 THEN "
        f"CAST(FLOOR({idf} * {tfn} * 1000000.0) AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
    )


_SCORE_SQL = " + ".join(_term_score_sql(t) for t in TERMS)
_MATCHED_SQL = " + ".join(
    f"CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END" for t in TERMS
)

_TOKENIZE_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

_BM25_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         len({_TOKENIZE_DUCK}) AS dl,
         {", ".join(f"len(list_filter({_TOKENIZE_DUCK}, t -> t = '{t}')) AS tf_{t}" for t in TERMS)}
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         {", ".join(f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in TERMS)}
  FROM base
), scored AS (
  SELECT doc_id,
         {_SCORE_SQL} AS score_micros,
         {_MATCHED_SQL} AS matched_terms
  FROM base, stats
), top AS (
  SELECT doc_id, score_micros, matched_terms
  FROM scored
  ORDER BY score_micros DESC, doc_id
  LIMIT {TOP_K}
)
SELECT doc_id, score_micros, CAST(matched_terms AS INT) AS matched_terms,
       CAST(ROW_NUMBER() OVER (ORDER BY score_micros DESC, doc_id) AS INT) AS rank
FROM top
"""


def _tokens() -> Column:
    return F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
    )


def _eq(term: str):
    """Single-arg lambda factory (a 2-arg lambda would be read by
    ``F.filter`` as the (element, index) form)."""
    return lambda x: x == F.lit(term)


@query("text_bm25_search", oracle=_BM25_ORACLE, tags=("text", "extension"))
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword search over ``documents``.

    Reference parity: the reference has no search operator — this is a
    training-data-pipeline extension (corpus retrieval / inspection).

    Plan shape (the 100 TB story): per-doc ``dl`` and per-term ``tf``
    are token-array expressions computed in the scan stage (no explode,
    no (doc, term) shuffle); N / avgdl / df collapse into one 1-row
    aggregate whose partials are the only shuffled bytes; the 1-row
    stats frame broadcasts back; top-k is TakeOrderedAndProject.  The
    idf uses the rational odds form and scores sum as integer micros —
    deterministic under any partitioning (see module docstring).

    widen_scan: per-doc dl/tf token-array expressions are the cost
    center and sit directly above the scan (measured 2.23× whole-query
    at sf0.1, SCALE.md r10).
    """
    from taipei_bi_etl_spark.scale import widen_scan

    d = widen_scan(read_table(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id",
        F.size(_tokens()).alias("dl"),
        *[
            F.size(F.filter(_tokens(), _eq(t))).alias(f"tf_{t}")
            for t in TERMS
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in TERMS
        ],
    )
    # bounded: 1-row corpus stats
    scored = base.join(F.broadcast(stats)).select(
        "doc_id",
        F.expr(_SCORE_SQL).alias("score_micros"),
        F.expr(_MATCHED_SQL).cast("int").alias("matched_terms"),
    )
    top = scored.orderBy(F.desc("score_micros"), "doc_id").limit(TOP_K)
    w = Window.orderBy(F.desc("score_micros"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# Numeric profiling: fixed-width histogram with in-plan bounds.
# ---------------------------------------------------------------------------

N_BUCKETS = 20

_BUCKET_SQL = (
    f"LEAST({N_BUCKETS - 1}, CAST(FLOOR(((value - vmin) / (vmax - vmin))"
    f" * {N_BUCKETS}.0) AS BIGINT))"
)
_LO_SQL = (
    "CAST(FLOOR((vmin + (CAST(bucket AS DOUBLE) * (vmax - vmin))"
    f" / {N_BUCKETS}.0) * 1000000.0) AS BIGINT)"
)
_HI_SQL = (
    "CAST(FLOOR((vmin + (CAST(bucket + 1 AS DOUBLE) * (vmax - vmin))"
    f" / {N_BUCKETS}.0) * 1000000.0) AS BIGINT)"
)

_HIST_ORACLE = f"""
WITH stats AS (
  SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events
), bucketed AS (
  SELECT {_BUCKET_SQL} AS bucket, vmin, vmax
  FROM events, stats
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_LO_SQL} AS lo_micros,
       {_HI_SQL} AS hi_micros
FROM bucketed
GROUP BY bucket, vmin, vmax
"""


@query("numeric_histogram_profile", oracle=_HIST_ORACLE, tags=("profiling", "extension"))
def numeric_histogram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of ``events.value`` with in-plan
    min/max bounds (data profiling for pipeline QA, V-family adjacent —
    the reference's checks are asserts, `tasks/rps.py:94,169`; a real
    corpus run wants distributions, not just floors).

    Plan shape: one 1-row min/max aggregate broadcast back onto the
    scan; bucket assignment is map-side arithmetic; the groupBy
    exchanges at most ``N_BUCKETS`` partial rows per task.  Bounds are
    reported as floored micros — the bucket arithmetic is pure IEEE
    +,-,*,/ so Spark and DuckDB agree bit-for-bit.
    """
    e = read_table(spark, sf_dir, "events")
    stats = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    # bounded: 1-row min/max aggregate
    bucketed = e.join(F.broadcast(stats)).select(
        F.expr(_BUCKET_SQL).alias("bucket"), "vmin", "vmax"
    )
    return (
        bucketed.groupBy("bucket", "vmin", "vmax")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "bucket",
            "n_events",
            F.expr(_LO_SQL).alias("lo_micros"),
            F.expr(_HI_SQL).alias("hi_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation (MRR / precision@k / NDCG@k) — the eval
# harness every search/RAG pipeline runs against labeled queries.  The
# reference has no retrieval surface; this extends the search family
# (BASELINE north star) with the measurement half.
#
# Determinism: ranking is by INTEGER (tf DESC, doc_id ASC) — no float
# enters the ordering; the log2 rank discounts are precomputed PYTHON
# integer-micro literals embedded identically in both plans (no libm at
# query time), so DCG/IDCG are exact integer sums and the single final
# division of identical integers yields the identical double in both
# engines (ROUND 8 is then byte-stable).
#
# Scale note: an eval runs over a LABELED query set — the per-query
# window is bounded by the matching-doc count, and eval corpora are
# small by construction.  For web-scale ad-hoc ranking the BM25 top-k
# above (TakeOrderedAndProject) is the serving path; this operator
# measures it.
# ---------------------------------------------------------------------------

import math as _math

#: (query_id, ranking term, relevance-intent term): a doc is RELEVANT
#: to the query iff it contains BOTH terms; ranking uses only the
#: ranking term's tf, so NDCG genuinely measures how well tf-ranking
#: surfaces the two-term intent (not 1.0 by construction).
EVAL_QUERIES = (
    ("q_spark_join", "spark", "join"),
    ("q_vector_merge", "vector", "merge"),
    ("q_table_scan", "table", "scan"),
    ("q_row_filter", "row", "filter"),
)
EVAL_K = 10

#: floor(1e6 / log2(rank+1)) for rank 1..K — integer literals shared by
#: both engines; position 1 is exactly 1_000_000.
_DISCOUNT_MICROS = tuple(
    int(_math.floor(1_000_000 / _math.log2(r + 1)))
    for r in range(1, EVAL_K + 1)
)


def _rank_eval_oracle() -> str:
    disc = ", ".join(str(d) for d in _DISCOUNT_MICROS)
    branches = "\n  UNION ALL\n".join(
        f"""  SELECT '{qid}' AS query_id,
         doc_id,
         len(list_filter({_TOKENIZE_DUCK}, t -> t = '{rank_t}')) AS tf,
         CASE WHEN len(list_filter({_TOKENIZE_DUCK}, t -> t = '{rank_t}')) > 0
               AND len(list_filter({_TOKENIZE_DUCK}, t -> t = '{rel_t}')) > 0
              THEN 1 ELSE 0 END AS rel
  FROM documents WHERE text IS NOT NULL"""
        for qid, rank_t, rel_t in EVAL_QUERIES
    )
    return f"""
WITH per_doc AS (
{branches}
), matched AS (
  SELECT * FROM per_doc WHERE tf > 0
), totals AS (
  SELECT query_id,
         CAST(COUNT(*) AS INT) AS n_matched,
         CAST(SUM(rel) AS INT) AS n_relevant
  FROM matched GROUP BY 1
), ranked AS (
  SELECT query_id, doc_id, rel,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY tf DESC, doc_id) AS INT) AS rnk
  FROM matched
  QUALIFY rnk <= {EVAL_K}
), disc(rnk, w) AS (
  SELECT CAST(UNNEST(range(1, {EVAL_K} + 1)) AS INT),
         UNNEST([{disc}])
), agg AS (
  SELECT r.query_id,
         CAST(COALESCE(MIN(CASE WHEN r.rel = 1 THEN r.rnk END), 0) AS INT)
           AS first_rel_rank,
         CAST(SUM(r.rel) AS INT) AS n_rel_topk,
         CAST(SUM(r.rel * d.w) AS BIGINT) AS dcg_micros
  FROM ranked r JOIN disc d ON d.rnk = r.rnk
  GROUP BY 1
)
SELECT t.query_id,
       t.n_matched,
       t.n_relevant,
       a.first_rel_rank,
       CAST(CASE WHEN a.first_rel_rank > 0
                 THEN 1000000 // a.first_rel_rank ELSE 0 END AS BIGINT)
         AS mrr_micros,
       a.n_rel_topk,
       a.dcg_micros,
       CAST((SELECT COALESCE(SUM(w), 0) FROM disc
             WHERE rnk <= LEAST(t.n_relevant, {EVAL_K})) AS BIGINT)
         AS idcg_micros,
       ROUND(CASE WHEN t.n_relevant > 0
                  THEN CAST(a.dcg_micros AS DOUBLE) /
                       CAST((SELECT SUM(w) FROM disc
                             WHERE rnk <= LEAST(t.n_relevant, {EVAL_K}))
                            AS DOUBLE)
                  ELSE 0.0 END, 8) AS ndcg_at_k
FROM totals t JOIN agg a USING (query_id)
"""


@query(
    "search_rank_eval",
    oracle=_rank_eval_oracle(),
    tags=("text", "eval", "extension"),
)
def search_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR / NDCG@{EVAL_K} / precision components for the labeled query
    set: one scan builds per-(query, doc) tf + relevance via an explode
    over the query array; ranking is integer (tf DESC, doc_id); the
    discount table is a broadcast literal."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = _tokens()
    per_q = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                F.size(F.filter(toks, _eq(rank_t))).alias("tf"),
                F.when(
                    (F.size(F.filter(toks, _eq(rank_t))) > 0)
                    & (F.size(F.filter(toks, _eq(rel_t))) > 0),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .alias("rel"),
            )
            for qid, rank_t, rel_t in EVAL_QUERIES
        ]
    )
    matched = (
        docs.select("doc_id", F.explode(per_q).alias("q"))
        .select("doc_id", "q.query_id", "q.tf", "q.rel")
        .filter(F.col("tf") > 0)
    )
    totals = matched.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_matched"),
        F.sum("rel").cast("int").alias("n_relevant"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("tf").desc(), F.col("doc_id")
    )
    ranked = (
        matched.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= EVAL_K)
    )
    # rank -> discount-micros literal map
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _DISCOUNT_MICROS]), F.col("rnk")
    )
    agg = ranked.groupBy("query_id").agg(
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rnk"))), F.lit(0)
        )
        .cast("int")
        .alias("first_rel_rank"),
        F.sum("rel").cast("int").alias("n_rel_topk"),
        F.sum(F.col("rel") * disc).cast("long").alias("dcg_micros"),
    )
    # IDCG = prefix sums of the discount literals, indexed by
    # min(n_relevant, K) — a pure literal lookup, no join
    prefix = [0]
    for d in _DISCOUNT_MICROS:
        prefix.append(prefix[-1] + d)
    idcg = F.element_at(
        F.array(*[F.lit(p) for p in prefix]),
        F.least(F.col("n_relevant"), F.lit(EVAL_K)) + 1,
    ).cast("long")
    return (
        totals.join(agg, "query_id")
        .select(
            "query_id",
            "n_matched",
            "n_relevant",
            "first_rel_rank",
            F.when(
                F.col("first_rel_rank") > 0,
                (F.lit(1_000_000) / F.col("first_rel_rank")).cast("long"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("mrr_micros"),
            "n_rel_topk",
            "dcg_micros",
            idcg.alias("idcg_micros"),
            F.round(
                F.when(
                    F.col("n_relevant") > 0,
                    F.col("dcg_micros").cast("double")
                    / idcg.cast("double"),
                ).otherwise(F.lit(0.0)),
                8,
            ).alias("ndcg_at_k"),
        )
    )
