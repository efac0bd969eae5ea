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
    """
    d = read_table(spark, sf_dir, "documents")
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
