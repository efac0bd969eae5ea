"""Round-4d corpus-forensics operators: positional boilerplate
detection and the shingle-novelty (dedup-saturation) curve — the two
audits a pipeline runs to decide WHERE to clean and WHETHER more data
is still adding information (BASELINE north star; the reference has no
text-curation surface).

Cross-engine determinism: counts and integer-micro ratios only; the
per-source argmax tie-breaks on the token text, so the winner is
deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

_TOK_DUCK = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


def _tok() -> F.Column:
    return F.filter(F.split("text", r"\s+"), lambda t: t != "")


# ---------------------------------------------------------------------------
# Positional boilerplate: does a source share its openings/closings?
# ---------------------------------------------------------------------------

_BOILER_ORACLE = f"""
WITH tokd AS (
  SELECT source, {_TOK_DUCK} AS tok
  FROM documents WHERE text IS NOT NULL
), pos AS (
  SELECT source, tok[1] AS first_tok, tok[len(tok)] AS last_tok
  FROM tokd WHERE len(tok) > 0
), f AS (
  SELECT source, first_tok AS tok, COUNT(*) AS c,
         'first' AS position
  FROM pos GROUP BY source, first_tok
  UNION ALL
  SELECT source, last_tok, COUNT(*), 'last'
  FROM pos GROUP BY source, last_tok
), n AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM pos GROUP BY source
), top AS (
  SELECT source, position, tok, c,
         ROW_NUMBER() OVER (PARTITION BY source, position
                            ORDER BY c DESC, tok) AS rn
  FROM f
)
SELECT t.source, t.position, t.tok AS top_token,
       CAST(t.c AS BIGINT) AS n_docs_with_token,
       n.n_docs,
       CAST(t.c * 1000000 // n.n_docs AS BIGINT) AS share_micros
FROM top t JOIN n USING (source)
WHERE t.rn = 1
"""


@query(
    "boilerplate_position_profile",
    oracle=_BOILER_ORACLE,
    tags=("text", "profiling", "extension"),
)
def boilerplate_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source positional boilerplate signal: the most common FIRST
    and LAST token across a source's documents and the share of
    documents carrying it — a high share means the source wraps its
    content in a template (headers, footers, navigation chrome), the
    cue to run a boilerplate-stripping pass before dedup (templated
    wrappers inflate every similarity measure).

    Determinism: the per-(source, position) argmax tie-breaks on the
    token text; shares are integer micros.

    Scale shape: first/last tokens come straight out of the scan
    projection (element_at — no explode of the document body), then
    two bounded-key hash aggregates and a (source, position)-
    partitioned ROW_NUMBER window; nothing corpus-sized survives the
    first aggregate.
    """
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = _tok()
    # try_element_at: ANSI element_at THROWS on the empty array a
    # whitespace-only document produces (hostile-sweep catch)
    pos = d.select(
        "source",
        F.try_element_at(tok, F.lit(1)).alias("first_tok"),
        F.try_element_at(tok, F.lit(-1)).alias("last_tok"),
    ).filter(F.col("first_tok").isNotNull())
    f = (
        pos.select("source", F.col("first_tok").alias("tok"))
        .withColumn("position", F.lit("first"))
        .unionByName(
            pos.select("source", F.col("last_tok").alias("tok")).withColumn(
                "position", F.lit("last")
            )
        )
        .groupBy("source", "position", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = pos.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("source", "position").orderBy(
        F.desc("c"), F.asc("tok")
    )
    top = f.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return top.join(n, "source").select(
        "source",
        "position",
        F.col("tok").alias("top_token"),
        F.col("c").cast("long").alias("n_docs_with_token"),
        "n_docs",
        F.expr("CAST(c * 1000000 DIV n_docs AS BIGINT)").alias(
            "share_micros"
        ),
    )


# ---------------------------------------------------------------------------
# Shingle-novelty curve: is more data still adding information?
# ---------------------------------------------------------------------------

NOVELTY_BUCKETS = 10

_NOVELTY_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, {_TOK_DUCK} AS tok
  FROM documents WHERE text IS NOT NULL
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tok) - 1, 1)),
                i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS shingle
  FROM tokd
), firsts AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
), per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM sh s JOIN firsts f USING (shingle)
  GROUP BY s.doc_id
), bounds AS (
  SELECT MAX(doc_id) AS mx FROM per_doc
)
SELECT CAST(LEAST(doc_id * {NOVELTY_BUCKETS} // (mx + 1),
                  {NOVELTY_BUCKETS - 1}) AS INT) AS ingest_decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) * 1000000 // SUM(n_shingles) AS BIGINT)
         AS novelty_micros
FROM per_doc CROSS JOIN bounds
GROUP BY ingest_decile
"""


@query(
    "shingle_novelty_curve",
    oracle=_NOVELTY_ORACLE,
    tags=("text", "dedup", "profiling", "extension"),
)
def shingle_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-saturation curve: treating doc_id as ingest order, the
    fraction of each decile's 3-gram shingles that are NOVEL (first
    seen in that document).  A curve collapsing toward zero means new
    data is mostly repeating the corpus — the signal scaling-law
    pipelines read before paying for more of a source.

    Exactly computable with no running state: a shingle's first-seen
    document is just ``MIN(doc_id)`` per shingle — one hash aggregate —
    and per-doc novelty is a join back on the shingle.  (The naive
    formulation — a cumulative distinct count per prefix — would need a
    quadratic self-join or ordered state; the MIN trick is the
    distributed form.)

    Scale shape: distinct (doc, shingle) explode → MIN aggregate on the
    8-byte shingle hash key → join back on the same key (co-partitioned
    by AQE) → bounded (decile) rollup.  Skew-free: shingle keys hash
    uniformly; no global sort, no window.
    """
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # hashed shingles for the join key (8-byte), the oracle keeps the
    # string spelling — same set per doc (shingle_hash_array is
    # distinct), so counts agree
    sh = d.select(
        "doc_id", F.explode(shingle_hash_array(_tok())).alias("shingle")
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    mx = per_doc.agg(F.max("doc_id").alias("mx"))
    return (
        # bounded: 1-row max aggregate
        per_doc.crossJoin(F.broadcast(mx))
        .select(
            F.expr(
                f"CAST(LEAST(doc_id * {NOVELTY_BUCKETS} DIV (mx + 1),"
                f" {NOVELTY_BUCKETS - 1}) AS INT)"
            ).alias("ingest_decile"),
            "n_shingles",
            "n_novel",
        )
        .groupBy("ingest_decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_shingles").cast("long").alias("n_shingles"),
            F.sum("n_novel").cast("long").alias("n_novel"),
            F.expr(
                "CAST(SUM(n_novel) * 1000000 DIV SUM(n_shingles) AS BIGINT)"
            ).alias("novelty_micros"),
        )
    )
