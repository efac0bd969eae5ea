"""Corpus profiling / layout operators, round 3: per-document tf-idf
keyword extraction, Z-order layout keys for locality-preserving file
clustering, and per-dimension embedding statistics — the profiling
tail of a training-data pipeline (what you run to KNOW a corpus before
training on it), in the established determinism regime: no
transcendentals (the tf-idf idf is the BM25 rational-odds form from
``search.py``), integer micros everywhere a float would cross the
engine boundary, and any shared float expression evaluated from ONE
SQL string by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim

# ---------------------------------------------------------------------------
# tf-idf top terms per document.
# ---------------------------------------------------------------------------

TFIDF_K = 5

#: identical text for Spark's F.expr and DuckDB — same parenthesization,
#: same IEEE rounding; the ln-free odds idf is monotone in the classic
#: idf, so ranking is unchanged and no libm ulp can flip a floor.
_TFIDF_SCORE_SQL = (
    "CAST(FLOOR(CAST(tf AS DOUBLE)"
    " * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
    " / (CAST(df AS DOUBLE) + 0.5))"
    " * 1000000.0) AS BIGINT)"
)

_TOKENIZE_DUCK = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " t -> t <> '')"
)

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENIZE_DUCK}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, {_TFIDF_SCORE_SQL} AS score_micros
  FROM tf JOIN df USING (term), stats
)
SELECT doc_id, term,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY doc_id ORDER BY score_micros DESC, term
       ) AS INT) AS rank,
       score_micros
FROM scored
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY doc_id ORDER BY score_micros DESC, term
) <= {TFIDF_K}
"""


@query("tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("text", "extension"))
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {TFIDF_K} most characteristic terms of every document by
    tf-idf — the per-document keyword profile (corpus tagging, topic
    drill-downs, dedup-cluster naming).  Complements `text_bm25_search`
    (query → documents); this is document → terms.

    Scale: ONE explode to (doc, term) pairs, tf in the same shuffle;
    df is a second aggregate keyed on term whose result is a
    VOCABULARY-sized frame — broadcast back onto the tf frame (never a
    corpus-sized shuffle); n_docs is a 1-row broadcast.  The final
    top-k windows on doc_id, the same key tf already shuffled on, so
    AQE plans it without a second exchange.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(bcast_dim(df), "term")
        # bounded: 1-row count
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_micros", F.expr(_TFIDF_SCORE_SQL))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micros"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TFIDF_K)
        .select("doc_id", "term", "rank", "score_micros")
    )


# ---------------------------------------------------------------------------
# Z-order layout key — locality-preserving clustering for file skipping.
# ---------------------------------------------------------------------------

Z_BITS = 16
Z_BUCKET_SHIFT = 24


def _interleave_sql(a: str, b: str) -> str:
    """Bit-interleave the low {Z_BITS} bits of two BIGINTs — ``a`` on
    even positions, ``b`` on odd.  Pure integer shifts/masks, one
    shared expression string for both engines."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_ZKEY_SQL = _interleave_sql(
    f"(l_partkey % {1 << Z_BITS})", f"(l_suppkey % {1 << Z_BITS})"
)

_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT l_partkey, l_suppkey, {_ZKEY_SQL} AS zkey FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
)
SELECT zkey >> {Z_BUCKET_SHIFT} AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
       CAST(MIN(l_partkey) AS BIGINT) AS min_part,
       CAST(MAX(l_partkey) AS BIGINT) AS max_part
FROM keyed
GROUP BY 1
"""


@query("zorder_layout_profile", oracle=_ZORDER_ORACLE, tags=("layout", "extension"))
def zorder_layout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over (l_partkey, l_suppkey) and the
    per-Z-bucket locality profile — the layout computation behind
    multi-dimensional file clustering (Delta/Iceberg ``ZORDER BY``):
    range-partitioning by zkey puts rows close in BOTH dimensions into
    the same files, so min/max footer stats prune scans filtered on
    EITHER key.  The profile shows it: each bucket covers a narrow
    part-key band (min_part..max_part) AND a bounded supplier set.

    Scale: the key is 32 integer bit-ops per row, map-side; writing
    the layout is ``repartitionByRange(zkey) + sortWithinPartitions``
    (`io.write_clustered`).  The profile here is one hash aggregate.
    The engine helper `scale.zorder_key` computes the same interleave
    (cross-pinned in tests); THIS form keeps the SQL-string shape so
    the oracle runs the identical expression, and uses modulo rather
    than clamping so the key stays faithful at any scale factor.
    """
    # NULL layout keys carry no locality meaning — excluded in BOTH
    # engines (hostile relational sweep: the NULL z-bucket's all-NULL
    # min/max break the driver compare's row sort)
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    keyed = li.select(
        "l_partkey", "l_suppkey", F.expr(_ZKEY_SQL).alias("zkey")
    )
    return (
        keyed.groupBy(
            F.expr(f"zkey >> {Z_BUCKET_SHIFT}").alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics — exact integer micros.
# ---------------------------------------------------------------------------

_DIM_STATS_ORACLE = """
WITH comps AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS x
  FROM embeddings
)
SELECT CAST(dim AS INT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT)
         AS mean_micros,
       CAST(MIN(x) AS BIGINT) AS min_micros,
       CAST(MAX(x) AS BIGINT) AS max_micros,
       CAST(SUM(CAST(x AS DECIMAL(38, 0)) * x) AS DECIMAL(38, 0))
         AS sum_sq_micros2,
       CAST(SUM(x) AS BIGINT) AS sum_micros
FROM comps
GROUP BY dim
"""


@query(
    "embedding_dim_stats",
    oracle=_DIM_STATS_ORACLE,
    tags=("similarity", "profile", "extension"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / min / max / variance of every embedding dimension — the
    collapse screen (dead or exploding dimensions) and normalization
    input a pipeline computes before ANN indexing or training.

    Determinism: components are floored to integer micros FIRST, so
    all sums are exact integer arithmetic — a double sum's value
    depends on partition merge order and can flip a floored digit.
    Variance is emitted as its EXACT ingredients (n, Σx, Σx²) rather
    than a divided value: decimal division rounds at different scales
    in different engines before any floor, the one cross-engine trap
    integer policy can't paper over.  Σx² runs in DECIMAL(38,0) —
    it crosses int64 inside real corpus sizes (SCALE.md's escalation
    rule).  The mean's floor-of-double-division is exact while Σx <
    2^53 (IEEE division is correctly rounded on exact operands).

    Scale: one posexplode (map-side) + ONE hash aggregate keyed on
    the |dim|-sized key space.  Partials collapse map-side, so the
    shuffle is |dims| × partitions rows regardless of corpus size.
    """
    e = read_table(spark, sf_dir, "embeddings")
    comps = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        )
    ).select(
        "dim",
        F.floor(F.col("v") * 1_000_000.0).cast("long").alias("x"),
    )
    n = F.count(F.lit(1))
    sx = F.sum("x")
    sxx = F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
    return comps.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        n.cast("long").alias("n"),
        F.floor(sx / n).cast("long").alias("mean_micros"),
        F.min("x").cast("long").alias("min_micros"),
        F.max("x").cast("long").alias("max_micros"),
        sxx.cast("decimal(38,0)").alias("sum_sq_micros2"),
        sx.cast("long").alias("sum_micros"),
    )


# ---------------------------------------------------------------------------
# Dedup impact accounting — the report a dedup pass publishes.
# ---------------------------------------------------------------------------

_DEDUP_IMPACT_ORACLE = """
WITH keyed AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
           AS n_tokens,
         md5(text) AS digest
  FROM documents
), kept AS (
  SELECT *,
         doc_id = MIN(doc_id) OVER (PARTITION BY digest) AS keep
  FROM keyed
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
         AS n_tokens_kept,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE n_tokens END) * 1000000
            // NULLIF(SUM(n_tokens), 0) AS BIGINT) AS removed_ppm
FROM kept
GROUP BY source
"""


@query(
    "dedup_impact_report",
    oracle=_DEDUP_IMPACT_ORACLE,
    tags=("dedup", "profile", "extension"),
)
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source accounting of an exact-dedup pass: documents and
    tokens before vs after, and the removed-token rate in exact ppm —
    the table a curation pipeline publishes so downstream consumers
    know how much (and whose) mass dedup deleted.  Survivor rule is
    `dedup_exact`'s: keep the minimum doc_id per md5(text) group.

    Scale: one shuffle on the 128-bit digest (uniform, skew-free) to
    mark survivors via a window min, one hash aggregate on source.
    Exact integers only — the rate is a cross-multiplied ppm, never a
    hashed float division.
    """
    d = read_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n_tokens"),
        F.md5("text").alias("digest"),
    )
    kept = keyed.withColumn(
        "keep",
        F.col("doc_id")
        == F.min("doc_id").over(Window.partitionBy("digest")),
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("n_tokens_kept"),
        # try_divide + NULLIF twin (r03 ADVICE #5): a source whose
        # documents are all empty has zero tokens — report NULL ppm
        # instead of DIVIDE_BY_ZERO in either engine.  Values are
        # non-negative, so DuckDB's truncating integer // equals floor.
        F.floor(
            F.try_divide(
                F.sum(
                    F.when(F.col("keep"), 0).otherwise(F.col("n_tokens"))
                )
                * 1_000_000,
                F.sum("n_tokens"),
            )
        )
        .cast("long")
        .alias("removed_ppm"),
    )
