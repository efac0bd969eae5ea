"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling" —
public method): hashed bag-of-ngram features, a target-vs-raw bucket
language model, and per-document importance weights that pick the raw
documents most like the target domain.

Faithfulness notes (documented deviations, both for cross-engine
determinism — the same policy as BM25's rational idf in search.py):

* the per-bucket importance weight uses the CENTERED LIKELIHOOD RATIO
  in integer micros, ``floor(1e6 * (pt_b / pr_b)) - 1e6``, instead of
  its logarithm — same sign and same per-feature monotone direction,
  but pure IEEE +,*,/ on doubles with identical expression text in
  both engines (no transcendental whose last ulp differs between libm
  builds).  The ratio itself is evaluated in doubles, which IEEE
  rounds identically everywhere.
* the paper's Gumbel-top-k resampling noise is dropped: selection is
  the deterministic top-K by weight (doc_id tiebreak).  A production
  run would add seeded Gumbel noise per doc_id — one extra map-side
  expression, no plan change.

Reference parity: the reference has no data-selection surface — this
is a training-data-pipeline extension (BASELINE north star; SURVEY
§7.1 step 8 family).

Scale (the 100 TB story): feature extraction is a linear explode of
unigram+bigram hashes (map-side, no data shuffle of text); the bucket
LM collapses into ``B_BUCKETS`` rows (one partial per task — the only
corpus-wide state), broadcast back onto the feature stream; per-doc
scores aggregate map-side-combined on ``doc_id``; the final selection
is a TakeOrderedAndProject (local heaps, never a global sort).  Raw
corpus size never concentrates on the driver or on any single key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.text import HASH_MOD, _char_array, poly_hash

B_BUCKETS = 128  #: hashed-feature buckets (the paper uses 10k at web scale)
TARGET_SOURCE = "src0"  #: in-domain proxy; every other source is "raw"
TOP_K = 100
_BASE = 31  #: polynomial hash base — shared with text.py's fingerprints

#: Centered likelihood-ratio weight in integer micros.  Laplace +1 on
#: bucket counts, +B on totals; all operands cast to DOUBLE first so
#: both engines evaluate the identical IEEE expression.
_WEIGHT_SQL = (
    "CAST(FLOOR(((CAST(ct AS DOUBLE) + 1.0) * (CAST(tr AS DOUBLE) + "
    f"{B_BUCKETS}.0)) / ((CAST(cr AS DOUBLE) + 1.0) * (CAST(tt AS DOUBLE)"
    f" + {B_BUCKETS}.0)) * 1000000.0) AS BIGINT) - 1000000"
)

#: Each TOKEN is char-hashed exactly once; a bigram feature combines
#: the two token hashes arithmetically (h1*1009 + h2 mod p) instead of
#: re-hashing the concatenated string — ~3x less char work, same
#: 2-universal family, identical in both engines.
_BIGRAM_MIX = 1009

_POLY_DUCK = (
    "list_reduce(list_transform(list_filter(string_split(w, ''),"
    " c -> c <> ''), c -> ascii(c)::BIGINT),"
    f" (acc, x) -> (acc * {_BASE} + x) % {HASH_MOD})"
)

_DSIR_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, source,
         list_transform(
           list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
           w -> {_POLY_DUCK}) AS hs
  FROM documents
), hashed AS (
  SELECT doc_id, source,
         unnest(list_concat(
           list_transform(hs, h -> h % {B_BUCKETS}),
           CASE WHEN len(hs) >= 2
                THEN list_transform(range(1, len(hs)),
                       i -> ((hs[i] * {_BIGRAM_MIX} + hs[i+1])
                             % {HASH_MOD}) % {B_BUCKETS})
                ELSE []::BIGINT[] END)) AS b
  FROM tokd
), cnt AS (
  SELECT b,
         CAST(SUM(CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN source <> '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS BIGINT) AS cr
  FROM hashed GROUP BY b
), tot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr
  FROM cnt
), w AS (
  SELECT b, {_WEIGHT_SQL} AS wt FROM cnt, tot
), scored AS (
  SELECT h.doc_id,
         CAST(SUM(w.wt) AS BIGINT) AS score_micros,
         CAST(COUNT(*) AS BIGINT) AS n_features
  FROM hashed h JOIN w USING (b)
  WHERE h.source <> '{TARGET_SOURCE}'
  GROUP BY h.doc_id
), top AS (
  SELECT * FROM scored ORDER BY score_micros DESC, doc_id LIMIT {TOP_K}
)
SELECT doc_id, score_micros, n_features,
       CAST(ROW_NUMBER() OVER (ORDER BY score_micros DESC, doc_id) AS INT)
         AS rank
FROM top
"""


def _buckets(tok: Column) -> Column:
    """Per-doc feature-bucket array: unigram buckets ++ bigram buckets
    from per-token hashes.  ``greatest(size-1, 0)``: with the filtered
    tokenizer a zero-token document reaches here, and slice rejects
    negative lengths at runtime."""
    hs = F.transform(tok, lambda t: poly_hash(_char_array(t), base=_BASE))
    uni = F.transform(hs, lambda h: h % B_BUCKETS)
    n1 = F.greatest(F.size(hs) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(hs, 1, n1),
        F.slice(hs, 2, n1),
        lambda a, b: ((a * _BIGRAM_MIX + b) % HASH_MOD) % B_BUCKETS,
    )
    return F.concat(uni, bi)


@query("dsir_importance_sample", oracle=_DSIR_ORACLE, tags=("curation", "extension"))
def dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the ``TOP_K`` raw documents whose hashed-ngram profile
    best matches the ``TARGET_SOURCE`` corpus (DSIR importance
    resampling, deterministic form — see module docstring).

    Plan shape: one linear feature explode; a ``B_BUCKETS``-row bucket
    LM (+ its 1-row totals) broadcast back; per-doc score aggregation
    map-side-combined on ``doc_id``; TakeOrderedAndProject for the
    selection.  The only corpus-wide exchanges carry ≤ ``B_BUCKETS``
    partial rows per task and (doc_id, partial-sum) pairs.
    """
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: the hashed-feature explode is map-side above the scan
    # (measured 2.95× whole-query at sf0.1, SCALE.md r10)
    d = widen_scan(read_table(spark, sf_dir, "documents"))
    # Empty tokens MUST be filtered: an empty-string token crashes the
    # oracle's list_reduce (no initial value) while Spark's F.aggregate
    # silently hashes it to 0 — an asymmetric failure, not just drift.
    tok = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    hashed = d.select(
        "doc_id", "source", F.explode(_buckets(tok)).alias("b")
    )
    is_t = F.col("source") == TARGET_SOURCE
    cnt = hashed.groupBy("b").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("long").alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("long").alias("tt"),
        F.sum("cr").cast("long").alias("tr"),
    )
    # bounded: 1-row total
    w = cnt.join(F.broadcast(tot)).select("b", F.expr(_WEIGHT_SQL).alias("wt"))
    scored = (
        hashed.filter(~is_t)
        # bounded: 128-row bucket-LM weight frame
        .join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("wt").alias("score_micros"),
            F.count(F.lit(1)).alias("n_features"),
        )
    )
    top = scored.orderBy(F.desc("score_micros"), "doc_id").limit(TOP_K)
    rank_w = Window.orderBy(F.desc("score_micros"), "doc_id")
    return top.withColumn("rank", F.row_number().over(rank_w).cast("int"))
