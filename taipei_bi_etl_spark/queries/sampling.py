"""Weighted sampling without replacement — Efraimidis & Spirakis
(2006) exponential-jumps ("A-ExpJ") selection as a distributed top-k:
item i with weight w_i gets key u_i^(1/w_i) for uniform u_i, and the
k largest keys are EXACTLY a weighted sample without replacement.

This was r01-backlogged as "blocked on cross-engine pow/log ulp
differences".  The unblock is twofold:

* the key is computed as ln(u)/w — same argmax set as u^(1/w)
  (monotone transform), avoiding ``pow`` entirely; ``ln`` is within
  1 ulp on both engines and the inputs are exact rationals, so a
  ranking flip needs two keys within ~1e-16 relative — vanishing for
  hash-derived uniforms;
* u derives from the first 15 hex chars of md5 (the repo's portable
  60-bit hash, same bits on both engines), u = (h + 0.5) / 2^60 —
  an EXACT dyadic rational, bit-identical cross-engine.

The output exposes only the selected (doc_id, weight) membership —
never the float keys — so the oracle hash cannot flap on last-digit
rendering.  tests/test_sampling.py adds the statistical gate: across
independent salts, inclusion frequency tracks weight.

Scale: one map-side key computation + one TakeOrderedAndProject-shaped
top-k — no shuffle beyond the k-row reduction; the classic reservoir
formulation serializes a stream, this form is embarrassingly parallel
(the same reason the paper's Algorithm A beats sequential reservoirs
on partitioned data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

SAMPLE_K = 50
_M = 1 << 60  # 15 hex chars of md5 → exact 60-bit uniform


def _u(col):
    """Portable exact-dyadic uniform in (0,1) from md5(col)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(_M))


_AEXPJ_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS weight,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            + 0.5) / {float(_M)} AS u
  FROM documents
)
SELECT doc_id, weight
FROM w
QUALIFY ROW_NUMBER() OVER (ORDER BY ln(u) / weight DESC, doc_id) <= {SAMPLE_K}
"""


@query(
    "weighted_sample_aexpj",
    oracle=_AEXPJ_ORACLE,
    tags=("curation", "sampling", "extension"),
)
def weighted_sample_aexpj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted document sample without replacement (K=50):
    heavier documents proportionally likelier, no document twice —
    the sampling primitive for building token-budgeted eval/train
    subsets where uniform row sampling would under-represent long
    documents.

    Content-addressed like every sampler in this repo: the uniform
    comes from md5(doc_id), so the sample is stable under
    repartitioning and re-ingestion."""
    d = read_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("long").alias("weight"),
        _u(F.col("doc_id")).alias("u"),
    )
    key = F.log(F.col("u")) / F.col("weight")
    return (
        w.orderBy(key.desc(), F.col("doc_id"))
        .limit(SAMPLE_K)
        .select("doc_id", "weight")
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment — exact per-class balance.
# ---------------------------------------------------------------------------

K_FOLDS = 5

_KFOLD_ORACLE = f"""
WITH ranked AS (
  SELECT label,
         (ROW_NUMBER() OVER (
            PARTITION BY label ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          ) - 1) % {K_FOLDS} AS fold
  FROM embeddings WHERE label IS NOT NULL
)
SELECT label, CAST(fold AS INT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM ranked GROUP BY 1, 2
"""


@query(
    "stratified_kfold_assignment",
    oracle=_KFOLD_ORACLE,
    tags=("curation", "sampling", "extension"),
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validation folds stratified by label with EXACT per-class
    balance: within each label, rows rank by a content-addressed key
    (md5 of the id — stable under repartitioning / re-ingestion, like
    every sampler here) and fold = rank mod K, so per (label, fold)
    counts differ by at most one.  Output is the (label, fold, count)
    balance certificate.

    Scale: one window per label.  A label that dominates the corpus
    serializes its rank on one task — at that scale trade exactness
    for `pmod(xxhash64(id), K)` (only approximately balanced, fully
    parallel), or salt the rank per label shard and take mod K of
    (shard_rank · n_shards + shard).  The exact form is right for the
    label-cardinality regimes a labeled training corpus actually has.
    """
    from pyspark.sql import Window

    # an unlabeled vector cannot be stratified — filtered both sides
    e = read_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = e.select(
        "label",
        ((F.row_number().over(w) - 1) % K_FOLDS).cast("int").alias("fold"),
    )
    return ranked.groupBy("label", "fold").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
