"""Label-quality operators over the embedding corpus — the curation
step a training pipeline runs between embedding and training: find
probably-mislabeled examples (Cleanlab-style neighborhood consensus,
Northcutt et al. 2021) and mine hard negatives for metric learning
(Schroff et al. 2015's semi-hard mining, the batch-offline form).

Both are exact brute-force kernels in the `ann_cosine_topk` house
pattern (broadcast one side, deterministic (sim DESC, id ASC) ranking,
ROUND(sim, 6) only in the projection) — at 100 TB swap the
candidate-generation stage for the JL shortlist or IVF forms in
`similarity.py`/`clustering.py`; the per-candidate ranking and label
logic below is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.similarity import (
    _corpus_with_norm,
    cosine,
)

K_NN = 10
N_HARD_QUERIES = 50
HARD_K = 5

_PAIR_CTE = """
e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
"""

_CONSISTENCY_ORACLE = f"""
WITH {_PAIR_CTE},
ranked AS (
  SELECT a.vec_id, a.label,
         CASE WHEN b.label = a.label THEN 1 ELSE 0 END AS same,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_inner_product(a.emb, b.emb) / (a.nrm * b.nrm) DESC,
                    b.vec_id
         ) AS rn
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
SELECT vec_id, label,
       CAST(SUM(same) AS BIGINT) AS k_same,
       CAST(SUM(same) * 2 < {K_NN} AS BOOLEAN) AS flagged
FROM ranked WHERE rn <= {K_NN}
GROUP BY vec_id, label
"""


@query(
    "knn_label_consistency",
    oracle=_CONSISTENCY_ORACLE,
    tags=("similarity", "curation", "extension"),
)
def knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every vector: how many of its K nearest neighbors share its
    label, flagging points whose neighborhood majority disagrees —
    the confident-learning screen for label errors run before a
    labeled corpus is trusted for training.

    Scale: the corpus side is broadcast once (|V|·dim doubles); the
    only shuffle is the per-vector top-K window keyed on vec_id.
    ALL-pairs candidate generation is the exact kernel — at corpus
    sizes where n² scans stop being free, generate candidates with
    `ann_jl_shortlist_topk`'s 16-dim pass or the IVF cells and keep
    this ranking stage as-is.
    """
    corpus = _corpus_with_norm(spark, sf_dir)
    a = corpus.select(
        F.col("vec_id"), F.col("label"),
        F.col("emb").alias("ea"), F.col("norm").alias("na"),
    )
    b = corpus.select(
        F.col("vec_id").alias("nbr_id"), F.col("label").alias("nbr_label"),
        F.col("emb").alias("eb"), F.col("norm").alias("nb"),
    )
    sim = cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("nbr_id"))
    ranked = (
        a.join(F.broadcast(b), F.col("vec_id") != F.col("nbr_id"))
        .select(
            "vec_id", "label",
            (F.col("nbr_label") == F.col("label")).cast("int").alias("same"),
            sim.alias("sim"),
            "nbr_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K_NN)
    )
    return ranked.groupBy("vec_id", "label").agg(
        F.sum("same").cast("long").alias("k_same"),
        (F.sum("same") * 2 < K_NN).alias("flagged"),
    )


_HARD_NEG_ORACLE = f"""
WITH {_PAIR_CTE},
q AS (
  SELECT vec_id AS query_id, label AS qlabel, emb AS qemb, nrm AS qnrm
  FROM e WHERE vec_id < {N_HARD_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neg_label,
         list_inner_product(e.emb, q.qemb) / (e.nrm * q.qnrm) AS sim
  FROM e JOIN q ON e.vec_id <> q.query_id AND e.label <> q.qlabel
)
SELECT query_id, neighbor_id, neg_label,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY sim DESC, neighbor_id
       ) AS INT) AS rank,
       ROUND(sim, 6) AS cosine_sim
FROM scored
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY query_id ORDER BY sim DESC, neighbor_id
) <= {HARD_K}
"""


@query(
    "ann_hard_negatives",
    oracle=_HARD_NEG_ORACLE,
    tags=("similarity", "curation", "extension"),
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each query vector, the K most similar
    vectors carrying a DIFFERENT label — the offline pass that builds
    contrastive/metric-learning batches (the highest-similarity wrong-
    label examples are the gradient-bearing ones).

    Scale: same shape as `ann_cosine_topk` (broadcast queries, one
    corpus scan, per-query top-k shuffle); the label-mismatch
    predicate lands in the scan filter, BEFORE ranking, so the window
    input shrinks by the positive-class mass.
    """
    corpus = _corpus_with_norm(spark, sf_dir)
    q = corpus.filter(F.col("vec_id") < N_HARD_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    sim = cosine(F.col("emb"), F.col("qemb"), F.col("norm"), F.col("qnorm"))
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neg_label"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= HARD_K)
        .select(
            "query_id", "neighbor_id", "neg_label", "rank",
            F.round("sim", 6).alias("cosine_sim"),
        )
    )


# ---------------------------------------------------------------------------
# JL-shortlist twin — the corpus-scale path for the consistency screen.
# ---------------------------------------------------------------------------

KNN_SHORT = 64


def _consistency_jl_oracle() -> str:
    from taipei_bi_etl_spark.queries.similarity import _jl_rows, _jl_sql_row

    proj = ", ".join(
        "list_inner_product(embedding::DOUBLE[], " + _jl_sql_row(r) + ")"
        for r in _jl_rows()
    )
    return f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm,
         [{proj}] AS p
  FROM embeddings
), pn AS (
  SELECT vec_id, label, emb, nrm, p,
         sqrt(list_inner_product(p, p)) AS pnrm
  FROM e
), shortlist AS (
  SELECT a.vec_id, a.label, a.emb, a.nrm,
         b.vec_id AS nbr_id, b.label AS nbr_label, b.emb AS bemb,
         b.nrm AS bnrm
  FROM pn a JOIN pn b ON a.vec_id <> b.vec_id
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY a.vec_id
    ORDER BY list_inner_product(a.p, b.p) / (a.pnrm * b.pnrm) DESC,
             b.vec_id
  ) <= {KNN_SHORT}
), ranked AS (
  SELECT vec_id, label,
         CASE WHEN nbr_label = label THEN 1 ELSE 0 END AS same
  FROM shortlist
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY vec_id
    ORDER BY list_inner_product(emb, bemb) / (nrm * bnrm) DESC, nbr_id
  ) <= {K_NN}
)
SELECT vec_id, label,
       CAST(SUM(same) AS BIGINT) AS k_same,
       CAST(SUM(same) * 2 < {K_NN} AS BOOLEAN) AS flagged
FROM ranked GROUP BY vec_id, label
"""


@query(
    "knn_label_consistency_jl",
    oracle=_consistency_jl_oracle(),
    tags=("similarity", "curation", "extension"),
)
def knn_label_consistency_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale twin of `knn_label_consistency`: candidate
    neighbors come from a 16-dim Johnson-Lindenstrauss shortlist
    (top {KNN_SHORT} by projected cosine — 4× fewer floats per pair),
    and only the shortlist is re-ranked with the exact 64-dim kernel.
    Same (vec_id, label, k_same, flagged) surface; the oracle
    replicates projection, shortlist and re-rank exactly (inlined sign
    matrix — the `ann_jl_shortlist_topk` pattern), so correctness is
    hash-exact, not recall-approximate.

    Scale: the projected corpus is the broadcast side (16 doubles +
    norm per vector, 4× smaller than the exact form's); the exact
    kernel touches |V|·{KNN_SHORT} pairs instead of |V|²."""
    from taipei_bi_etl_spark.queries.similarity import (
        _jl_rows,
        as_double,
        dot,
        l2_norm,
    )
    from taipei_bi_etl_spark.io import read_table

    e = read_table(spark, sf_dir, "embeddings")
    emb = as_double("embedding")
    rows = _jl_rows()
    proj = F.array(
        *[
            dot(emb, F.array(*[F.lit(float(s)) for s in row]))
            for row in rows
        ]
    )
    pn = e.select(
        "vec_id", "label", emb.alias("emb"), l2_norm(emb).alias("norm"),
        proj.alias("p"),
    ).withColumn("pnrm", F.sqrt(dot(F.col("p"), F.col("p")))).persist()
    a = pn.select(
        "vec_id", "label", F.col("emb").alias("ea"), F.col("norm").alias("na"),
        F.col("p").alias("pa"), F.col("pnrm").alias("pna"),
    )
    b = pn.select(
        F.col("vec_id").alias("nbr_id"), F.col("label").alias("nbr_label"),
        F.col("emb").alias("eb"), F.col("norm").alias("nb"),
        F.col("p").alias("pb"), F.col("pnrm").alias("pnb"),
    )
    jl_sim = dot(F.col("pa"), F.col("pb")) / (F.col("pna") * F.col("pnb"))
    w_short = Window.partitionBy("vec_id").orderBy(
        F.desc("jl_sim"), F.asc("nbr_id")
    )
    shortlist = (
        a.join(F.broadcast(b), F.col("vec_id") != F.col("nbr_id"))
        .withColumn("jl_sim", jl_sim)
        .withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= KNN_SHORT)
    )
    exact = cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    w_exact = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.asc("nbr_id")
    )
    ranked = (
        shortlist.withColumn("sim", exact)
        .withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") <= K_NN)
        .select(
            "vec_id", "label",
            (F.col("nbr_label") == F.col("label")).cast("int").alias("same"),
        )
    )
    return ranked.groupBy("vec_id", "label").agg(
        F.sum("same").cast("long").alias("k_same"),
        (F.sum("same") * 2 < K_NN).alias("flagged"),
    )
