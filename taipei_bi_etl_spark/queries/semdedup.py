"""SemDeDup-style semantic deduplication (r10) — centroid-bounded
within-cluster near-dup pruning over the embedding table.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the
embeddings with k-means, compute pairwise cosine INSIDE each cluster
only (the n²→n²/K bound that makes semantic dedup tractable at
web scale), and within every duplicate pair KEEP the point with the
LOWER cosine to its cluster centroid (the most atypical exemplar),
dropping the rest.  This complements the engine's other embedding
dedups: `dedup_embedding_lsh` finds near-EXACT duplicates via random
hyperplanes; SemDeDup prunes semantic redundancy inside semantically
coherent regions at a lower threshold, with the quadratic bounded by
the cluster size instead of the LSH bucket size.

Determinism (the full value-hash oracle): the clustering is the
r05 integer-quantized Lloyd machinery (`ann_deterministic`) — picounit
quantization, {DKM_ITERS} unrolled integer iterations, argmin with
ties to the smaller cell — replayed verbatim in the DuckDB oracle, so
cells are bit-identical across engines.  Every similarity is computed
from EXACT integer dot products cast to double at the last step with
identical expression text, so the drop rule's float comparisons
(centroid_sim of a vs b) agree bit-for-bit.

Drop rule, precisely (the paper's per-pair rule, not connected
components — a point survives only if NO in-cluster neighbor at
cos ≥ {SEMDEDUP_T} out-ranks it): for each qualifying pair the side
with the HIGHER centroid cosine is dropped (ties → the larger
vec_id), and a vector is dropped if ANY pair dooms it.  Documented
deviation from a CC-based reduction: a chain a~b~c can drop both a
and b (each doomed by a different pair) — exactly what the reference
implementation's pairwise epsilon-dedup does within clusters.

100 TB: quantization and assignment are map-side behind one bounded
codebook broadcast; the pair stage shuffles on cell and is quadratic
ONLY within a cell — K grows with the corpus in production (the paper
uses tens of thousands of clusters for web scale; DKM_K here matches
the oracle-replayable trainer), so per-cell work stays bounded the
same way df_cap bounds the shingle index.  The drop join is a
broadcast-able distinct id list per cell.

Reference anchor: the reference engine has no semantic-dedup analog —
this is part of the LLM-training-data surface the build brief adds on
top of reference parity (like MinHash/SimHash before it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.ann_deterministic import (
    _DOT_SQL,
    _QUANT_SQL,
    _argmin_cells,
    _lloyd_init_sql,
    _lloyd_iteration_sql,
    _train_centroids,
    DKM_ITERS,
    DKM_K,
    PICO,
)
from taipei_bi_etl_spark.queries.emb_common import VALID_SQL, read_embeddings

#: within-cluster cosine at-or-above which a pair is a semantic dup.
#: Deliberately equal to the LSH family's NEARDUP_SIM so the corpora's
#: planted near-dups are non-vacuous here too, but an independent
#: constant: SemDeDup's threshold is a curation knob, not a recall
#: target.
SEMDEDUP_T = 0.3


def _idot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (order-free
    int64 fold; |x| ≤ ~5·10⁶ per coord ⇒ 64-term sum ≪ 2⁶³)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _cos(dot_col: Column, sa: Column, sb: Column) -> Column:
    """cos = idot / (√self_a · √self_b), all ingredients exact ints —
    the one float expression, textually mirrored in the oracle."""
    return dot_col.cast("double") / (
        F.sqrt(sa.cast("double")) * F.sqrt(sb.cast("double"))
    )


def _doom_side(
    ca: Column, cb: Column, va: Column, vb: Column
) -> Column:
    """The ONE copy of the SemDeDup drop rule: of a qualifying pair,
    the side with the HIGHER centroid cosine is doomed (keep the most
    atypical exemplar); ties → the larger vec_id.  Shared by the
    registered query and the stored-state kernel so the rule cannot
    drift between the proof shape and the deployment shape."""
    return F.when((ca > cb) | ((ca == cb) & (va > vb)), va).otherwise(vb)


def semdedup_doomed_ids(probe: DataFrame, index: DataFrame) -> DataFrame:
    """Distinct doomed vec_ids from every qualifying within-cell pair
    with at least one side in ``probe`` — the stored-state SemDeDup
    kernel (r10; frames carry (vec_id, cell, qv, sd, centroid_sim),
    the `ivm_store` member layout).

    The drop rule is PER-PAIR LOCAL (each pair dooms exactly one side,
    independent of every other pair), so the doomed SET decomposes
    exactly: doomed(hist ∪ new) = doomed(hist × hist) ∪
    doomed(pairs touching new) — the identity `ivm_store.
    semdedup_state_advance` rides.  A pair with both sides in
    ``probe`` appears in both orientations; the doomed id is the same
    either way and the distinct collapses it.  Note the probe term can
    doom a HISTORY id (a new arrival can out-rank an old member) —
    the kernel emits those too, which is why the advance returns
    doomed ids rather than batch rows."""
    a = probe.select(
        "cell",
        F.col("vec_id").alias("va"),
        F.col("qv").alias("qa"),
        F.col("sd").alias("sa"),
        F.col("centroid_sim").alias("ca"),
    )
    b = index.select(
        "cell",
        F.col("vec_id").alias("vb"),
        F.col("qv").alias("qb"),
        F.col("sd").alias("sb"),
        F.col("centroid_sim").alias("cb"),
    )
    psim = _cos(_idot(F.col("qa"), F.col("qb")), F.col("sa"), F.col("sb"))
    return (
        a.join(b, "cell")
        .filter(F.col("va") != F.col("vb"))
        .filter(psim >= F.lit(SEMDEDUP_T))
        .select(
            _doom_side(
                F.col("ca"), F.col("cb"), F.col("va"), F.col("vb")
            ).alias("vec_id")
        )
        .distinct()
    )


def _semdedup_oracle() -> str:
    iters = ",\n".join(
        _lloyd_iteration_sql(i) for i in range(1, DKM_ITERS + 1)
    )
    last = f"c{DKM_ITERS}"
    dist = (
        "CAST(list_sum(list_transform(list_zip(q.qv, c.cv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
    )
    dot_vc = _DOT_SQL.format(a="v.qv", b="c.cv")
    dot_ab = _DOT_SQL.format(a="a.qv", b="b.qv")
    return f"""
WITH q AS (
  SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings
  WHERE {VALID_SQL}
),
{_lloyd_init_sql("", "q", DKM_K)},
{iters},
fin AS (
  SELECT vec_id, qv, cell FROM (
    SELECT q.vec_id, q.qv, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id ORDER BY {dist}, c.cell) AS rn
    FROM q CROSS JOIN {last} c
  ) WHERE rn = 1
), cent AS (
  SELECT cell, cv,
         {_DOT_SQL.format(a="cv", b="cv")} AS cc
  FROM {last}
), v0 AS (
  SELECT f.vec_id, f.qv, f.cell,
         {_DOT_SQL.format(a="f.qv", b="f.qv")} AS sd
  FROM fin f
), v AS (
  SELECT v.*, CAST({dot_vc} AS DOUBLE)
           / (SQRT(CAST(v.sd AS DOUBLE)) * SQRT(CAST(c.cc AS DOUBLE)))
           AS centroid_sim
  FROM v0 v JOIN cent c USING (cell)
  WHERE v.sd > 0
), pr AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         a.centroid_sim AS ca, b.centroid_sim AS cb,
         CAST({dot_ab} AS DOUBLE)
           / (SQRT(CAST(a.sd AS DOUBLE)) * SQRT(CAST(b.sd AS DOUBLE)))
           AS psim
  FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
), doomed AS (
  SELECT DISTINCT CASE WHEN ca > cb OR (ca = cb AND va > vb)
                       THEN va ELSE vb END AS vec_id
  FROM pr WHERE psim >= {SEMDEDUP_T}
)
SELECT v.vec_id, v.cell,
       ROUND(v.centroid_sim, 6) AS centroid_sim,
       (d.vec_id IS NOT NULL) AS dropped
FROM v LEFT JOIN doomed d ON d.vec_id = v.vec_id
"""


@query(
    "dedup_semantic_centroid",
    oracle=_semdedup_oracle(),
    tags=("dedup", "similarity", "curation", "extension", "trained-state"),
)
def dedup_semantic_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: one row per valid embedding — its deterministic
    k-means cell, its cosine to the cell centroid, and whether the
    within-cluster pairwise rule drops it (module docstring: recipe,
    determinism argument, drop-rule semantics, 100 TB bounds).

    Plan: quantize (map-side) → {DKM_ITERS} integer Lloyd rounds
    (bounded codebook collects) → map-side assignment → per-cell
    self-join (cell-bounded quadratic) → broadcast-able doomed-id
    anti-ish left join."""
    emb = read_embeddings(spark, sf_dir)
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * PICO).cast("long"),
        ).alias("qv"),
    ).persist()
    cents = _train_centroids(quant)
    cent_rows = [
        (j, c, sum(v * v for v in c)) for j, c in enumerate(cents)
    ]
    cent_df = quant.sparkSession.createDataFrame(
        cent_rows, "cell long, cv array<long>, cc long"
    )
    v = (
        quant.withColumn("cell", _argmin_cells(F.col("qv"), cents, 1)[0])
        .withColumn("sd", _idot(F.col("qv"), F.col("qv")))
        .filter(F.col("sd") > 0)
        # bounded: DKM_K centroid rows
        .join(F.broadcast(cent_df), "cell")
        .withColumn(
            "centroid_sim",
            _cos(_idot(F.col("qv"), F.col("cv")), F.col("sd"), F.col("cc")),
        )
        .select("vec_id", "qv", "cell", "sd", "centroid_sim")
        .persist()
    )
    a = v.select(
        "cell",
        F.col("vec_id").alias("va"),
        F.col("qv").alias("qa"),
        F.col("sd").alias("sa"),
        F.col("centroid_sim").alias("ca"),
    )
    b = v.select(
        "cell",
        F.col("vec_id").alias("vb"),
        F.col("qv").alias("qb"),
        F.col("sd").alias("sb"),
        F.col("centroid_sim").alias("cb"),
    )
    psim = _cos(_idot(F.col("qa"), F.col("qb")), F.col("sa"), F.col("sb"))
    doomed = (
        a.join(b, "cell")
        .filter(F.col("va") < F.col("vb"))
        .filter(psim >= F.lit(SEMDEDUP_T))
        .select(
            _doom_side(
                F.col("ca"), F.col("cb"), F.col("va"), F.col("vb")
            ).alias("vec_id")
        )
        .distinct()
        .withColumn("__doomed", F.lit(True))
    )
    return (
        v.join(doomed, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.round("centroid_sim", 6).alias("centroid_sim"),
            F.coalesce("__doomed", F.lit(False)).alias("dropped"),
        )
    )
