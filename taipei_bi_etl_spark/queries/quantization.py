"""Product quantization (PQ) ANN over the embedding corpus — the
memory-bound scale path for similarity search (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

Where IVF (`ann_ivf_topk`) bounds the SEARCH (probe a few cells), PQ
bounds the BYTES: each vector is stored as M sub-space codeword ids
(here 8 bytes for a 64-dim float vector — a 32× compression), and query
distance is computed against a tiny per-query lookup table (ADC,
asymmetric distance computation) instead of the raw floats.  At 100 TB
of embeddings this is the difference between scanning floats and
scanning bytes.

Training is a DataFrame-distributed JOINT Lloyd: all M sub-space
codebooks train in the same pass — sub-vectors explode to (vec_id, m,
sub) rows, assignment joins a broadcast (m, code, centroid) frame, and
the centroid update is one groupBy(m, code) aggregate.  The driver only
ever sees the codebook (M×K×D_SUB floats — scalar-sized, same policy as
the k-means fit).  Rows-only query (iterative training has no ANSI
twin); recall vs the exact scan is gated in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.similarity import (
    N_QUERIES,
    TOP_K,
    _corpus_with_norm,
)

D = 64  # embedding dimensionality (driver tables)
M_SUB = 8  # sub-spaces
D_SUB = D // M_SUB  # dims per sub-space
K_SUB = 32  # codewords per sub-space (one byte would hold 256)
LLOYD_ROUNDS = 3
SHORTLIST = 100  # ADC shortlist size fed to the exact re-rank


def _sq_l2(a: Column, b: Column) -> Column:
    """Σ (a_i - b_i)² — deterministic left-to-right fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvectors(corpus: DataFrame) -> DataFrame:
    """(vec_id, m, sub): the M_SUB D_SUB-dim slices of every vector."""
    m = F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("m")
    return corpus.select("vec_id", "emb", m).select(
        "vec_id",
        "m",
        F.slice("emb", F.col("m") * D_SUB + 1, D_SUB).alias("sub"),
    )


def _assign(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest codeword per (vec_id, m): broadcast the codebook, take
    the min (dist², code) struct — one shuffle on (vec_id, m) whose
    partials are single structs, not candidate lists."""
    # bounded: PQ codebook (M*K rows)
    cand = sub.join(F.broadcast(codebook), "m")
    d2 = _sq_l2(F.col("sub"), F.col("centroid"))
    return (
        cand.select(
            "vec_id", "m", "sub", F.struct(d2.alias("d2"), "code").alias("dc")
        )
        .groupBy("vec_id", "m")
        .agg(F.min("dc").alias("best"), F.first("sub").alias("sub"))
        .select("vec_id", "m", F.col("best.code").alias("code"), "sub")
    )


def _train_codebook(spark: SparkSession, sub: DataFrame) -> DataFrame:
    """Joint Lloyd over all M sub-spaces; returns (m, code, centroid).

    Init is content-addressed (xxhash64 of (vec_id, m) picks K_SUB seed
    sub-vectors per sub-space) — deterministic under any partitioning.
    Each round: broadcast-assign, then ONE groupBy(m, code) centroid
    update.  The collect() is the codebook itself (M×K rows).
    """
    w = Window.partitionBy("m").orderBy(
        F.xxhash64(F.col("vec_id"), F.col("m")), F.col("vec_id")
    )
    codebook = (
        sub.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K_SUB)
        .select(
            "m", (F.col("rn") - 1).cast("int").alias("code"),
            F.col("sub").alias("centroid"),
        )
    ).persist()
    codebook.count()
    for _ in range(LLOYD_ROUNDS):
        assigned = _assign(sub, codebook)
        new = (
            assigned.groupBy("m", "code")
            .agg(
                F.array(
                    *[F.avg(F.col("sub")[i]) for i in range(D_SUB)]
                ).alias("centroid")
            )
        ).persist()
        new.count()
        codebook.unpersist()
        codebook = new
    return codebook


@query("ann_pq_topk", oracle=None, tags=("similarity", "extension", "iterative"))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN: encode the corpus as M_SUB codeword bytes, score queries
    by ADC (per-query (m, code) → partial-dist² lookup table, summed
    over sub-spaces), shortlist by approximate distance, then exact-L2
    re-rank the shortlist — the classic PQ search pipeline (quantized
    scan → small exact refine).

    Plan shape: the LUT is |queries|·M·K rows — broadcast; the encoded
    corpus (vec_id, m, code) is the only large frame, and it carries
    ints, never floats; ADC scoring is one groupBy(query_id, vec_id)
    sum with map-side partials; only |queries|·SHORTLIST rows ever see
    raw floats again (the re-rank join).  Top-k windows are bounded
    per-query.  Reference parity: none (extension; BASELINE north star).
    """
    corpus = _corpus_with_norm(spark, sf_dir)
    sub = _subvectors(corpus).persist()
    codebook = _train_codebook(spark, sub)
    encoded = _assign(sub, codebook).select("vec_id", "m", "code")

    qsub = _subvectors(corpus.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"), "m", F.col("sub").alias("qsub")
    )
    # bounded: PQ codebook (M*K rows)
    lut = qsub.join(F.broadcast(codebook), "m").select(
        "query_id",
        "m",
        "code",
        _sq_l2(F.col("qsub"), F.col("centroid")).alias("pdist"),
    )
    scored = (
        # bounded: ADC LUT (queries x M x K rows)
        encoded.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdist").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= SHORTLIST)
        .select("query_id", "vec_id", "adc_dist")
    )
    # exact refine: only the shortlist rows re-touch raw floats
    qvec = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    refined = (
        shortlist.join(corpus.select("vec_id", "emb"), "vec_id")
        # bounded: fixed query set
        .join(F.broadcast(qvec), "query_id")
        .withColumn("d2", _sq_l2(F.col("emb"), F.col("qemb")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("d2", 6).alias("l2_dist"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
    )
