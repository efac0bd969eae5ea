"""Sparse text similarity + ANN quality reporting.

Two additions to the similarity family:

* ``tfidf_doc_similarity_topk`` — document-to-document cosine over
  SPARSE tf-idf vectors via an inverted-index join: the scalable
  text-similarity primitive (dense ANN's sparse sibling).  Documents
  only ever meet inside a term's posting list, so candidate generation
  is bounded by posting-list sizes, not |corpus|².
* ``ann_lsh_recall_report`` — recall@K of the LSH-bucketed ANN against
  the exact kernel, computed IN-PLAN and hash-checked by the driver.
  The pytest recall gates (tests/test_similarity.py) assert a floor
  once per run; this makes the quality metric a first-class, oracled
  query output.

Float discipline (BACKLOG r03: never hash an order-dependent float
fold): every variable-length float summation is integer-ized per term
BEFORE the sum — Σ floor(x·10¹²) over BIGINTs is order-free, while
Σ doubles depends on partition order and flaps the last bit across
engines.  Single products/divisions of bit-identical doubles (same
expression text both engines) remain exact, per the BM25 precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.similarity import (
    _TOPK_ORACLE,
    TOP_K as ANN_TOP_K,
    _lsh_oracle,
    ann_cosine_topk,
    ann_lsh_bucketed,
)

#: deterministic corpus sample for the pairwise demo: the synthetic
#: corpus has a 31-term vocabulary, so nearly every document shares a
#: term with every other (df ≈ 0.8·n measured) and the inverted index
#: degenerates to all-pairs.  On a real Zipfian vocabulary the posting
#: lists are selective and the same plan scales; here a doc_id sample
#: keeps the demo honest without pretending the data is Zipfian.
SIM_DOC_MOD = 50
SIM_TOP_K = 5

_TOKENIZE_DUCK = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)

#: identical expression TEXT in both engines (same parenthesization ⇒
#: same IEEE rounding): raw tf-idf weight from integer ingredients.
_WEIGHT_SQL = (
    "((1.0 + ln(CAST(tf AS DOUBLE))) * "
    "ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)))"
)
#: L2 norm from the order-free integer sum of squared weights.
_NORM_SQL = "sqrt(CAST(nq AS DOUBLE) / 1000000000000.0)"

_TFIDF_SIM_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {SIM_DOC_MOD} = 0 AND text IS NOT NULL
), toks AS (
  SELECT doc_id, unnest({_TOKENIZE_DUCK}) AS term FROM docs
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM docs
), w AS (
  SELECT tf.doc_id, tf.term, {_WEIGHT_SQL} AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
), nq AS (
  -- order-free: integer picounits per term, BIGINT sum
  SELECT doc_id,
         CAST(SUM(CAST(FLOOR(w * w * 1000000000000.0) AS BIGINT)) AS BIGINT)
           AS nq
  FROM w GROUP BY 1
), wn AS (
  -- nq > 0 (r05 ADVICE #4): a doc whose every term has df = n_docs
  -- gets all-zero weights -> 0/0 = NaN in Spark (then ANSI floor/cast
  -- aborts) vs DuckDB's own NaN semantics; zero-norm docs carry no
  -- cosine signal, exclude them identically in both engines.
  SELECT w.doc_id, w.term, w.w / {_NORM_SQL} AS wn
  FROM w JOIN nq USING (doc_id) WHERE nq > 0
), pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(CAST(FLOOR(a.wn * b.wn * 1000000000000.0) AS BIGINT))
              AS BIGINT) AS sim_pico
  FROM wn a JOIN wn b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, sim_pico,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_a ORDER BY sim_pico DESC, doc_b) AS INT) AS rank
FROM pair
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY doc_a ORDER BY sim_pico DESC, doc_b) <= {SIM_TOP_K}
"""


@query(
    "tfidf_doc_similarity_topk",
    oracle=_TFIDF_SIM_ORACLE,
    tags=("similarity", "text", "extension"),
)
def tfidf_doc_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most-similar documents per document under sparse tf-idf
    cosine, via an inverted-index join — no dense vectors, no
    corpus×corpus product.

    100 TB shape: tf/df/weights are one grouped pass each; candidate
    pairs are generated per POSTING LIST (term bucket), so cost is
    Σ df(t)² over terms — on Zipfian text the head terms get dropped by
    a df cap (cap_document_frequency, same guard as the shingle index)
    and the tail keeps lists short.  The similarity sum is per-term
    integer picounits (order-free BIGINT fold) — see module docstring.
    """
    d = (
        read_table(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % SIM_DOC_MOD == 0) & F.col("text").isNotNull()
        )
        .select("doc_id", "text")
    )
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = (
        tf.join(df, "term")
        # bounded: 1-row corpus count
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", F.expr(_WEIGHT_SQL).alias("w"))
    )
    nq = w.groupBy("doc_id").agg(
        F.sum(
            F.floor(F.col("w") * F.col("w") * F.lit(1e12)).cast("long")
        ).cast("long").alias("nq")
    )
    # both join sides read wn: persist so toks→tf→df→w→nq computes once
    # (the registry cache contract releases it on the next invocation)
    wn = (
        w.join(nq.filter(F.col("nq") > 0), "doc_id")  # see oracle note
        .select(
            "doc_id", "term", (F.col("w") / F.expr(_NORM_SQL)).alias("wn")
        )
        .persist()
    )
    a = wn.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("wn").alias("wa")
    )
    b = wn.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("wn").alias("wb")
    )
    pair = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.floor(F.col("wa") * F.col("wb") * F.lit(1e12)).cast("long")
            ).cast("long").alias("sim_pico")
        )
    )
    rw = W.partitionBy("doc_a").orderBy(F.desc("sim_pico"), F.asc("doc_b"))
    return (
        pair.withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= SIM_TOP_K)
        .select("doc_a", "doc_b", "sim_pico", "rank")
    )


_RECALL_ORACLE = f"""
WITH exact_topk AS (
  SELECT query_id, neighbor_id FROM ({_TOPK_ORACLE})
), lsh_topk AS (
  SELECT query_id, neighbor_id FROM ({_lsh_oracle()})
), hits AS (
  SELECT e.query_id, CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hit
  FROM exact_topk e
  LEFT JOIN lsh_topk l
    ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
  GROUP BY 1
)
SELECT query_id,
       CAST({ANN_TOP_K} AS BIGINT) AS k,
       n_hit,
       CAST(FLOOR(n_hit * 1000000.0 / {ANN_TOP_K}) AS BIGINT)
         AS recall_micros
FROM hits
"""


@query(
    "ann_lsh_recall_report",
    oracle=_RECALL_ORACLE,
    tags=("similarity", "extension", "quality"),
)
def ann_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@K of `ann_lsh_bucketed` against `ann_cosine_topk`, per
    query vector, computed in-plan: the ANN quality metric as an
    oracled query instead of a test-only gate.  Composes the two
    registered queries' UNWRAPPED builders (module-level functions —
    calling the registry wrappers here would trip the cache contract's
    release-on-invocation mid-construction).

    Scale: both sides are the already-scaled plans; the report joins
    two K·|queries|-row frames — negligible."""
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = ann_lsh_bucketed(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("lsh_neighbor_id")
    )
    hits = (
        exact.join(
            lsh,
            (exact.query_id == lsh.query_id)
            & (exact.neighbor_id == lsh.lsh_neighbor_id),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count("lsh_neighbor_id").cast("long").alias("n_hit"))
    )
    return hits.select(
        "query_id",
        F.lit(ANN_TOP_K).cast("long").alias("k"),
        "n_hit",
        F.floor(F.col("n_hit") * F.lit(1e6) / F.lit(ANN_TOP_K))
        .cast("long")
        .alias("recall_micros"),
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (Artetxe & Schwenk ratio margin) — the
# parallel-corpus mining primitive (LASER/CCMatrix): for every vector
# in the "source" pool, its best "target"-pool neighbor scored by
# cosine RELATIVE to both sides' top-K neighborhoods, so hubs (vectors
# similar to everything) don't flood the mined pairs.
# ---------------------------------------------------------------------------

MARGIN_K = 4
MARGIN_ACCEPT_MICROS = 1_050_000  # ratio >= 1.05
_SIM_SCALE = "10000000000.0"  # 1e10: integer deci-nano sims (order-free)

_BITEXT_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND len(list_filter(embedding, x -> x <> 0)) > 0
    AND label IS NOT NULL
), p AS (
  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
         CAST(FLOOR(list_inner_product(s.emb, t.emb) / (s.nrm * t.nrm)
                    * {_SIM_SCALE}) AS BIGINT) AS sim_i
  FROM e s JOIN e t ON s.label % 2 = 0 AND t.label % 2 = 1
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (
             PARTITION BY src_id ORDER BY sim_i DESC, tgt_id) AS rn_f,
         ROW_NUMBER() OVER (
             PARTITION BY tgt_id ORDER BY sim_i DESC, src_id) AS rn_b
  FROM p
), fwd AS (
  SELECT src_id, CAST(SUM(sim_i) AS BIGINT) AS fwd_sum
  FROM r WHERE rn_f <= {MARGIN_K} GROUP BY 1
), bwd AS (
  SELECT tgt_id, CAST(SUM(sim_i) AS BIGINT) AS bwd_sum
  FROM r WHERE rn_b <= {MARGIN_K} GROUP BY 1
)
SELECT r.src_id, r.tgt_id,
       CAST(CASE WHEN fwd_sum + bwd_sum > 0
                 THEN (r.sim_i * {2 * MARGIN_K * 1_000_000}) // (fwd_sum + bwd_sum)
                 ELSE -1 END AS BIGINT) AS margin_micros,
       (CASE WHEN fwd_sum + bwd_sum > 0
             THEN (r.sim_i * {2 * MARGIN_K * 1_000_000}) // (fwd_sum + bwd_sum)
             ELSE -1 END) >= {MARGIN_ACCEPT_MICROS} AS accepted
FROM r
JOIN fwd USING (src_id)
JOIN bwd USING (tgt_id)
WHERE r.rn_f = 1
"""


@query(
    "bitext_margin_mining",
    oracle=_BITEXT_ORACLE,
    tags=("similarity", "extension", "mining"),
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-margin bitext mining between the even-label pool (source
    side) and the odd-label pool (target side): each source vector's
    best target neighbor, scored margin = 2K·cos(x,y) / (Σtop-K fwd +
    Σtop-K bwd), accepted at ratio ≥ 1.05.

    Float discipline: per-pair cosines are bit-identical across engines
    (sequential in-order folds both sides — the similarity-family
    precedent), integer-ized at 1e10 BEFORE the top-K sums (order-free
    BIGINT folds) and the margin is pure integer arithmetic with
    truncating division in BOTH engines (Spark DIV / DuckDB ``//``,
    numerator ≤ 8e16 « int64).

    Scale: the exact all-pairs kernel between pools is the documented
    verification form (same convention as `knn_label_consistency`); at
    corpus scale the candidate pairs come from `ann_lsh_bucketed`'s
    banded buckets or the IVF cells and this margin stage is unchanged.
    """
    from taipei_bi_etl_spark.queries.similarity import (
        _corpus_with_norm,
        cosine,
    )

    corpus = _corpus_with_norm(spark, sf_dir).filter(
        F.col("label").isNotNull()
    )
    src = corpus.filter(F.col("label") % 2 == 0).select(
        F.col("vec_id").alias("src_id"),
        F.col("emb").alias("se"),
        F.col("norm").alias("sn"),
    )
    tgt = corpus.filter(F.col("label") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("emb").alias("te"),
        F.col("norm").alias("tn"),
    )
    sim_i = F.floor(
        cosine(F.col("se"), F.col("te"), F.col("sn"), F.col("tn"))
        * F.expr(_SIM_SCALE)
    ).cast("long")
    # both windows, the top-K sums and the rank-1 extraction all read
    # the scored pairs: persist (released by the registry contract)
    scored = (
        src.crossJoin(tgt)
        .select("src_id", "tgt_id", sim_i.alias("sim_i"))
        .withColumn(
            "rn_f",
            F.row_number().over(
                W.partitionBy("src_id").orderBy(
                    F.desc("sim_i"), F.asc("tgt_id")
                )
            ),
        )
        .withColumn(
            "rn_b",
            F.row_number().over(
                W.partitionBy("tgt_id").orderBy(
                    F.desc("sim_i"), F.asc("src_id")
                )
            ),
        )
        .persist()
    )
    fwd = (
        scored.filter(F.col("rn_f") <= MARGIN_K)
        .groupBy("src_id")
        .agg(F.sum("sim_i").cast("long").alias("fwd_sum"))
    )
    bwd = (
        scored.filter(F.col("rn_b") <= MARGIN_K)
        .groupBy("tgt_id")
        .agg(F.sum("sim_i").cast("long").alias("bwd_sum"))
    )
    denom = F.col("fwd_sum") + F.col("bwd_sum")
    margin = F.when(
        denom > 0,
        F.expr(f"sim_i * {2 * MARGIN_K * 1_000_000} DIV (fwd_sum + bwd_sum)"),
    ).otherwise(F.lit(-1)).cast("long")
    return (
        scored.filter(F.col("rn_f") == 1)
        .join(fwd, "src_id")
        .join(bwd, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            margin.alias("margin_micros"),
            (margin >= MARGIN_ACCEPT_MICROS).alias("accepted"),
        )
    )
