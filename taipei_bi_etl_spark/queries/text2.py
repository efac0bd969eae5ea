"""Second text-analysis batch over ``documents``: hashed-feature linear
quality classifier, self-trained bigram-LM fluency scoring, and
intra-corpus exact-substring (n-gram span) duplication profiling.

Extends the curation family (BASELINE north star): the classifier is
the fasttext-style quality-gate shape, the bigram LM is the
CCNet/KenLM-style fluency gate, and the substring profile is the
bounded-granularity analog of suffix-array ExactSubstr dedup
(Lee et al. 2022) — per-doc duplicated-span fractions at 13-gram
granularity.

Everything is pure Column expressions.  The classifier keeps the
portable polynomial hash (cross-engine checkable); the substring
profile carries 8-byte xxhash64 grams with a string-gram oracle
(equal modulo 2^-64 collisions — same policy as text_decontaminate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.text import HASH_MOD, _tokens

# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier.
# ---------------------------------------------------------------------------

#: Feature-hash buckets and the deterministic integer weight function.
#: w(b) = ((b+1) * KNUTH) % 1001 - 500  ∈ [-500, 500] — a stand-in for
#: trained weights that both engines can compute exactly; swapping in a
#: trained vector = replacing this expression with a broadcast lookup.
N_BUCKETS = 64
_KNUTH = 2654435761

_POLY_TOKEN_SQL = (
    "list_reduce(list_transform(string_split(t, ''),"
    " c -> ascii(c)::BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)"
)
_WEIGHT_SQL = (
    f"((({_POLY_TOKEN_SQL} % {N_BUCKETS}) + 1) * {_KNUTH}) % 1001 - 500"
)

_CLASSIFIER_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tok
    FROM documents
), scored AS (
    SELECT doc_id, source,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(tok, t -> {_WEIGHT_SQL}))
                AS BIGINT) AS total_weight
    FROM toks WHERE len(tok) > 0
)
SELECT doc_id, source, n_tokens, total_weight,
       ROUND(CAST(total_weight AS DOUBLE) / n_tokens, 6) AS score,
       CASE WHEN total_weight >= 0 THEN 1 ELSE 0 END AS keep
FROM scored
"""


def _token_weight(t: Column) -> Column:
    """Portable per-token weight: polynomial hash → bucket → weight."""
    codes = F.transform(
        F.filter(F.split(t, ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"),
    )
    h = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % HASH_MOD
    )
    return ((h % N_BUCKETS) + 1) * _KNUTH % 1001 - 500


@query(
    "quality_classifier_linear",
    oracle=_CLASSIFIER_ORACLE,
    tags=("text", "curation", "extension"),
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fasttext-shaped linear quality gate: hash each token into
    {N_BUCKETS} feature buckets, sum deterministic integer bucket
    weights, keep docs with a non-negative total.

    The score is a pure map-side fold per document — zero shuffle, no
    Python, whole-stage codegen end to end.  A trained model drops in
    by replacing the weight expression with a broadcast (bucket →
    weight) array literal; the plan shape (embarrassingly parallel
    scan) is unchanged at 100 TB.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = F.filter(_tokens(), lambda t: t != "")
    total = F.aggregate(
        F.transform(tok, _token_weight),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = d.select(
        "doc_id",
        "source",
        F.size(tok).cast("long").alias("n_tokens"),
        total.alias("total_weight"),
    ).filter(F.col("n_tokens") > 0)
    return scored.select(
        "doc_id",
        "source",
        "n_tokens",
        "total_weight",
        F.round(
            F.col("total_weight").cast("double") / F.col("n_tokens"), 6
        ).alias("score"),
        F.when(F.col("total_weight") >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# Self-trained bigram LM fluency score.
# ---------------------------------------------------------------------------

#: ASCII record separator — cannot appear in the token stream.
_SEP = "\x1e"

_LM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tok
    FROM documents
), bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(tok)),
                  i -> tok[i] || chr(30) || tok[i + 1])) AS bigram
    FROM toks
), doc_bg AS (
    SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS k
    FROM bg GROUP BY doc_id, bigram
), c2 AS (
    SELECT bigram, CAST(SUM(k) AS BIGINT) AS c2 FROM doc_bg GROUP BY bigram
), c1 AS (
    SELECT split_part(bigram, chr(30), 1) AS w1,
           CAST(SUM(c2) AS BIGINT) AS c1
    FROM c2 GROUP BY 1
), probs AS (
    SELECT bigram, (c2 * 1000000) // c1 AS prob_micros
    FROM c2 JOIN c1 ON split_part(c2.bigram, chr(30), 1) = c1.w1
), per_doc AS (
    SELECT d.doc_id,
           CAST(SUM(d.k) AS BIGINT) AS n_bigrams,
           CAST(SUM(d.k * p.prob_micros) AS BIGINT) AS sum_prob_micros
    FROM doc_bg d JOIN probs p USING (bigram)
    GROUP BY d.doc_id
)
SELECT doc_id, n_bigrams, sum_prob_micros,
       sum_prob_micros // n_bigrams AS avg_prob_micros
FROM per_doc
"""


@query(
    "text_ngram_lm_score",
    oracle=_LM_ORACLE,
    tags=("text", "curation", "extension"),
)
def text_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style fluency gate: train a bigram model on the corpus
    itself, then score each document by its mean transition probability
    P(w_i | w_{i-1}) in exact integer micros (floor at each step —
    transcendental-free, so the score hash-checks cross-engine; a real
    perplexity swaps the fold for log-sums without changing the plan).

    Plan: the corpus is scanned once into per-doc bigram counts
    (map-side combine on (doc, bigram)); the model (c2 marginalized to
    c1) lives entirely on the bigram-count frame — vocabulary-sized,
    not corpus-sized; scoring re-joins the per-doc counts against the
    probability table on the bigram key.  Three shuffles total, all on
    bounded-cardinality keys.  At 100 TB the bigram key would carry an
    8-byte hash instead of the string (kept here for the oracle).

    widen_scan: tokenize + bigram zip_with are map-side above the scan;
    a single-file input runs them on one core (measured 1.14× at
    sf0.1, SCALE.md r10).
    """
    from taipei_bi_etl_spark.scale import widen_scan

    d = widen_scan(read_table(spark, sf_dir, "documents"))
    tok = F.filter(_tokens(), lambda t: t != "")
    sz1 = F.greatest(F.size(tok) - 1, F.lit(0))  # slice rejects negatives
    bigrams = F.zip_with(
        F.slice(tok, 1, sz1),
        F.slice(tok, 2, sz1),
        lambda a, b: F.concat_ws(_SEP, a, b),
    )
    doc_bg = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("k"))
        # feeds the model (c2 → c1) AND the final scoring join — persist
        # so the tokenize+explode+count pass runs once (same shared-
        # subtree policy as the ngram-Jaccard inverted index).
        .persist()
    )
    c2 = doc_bg.groupBy("bigram").agg(F.sum("k").alias("c2"))
    c1 = c2.groupBy(
        F.substring_index("bigram", _SEP, 1).alias("w1")
    ).agg(F.sum("c2").alias("c1"))
    probs = c2.join(
        c1, F.substring_index(c2["bigram"], _SEP, 1) == c1["w1"]
    ).select("bigram", F.expr("(c2 * 1000000) div c1").alias("prob_micros"))
    return (
        doc_bg.join(probs, "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("prob_micros")).alias("sum_prob_micros"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_prob_micros",
            F.expr("sum_prob_micros div n_bigrams").alias("avg_prob_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-substring duplication profile (13-gram granularity).
# ---------------------------------------------------------------------------

N_SUB = 13  # span granularity — same as the decontamination n

_SUB_TERMS = " || ' ' || ".join(f"tok[i+{j}]" for j in range(N_SUB))
_SUBSTR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM documents
), ngr AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tok) - {N_SUB - 2}, 1)),
                  i -> {_SUB_TERMS})) AS g
    FROM toks
), docs_per AS (
    SELECT g, COUNT(DISTINCT doc_id) AS nd FROM ngr GROUP BY g
), per AS (
    SELECT n.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup
    FROM ngr n JOIN docs_per d USING (g) GROUP BY n.doc_id
)
SELECT doc_id, n_grams, n_dup,
       ROUND(CAST(n_dup AS DOUBLE) / n_grams, 6) AS dup_fraction
FROM per
"""


@query(
    "dedup_substring_profile",
    oracle=_SUBSTR_ORACLE,
    tags=("text", "dedup", "extension"),
)
def dedup_substring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span profile: the fraction of 13-gram
    positions whose span also occurs in another document — the
    bounded-granularity form of suffix-array ExactSubstr dedup
    (span removal = filter positions where the flag is set; this query
    materializes the profile the removal pass consumes).

    Plan: one scan explodes hashed grams (8-byte xxhash64 combinations,
    never the 13-word strings); gram→distinct-doc counts aggregate with
    map-side partial distinct on (g, doc); the flag re-joins on the
    gram key and re-aggregates per doc.  All shuffles carry longs, and
    gram frequencies are near-uniform by construction — the skew guard
    for a pathological corpus is the same df-cap used by the sketch
    dedups.  Oracle runs the string-gram form (equal modulo 2^-64
    collisions — same policy as text_decontaminate).
    """
    from taipei_bi_etl_spark.queries.dedup import ngram_hash_array
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: the gram-hash explode is map-side above the scan
    # (measured 1.91× whole-query at sf0.1, SCALE.md r10)
    d = widen_scan(read_table(spark, sf_dir, "documents"))
    ngr = d.select(
        "doc_id", F.explode(ngram_hash_array(_tokens(), N_SUB)).alias("g")
    ).persist()  # two consumers (doc counts + re-join); sketch once
    docs_per = (
        ngr.distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    return (
        ngr.join(docs_per, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("nd") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup",
            F.round(
                F.col("n_dup").cast("double") / F.col("n_grams"), 6
            ).alias("dup_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-weighted sampling — keep-probability from the classifier score.
# ---------------------------------------------------------------------------

_MD5_POLY_SQL = (
    "list_reduce(list_transform(string_split(md5(text), ''),"
    " c -> ascii(c)::BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)"
)

_WSAMPLE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, text,
           list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tok
    FROM documents
), scored AS (
    SELECT doc_id, source,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(tok, t -> {_WEIGHT_SQL}))
                AS BIGINT) AS total_weight,
           {_MD5_POLY_SQL} % 1000 AS u
    FROM toks WHERE len(tok) > 0
)
SELECT doc_id, source,
       CAST(u AS BIGINT) AS u,
       total_weight // n_tokens AS avg_w,
       CASE WHEN u < 500 + greatest(-500, least(500, total_weight // n_tokens))
            THEN 1 ELSE 0 END AS kept
FROM scored
"""


@query(
    "quality_weighted_sample",
    oracle=_WSAMPLE_ORACLE,
    tags=("curation", "sampling", "extension"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted Bernoulli sampling: each doc's
    keep-probability is (500 + clamped per-token classifier score)/1000
    and the coin flip is a content hash — upsample good docs, keep the
    sample reproducible under any layout/re-ingestion (the
    quality-proportional mixing step of a curation pipeline, after the
    hard gates).

    Everything is exact integers: the uniform draw is a polynomial fold
    of md5(text) mod 1000, the threshold a clamped integer floor-div —
    no float boundary can flap the membership hash.  Map-side only;
    zero shuffle.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = F.filter(_tokens(), lambda t: t != "")
    total = F.aggregate(
        F.transform(tok, _token_weight),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    md5_chars = F.filter(F.split(F.md5("text"), ""), lambda c: c != "")
    u = (
        F.aggregate(
            F.transform(md5_chars, lambda c: F.ascii(c).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 31 + x) % HASH_MOD,
        )
        % 1000
    )
    scored = d.select(
        "doc_id",
        "source",
        F.size(tok).cast("long").alias("n_tokens"),
        total.alias("total_weight"),
        u.alias("u"),
    ).filter(F.col("n_tokens") > 0)
    avg_w = F.expr("total_weight div n_tokens")
    clamped = F.greatest(F.lit(-500), F.least(F.lit(500), avg_w))
    return scored.select(
        "doc_id",
        "source",
        "u",
        avg_w.alias("avg_w"),
        F.when(F.col("u") < 500 + clamped, F.lit(1))
        .otherwise(F.lit(0))
        .alias("kept"),
    )
