"""Round-4c corpus-audit extensions: frequency spectrum, vocabulary
coverage, order-preserving intra-document token dedup, and static-batch
padding-waste accounting — four more training-data pipeline operators
(BASELINE north star; the reference has no text-curation surface).

Cross-engine determinism notes:

* Log2 frequency buckets use ``length(bin(c)) - 1`` — exact integer
  floor(log2) in BOTH engines (verified: neither pads ``bin`` output),
  immune to the float-log2 boundary rounding a ``floor(log2(x))``
  expression risks at powers of two.
* ``vocab_coverage_report`` tie-breaks the global top-K cut by
  ``(count DESC, term ASC)`` so the vocabulary SET is identical across
  engines even when counts tie at the boundary.
* ``text_dedup_tokens`` is a TRANSFORM under the driver hash gate: the
  md5 of every deduplicated document is compared, not just counts.
* All ratios are exact integer micros (``x * 1e6 DIV total``) — no
  float division anywhere in the family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

#: Shared tokenizer fragment (same regex text in both engines).
_TOK_DUCK = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


def _tok() -> F.Column:
    return F.filter(F.split("text", r"\s+"), lambda t: t != "")


# ---------------------------------------------------------------------------
# Frequency spectrum (count-of-counts): the Zipf / boilerplate audit.
# ---------------------------------------------------------------------------

_SPECTRUM_ORACLE = f"""
WITH tokd AS (
  SELECT source, {_TOK_DUCK} AS tok FROM documents
), uni AS (
  SELECT source, unnest(tok) AS term FROM tokd
), f AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM uni GROUP BY source, term
)
SELECT source,
       CAST(len(bin(c)) - 1 AS INT) AS log2_freq,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(c) AS BIGINT) AS token_mass
FROM f GROUP BY source, log2_freq
"""


@query(
    "corpus_frequency_spectrum",
    oracle=_SPECTRUM_ORACLE,
    tags=("text", "profiling", "extension"),
)
def corpus_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source count-of-counts: how many distinct terms fall in each
    log2 frequency bucket, and how much token mass they carry.  The
    classic Zipf-shape audit — a spectrum with mass concentrated in the
    top buckets means templated/boilerplate text; a healthy natural
    corpus shows the long low-frequency tail.  Complements
    `corpus_diversity_profile` (one TTR number) with the full shape.

    Scale shape: explode → two cascaded hash aggregates, both keyed by
    bounded composites ((source, term) then (source, bucket)); partial
    aggregation absorbs the fan-out map-side, and no key concentrates
    more than one source's vocabulary.  The bucket expression is exact
    integer arithmetic (`length(bin(c)) - 1`), inside codegen.
    """
    d = read_table(spark, sf_dir, "documents")
    f = (
        d.select("source", F.explode(_tok()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        f.withColumn("log2_freq", F.expr("CAST(length(bin(c)) - 1 AS INT)"))
        .groupBy("source", "log2_freq")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c").cast("long").alias("token_mass"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate vs the global top-K vocabulary.
# ---------------------------------------------------------------------------

VOCAB_K = 16

_COVERAGE_ORACLE = f"""
WITH tokd AS (
  SELECT source, {_TOK_DUCK} AS tok FROM documents
), uni AS (
  SELECT source, unnest(tok) AS term FROM tokd
), vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS c FROM uni GROUP BY term
  ) ORDER BY c DESC, term LIMIT {VOCAB_K}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN vocab.term IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS in_vocab,
       CAST((COUNT(*) - SUM(CASE WHEN vocab.term IS NOT NULL
                                 THEN 1 ELSE 0 END)) * 1000000
            // COUNT(*) AS BIGINT) AS oov_micros
FROM uni LEFT JOIN vocab ON uni.term = vocab.term
GROUP BY source
"""


@query(
    "vocab_coverage_report",
    oracle=_COVERAGE_ORACLE,
    tags=("text", "profiling", "extension"),
)
def vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit: build the global top-K vocabulary by
    frequency (tie-broken by term so the cut is deterministic) and
    report each source's token coverage and OOV rate in exact integer
    micros — the pre-tokenizer-training check that a source's lexicon
    is actually representable.

    Scale shape: the vocabulary is K rows by construction — Spark's
    `limit` after the global count collapses to a TakeOrderedAndProject,
    and the probe join is an explicit `F.broadcast` (K≪corpus always
    holds: a vocabulary is bounded, the corpus is not).  One explode,
    one bounded-key aggregate, one broadcast probe, one per-source
    rollup — no all-pairs anything.
    """
    d = read_table(spark, sf_dir, "documents")
    uni = d.select("source", F.explode(_tok()).alias("term"))
    vocab = (
        uni.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "term")
        .limit(VOCAB_K)
        .select("term", F.lit(1).alias("hit"))
    )
    return (
        # bounded: top-K vocab (LIMIT'd)
        uni.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("in_vocab"),
        )
        .select(
            "source",
            "n_tokens",
            "in_vocab",
            F.expr(
                "CAST((n_tokens - in_vocab) * 1000000 DIV n_tokens AS BIGINT)"
            ).alias("oov_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Order-preserving intra-document token dedup (a hash-gated transform).
# ---------------------------------------------------------------------------

_DEDUP_TOKENS_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, {_TOK_DUCK} AS tok FROM documents
), pos AS (
  SELECT doc_id, unnest(tok) AS term,
         unnest(range(1, len(tok) + 1)) AS p
  FROM tokd
), firsts AS (
  SELECT doc_id, term, MIN(p) AS p FROM pos GROUP BY doc_id, term
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS kept,
       md5(COALESCE(string_agg(term, ' ' ORDER BY p), ''))
         AS dedup_md5
FROM firsts GROUP BY doc_id
"""


@query(
    "text_dedup_tokens",
    oracle=_DEDUP_TOKENS_ORACLE,
    tags=("text", "dedup", "extension"),
)
def text_dedup_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal: keep the FIRST occurrence of
    every token, preserving original order, and hash-verify the md5 of
    each rewritten document — the within-doc cleanup pass (repeated
    boilerplate fragments, stutter artifacts) that corpus-level dedup
    can't see.  The transform itself is gated, not just its counts.

    Scale shape: in Spark the whole rewrite is ONE array expression in
    the scan projection — `filter(tok, (t, i) -> array_position(tok, t)
    == i+1)` — zero exchanges, embarrassingly parallel, no explode.
    (The DuckDB oracle must unnest + re-aggregate; per-position
    `array_position` is O(len²) per doc, fine for bounded docs —
    genuinely long documents should route through the explode/window
    form the oracle uses, at the cost of one shuffle.)
    """
    d = read_table(spark, sf_dir, "documents")
    tok = _tok()
    kept = F.filter(
        tok, lambda t, i: F.array_position(tok, t) == i + F.lit(1)
    )
    # Zero-token documents produce no unnest rows in the oracle, so
    # they must be dropped here too — otherwise Spark emits a phantom
    # (kept=0, md5('')) row the oracle-verified semantics don't have.
    return d.filter(F.size(tok) > 0).select(
        "doc_id",
        F.size(kept).cast("long").alias("kept"),
        F.md5(F.concat_ws(" ", kept)).alias("dedup_md5"),
    )


# ---------------------------------------------------------------------------
# Static-batch padding waste: the economics argument for packing.
# ---------------------------------------------------------------------------

PAD_BUCKET = 32

_PADDING_ORACLE = f"""
WITH lens AS (
  SELECT source, CAST(len({_TOK_DUCK}) AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST((n - 1) // {PAD_BUCKET} AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(((n - 1) // {PAD_BUCKET} + 1) * {PAD_BUCKET} - n)
            AS BIGINT) AS pad_waste,
       CAST(SUM(((n - 1) // {PAD_BUCKET} + 1) * {PAD_BUCKET} - n)
            * 1000000 // SUM(((n - 1) // {PAD_BUCKET} + 1)
            * {PAD_BUCKET}) AS BIGINT) AS waste_micros
FROM lens GROUP BY source, bucket
"""


@query(
    "sequence_length_histogram",
    oracle=_PADDING_ORACLE,
    tags=("curation", "profiling", "extension"),
)
def sequence_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sequence-length histogram with static-batch padding
    waste: documents bucketed to the next multiple of ``PAD_BUCKET``
    tokens (the fixed-shape batching a naive trainer does), reporting
    exactly how many pad tokens that burns per bucket — the
    before/after ledger that justifies `pack_context_windows`.  Both
    engines integer-divide only (``(n-1) DIV 32``, micros via DIV), so
    the hash is exact.

    Scale shape: token counts come straight out of the scan projection
    (a `size(split(...))` — no explode, no intermediate array kept),
    then one hash aggregate on the bounded (source, bucket) key.
    """
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # NULL length has no bucket
    )
    n = F.size(_tok()).cast("long")
    lens = d.select("source", n.alias("n"))
    bucket = F.expr(f"CAST((n - 1) DIV {PAD_BUCKET} AS INT)")
    padded = F.expr(f"((n - 1) DIV {PAD_BUCKET} + 1) * {PAD_BUCKET}")
    return (
        lens.select("source", bucket.alias("bucket"), "n",
                    padded.alias("padded"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("n_tokens"),
            (F.sum("padded") - F.sum("n")).cast("long").alias("pad_waste"),
            F.expr(
                "CAST((SUM(padded) - SUM(n)) * 1000000"
                " DIV SUM(padded) AS BIGINT)"
            ).alias("waste_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (multilingual-sampling style).
# ---------------------------------------------------------------------------

#: Sampling temperature: weights ∝ share^(1/T).  T=2 (the common
#: multilingual setting) makes the rescale a square root — IEEE sqrt is
#: correctly rounded, so the same double yields the same result in both
#: engines; the per-source FLOOR to micros then makes everything
#: downstream exact integer arithmetic (never a float SUM, whose
#: accumulation ORDER differs between engines).
MIX_T = 2

_TEMPERATURE_ORACLE = """
WITH tok AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'),
                                  t -> t <> ''))) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source
), s AS (
  SELECT source, n_tokens,
         CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
              AS BIGINT) AS sqrt_micros
  FROM tok
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(sqrt_micros) AS BIGINT) AS total_sqrt
  FROM s
)
SELECT source, n_tokens,
       CAST(n_tokens * 1000000 // total_tokens AS BIGINT)
         AS natural_ppm,
       CAST(sqrt_micros * 1000000 // total_sqrt AS BIGINT)
         AS sampled_ppm,
       CAST(sqrt_micros * 1000000 // total_sqrt
            - n_tokens * 1000000 // total_tokens AS BIGINT)
         AS boost_ppm
FROM s CROSS JOIN tot
"""


@query(
    "corpus_mix_temperature",
    oracle=_TEMPERATURE_ORACLE,
    tags=("curation", "sampling", "extension"),
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (T={MIX_T}): each
    source's sampling probability ∝ share^(1/T) — the standard
    upweighting of small sources / downweighting of dominant ones used
    by multilingual and multi-corpus training mixes.  Emits natural vs
    temperature-sampled proportions (ppm) and the boost each source
    receives.

    Determinism: sqrt of an exact integer double is correctly rounded
    IEEE (identical in both engines); the result is FLOORed to integer
    micros PER SOURCE before any summation, so the normalizing total is
    an integer sum — a float Σ√nᵢ would accumulate in engine-specific
    order and flip the last digit.

    Scale shape: one map-side-combined per-source token rollup
    (|sources| rows), a 1-row total broadcast back — nothing beyond
    the scan touches corpus-sized data.
    """
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = d.groupBy("source").agg(
        F.sum(F.size(_tok())).cast("long").alias("n_tokens")
    )
    s = tok.select(
        "source",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000.0)
        .cast("long")
        .alias("sqrt_micros"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("sqrt_micros").cast("long").alias("total_sqrt"),
    )
    # bounded: 1-row total
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr("CAST(n_tokens * 1000000 DIV total_tokens AS BIGINT)").alias(
            "natural_ppm"
        ),
        F.expr("CAST(sqrt_micros * 1000000 DIV total_sqrt AS BIGINT)").alias(
            "sampled_ppm"
        ),
        F.expr(
            "CAST(sqrt_micros * 1000000 DIV total_sqrt"
            " - n_tokens * 1000000 DIV total_tokens AS BIGINT)"
        ).alias("boost_ppm"),
    )
