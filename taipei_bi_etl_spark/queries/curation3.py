"""Round-4b curation extensions: PII redaction under the driver hash
gate, corpus diversity profiling, and deterministic training-order
shuffling — three more operators of the training-data pipeline family
(BASELINE north star; the reference has no text-curation surface).

Cross-engine determinism notes:

* `text_pii_redact` injects deterministic synthetic PII (built from
  doc_id arithmetic with the shared `||` concatenation SQL, which both
  engines evaluate identically) because the sf corpora are word-soup —
  without injection the scrub would be hash-vacuous.  Patterns are the
  RE2-and-Java-safe set from `queries.text` (no backrefs/lookaround);
  replacement order (email, IP, phone) is fixed in both engines.
* `corpus_diversity_profile` reports type-token ratios as exact
  integer micros (``distinct*1e6 div total``) — no float division.
* `training_shuffle_order` uses the Knuth multiplicative hash
  ``((doc_id mod 2^32) * 1327217885) mod 2^32`` — the 31-bit constant
  with a pre-reduction keeps the product inside int64 for ANY doc_id
  (the 32-bit constant overflows at doc_id ≈ 3.47e9: Spark wraps
  silently, DuckDB raises).  Production would swap in xxhash64; the
  plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.dsir import _BIGRAM_MIX
from taipei_bi_etl_spark.queries.text import (
    HASH_MOD,
    PII_EMAIL,
    PII_IP,
    PII_PHONE,
    _char_array,
    poly_hash,
)

# ---------------------------------------------------------------------------
# PII redaction, hash-gated: inject synthetic PII, scrub, verify md5.
# ---------------------------------------------------------------------------

#: Deterministic synthetic-PII suffix — `||` coerces integers to text
#: in both engines, so the very same SQL text runs in each.
_INJECT_SQL = (
    "text || ' contact u' || doc_id || '@mail' || (doc_id % 7) || '.com"
    " from 10.' || (doc_id % 256) || '.0.99 call +1 (555) 010-' "
    "|| (1000 + doc_id % 9000)"
)

_REDACT_ORACLE = f"""
WITH injected AS (
  SELECT doc_id, source, {_INJECT_SQL} AS raw FROM documents
), staged AS (
  SELECT doc_id, source, raw,
         regexp_replace(
           regexp_replace(raw, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_IP}', '<IP>', 'g') AS mid
  FROM injected
), scrubbed AS (
  SELECT doc_id, source, raw, mid,
         regexp_replace(mid, '{PII_PHONE}', '<PHONE>', 'g') AS clean
  FROM staged
)
SELECT doc_id, md5(clean) AS redacted_md5,
       CAST(len(regexp_extract_all(raw, '{PII_EMAIL}'))
            + len(regexp_extract_all(raw, '{PII_IP}'))
            + len(regexp_extract_all(mid, '{PII_PHONE}')) AS BIGINT)
         AS n_hits,
       CAST(len(clean) - len(replace(replace(replace(clean,
              '<EMAIL>', ''), '<IP>', ''), '<PHONE>', '')) AS BIGINT)
         AS placeholder_chars
FROM scrubbed
"""


@query("text_pii_redact", oracle=_REDACT_ORACLE, tags=("text", "extension"))
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction as a verified TRANSFORM (not just the inventory
    `text_pii_scan` reports): synthetic emails/IPs/phones are injected
    deterministically per doc, :func:`queries.text.pii_scrub` rewrites
    them to typed placeholders, and the md5 of every redacted document
    is hash-checked against the oracle.

    Scale shape: pure map-side regexp rewriting in the scan stage —
    zero shuffles beyond the driver's own collect; at 100 TB this is
    the classic embarrassingly-parallel text pass.
    """
    d = read_table(spark, sf_dir, "documents")
    raw = F.expr(_INJECT_SQL)
    # staged spelling of pii_scrub (email → IP → phone) so each class
    # can be COUNTED at the stage its rewrite actually sees — phones
    # must be counted post-email/IP, not on raw.
    mid = F.regexp_replace(
        F.regexp_replace(raw, PII_EMAIL, "<EMAIL>"), PII_IP, "<IP>"
    )
    clean = F.regexp_replace(mid, PII_PHONE, "<PHONE>")
    placeholder = F.length(clean) - F.length(
        F.replace(
            F.replace(
                F.replace(clean, F.lit("<EMAIL>"), F.lit("")),
                F.lit("<IP>"),
                F.lit(""),
            ),
            F.lit("<PHONE>"),
            F.lit(""),
        )
    )
    return d.select(
        "doc_id",
        F.md5(clean).alias("redacted_md5"),
        (
            F.regexp_count(raw, F.lit(PII_EMAIL))
            + F.regexp_count(raw, F.lit(PII_IP))
            + F.regexp_count(mid, F.lit(PII_PHONE))
        ).cast("long").alias("n_hits"),
        placeholder.cast("long").alias("placeholder_chars"),
    )


# ---------------------------------------------------------------------------
# Corpus diversity: type-token ratios per source.
# ---------------------------------------------------------------------------

# One definition of the per-token hash fragment — imported from dsir,
# not re-declared, so the two "identical by construction" hash
# families can never drift apart.
from taipei_bi_etl_spark.queries.dsir import _POLY_DUCK  # noqa: E402

_DIVERSITY_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
           AS tok
  FROM documents
), uni AS (
  SELECT source, unnest(tok) AS term FROM tokd
), bi AS (
  SELECT source, unnest(
           CASE WHEN len(hs) >= 2
                THEN list_transform(range(1, len(hs)),
                       i -> (hs[i] * {_BIGRAM_MIX} + hs[i+1])
                            % {HASH_MOD})
                ELSE []::BIGINT[] END) AS bg
  FROM (SELECT source, list_transform(tok, w -> {_POLY_DUCK}) AS hs
        FROM tokd)
), u AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS distinct_terms
  FROM uni GROUP BY source
), b AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT bg) AS BIGINT) AS distinct_bigrams
  FROM bi GROUP BY source
)
SELECT u.source, n_tokens, distinct_terms,
       CAST((distinct_terms * 1000000) // n_tokens AS BIGINT)
         AS ttr_micros,
       n_bigrams, distinct_bigrams,
       CAST((distinct_bigrams * 1000000) // n_bigrams AS BIGINT)
         AS bigram_ttr_micros
FROM u JOIN b ON u.source = b.source
"""


@query(
    "corpus_diversity_profile",
    oracle=_DIVERSITY_ORACLE,
    tags=("text", "profiling", "extension"),
)
def corpus_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: unigram and hashed-bigram
    type-token ratios in exact integer micros — the duplication /
    templated-content smell test a corpus audit runs before mixing
    sources (low TTR ⇒ boilerplate; complements the per-document
    `text_repetition_gopher` gates with a corpus-level view).

    Scale shape: one linear explode per n-gram order; distinct counts
    are hash-partitioned by (source, term) partial-aggregates — the
    standard two-level distinct, no single-key hotspot since terms
    fan out within each source.  Bigrams reuse the per-token hash +
    arithmetic-mix trick from `queries.dsir` (each token char-hashed
    once, no bigram strings materialized).
    """
    d = read_table(spark, sf_dir, "documents")
    tok = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    hs = F.transform(tok, lambda t: poly_hash(_char_array(t)))
    # greatest(…, 0): a zero-token document yields size-1 = -1, and
    # slice rejects negative lengths at runtime (the oracle's
    # `CASE WHEN len(hs) >= 2` guard, Spark-side).
    n1 = F.greatest(F.size(hs) - 1, F.lit(0))
    bg = F.zip_with(
        F.slice(hs, 1, n1),
        F.slice(hs, 2, n1),
        lambda a, b: (a * _BIGRAM_MIX + b) % HASH_MOD,
    )
    base = d.select("source", tok.alias("tok"), bg.alias("bg"))
    u = (
        base.select("source", F.explode("tok").alias("term"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("term").alias("distinct_terms"),
        )
    )
    b = (
        base.select("source", F.explode("bg").alias("bg"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.countDistinct("bg").alias("distinct_bigrams"),
        )
    )
    return u.join(b, "source").select(
        "source",
        "n_tokens",
        "distinct_terms",
        F.expr("CAST((distinct_terms * 1000000) DIV n_tokens AS BIGINT)")
        .alias("ttr_micros"),
        "n_bigrams",
        "distinct_bigrams",
        F.expr("CAST((distinct_bigrams * 1000000) DIV n_bigrams AS BIGINT)")
        .alias("bigram_ttr_micros"),
    )


# ---------------------------------------------------------------------------
# Deterministic training-order shuffle.
# ---------------------------------------------------------------------------

N_SHARDS = 64
#: floor(2^31 / φ) — the 31-bit Knuth multiplicative constant.  The
#: 32-bit constant (2654435761) is NOT usable here: (doc_id % 2^32) *
#: 2654435761 exceeds int64 for large ids, which Spark silently WRAPS
#: (negative shards) while DuckDB raises — reducing doc_id mod 2^32
#: first and multiplying by the 31-bit constant keeps the product
#: ≤ (2^32−1)·1327217885 < 2^63 in both engines, exactly.
_KNUTH31 = 1327217885
_MOD32 = 4294967296


@query(
    "training_shuffle_order",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         ((doc_id % {_MOD32}) * {_KNUTH31}) % {_MOD32} AS hv
  FROM documents
)
SELECT doc_id,
       CAST(hv % {N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hv % {N_SHARDS}
                               ORDER BY hv, doc_id) AS BIGINT) AS pos
FROM h
""",
    tags=("curation", "extension"),
)
def training_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training: every document gets a
    pseudo-random (shard, position) — the read order a trainer consumes
    — reproducible across runs and engines (multiplicative hashing, no
    RNG state; overflow-safe BIGINT arithmetic, see ``_KNUTH31``).

    Scale shape: the hash is map-side arithmetic; ordering happens ONLY
    inside each of the ``N_SHARDS`` partitions (a partitioned window —
    never a global sort), so shard files can be written independently
    by ``io.write_training_shards``-style sinks.  Skew-free by
    construction: the multiplicative hash spreads sequential doc_ids
    uniformly across shards.
    """
    d = read_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        (((F.col("doc_id") % _MOD32) * _KNUTH31) % _MOD32).alias("hv"),
    )
    w = Window.partitionBy(F.col("hv") % N_SHARDS).orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hv") % N_SHARDS).cast("int").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )
