"""Content-defined chunking (FastCDC/gear-style) for block-level dedup.

Whole-document hashing misses partial duplication (boilerplate headers,
quoted passages, re-posted fragments); fixed-size blocks break on any
insertion.  Content-defined chunking cuts where a rolling window hash
hits a mask, so chunk boundaries are a function of the CONTENT — an
insertion re-chunks only its neighborhood, and identical passages in
different documents yield identical chunks wherever they sit.  This is
the storage-dedup primitive (LBFS/FastCDC) applied at token level, the
block-granular sibling of the document-level dedup family.

Both queries are pure array expressions per document (zero exchanges
until the final rollup): token char-hashes computed ONCE per token
(the 21s→3.7s r04 lesson), a W-token window hash per position, cut
positions by divisor mask, chunks sliced and md5'd.  All arithmetic is
integer and the chunk identity is md5 text — nothing floats, so the
DuckDB twins are exact.

Reference parity: none (the reference dedups nothing); this extends
SURVEY §2's dedup family per the training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

CDC_W = 4  # rolling window, tokens
CDC_DIV = 32  # boundary when window hash % DIV == 0 (~32-token chunks)
CDC_B = 31
CDC_P = 1_000_000_007

_TOKS_DUCK = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
#: per-token char poly hash (same fold both engines; list_reduce seeds
#: with the first element == Spark's fold from 0, proven by winnowing)
_TH_DUCK = (
    "list_transform(toks, t -> list_reduce("
    "list_transform(string_split(t, ''), c -> ascii(c)::BIGINT), "
    f"(acc, x) -> (acc * {CDC_B} + x) % {CDC_P}))"
)
#: window hash at position i (1-indexed, i >= W) over th[i-3..i]
_G_DUCK = (
    f"(((th[i-3] * {CDC_B} + th[i-2]) % {CDC_P} * {CDC_B} + th[i-1]) "
    f"% {CDC_P} * {CDC_B} + th[i]) % {CDC_P}"
)

_CHUNKS_CTE = f"""
docs AS (
  SELECT doc_id, source, {_TOKS_DUCK} AS toks
  FROM documents
  WHERE text IS NOT NULL AND len({_TOKS_DUCK}) > 0
), hashed AS (
  SELECT doc_id, source, toks, len(toks) AS n, {_TH_DUCK} AS th
  FROM docs
), cutpoints AS (
  SELECT doc_id, source, toks, n,
         [0] || CASE WHEN n >= {CDC_W}
                     THEN list_filter(range({CDC_W}, n + 1),
                            i -> i < n AND ({_G_DUCK}) % {CDC_DIV} = 0)
                     ELSE [] END
             || [n] AS cuts
  FROM hashed
), chunks AS (
  SELECT doc_id, source, j AS chunk_idx,
         md5(array_to_string(
             list_slice(toks, cuts[j] + 1, cuts[j + 1]), ' ')) AS chunk_md5,
         CAST(cuts[j + 1] - cuts[j] AS BIGINT) AS chunk_ntok
  FROM cutpoints, unnest(range(1, len(cuts))) AS u(j)
)
"""

_CDC_DEDUP_ORACLE = f"""
WITH {_CHUNKS_CTE}
SELECT chunk_md5,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(chunk_ntok) AS BIGINT) AS chunk_ntok
FROM chunks
GROUP BY 1
HAVING COUNT(*) >= 2
"""

_CDC_PROFILE_ORACLE = f"""
WITH {_CHUNKS_CTE}
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT chunk_md5) AS BIGINT) AS n_distinct_chunks,
       CAST(SUM(chunk_ntok) AS BIGINT) AS sum_chunk_ntok,
       CAST(MAX(chunk_ntok) AS BIGINT) AS max_chunk_ntok
FROM chunks
GROUP BY 1
"""


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, chunk_idx, chunk_md5, chunk_ntok) — one row per
    content-defined chunk; every step a per-row array expression."""
    from taipei_bi_etl_spark.queries.text import _char_array, poly_hash

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    d = d.select("doc_id", "source", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    th = F.transform(
        F.col("toks"), lambda t: poly_hash(_char_array(t), CDC_B, CDC_P)
    )
    n = F.size("toks")

    def g(i):  # window hash at 1-indexed position i over th[i-3..i]
        e = lambda k: F.element_at(F.col("th"), (i + k).cast("int"))  # noqa: E731
        return (
            (
                (e(-3) * CDC_B + e(-2)) % CDC_P * CDC_B + e(-1)
            ) % CDC_P * CDC_B + e(0)
        ) % CDC_P

    h = d.select("doc_id", "source", "toks", th.alias("th"), n.alias("n"))
    cuts = F.concat(
        F.array(F.lit(0)),
        F.when(
            F.col("n") >= CDC_W,
            F.filter(
                F.sequence(F.lit(CDC_W), F.col("n")),
                lambda i: (i < F.col("n")) & (g(i) % CDC_DIV == 0),
            ),
        ).otherwise(F.array().cast("array<int>")),
        F.array(F.col("n")),
    )
    c = h.select("doc_id", "source", "toks", cuts.alias("cuts"))
    j = F.explode(F.sequence(F.lit(1), F.size("cuts") - 1)).alias("j")
    rows = c.select("doc_id", "source", "toks", "cuts", j)
    start = F.element_at("cuts", F.col("j").cast("int"))
    end = F.element_at("cuts", (F.col("j") + 1).cast("int"))
    return rows.select(
        "doc_id",
        "source",
        F.col("j").alias("chunk_idx"),
        F.md5(
            F.array_join(
                F.slice(F.col("toks"), start + 1, end - start), " "
            )
        ).alias("chunk_md5"),
        (end - start).cast("long").alias("chunk_ntok"),
    )


@query(
    "cdc_chunk_dedup",
    oracle=_CDC_DEDUP_ORACLE,
    tags=("dedup", "extension", "cdc"),
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated content-defined chunks across the corpus: chunk
    identity by md5, copies and distinct carrying documents per chunk.
    Catches PARTIAL duplication (shared passages/boilerplate blocks)
    that document-level hashing misses and that boundary-shifted
    copies hide from fixed-size blocking.

    Scale: chunking is map-side per document; the only exchange is the
    groupBy on chunk_md5 (block-level exact dedup — same shape and
    guards as `dedup_exact`, keys are 32-byte digests)."""
    ch = _chunks(spark, sf_dir)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("chunk_ntok").alias("chunk_ntok"),
        )
        .filter(F.col("n_copies") >= 2)
    )


@query(
    "cdc_chunk_profile",
    oracle=_CDC_PROFILE_ORACLE,
    tags=("dedup", "extension", "cdc", "profiling"),
)
def cdc_chunk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chunking ledger: chunk counts, distinct-chunk counts
    (the block-level dedup opportunity), exact token sums and the max
    chunk length (boundary-mask sanity — a mask that never fires makes
    every doc one chunk).  Integer sums only; averages belong to the
    reader."""
    ch = _chunks(spark, sf_dir)
    return ch.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("chunk_md5").alias("n_distinct_chunks"),
        F.sum("chunk_ntok").alias("sum_chunk_ntok"),
        F.max("chunk_ntok").alias("max_chunk_ntok"),
    )
