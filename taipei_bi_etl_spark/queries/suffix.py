"""Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr dedup)
as a windowed-suffix computation: every maximal token span of length
≥ W that occurs more than once in the corpus, reported per document.

Equivalence to the suffix-array formulation: a suffix array detects a
duplicated span of length ≥ W iff two suffixes share a prefix of ≥ W
tokens, iff some W-token window occurs twice.  Grouping positions by
their ACTUAL W-token window string (not a hash — zero collisions),
marking every token covered by a duplicated window, and emitting the
maximal contiguous runs of marked tokens (duplicated window starts
p1 < p2 mark a contiguous region iff p2 - p1 <= W, the islands merge
condition) therefore yields exactly the maximal duplicate-marked
spans with detection granularity W — Lee et al.'s suffix array with
comparison depth bounded at W, which is also how their implementation
bounds memory.

This completes the dedup family's one honest r01 gap (BACKLOG:
"suffix-array ExactSubstr full dedup"); the hashed 13-gram PROFILE
(`dedup_substring_profile`) remains the cheap screening pass, and
tests/test_suffix.py gates this form against it (every cross-document
duplicated gram position falls inside a span here).

Scale: one explode to |tokens| windowed positions, ONE shuffle keyed
on the window string (frequencies are near-uniform — a natural-text
window repeating enough to skew a partition is precisely the
duplication being hunted), one per-doc islands pass.  At 100 TB,
replace the window-string shuffle key with (xxhash64(window), window)
to cut comparator cost, or switch to ``repartitionByRange`` + run
detection within sorted partitions — the classic distributed
suffix-sort layout; semantics identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

WINDOW = 13  # detection granularity, aligned with dedup_substring_profile

_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM documents
), posn AS (
  SELECT doc_id, tok,
         unnest(range(1, len(tok) - {WINDOW} + 2)) AS p
  FROM toks WHERE len(tok) >= {WINDOW}
), win AS (
  SELECT doc_id, p,
         array_to_string(list_slice(tok, p, p + {WINDOW} - 1), ' ') AS w
  FROM posn
), cnt AS (
  SELECT doc_id, p, COUNT(*) OVER (PARTITION BY w) AS c FROM win
), dup AS (
  SELECT doc_id, p,
         CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
                   > {WINDOW} THEN 1 ELSE 0 END AS ni
  FROM cnt WHERE c >= 2
), isl AS (
  SELECT doc_id, p,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM dup
)
SELECT doc_id,
       CAST(MIN(p) AS BIGINT) AS span_start,
       CAST(MAX(p) - MIN(p) + {WINDOW} AS BIGINT) AS span_len
FROM isl
GROUP BY doc_id, grp
"""


@query(
    "dedup_exact_substring_spans",
    oracle=_SPAN_ORACLE,
    tags=("text", "dedup", "extension"),
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans (≥ WINDOW tokens, exact string
    equality) per document — the removal input for ExactSubstr dedup:
    cut every (doc_id, span_start, span_len) from the training corpus
    and repeated passages are gone with single-copy retention decided
    by the caller's policy.

    Plan: positions explode map-side; the window COUNT(*) is one
    shuffle on the window string (exact strings — a hash would admit
    false spans); the islands merge is a per-doc window over the tiny
    duplicated subset.  See the module docstring for the suffix-array
    equivalence and the 100 TB layout."""
    d = read_table(spark, sf_dir, "documents")
    tok = F.split("text", r"\s+")
    base = d.select("doc_id", tok.alias("tok")).filter(
        F.size("tok") >= WINDOW
    )
    posn = base.select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(F.lit(1), F.size("tok") - WINDOW + 1)
        ).alias("p"),
    )
    win = posn.select(
        "doc_id",
        "p",
        F.array_join(F.slice("tok", F.col("p"), WINDOW), " ").alias("w"),
    )
    cnt = win.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("w")))
    # islands merge spans whose MARKED-TOKEN regions touch or overlap:
    # window starts p1 < p2 cover a contiguous duplicated region iff
    # p2 - p1 <= WINDOW (gap > WINDOW leaves an unmarked token between
    # [p1, p1+W-1] and [p2, p2+W-1]), so a new island begins exactly
    # when the gap exceeds WINDOW — not only at consecutive positions.
    wdoc = W.partitionBy("doc_id").orderBy("p")
    dup = (
        cnt.filter(F.col("c") >= 2)
        .withColumn(
            "ni",
            F.when(
                F.col("p") - F.lag("p").over(wdoc) > WINDOW, 1
            ).otherwise(0),
        )
        .withColumn("grp", F.sum("ni").over(wdoc))
    )
    return (
        dup.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") - F.min("p") + WINDOW).cast("long").alias("span_len"),
        )
        .drop("grp")
    )
