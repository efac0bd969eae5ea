"""Paragraph-level exact dedup (CCNet-style) — the segment-granular
sibling of document dedup: LLM corpora are cleaned by removing REPEATED
PARAGRAPHS corpus-wide (boilerplate headers, navigation, license
blocks) while keeping each document's unique remainder.  CCNet /
RefinedWeb dedup at the paragraph level before any document-level
near-dup pass; the reference has no analog (its unit is the event),
so this extends the LLM-pipeline family (BASELINE north star).

The synthetic documents carry no newline structure, so "paragraph" is
a fixed {SEG_WORDS}-word segment (the same fixed-window convention as
`curation2.chunk_sliding_windows`); the operator's semantics —
hash each segment, keep only the corpus-wide FIRST occurrence in
(doc_id, segment-index) order, report each document's retained
fraction and the digest of its cleaned text — are exactly the
production shape.

100 TB design: segmentation is a zero-exchange array expression per
document; the first-occurrence decision is ONE groupBy on the segment
hash (map-side combinable ``min(struct(doc_id, seg_idx))`` — no window
over a global sort) followed by an equi-join back on the hash; the
per-document report is one more groupBy on doc_id.  Shuffle keys are
the 128-bit digest (uniform, skew-free) and doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

SEG_WORDS = 10  # words per "paragraph" segment

# Segments are whole windows of SEG_WORDS tokens plus the final partial
# (a document shorter than SEG_WORDS is one segment).  Both engines
# tokenize with the same \s+ split and join segments with one space.
_PARA_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS tok
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), segs AS (
  SELECT doc_id,
         CAST(i - 1 AS INT) AS seg_idx,
         array_to_string(tok[(i - 1) * {SEG_WORDS} + 1 : i * {SEG_WORDS}], ' ')
           AS seg
  FROM toks,
       LATERAL (SELECT UNNEST(range(1,
                CAST(ceil(len(tok) / {SEG_WORDS}.0) AS BIGINT) + 1)) AS i) t
), kept AS (
  SELECT doc_id, seg_idx, seg
  FROM segs
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) = 1
)
SELECT s.doc_id,
       CAST(COUNT(*) AS INT) AS n_segments,
       CAST(COUNT(k.seg_idx) AS INT) AS n_kept,
       ROUND(COUNT(k.seg_idx) * 1.0 / COUNT(*), 8) AS retained_ratio,
       md5(COALESCE(array_to_string(
           list_sort(list(CAST(k.seg_idx AS VARCHAR) || ':' || k.seg)
                     FILTER (WHERE k.seg_idx IS NOT NULL)), '|'), ''))
         AS cleaned_md5
FROM segs s LEFT JOIN kept k
  ON k.doc_id = s.doc_id AND k.seg_idx = s.seg_idx
GROUP BY 1
"""


@query(
    "paragraph_dedup_report",
    oracle=_PARA_ORACLE,
    tags=("dedup", "text", "extension"),
)
def paragraph_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph (fixed-window segment) dedup: each distinct
    segment survives only at its first occurrence in (doc_id, seg_idx)
    order; per document, report total segments, kept segments, retained
    fraction, and a digest of the kept (seg_idx, text) set.

    The keeper digest folds seg_idx so the oracle and the plan agree on
    WHICH copies survived, not just how many."""
    segs = _segments(read_table(spark, sf_dir, "documents"))
    return _report(segs, _first_occurrence(segs))


def _segments(docs: DataFrame) -> DataFrame:
    """(doc_id, seg_idx, seg, h): fixed-window segments + md5."""
    docs = docs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
    tok = F.split(F.col("text"), r"\s+")
    n_seg = F.ceil(F.size(tok) / F.lit(SEG_WORDS)).cast("int")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.struct(
                        i.cast("int").alias("seg_idx"),
                        F.array_join(
                            F.slice(tok, i * SEG_WORDS + 1, SEG_WORDS), " "
                        ).alias("seg"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "s.seg_idx", "s.seg")
        .withColumn("h", F.md5("seg"))
    )


def _first_occurrence(segs: DataFrame) -> DataFrame:
    """(doc_id, seg_idx) of each segment hash's first occurrence —
    map-side-combinable min(struct), no global-sort window."""
    firsts = segs.groupBy("h").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("keeper")
    )
    return (
        segs.join(firsts, "h")
        .filter(
            (F.col("doc_id") == F.col("keeper.doc_id"))
            & (F.col("seg_idx") == F.col("keeper.seg_idx"))
        )
        .select("doc_id", "seg_idx")
    )


def _report(segs: DataFrame, kept: DataFrame) -> DataFrame:
    """Per-doc retention report given the surviving (doc_id, seg_idx)."""
    kept_flag = kept.withColumn("kept", F.lit(1))
    joined = segs.join(kept_flag, ["doc_id", "seg_idx"], "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.count("kept").cast("int").alias("n_kept"),
        F.round(
            F.count("kept") / F.count(F.lit(1)), 8
        ).alias("retained_ratio"),
        F.md5(
            F.coalesce(
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept").isNotNull(),
                                F.concat_ws(
                                    ":",
                                    F.col("seg_idx").cast("string"),
                                    F.col("seg"),
                                ),
                            )
                        )
                    ),
                    "|",
                ),
                F.lit(""),
            )
        ).alias("cleaned_md5"),
    )


@query(
    "paragraph_dedup_incremental",
    oracle=_PARA_ORACLE,
    tags=("dedup", "text", "ivm", "extension"),
)
def paragraph_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental paragraph dedup against a persisted first-occurrence
    index — the daily-batch form (same IVM-identity pattern as the
    incremental MinHash/SimHash/image entries: the ORACLE is the FULL
    recompute, so the driver hash gate proves the equivalence).

    APPEND-ONLY split: new batch = doc_ids above the 75th-percentile id
    cut (computed as one 1-row aggregate and broadcast).  Because every
    new id exceeds every history id, the full recompute's global
    first-occurrence decomposes exactly:

    * a HISTORY segment's keeper is unchanged by the new batch (new
      docs sort after it) — yesterday's report rows are final;
    * a NEW segment survives iff its hash is absent from the history
      index (anti-join probe) AND it is the batch-local first
      occurrence.

    Daily cost ∝ |batch| + probed index keys; history text is never
    re-segmented in the stored-state deployment (here both sides are
    derived in-plan from one corpus so the driver can hash the whole
    thing — the `ivm_store` pattern applies verbatim if persisted)."""
    from taipei_bi_etl_spark.queries.incremental import quantile_cut_split

    segs = _segments(read_table(spark, sf_dir, "documents")).persist()
    hist, new = quantile_cut_split(segs, "doc_id")
    hist_kept = _first_occurrence(hist)
    # probe: new segments whose hash exists in history are dropped
    # outright; survivors compete batch-locally
    new_fresh = new.join(hist.select("h").distinct(), "h", "left_anti")
    new_kept = _first_occurrence(new_fresh)
    return _report(hist, hist_kept).unionByName(
        _report(new, new_kept)
    )
