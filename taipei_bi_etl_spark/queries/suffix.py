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


# ---------------------------------------------------------------------------
# Prefix-doubling form — the suffix-array layout at 100 TB.
# ---------------------------------------------------------------------------


def _equality_rank(df: DataFrame, c1: str, c2: str, out: str) -> DataFrame:
    """Replace each distinct (c1, c2) pair with one 8-byte id.

    Only EQUALITY of ids is consumed downstream (the doubling rounds
    test window equality, never order), so the id does not need to be
    dense or order-preserving — ``monotonically_increasing_id`` over
    the distinct pairs is collision-free by construction (partition id
    in the high bits) with zero extra shuffle beyond the distinct.
    The id frame is persisted so every consumer sees ONE materialized
    assignment — an unpersisted nondeterministic id could be
    recomputed differently per consumer."""
    ids = (
        df.select(c1, c2)
        .distinct()
        .withColumn(out, F.monotonically_increasing_id())
        .persist()
    )
    return df.join(ids, [c1, c2])


def _shift_rank(ranks: DataFrame, k: int, out: str) -> DataFrame:
    """(doc_id, p, r) → (doc_id, p, r, r_at_p_plus_k) — inner join, so
    positions whose shifted partner falls off the document end drop
    out, exactly the positions whose window would overrun."""
    shifted = ranks.select(
        "doc_id", (F.col("p") - k).alias("p"), F.col("r").alias(out)
    )
    return ranks.join(shifted, ["doc_id", "p"])


@query(
    "dedup_exact_substring_sa",
    oracle=_SPAN_ORACLE,
    tags=("text", "dedup", "extension", "iterative"),
)
def dedup_exact_substring_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME maximal duplicate-marked spans as
    ``dedup_exact_substring_spans`` (identical oracle — the two forms
    are hash-compared against one SQL text), computed in the
    suffix-array layout: prefix-doubling equality ranks instead of
    materialized window strings.

    Manber-Myers doubling, equality-only: rank_1 = id of the token;
    rank_2k(p) = id of (rank_k(p), rank_k(p+k)); the final length-13
    rank combines rank_8(p) and rank_8(p+5) — the overlapping-pair
    trick (sparse-table style): two length-8 windows at offsets 0 and
    5 cover positions p..p+12, and equality of the pair is equality
    of the 13-token window.  Positions sharing a final rank with ≥ 2
    members are duplicated; the islands merge is shared with the
    windowed form.

    Scale — WHY this exists next to the windowed form: the windowed
    form shuffles O(n·W) bytes (every position carries its W-token
    string as the shuffle key); this form shuffles O(n) 8-byte ranks
    per doubling round, ceil(log2 W)+1 rounds — at W=50+ (Lee et
    al.'s threshold) that is an order of magnitude less shuffle
    volume, and the key is always a fixed-width long, never a string
    comparator.  Per round: one distinct + one join + one shift join,
    all keyed on (doc_id, p) or the 8-byte pair.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = F.split("text", r"\s+")
    base = d.select("doc_id", tok.alias("tok")).filter(
        F.size("tok") >= WINDOW
    )
    pos = base.select(
        "doc_id", F.posexplode("tok").alias("p0", "t")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "t")
    # rank_1: token identity (c2 is a constant — rank over the token).
    # Each round SELF-joins the rank frame (shifted vs unshifted) and
    # feeds the next round: the LOGICAL plan doubles per round even
    # when a persist makes execution reuse the cache, and by round 4
    # the plan tree itself (2^rounds nodes) OOMs the driver just
    # rendering explain strings.  localCheckpoint truncates lineage —
    # the iterative-algorithm tool persist is not.
    r = (
        _equality_rank(pos.withColumn("z", F.lit(0)), "t", "z", "r")
        .select("doc_id", "p", "r")
        .localCheckpoint()
    )
    # doubling rounds 1→2→4→8, then the 8+5 overlap for length 13
    for k in (1, 2, 4):
        paired = _shift_rank(r, k, "r2")
        r = (
            _equality_rank(paired, "r", "r2", "rn")
            .select("doc_id", "p", F.col("rn").alias("r"))
            .localCheckpoint()
        )
    final = _shift_rank(r, WINDOW - 8, "r2")
    w13 = _equality_rank(final, "r", "r2", "w").select("doc_id", "p", "w")
    cnt = w13.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("w")))
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


# ---------------------------------------------------------------------------
# Removal rewrite — the deployment form of ExactSubstr dedup (r10).
# ---------------------------------------------------------------------------

_REMOVE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS tok
  FROM documents WHERE text IS NOT NULL
), posn AS (
  SELECT doc_id, tok,
         unnest(range(1, len(tok) - {WINDOW} + 2)) AS p
  FROM toks WHERE len(tok) >= {WINDOW}
), win AS (
  SELECT doc_id, p,
         array_to_string(list_slice(tok, p, p + {WINDOW} - 1), ' ') AS w
  FROM posn
), occ AS (
  SELECT doc_id, p,
         ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id, p) AS rn
  FROM win
), marked AS (
  -- rn >= 2 alone implies the window occurs >= 2 times (r10 review:
  -- a COUNT(*) OVER w predicate here was redundant)
  SELECT doc_id, p FROM occ WHERE rn >= 2
), isl0 AS (
  SELECT doc_id, p,
         CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
                   > {WINDOW} THEN 1 ELSE 0 END AS ni
  FROM marked
), isl AS (
  SELECT doc_id, p,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM isl0
), spans AS (
  SELECT doc_id, MIN(p) AS s, MAX(p) + {WINDOW} - 1 AS e
  FROM isl GROUP BY doc_id, grp
), sp AS (
  SELECT doc_id, list([s, e]) AS spans FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.tok) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(range(1, len(t.tok) + 1),
            i -> len(list_filter(COALESCE(sp.spans, []),
                 b -> i >= b[1] AND i <= b[2])) > 0)) AS BIGINT)
         AS n_removed,
       md5(COALESCE(array_to_string(list_filter(t.tok,
            (x, i) -> len(list_filter(COALESCE(sp.spans, []),
                 b -> i >= b[1] AND i <= b[2])) = 0), ' '), ''))
         AS kept_md5
FROM toks t LEFT JOIN sp ON sp.doc_id = t.doc_id
"""


@query(
    "dedup_substring_remove",
    oracle=_REMOVE_ORACLE,
    tags=("text", "dedup", "extension"),
)
def dedup_substring_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL rewrite — ExactSubstr dedup's deployment form (Lee
    et al. 2022 §4.2: excise duplicated substrings, keep one copy):
    per document, the tokens covered by NON-FIRST occurrences of any
    duplicated ≥ WINDOW-token window are removed, and the kept text is
    emitted as (doc_id, n_tokens, n_removed, kept_md5).

    KEEP-FIRST policy, fully deterministic: occurrences of each
    duplicated window string are ranked by (doc_id, p) and every rank
    ≥ 2 occurrence is marked; marked starts merge into maximal covered
    intervals by the same gap > WINDOW islands rule as
    `dedup_exact_substring_spans` (the union of [p, p+W−1] ranges is
    contiguous within an island by construction).  The corpus-first
    occurrence of every passage survives — repeated boilerplate
    collapses to one copy instead of vanishing entirely.

    The driver hash-gates the REWRITE ITSELF: kept_md5 hashes the
    kept-token join, so a single mis-kept token anywhere flips the
    value hash (the `paragraph_dedup_report` kept-set-digest pattern,
    upgraded to per-document).  Docs with NULL text are excluded in
    both engines (contract); docs shorter than WINDOW pass through
    with n_removed = 0.

    Scale: the window COUNT + ROW_NUMBER ride ONE shuffle on the
    window string (the spans query's shuffle — rn adds no exchange:
    same partition key); the spans side that joins back to the corpus
    holds only documents that LOSE tokens, and the rewrite itself is a
    map-side lambda projection over (tok, spans) — no token-granular
    shuffle.  The per-token exists() is O(spans/doc) with spans/doc
    bounded by n_tokens/WINDOW; the lambda projection is the
    documented interpreted-exclusion class (WSCG.md)."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = F.split("text", r"\s+")
    docs = d.select("doc_id", tok.alias("tok"))
    base = docs.filter(F.size("tok") >= WINDOW)
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
    occ = win.select(
        "doc_id",
        "p",
        F.row_number()
        .over(W.partitionBy("w").orderBy("doc_id", "p"))
        .alias("rn"),
    )
    # rn >= 2 alone implies the window occurs >= 2 times — no COUNT
    # window needed (r10 review)
    marked = occ.filter(F.col("rn") >= 2).select("doc_id", "p")
    wdoc = W.partitionBy("doc_id").orderBy("p")
    isl = marked.withColumn(
        "ni",
        F.when(F.col("p") - F.lag("p").over(wdoc) > WINDOW, 1).otherwise(0),
    ).withColumn("grp", F.sum("ni").over(wdoc))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("p").alias("s"), (F.max("p") + WINDOW - 1).alias("e")
    )
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("spans")
    )
    joined = docs.join(sp, "doc_id", "left")

    def covered(i):
        # NULL spans (doc lost nothing) -> exists() is NULL -> False
        return F.coalesce(
            F.exists(
                F.col("spans"), lambda b: (i >= b["s"]) & (i <= b["e"])
            ),
            F.lit(False),
        )

    flags = F.transform(F.sequence(F.lit(1), F.size("tok")), covered)
    kept = F.filter(
        F.zip_with(F.col("tok"), flags, lambda t, f: F.when(~f, t)),
        lambda x: x.isNotNull(),
    )
    return joined.select(
        "doc_id",
        F.size("tok").cast("long").alias("n_tokens"),
        F.size(F.filter(flags, lambda x: x)).cast("long").alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("kept_md5"),
    )
