"""Tokenizer-adjacent corpus operators: fixed-quota content-addressed
sampling and distributed BPE merge training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-training half of a training-data pipeline (BASELINE north
star; complements `token_count_bpe`, which *applies* a subword budget).

Scale notes inline per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Fixed-quota stratified sample: exactly K docs per source, chosen by
# content hash — a deterministic eval-set builder.
# ---------------------------------------------------------------------------

SAMPLE_K = 20

_FIXED_K_ORACLE = f"""
SELECT source, doc_id, CAST(rn AS INT) AS sample_rank
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
  FROM documents WHERE text IS NOT NULL
)
WHERE rn <= {SAMPLE_K}
"""


@query(
    "stratified_fixed_k_sample",
    oracle=_FIXED_K_ORACLE,
    tags=("curation", "extension"),
)
def stratified_fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly SAMPLE_K documents per source, ranked by md5(text) —
    content-addressed, so the sample is stable under repartitioning,
    re-ingestion, and upstream dedup (same property as
    `corpus_hash_split`, but with an exact per-stratum quota instead of
    a rate).

    Scale: one hash-partitioned window on ``source``; per-source rank
    truncates to K, so the output is |sources|·K rows.  With few, huge
    strata the window sort is the cost — swap to a per-partition top-K
    heap (the TakeOrderedAndProject pattern, per group) if |sources| is
    small and strata are 100 TB-sized; semantics are unchanged.
    """
    # md5(NULL) is NULL, and the engines DISAGREE on default NULL
    # ordering (Spark windows: NULLS FIRST asc; DuckDB: NULLS LAST) —
    # contentless docs are not sampling candidates, filter both sides.
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = Window.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_K)
        .select("source", "doc_id", F.col("rn").cast("int").alias("sample_rank"))
    )


# ---------------------------------------------------------------------------
# Distributed BPE merge training.
# ---------------------------------------------------------------------------

N_MERGES = 10


def _merge_pair(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    symbol array, as a Catalyst fold (no Python in the data path)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n) over the whitespace-tokenized corpus — BPE trains on
    the distinct-word frame weighted by frequency, so the iteration cost
    is ∝ |vocabulary|, not corpus size (the corpus-sized aggregation
    happens exactly once)."""
    d = read_table(spark, sf_dir, "documents")
    tok = F.explode(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    ).alias("word")
    return d.select(tok).groupBy("word").agg(F.count(F.lit(1)).alias("n"))


from taipei_bi_etl_spark.queries.bpe_pins import encode_oracle, merges_oracle


@query(
    "bpe_train_merges",
    oracle=merges_oracle(),
    tags=("text", "extension", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train N_MERGES BPE merges on the corpus: start from characters,
    repeatedly count adjacent symbol pairs (weighted by word frequency)
    and merge the globally most frequent pair (ties: count desc, then
    lexicographic (left, right) — deterministic).  Plain inner-word BPE,
    no end-of-word marker.  Oracle: pinned per-corpus tables (see
    bpe_pins.py — training is iterative, but its output is
    deterministic, so the fixed driver corpora pin exactly); ALSO
    pinned against a pure-Python reference BPE in
    tests/test_tokenizer.py, which re-derives the values live.

    Scale: each round is one explode+groupBy over the DISTINCT-WORD
    frame (vocabulary-sized, not corpus-sized) with map-side partial
    sums, plus a 1-row argmax collected to the driver (the merge table
    itself — scalar per round, same policy as k-means centroids).  The
    pair-merge rewrite is a Catalyst fold, no Python in the data path.
    """
    words = _word_counts(spark, sf_dir).select(
        F.filter(F.split(F.col("word"), ""), lambda c: c != "").alias("syms"),
        "n",
    ).persist()
    words.count()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, N_MERGES + 1):
        pairs = words.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, top[0].cnt
        merges.append((rank, l, r, int(cnt)))
        new = words.select(_merge_pair(F.col("syms"), l, r).alias("syms"), "n").persist()
        new.count()
        words.unpersist()
        words = new
    words.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count bigint"
    )


# ---------------------------------------------------------------------------
# BPE encode — apply the trained merges to the corpus.
# ---------------------------------------------------------------------------


@query(
    "bpe_encode_apply",
    oracle=encode_oracle(),
    tags=("text", "extension", "iterative"),
)
def bpe_encode_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the merges `bpe_train_merges` learns:
    each distinct word starts as characters and replays the merge table
    in rank order (greedy left-to-right, the training rewrite), giving
    words → piece counts; per-source totals weight by word frequency.

    Oracle: pinned per-corpus tables (bpe_pins.py); ALSO pinned
    against a pure-Python encoder in tests/test_tokenizer.py.

    Scale: the encode fold runs on the DISTINCT-WORD frame (vocabulary-
    sized), entirely in Catalyst (N chained folds, no Python, no UDF);
    the corpus is touched twice — once to build (source, word) counts
    (map-side combined), once never: totals come from the count frame
    joined to the encoded vocabulary on the word key.  The merge table
    itself is a driver-side scalar list (same policy as k-means
    centroids), N_MERGES rows.
    """
    merges = [
        (r.left, r.right)
        for r in bpe_train_merges(spark, sf_dir).orderBy("merge_rank").collect()
    ]
    d = read_table(spark, sf_dir, "documents")
    tok = F.explode(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    ).alias("word")
    sw = d.select("source", tok).groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("k")
    )
    vocab = sw.select("word").distinct()
    enc = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    for left, right in merges:
        enc = _merge_pair(enc, left, right)
    word_pieces = vocab.select(
        "word", F.size(enc).cast("long").alias("n_pieces")
    )
    return (
        sw.join(word_pieces, "word")
        .groupBy("source")
        .agg(
            F.sum("k").alias("total_words"),
            F.sum(F.col("k") * F.col("n_pieces")).alias("total_pieces"),
        )
        .select(
            "source",
            "total_words",
            "total_pieces",
            F.round(
                F.col("total_pieces").cast("double") / F.col("total_words"), 6
            ).alias("pieces_per_word"),
        )
    )
