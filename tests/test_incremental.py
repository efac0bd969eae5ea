"""Incremental-form scaffold (r08): split contract + the seventh form's
identity against the full recompute (the oracle gate proves it against
DuckDB; this pins it engine-internally too, so a scaffold regression
shows up as a frame diff, not a cross-engine hash flap)."""

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.incremental import quantile_cut_split
from tests.conftest import SF_DIR


def test_quantile_cut_split_contract(spark):
    base = spark.range(101).select(F.col("id").alias("doc_id"))
    hist, new = quantile_cut_split(base, "doc_id")
    h = {r.doc_id for r in hist.collect()}
    n = {r.doc_id for r in new.collect()}
    assert h | n == set(range(101))  # partition: nothing lost
    assert h & n == set()            # disjoint
    assert max(h) < min(n)           # append-only ordering
    # 75th-percentile cut: ~25% of the id RANGE is the new batch
    assert n == set(range(76, 101))


def test_quantile_cut_split_single_row(spark):
    # max == min → cut == the id itself → the one row is history
    base = spark.range(1).select((F.col("id") + 7).alias("doc_id"))
    hist, new = quantile_cut_split(base, "doc_id")
    assert hist.count() == 1 and new.count() == 0


def test_ngram_incremental_equals_full(spark):
    """pairs(hist ∪ new) decomposition identity, frame-exact."""
    from taipei_bi_etl_spark.queries.pipeline import (
        dedup_ngram_jaccard,
        dedup_ngram_jaccard_incremental,
    )

    full = dedup_ngram_jaccard(spark, SF_DIR)
    inc = dedup_ngram_jaccard_incremental(spark, SF_DIR)
    assert full.exceptAll(inc).count() == 0
    assert inc.exceptAll(full).count() == 0
    assert full.count() > 0  # non-vacuous: planted near-dups exist


def test_exact_incremental_equals_full(spark, tmp_path):
    """Agg-merge identity, frame-exact against the full recompute — on
    a corpus with duplicates PLANTED ACROSS the quantile cut (sf0.001
    has no exact dups, so the real-corpus identity is vacuous; the
    oracle gate covers it at sf0.01).  Ids 0..99: dup pairs (i, i+90)
    for i < 10 straddle the 75th-percentile cut at 75."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.pipeline import (
        dedup_exact,
        dedup_exact_incremental,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("text-"),
            F.when(
                (F.col("id") >= 90), F.col("id") - 90
            ).otherwise(F.col("id")).cast("string"),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(6).alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    full = dedup_exact(spark, str(tmp_path))
    inc = dedup_exact_incremental(spark, str(tmp_path))
    assert full.exceptAll(inc).count() == 0
    assert inc.exceptAll(full).count() == 0
    assert full.count() == 10  # all cross-cut dups found


def test_agg_merge_cross_cut_duplicates(spark):
    """A digest that is a SINGLETON on each side of the cut must still
    merge into a duplicate group — the reason partials keep the HAVING
    off (the bug class the merge scaffold exists to prevent)."""
    from taipei_bi_etl_spark.queries.incremental import (
        incremental_agg_merge,
    )
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(1, "same"), (2, "only-hist")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "same")], "doc_id long, text string"
    )

    def state(side):
        return side.groupBy(F.md5("text").alias("content_hash")).agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )

    merged = incremental_agg_merge(
        hist, new, state, ["content_hash"],
        {
            "keep_doc_id": F.least,
            "n_copies": lambda a, b: F.coalesce(a, F.lit(0))
            + F.coalesce(b, F.lit(0)),
        },
    )
    dup = merged.filter(F.col("n_copies") > 1).collect()
    assert len(dup) == 1
    assert dup[0].keep_doc_id == 1 and dup[0].n_copies == 2


def test_minhash_incremental_equals_full(spark):
    """r09 (VERDICT r08 #6): the TENTH form — MinHash on the scaffold —
    is frame-exact against the full LSH run."""
    from taipei_bi_etl_spark.queries.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    full = dedup_minhash_lsh(spark, SF_DIR)
    inc = dedup_minhash_incremental(spark, SF_DIR)
    assert full.exceptAll(inc).count() == 0
    assert inc.exceptAll(full).count() == 0
    assert full.count() > 0


def test_embedding_incremental_equals_full(spark):
    """r09: the ELEVENTH form — embedding LSH dedup on the scaffold,
    ids-only index rows with corpus-side verify — is frame-exact
    against the full bucketed run."""
    from taipei_bi_etl_spark.queries.similarity import (
        dedup_embedding_incremental,
        dedup_embedding_lsh,
    )

    full = dedup_embedding_lsh(spark, SF_DIR)
    inc = dedup_embedding_incremental(spark, SF_DIR)
    assert full.exceptAll(inc).count() == 0
    assert inc.exceptAll(full).count() == 0
    assert full.count() > 0
