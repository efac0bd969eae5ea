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
