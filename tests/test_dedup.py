"""Sketch-dedup quality gates: MinHash-LSH and SimHash must agree with
the exact near-duplicate pair sets (the oracle only hash-checks
MinHash; SimHash has no SQL twin, so its gate lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.dedup import (
    JACCARD_T,
    _doc_shingles,
    dedup_minhash_lsh,
    dedup_simhash,
)
from tests.conftest import SF_DIR


def _exact_pairs(spark, threshold):
    """All-pairs exact Jaccard ≥ threshold via the inverted index."""
    sh = _doc_shingles(spark, SF_DIR).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    rows = (
        inter.join(sa, "doc_a").join(sb, "doc_b").filter(jac >= threshold).collect()
    )
    return {(r.doc_a, r.doc_b) for r in rows}


def test_minhash_lsh_finds_all_exact_pairs(spark):
    exact = _exact_pairs(spark, JACCARD_T)
    lsh = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()}
    assert lsh == exact


def test_simhash_matches_exact_pairs_on_long_docs(spark):
    # SimHash fingerprints of very short docs are high-variance (one
    # differing shingle among ~5 flips dozens of bits), so the
    # exact-recall gate applies to pairs where both docs have >= 20
    # shingles.  False positives are checked unconditionally.
    sizes = {
        r.doc_id: r.n
        for r in _doc_shingles(spark, SF_DIR)
        .select("doc_id", F.size("sh").alias("n"))
        .collect()
    }
    exact = _exact_pairs(spark, JACCARD_T)
    weak = _exact_pairs(spark, 0.5)
    sim = {(r.doc_a, r.doc_b) for r in dedup_simhash(spark, SF_DIR).collect()}
    long_exact = {
        (a, b) for a, b in exact if sizes[a] >= 20 and sizes[b] >= 20
    }
    missed = long_exact - sim
    false_pos = sim - weak
    assert not missed, f"simhash missed long-doc true pairs: {sorted(missed)[:5]}"
    assert not false_pos, f"simhash false positives: {sorted(false_pos)[:5]}"
