"""Gates for ExactSubstr duplicated-span detection beyond the oracle
hash check: planted duplicates are found exactly, spans are maximal,
and the spans are consistent with the 13-gram screening profile."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.suffix import (
    WINDOW,
    dedup_exact_substring_spans,
)
from tests.conftest import SF_DIR


def _spans_of(spark, docs):
    docs.createOrReplaceTempView("_suffix_docs")
    # run the same logic on a planted frame by monkey-free reuse: inline
    from pyspark.sql import Window as W

    tok = F.split("text", r"\s+")
    base = docs.select("doc_id", tok.alias("tok")).filter(
        F.size("tok") >= WINDOW
    )
    posn = base.select(
        "doc_id", "tok",
        F.explode(F.sequence(F.lit(1), F.size("tok") - WINDOW + 1)).alias("p"),
    )
    win = posn.select(
        "doc_id", "p",
        F.array_join(F.slice("tok", F.col("p"), WINDOW), " ").alias("w"),
    )
    cnt = win.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("w")))
    dup = cnt.filter(F.col("c") >= 2).withColumn(
        "grp",
        F.col("p") - F.row_number().over(W.partitionBy("doc_id").orderBy("p")),
    )
    return {
        (r.doc_id, r.span_start, r.span_len)
        for r in dup.groupBy("doc_id", "grp")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") - F.min("p") + WINDOW).alias("span_len"),
        )
        .collect()
    }


def test_planted_duplicate_span_found_exactly(spark):
    """Two docs share a 20-token passage embedded in unique noise: the
    span must be reported in both docs, maximal, and nothing else."""
    shared = " ".join(f"dup{i}" for i in range(20))
    a_noise = " ".join(f"a{i}" for i in range(15))
    b_noise = " ".join(f"b{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, f"{a_noise} {shared} {a_noise.upper()}"),
            (2, f"{b_noise} {shared} {b_noise.upper()}"),
            (3, " ".join(f"c{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    spans = _spans_of(spark, docs)
    # span covers positions 16..35 in both docs (1-based), len 20
    assert (1, 16, 20) in spans
    assert (2, 16, 20) in spans
    assert all(d != 3 for d, _, _ in spans)
    assert len(spans) == 2


def test_intra_document_repeat_detected(spark):
    """Lee et al. semantics: a passage repeated WITHIN one document is
    a duplicated span too."""
    rep = " ".join(f"r{i}" for i in range(WINDOW))
    mid = " ".join(f"m{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, f"{rep} {mid} {rep}"), (2, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    spans = _spans_of(spark, docs)
    assert (1, 1, WINDOW) in spans
    assert (1, WINDOW + 6, WINDOW) in spans


def test_consistent_with_13gram_profile(spark):
    """Every document the hashed 13-gram profile marks as having
    cross-document duplicated grams must carry at least one span here
    (this form detects a superset: exact strings, intra-doc repeats
    included)."""
    from taipei_bi_etl_spark.queries.text2 import dedup_substring_profile

    profile = {
        r.doc_id: r.n_dup
        for r in dedup_substring_profile(spark, SF_DIR).collect()
    }
    spans = dedup_exact_substring_spans(spark, SF_DIR).collect()
    docs_with_spans = {r.doc_id for r in spans}
    flagged = {d for d, n in profile.items() if n > 0}
    missing = flagged - docs_with_spans
    assert not missing, f"profile-flagged docs without spans: {missing}"
    # span sanity: every span is at least WINDOW long and inside the doc
    for r in spans:
        assert r.span_len >= WINDOW
        assert r.span_start >= 1
