"""Invariant gates for distributed FFD sequence packing (no SQL oracle —
bin packing is iterative — so these tests ARE the correctness contract:
exactly-once assignment, capacity respected, fill-rate floor, and
partitioning-invariance of the content-addressed layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.packing import (
    CAPACITY,
    pack_sequences,
    pack_sequences_ffd,
)
from tests.conftest import SF_DIR


def _assignments(df):
    return {
        r.doc_id: (r.pack_group, r.bin_id, r.n_tokens) for r in df.collect()
    }


def _packed_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    return pack_sequences(docs)


def test_pack_exactly_once_and_capacity(spark):
    packed = _packed_docs(spark)
    rows = packed.collect()
    doc_ids = [r.doc_id for r in rows]
    assert len(doc_ids) == len(set(doc_ids))
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(doc_ids) == n_docs
    loads = (
        packed.groupBy("pack_group", "bin_id")
        .agg(F.sum("n_tokens").alias("load"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in loads:
        # an overflow bin (single doc > capacity) is the only excuse
        assert r.load <= CAPACITY or r.n == 1, r
    # and the registered audit form agrees with itself end-to-end
    audit = pack_sequences_ffd(spark, SF_DIR).collect()
    assert len(audit) == 1
    a = audit[0]
    assert a.exactly_once_ok and a.capacity_ok and a.fill_ok
    assert a.n_docs == n_docs


def test_pack_fill_rate_floor(spark):
    """FFD with doc ≪ capacity packs tightly: all bins but the last
    per group must be > half full, and the corpus-wide fill rate
    beats 70% even at tiny scale (few docs per group)."""
    packed = _packed_docs(spark).collect()
    import collections

    loads: dict = collections.defaultdict(int)
    for r in packed:
        loads[(r.pack_group, r.bin_id)] += r.n_tokens
    total = sum(loads.values())
    fill = total / (len(loads) * CAPACITY)
    assert fill > 0.7, f"fill rate {fill:.2f}"


def test_pack_invariant_under_repartition(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    a = _assignments(pack_sequences(docs))
    b = _assignments(pack_sequences(docs.repartition(13, "text")))
    assert a == b


def test_pack_overflow_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 9), (2, "x " * 300), (3, "y " * 4)],
        "doc_id long, text string",
    ).select("doc_id", F.trim("text").alias("text"))
    out = _assignments(pack_sequences(docs, capacity=16, n_groups=1))
    # doc 2 exceeds capacity: alone in its bin; docs 1+3 co-pack (9+4<=16)
    assert out[2][1] != out[1][1]
    bins = {}
    for doc, (_, b, t) in out.items():
        bins.setdefault(b, []).append(doc)
    assert sorted(bins[out[1][1]]) == [1, 3]
    assert bins[out[2][1]] == [2]
