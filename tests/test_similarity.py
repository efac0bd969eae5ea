"""Similarity-search quality gates beyond the oracle hash check:
the LSH ANN path must actually find (most of) the true neighbors."""

from __future__ import annotations

from taipei_bi_etl_spark.queries.similarity import (
    ann_cosine_topk,
    ann_lsh_bucketed,
    dedup_embedding_cosine,
)
from tests.conftest import SF_DIR


def test_lsh_recall_vs_exact(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, SF_DIR).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_bucketed(spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 4 tables x 12 bits on a small corpus: top-1/2 neighbors are near
    # the query and collide with high probability; distant tail may not.
    assert recall >= 0.5, f"LSH recall too low: {recall:.2f}"


def test_lsh_is_deterministic(spark):
    a = sorted(map(tuple, ann_lsh_bucketed(spark, SF_DIR).collect()))
    b = sorted(map(tuple, ann_lsh_bucketed(spark, SF_DIR).collect()))
    assert a == b


def test_near_dup_pairs_are_symmetric_free(spark):
    rows = dedup_embedding_cosine(spark, SF_DIR).collect()
    assert all(r.vec_a < r.vec_b for r in rows)
