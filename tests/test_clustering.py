"""Clustering gates: component labels are valid CC labels, k-means
covers the corpus, IVF recall against the exact top-k."""

from __future__ import annotations

from taipei_bi_etl_spark.queries.clustering import (
    ann_ivf_topk,
    dedup_components,
    embedding_kmeans,
)
from taipei_bi_etl_spark.queries.dedup import dedup_minhash_lsh
from taipei_bi_etl_spark.queries.similarity import ann_cosine_topk
from tests.conftest import SF_DIR


def test_components_are_consistent_with_pairs(spark):
    comp = {
        r.doc_id: r.component_id
        for r in dedup_components(spark, SF_DIR).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    ]
    # every edge endpoint is labeled, edges join equal components,
    # and each component is labeled by its own minimum member
    assert all(a in comp and b in comp for a, b in pairs)
    assert all(comp[a] == comp[b] for a, b in pairs)
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    assert all(min(ms) == c for c, ms in members.items())


def test_kmeans_partitions_corpus(spark):
    rows = embedding_kmeans(spark, SF_DIR).collect()
    assert sum(r.n_vectors for r in rows) == 500
    assert len(rows) > 1  # corpus actually splits across cells


def test_ivf_recall_vs_exact(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, SF_DIR).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(spark, SF_DIR).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"
