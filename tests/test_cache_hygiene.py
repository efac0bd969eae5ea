"""Registry cache contract (r04 VERDICT #8 / r03 ADVICE #3): registry
queries persist() subtrees their RETURNED frame consumes, so they cannot
unpersist before their action.  The registry wrapper therefore releases
the PREVIOUS query's tracked persists on each new invocation, and
exposes release_tracked() for teardown — no harness has to remember
spark.catalog.clearCache() to avoid unbounded cache growth in a
long-lived session."""

from __future__ import annotations

from taipei_bi_etl_spark.queries import REGISTRY, _TRACKED, release_tracked
from tests.conftest import SF_DIR

#: ten persist-using registry queries (the leak class: similarity,
#: label-quality, graph, dedup, curation pipelines)
CACHE_USERS = [
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "dedup_ngram_jaccard",
    "knn_label_consistency_jl",
    "copurchase_triangle_count",
    "dedup_components",
    "text_ngram_lm_score",
    "dedup_substring_profile",
    "curation_end_to_end",
    "ann_lsh_bucketed",
]


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_ten_registry_queries_leave_no_residual_caches(spark):
    spark.catalog.clearCache()
    release_tracked()
    assert _n_cached_rdds(spark) == 0

    prev_ids: set[int] = set()
    for name in CACHE_USERS:
        df = REGISTRY[name].fn(spark, SF_DIR)
        # the invocation must have RELEASED every frame the previous
        # query tracked — residue is bounded at one query's caches
        current = {id(e) for e in _TRACKED}
        assert not (prev_ids & current), name
        df.count()  # consume the returned frame like a harness would
        prev_ids = {id(e) for e in _TRACKED}

    # teardown leaves a zero-residue session
    release_tracked()
    assert not _TRACKED
    assert _n_cached_rdds(spark) == 0, "cached RDDs leaked past release"


def test_wrapper_tracks_persists_and_next_call_releases(spark):
    spark.catalog.clearCache()
    release_tracked()
    REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).count()
    first = list(_TRACKED)
    assert first, "dedup_minhash_lsh persists at least one subtree"
    # invoking ANY registry query releases the previous one's caches
    REGISTRY["pricing_summary"].fn(spark, SF_DIR).count()
    assert all(df not in _TRACKED for df in first)
    release_tracked()


def test_nested_registry_invocation_fails_loudly(spark):
    """r05 ADVICE #5: a registry query invoked while another holds the
    instrumentation window must raise, not silently cross-track."""
    import pytest

    from taipei_bi_etl_spark import queries as Q

    assert Q._ACTIVE_QUERY is None
    Q._ACTIVE_QUERY = ("outer_query", 0)
    try:
        with pytest.raises(RuntimeError, match="cache contract violated"):
            Q.REGISTRY["dedup_exact"].fn(spark, SF_DIR)
    finally:
        Q._ACTIVE_QUERY = None
    # window closed again: normal invocation works
    assert Q.REGISTRY["dedup_exact"].fn(spark, SF_DIR).count() >= 0
    assert Q._ACTIVE_QUERY is None


def test_back_to_back_jvm_cache_bounded(spark):
    """r09 (VERDICT r08 #3): two persist-using registry queries run
    back-to-back must leave the JVM-side cached-RDD count bounded at
    exactly ONE query's caches — i.e. release-on-next-invocation fires
    at the CATALOG level (blocks actually dropped), not just in the
    _TRACKED bookkeeping list.  This is the contract every
    linkage/shingle-family query relies on when it persists subtrees
    its returned frame consumes."""
    spark.catalog.clearCache()
    release_tracked()
    assert _n_cached_rdds(spark) == 0

    REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).count()
    solo_first = _n_cached_rdds(spark)
    assert solo_first > 0  # non-vacuous: the query does persist

    REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR).count()
    after_second = _n_cached_rdds(spark)

    # measure the second query's solo footprint from a clean session
    release_tracked()
    spark.catalog.clearCache()
    assert _n_cached_rdds(spark) == 0
    REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR).count()
    solo_second = _n_cached_rdds(spark)

    # bounded: back-to-back == the second query alone — nothing of the
    # first query's caches survived its successor's invocation
    assert after_second == solo_second, (after_second, solo_second)
    release_tracked()
    assert _n_cached_rdds(spark) == 0
