"""Trained-state layout pins (r06 VERDICT #7): can each trainer's
state be pinned bit-exactly across partition layouts?

The deterministic integer trainers (queries/ann_deterministic.py) are
pinned under 3 layouts by design (order-free int64 sums).  This module
settles the question for the two LIBRARY/FLOAT-backed rows-only forms:

* **PQ codebook (`quantization._train_codebook`) — PINNABLE.**  Init is
  content-addressed (xxhash64 of (vec_id, m) picks the seed
  sub-vectors, layout-independent) and the float `avg` updates measured
  bit-identical under default / repartition(8) / coalesce(1) at the
  gate scale.  Float summation order is NOT guaranteed associative-safe
  in general, so this test is a TRIPWIRE: if a Spark upgrade or data
  change ever makes the avg drift, the pin fails visibly and the
  recall gates (tests/test_quantization.py) remain the correctness
  floor.

* **pyspark.ml KMeans (IVF coarse quantizer) — NOT PINNABLE, measured.**
  With a fixed seed, `KMeans(k, seed=42)`'s k-means|| initialization
  samples per-partition RNG streams, so different partition LAYOUTS
  produce genuinely different initializations and converge to different
  local optima — measured max centroid-coordinate delta **0.54**
  between the default layout and repartition(8) at sf0.01 (not float
  last-bit noise; a different optimum).  This is the documented reason
  `ann_ivf_topk` / `embedding_kmeans` stay rows-only with recall/
  consistency gates instead of drift pins; the pinnable trained-state
  pattern lives in the deterministic twins
  (`ann_ivf_deterministic_topk`, whose integer Lloyd is pinned under 3
  layouts with full value-hash oracles).
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _pq_codebook(spark, layout: str):
    from taipei_bi_etl_spark.queries.clustering import _corpus_with_norm
    from taipei_bi_etl_spark.queries.quantization import (
        _subvectors,
        _train_codebook,
    )

    c = _corpus_with_norm(spark, SF_DIR)
    if layout == "repart8":
        c = c.repartition(8)
    elif layout == "coalesce1":
        c = c.coalesce(1)
    cb = _train_codebook(spark, _subvectors(c))
    return sorted(
        (r["m"], r["code"], tuple(r["centroid"])) for r in cb.collect()
    )


def test_pq_codebook_pinned_across_layouts(spark):
    a = _pq_codebook(spark, "default")
    b = _pq_codebook(spark, "repart8")
    c = _pq_codebook(spark, "coalesce1")
    assert a == b == c, (
        "PQ codebook drifted across partition layouts — the float-avg "
        "update is no longer order-stable at this scale; the recall "
        "gates still hold, but the drift-pin claim in this module's "
        "docstring (and COVERAGE.md) must be revised"
    )
    assert len(a) > 0


def test_ml_kmeans_layout_divergence_is_real(spark):
    """Pin the NEGATIVE: the library k-means is genuinely not
    layout-invariant (if this ever starts passing as equal, the
    documented reason above is stale and the IVF form could be
    drift-pinned after all)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from taipei_bi_etl_spark.queries.clustering import (
        N_CLUSTERS,
        _corpus_with_norm,
    )

    def fit(layout: str):
        corpus = _corpus_with_norm(spark, SF_DIR)
        if layout == "repart8":
            corpus = corpus.repartition(8)
        feats = corpus.select(array_to_vector("emb").alias("features"))
        m = KMeans(k=N_CLUSTERS, seed=42, maxIter=10).fit(feats)
        return sorted(tuple(c.tolist()) for c in m.clusterCenters())

    a, b = fit("default"), fit("repart8")
    if a == b:
        raise AssertionError(
            "pyspark.ml KMeans became layout-invariant — revisit "
            "r06 VERDICT #7: the IVF/kmeans rows-only forms could now "
            "be drift-pinned per corpus digest"
        )
