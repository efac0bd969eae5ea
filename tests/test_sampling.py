"""Statistical gate for A-ExpJ weighted sampling: across independent
salts, inclusion frequency must track weight (the defining property a
hash-identity check cannot see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.sampling import SAMPLE_K, _M, _u
from tests.conftest import SF_DIR


def test_heavier_items_selected_more_often(spark):
    """Plant a two-tier weight distribution and sample with 40
    independent salts: tier-heavy items (10× weight) must be selected
    substantially more often, and every sample is exactly K distinct
    items."""
    n = 200
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit(100))
        .otherwise(F.lit(10))
        .cast("long")
        .alias("weight"),
    ).cache()
    heavy = {i for i in range(n) if i % 10 == 0}
    k = 20
    heavy_hits = light_hits = 0
    for salt in range(40):
        u = _u(F.concat(F.col("doc_id").cast("string"), F.lit(f"#{salt}")))
        key = F.log(u) / F.col("weight")
        chosen = [
            r.doc_id
            for r in docs.orderBy(key.desc(), "doc_id").limit(k).collect()
        ]
        assert len(set(chosen)) == k  # without replacement
        heavy_hits += sum(1 for c in chosen if c in heavy)
        light_hits += sum(1 for c in chosen if c not in heavy)
    # expected inclusion: heavy items (20 of them, w=100) vs light
    # (180, w=10): heavy should dominate the k=20 sample
    heavy_rate = heavy_hits / (40 * len(heavy))
    light_rate = light_hits / (40 * (n - len(heavy)))
    assert heavy_rate > 4 * light_rate, (heavy_rate, light_rate)


def test_registered_sample_is_repartition_stable(spark):
    from taipei_bi_etl_spark.queries.sampling import weighted_sample_aexpj

    a = sorted(r.doc_id for r in weighted_sample_aexpj(spark, SF_DIR).collect())
    b = sorted(r.doc_id for r in weighted_sample_aexpj(spark, SF_DIR).collect())
    assert a == b and len(a) == SAMPLE_K
