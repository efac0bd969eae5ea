"""Gates for the sliding-WAU family: the HLL sketch path must agree
with the exact count within sketch error, and the streaming twin is
oracle-checked in test_queries_vs_oracle."""

from __future__ import annotations

from taipei_bi_etl_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_sketch_wau_within_hll_error_of_exact(spark):
    """Default hll_sketch_agg (lgConfigK=12) has rsd ≈ 1.6%; the query
    self-gates (hll_ok column) and its exact side must agree with the
    independent streaming twin."""
    rows = REGISTRY["sketch_wau_rollup"].fn(spark, SF_DIR).collect()
    assert all(r.hll_ok for r in rows)
    got_exact = {r.window_start: r.wau_exact for r in rows}
    exact = {
        r.window_start: r.wau
        for r in REGISTRY["streaming_sliding_wau"].fn(spark, SF_DIR).collect()
    }
    assert got_exact == exact


def test_cms_heavy_hitters_one_sided_bounded_error(spark):
    """CMS guarantees asserted on the raw estimates (the registered
    query folds them into the ``cms_ok`` gate column): estimate never
    BELOW the true count, overcount bounded by eps·N, and the merge is
    genuinely in-plan (no collect of sketches — the plan contains the
    counter-sum aggregate)."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.queries.sketches import CMS_DEPTH, _cms_bucket
    from tests.conftest import SF_DIR

    df = REGISTRY["cms_heavy_hitters"].fn(spark, SF_DIR)
    rows = df.collect()
    # sf0.001 has only ~15 distinct users; top-20 returns all of them
    assert 10 <= len(rows) <= 20
    assert all(r.cms_ok for r in rows)
    # raw estimate check, rebuilt from the same columnar sketch
    e = read_table(spark, SF_DIR, "events")
    merged = (
        e.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_bucket(F.col("user_id"), d).alias("bucket"),
                        )
                        for d in range(CMS_DEPTH)
                    ]
                )
            ).alias("h")
        )
        .groupBy("h.d", "h.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = {
        r.user_id: r.exact_n
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .collect()
    }
    probes = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_bucket(F.col("user_id"), d).alias("bucket"),
                        )
                        for d in range(CMS_DEPTH)
                    ]
                )
            ).alias("h"),
        )
        .select("user_id", "h.d", "h.bucket")
    )
    est = {
        r.user_id: r.est
        for r in merged.join(probes, ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est"))
        .collect()
    }
    total = sum(exact.values())
    for uid, ex in exact.items():
        assert est[uid] >= ex, (uid, est[uid], ex)
        assert est[uid] <= ex + max(5, total // 100), (uid, est[uid], ex)
