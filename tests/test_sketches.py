"""Gates for the sliding-WAU family: the HLL sketch path must agree
with the exact count within sketch error, and the streaming twin is
oracle-checked in test_queries_vs_oracle."""

from __future__ import annotations

from taipei_bi_etl_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_sketch_wau_within_hll_error_of_exact(spark):
    """Default hll_sketch_agg (lgConfigK=12) has rsd ≈ 1.6%; assert a
    generous ±5% against the exact per-window distinct count."""
    est = {
        r.window_start: r.wau_est
        for r in REGISTRY["sketch_wau_rollup"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r.window_start: r.wau
        for r in REGISTRY["streaming_sliding_wau"].fn(spark, SF_DIR).collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(3, 0.05 * e), (k, est[k], e)


def test_cms_heavy_hitters_one_sided_bounded_error(spark):
    """CMS guarantees: estimate never BELOW the true count, and over-
    count bounded by eps·N (eps=1e-4 at sf0.001's ~9k events → slack
    of a few counts; assert a loose 1% of N)."""
    from taipei_bi_etl_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["cms_heavy_hitters"].fn(spark, SF_DIR)
    rows = df.collect()
    # sf0.001 has only ~15 distinct users; top-20 returns all of them
    assert 10 <= len(rows) <= 20
    total = sum(r.exact_n for r in rows)
    for r in rows:
        assert r.cms_est >= r.exact_n, r
        assert r.cms_est <= r.exact_n + max(5, total // 100), r
