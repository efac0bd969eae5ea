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
