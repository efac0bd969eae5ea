"""The driver gate, replicated locally: every registered query with an
oracle must match DuckDB on row count + columns + order-insensitive
values.  Parametrized over the whole REGISTRY so a new query is tested
the moment it is registered."""

from __future__ import annotations

import pytest

from taipei_bi_etl_spark.queries import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_utils import compare

CASES = sorted(REGISTRY)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, duck, name):
    # registry queries persist() subtrees they cannot unpersist before
    # their action — drop the previous query's leftovers so a full
    # 200+-query session doesn't accumulate caches (r03 ADVICE #3)
    spark.catalog.clearCache()
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible ops)
        assert sdf.count() >= 0
        return
    compare(sdf, duck, spec.oracle)


def test_percentile_approx_matches_exact_within_rank_error(spark):
    """The approx W4 twin self-gates its GK rank guarantee (approx_ok
    column); its exact side must agree with the exact rollup."""
    exact = {
        r.o_orderpriority: r
        for r in REGISTRY["percentile_rollup"].fn(spark, SF_DIR).collect()
    }
    approx = {
        r.o_orderpriority: r
        for r in REGISTRY["percentile_rollup_approx"].fn(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        assert a.n == e.n
        assert a.approx_ok, k
        for q in ("p25", "p50", "p75"):
            assert getattr(a, f"{q}_exact") == getattr(e, q), (
                k, q, getattr(a, f"{q}_exact"), getattr(e, q)
            )
