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
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible ops)
        assert sdf.count() >= 0
        return
    compare(sdf, duck, spec.oracle)
