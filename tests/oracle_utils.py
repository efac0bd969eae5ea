"""Compare a Spark DataFrame against a DuckDB oracle result the way the
driver does: row count + column names + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import DataFrame


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries must round explicitly; .12g only normalizes -0.0 / repr
        return f"{v + 0.0:.12g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in idx) for r in rows
    ), [cols[i] for i in idx]


def compare(sdf: DataFrame, duck: duckdb.DuckDBPyConnection, oracle_sql: str):
    """Assert Spark result == DuckDB oracle result (names + multiset)."""
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    d_res = duck.execute(oracle_sql)
    d_cols = [c[0] for c in d_res.description]
    d_rows = [tuple(r) for r in d_res.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(d_rows)}"
    )
    s_ms, _ = _rows_to_multiset(s_cols, s_rows)
    d_ms, _ = _rows_to_multiset(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_ms, d_ms)):
        assert a == b, f"value mismatch at sorted row {i}: spark={a} oracle={b}"
