"""Boundary semantics of the temporal operators on hand-built rows —
the random benchmark data essentially never lands on exact bucket/hour
edges or equal timestamps, so the inclusive/exclusive bounds and tie
rules are pinned here on a synthetic events table, checked both against
the DuckDB oracle (same file) and against hand-computed expectations."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from taipei_bi_etl_spark.queries import REGISTRY
from tests.oracle_utils import compare

T0 = datetime(2024, 1, 1, 10, 0, 0)  # exact hour boundary
US = timedelta(microseconds=1)
H = timedelta(hours=1)

#: (event_id, ts, user_id, event_type, value, props)
_ROWS = [
    # user 1 — purchase exactly on an hour boundary
    (10, T0, 1, "purchase", 50.0, '{"k": 1}'),
    # errors around the [T0-1h, T0) window edges
    (1, T0 - H, 1, "error", 1.0, '{"k": 1}'),        # == lower bound: IN
    (2, T0 - H - US, 1, "error", 1.0, '{"k": 1}'),   # just below: OUT
    (3, T0 - US, 1, "error", 1.0, '{"k": 1}'),       # just inside: IN
    (4, T0, 1, "error", 1.0, '{"k": 1}'),            # == purchase ts: OUT
    # clicks: two at exactly T0 (ties), one earlier
    (5, T0, 1, "click", 11.0, '{"k": 1}'),
    (6, T0, 1, "click", 22.0, '{"k": 1}'),           # larger event_id wins
    (7, T0 - timedelta(minutes=5), 1, "click", 33.0, '{"k": 1}'),
    # user 2 — purchase with no clicks and no errors
    (20, T0, 2, "purchase", 60.0, '{"k": 2}'),
    # user 3 — SCD2 attr stream 1,1,2,2,1 → three validity intervals
    (30, T0 + 0 * H, 3, "view", 0.0, '{"k": 1}'),
    (31, T0 + 1 * H, 3, "view", 0.0, '{"k": 1}'),
    (32, T0 + 2 * H, 3, "view", 0.0, '{"k": 2}'),
    (33, T0 + 3 * H, 3, "view", 0.0, '{"k": 2}'),
    (34, T0 + 4 * H, 3, "view", 0.0, '{"k": 1}'),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    df = spark.createDataFrame(
        _ROWS, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{edge_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "name",
    ["asof_join_attribution", "range_join_error_window", "scd2_dimension_build"],
)
def test_edge_rows_match_oracle(spark, edge_duck, edge_dir, name):
    spec = REGISTRY[name]
    compare(spec.fn(spark, edge_dir), edge_duck, spec.oracle)


def test_range_window_bounds_inclusive_exclusive(spark, edge_dir):
    rows = {
        r.purchase_id: r
        for r in REGISTRY["range_join_error_window"].fn(spark, edge_dir).collect()
    }
    # [T0-1h, T0): includes the == lower-bound and T0-1µs errors only
    assert rows[10].n_errors_1h == 2
    assert rows[20].n_errors_1h == 0


def test_asof_tie_breaks_to_latest_event_id(spark, edge_dir):
    rows = {
        r.purchase_id: r
        for r in REGISTRY["asof_join_attribution"].fn(spark, edge_dir).collect()
    }
    # clicks AT the purchase ts are eligible (≤); among the two ties the
    # larger event_id (6, value 22.0) is the as-of match
    assert rows[10].attributed == 1
    assert rows[10].click_value == 22.0
    assert rows[10].lag_ms == 0
    # no clicks at all → sentinel row
    assert rows[20].attributed == 0
    assert rows[20].click_ts_us == -1 and rows[20].lag_ms == -1


def test_scd2_collapses_runs_and_reopens(spark, edge_dir):
    rows = sorted(
        (
            r
            for r in REGISTRY["scd2_dimension_build"].fn(spark, edge_dir).collect()
            if r.user_id == 3
        ),
        key=lambda r: r.valid_from_us,
    )
    assert [r.attr_k for r in rows] == [1, 2, 1]
    # consecutive intervals chain exactly: valid_to == next valid_from
    assert rows[0].valid_to_us == rows[1].valid_from_us
    assert rows[1].valid_to_us == rows[2].valid_from_us
    assert rows[2].valid_to_us == -1 and rows[2].is_current == 1
    assert rows[0].is_current == 0 and rows[1].is_current == 0
