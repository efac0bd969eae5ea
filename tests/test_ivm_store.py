"""Stored-state IVM for the packed-window accounting
(`taipei_bi_etl_spark.ivm_store`): multi-step append == full
recompute, idempotent retry after a simulated crash, and the
append-only contract check."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from taipei_bi_etl_spark import ivm_store
from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries.curation2 import (
    _offsets_from,
    _windows_from,
)
from tests.conftest import SF_DIR


def _full_accounting(spark, docs):
    d = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    off = _offsets_from(spark, d)
    return [] if off is None else sorted(
        _windows_from(off).collect(), key=lambda r: r["chunk_id"]
    )


def _state_rows(spark, state_dir):
    acc, total, max_id, v = ivm_store.read_state(spark, state_dir)
    return sorted(acc.collect(), key=lambda r: r["chunk_id"]), total, max_id, v


@pytest.fixture()
def docs(spark):
    return read_table(spark, SF_DIR, "documents")


def _batches(docs, cuts):
    """Split docs into doc_id-range batches at the given cut points."""
    lo = None
    out = []
    for hi in [*cuts, None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") < hi)
        out.append(docs.filter(cond))
        lo = hi
    return out


def test_three_appends_equal_full_recompute(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    b0, b1, b2, b3 = _batches(docs, [12, 25, 40])
    assert ivm_store.pack_state_init(spark, b0, state) == 1
    for i, b in enumerate((b1, b2, b3)):
        assert ivm_store.pack_state_append(spark, b, state) == i + 2
    rows, total, max_id, v = _state_rows(spark, state)
    assert v == 4
    assert rows == _full_accounting(spark, docs)
    d = docs.select(
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n")
    )
    assert total == d.agg(F.sum("n")).collect()[0][0]


def test_crash_retry_is_idempotent(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    b0, b1 = _batches(docs, [25])
    ivm_store.pack_state_init(spark, b0, state)
    ivm_store.pack_state_append(spark, b1, state)
    want = _state_rows(spark, state)
    # simulate a crash between data write and commit marker: delete the
    # marker so v2 looks uncommitted, then retry the same append
    os.remove(os.path.join(state, "v000002", "_COMMITTED"))
    assert ivm_store.latest_version(state) == 1
    assert ivm_store.pack_state_append(spark, b1, state) == 2
    assert _state_rows(spark, state) == want


def test_append_only_contract_enforced(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    b0, b1 = _batches(docs, [25])
    ivm_store.pack_state_init(spark, b1, state)  # higher ids first
    with pytest.raises(ValueError, match="append-only"):
        ivm_store.pack_state_append(spark, b0, state)


def test_empty_batch_bumps_version_without_change(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    ivm_store.pack_state_init(spark, docs, state)
    rows0, total0, max0, _ = _state_rows(spark, state)
    empty = docs.filter(F.lit(False))
    assert ivm_store.pack_state_append(spark, empty, state) == 2
    rows1, total1, max1, v = _state_rows(spark, state)
    assert (rows1, total1, max1, v) == (rows0, total0, max0, 2)


def test_empty_init_then_append(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    ivm_store.pack_state_init(spark, docs.filter(F.lit(False)), state)
    acc, total, max_id, _ = ivm_store.read_state(spark, state)
    assert (acc.count(), total, max_id) == (0, 0, -1)
    ivm_store.pack_state_append(spark, docs, state)
    rows, total, _, _ = _state_rows(spark, state)
    assert rows == _full_accounting(spark, docs)


# ---------------------------------------------------------------------------
# Stored-state retention IVM: daily advances == full recompute.
# ---------------------------------------------------------------------------


def _pivot_rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()]
    )


@pytest.fixture()
def events(spark):
    return read_table(spark, SF_DIR, "events")


def test_retention_daily_advances_equal_full(spark, events, tmp_path):
    from taipei_bi_etl_spark.queries.retention import _pivot_from_events

    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    assert ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-27")), state, "2024-01-27"
    ) == 1
    for i, d in enumerate(("2024-01-28", "2024-01-29", "2024-01-30")):
        assert ivm_store.retention_state_advance(
            spark, events.filter(day == F.lit(d)), state
        ) == i + 2
    _, pivot, as_of, v = ivm_store.read_retention_state(spark, state)
    assert (as_of, v) == ("2024-01-30", 4)
    want = _pivot_from_events(events, "2024-01-30")
    assert _pivot_rows(pivot) == _pivot_rows(want)


def test_retention_one_day_contract_enforced(spark, events, tmp_path):
    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-28")), state, "2024-01-28"
    )
    with pytest.raises(ValueError, match="one-day-advance"):
        ivm_store.retention_state_advance(
            spark, events.filter(day == F.lit("2024-01-30")), state
        )


def test_retention_crash_retry_is_idempotent(spark, events, tmp_path):
    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-29")), state, "2024-01-29"
    )
    batch = events.filter(day == F.lit("2024-01-30"))
    ivm_store.retention_state_advance(spark, batch, state)
    _, pivot, as_of, v = ivm_store.read_retention_state(spark, state)
    want = _pivot_rows(pivot)
    os.remove(os.path.join(state, "v000002", "_COMMITTED"))
    assert ivm_store.latest_version(state) == 1
    assert ivm_store.retention_state_advance(spark, batch, state) == 2
    _, pivot2, as_of2, _ = ivm_store.read_retention_state(spark, state)
    assert (_pivot_rows(pivot2), as_of2) == (want, "2024-01-30")


def test_pack_double_apply_fails_closed(spark, docs, tmp_path):
    """Crash AFTER the commit marker: re-applying the same batch must
    raise (append-only check), never double-count — the fail-closed
    half of the recovery contract."""
    state = str(tmp_path / "state")
    b0, b1 = _batches(docs, [25])
    ivm_store.pack_state_init(spark, b0, state)
    ivm_store.pack_state_append(spark, b1, state)  # committed OK
    with pytest.raises(ValueError, match="append-only"):
        ivm_store.pack_state_append(spark, b1, state)


def test_retention_double_apply_fails_closed(spark, events, tmp_path):
    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-29")), state, "2024-01-29"
    )
    batch = events.filter(day == F.lit("2024-01-30"))
    ivm_store.retention_state_advance(spark, batch, state)  # committed OK
    with pytest.raises(ValueError, match="one-day-advance"):
        ivm_store.retention_state_advance(spark, batch, state)
