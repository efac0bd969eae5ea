"""Hostile pass #5 (r05 VERDICT next-round #7): the content-keyed /tmp
ingest fixtures are trust boundaries the corpus sweeps build but never
doctor.  These tests doctor the fixture LAYER itself:

* a truncated tar member in a published fixture must fail LOUDLY, not
  silently drop rows;
* a source-parquet swap must re-key (rebuild) the fixture, never serve
  the stale one;
* stale build dirs from killed runs and staged ``.tmp`` sink files
  must be invisible to readers.

Documented impossibility (BACKLOG): swapping a source parquet's bytes
while FORGING identical (mtime, size) serves a stale digest — the memo
is stat-based by design (hashing every byte on every call would defeat
memoization); same boundary as any mtime-keyed build cache.
"""

from __future__ import annotations

import os
import shutil

import pytest

from tests.conftest import SF_DIR


def _private_corpus(tmp_path) -> str:
    d = tmp_path / "corpus"
    d.mkdir()
    shutil.copy(
        os.path.join(SF_DIR, "documents.parquet"),
        d / "documents.parquet",
    )
    return str(d)


def test_truncated_tar_member_fails_loudly(spark, tmp_path):
    from taipei_bi_etl_spark.queries.tar_ingest import (
        _fixture_dir,
        tar_shard_ingest,
    )

    sf = _private_corpus(tmp_path)
    fixture = _fixture_dir(sf)
    try:
        # cut INSIDE the member-data region of one shard (truncating
        # just the end-of-archive RECORDSIZE padding loses no member
        # and legitimately does not raise — verified)
        victim = os.path.join(fixture, "docs-000.tar")
        size = os.path.getsize(victim)
        with open(victim, "r+b") as f:
            f.truncate(size // 2)
        with pytest.raises(Exception, match="truncated tar"):
            tar_shard_ingest(spark, sf).count()
    finally:
        shutil.rmtree(fixture, ignore_errors=True)


def test_trimmed_tar_fixture_strict_rejects_optin_reads(spark, tmp_path):
    """r08 (VERDICT r07 #8): the trimmed-EOF shape at the FIXTURE layer.
    The fixture's own writer always pads the full end-of-archive marker,
    so a fixture shard whose marker is missing IS corruption — the
    strict-default ingest must fail loudly.  The same bytes under
    ``allow_trimmed_eof=True`` are a legal trimming-writer archive: the
    opt-in reader must return every member."""
    import io
    import tarfile

    from taipei_bi_etl_spark.queries.tar_ingest import (
        _fixture_dir,
        tar_shard_ingest,
    )
    from taipei_bi_etl_spark.sources.tar_shards import read_tar_members

    sf = _private_corpus(tmp_path)
    fixture = _fixture_dir(sf)
    try:
        victim = os.path.join(fixture, "docs-000.tar")
        blob = open(victim, "rb").read()
        last_end = 0
        n_members = 0
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            for m in tf:
                last_end = m.offset_data + ((m.size + 511) // 512) * 512
                n_members += 1
        # trim the END-OF-ARCHIVE MARKER entirely (boundary cut: no
        # member bytes lost — byte-identical to a trimming writer)
        with open(victim, "r+b") as f:
            f.truncate(last_end)
        with pytest.raises(Exception, match="truncated tar shard"):
            tar_shard_ingest(spark, sf).count()
        got = read_tar_members(
            spark, victim, allow_trimmed_eof=True
        ).count()
        assert got == n_members  # opt-in mode loses nothing
    finally:
        shutil.rmtree(fixture, ignore_errors=True)


# Every content-keyed fixture builder in the engine (all routed
# through io.content_keyed_fixture since r07 — VERDICT r06 #4).  A new
# fixture joins this list and inherits the source-swap coverage free.
def _tar_builder(spark, sf):
    from taipei_bi_etl_spark.queries.tar_ingest import _fixture_dir

    return _fixture_dir(sf)


def _variant_builder(spark, sf):
    from taipei_bi_etl_spark.queries.variant_ingest import (
        _variant_events_dir,
    )

    return _variant_events_dir(spark, sf)


def _mango_flat_builder(spark, sf):
    from taipei_bi_etl_spark.queries.mango_materialized import (
        _flat_events_dir,
    )

    return _flat_events_dir(spark, sf)


FIXTURE_BUILDERS = [
    pytest.param("documents.parquet", _tar_builder, id="tar_shards"),
    pytest.param("events.parquet", _variant_builder, id="variant_ingest"),
    pytest.param("events.parquet", _mango_flat_builder, id="mango_flat"),
]


@pytest.mark.parametrize("source_file,builder", FIXTURE_BUILDERS)
def test_source_swap_rekeys_fixture(spark, tmp_path, source_file, builder):
    """A source-parquet swap must re-key (rebuild) the fixture, never
    serve the stale one — parametrized over every content-keyed
    fixture builder (r06 VERDICT #4)."""
    import pyarrow.parquet as pq

    d = tmp_path / "corpus_swap"
    d.mkdir()
    for f in {"documents.parquet", "events.parquet"}:
        shutil.copy(os.path.join(SF_DIR, f), d / f)
    sf = str(d)
    first = builder(spark, sf)
    second = None
    try:
        # swap the source parquet for a different table (new bytes)
        t = pq.read_table(os.path.join(sf, source_file))
        pq.write_table(
            t.slice(0, max(1, t.num_rows // 2)),
            os.path.join(sf, source_file),
        )
        second = builder(spark, sf)
        assert second != first, "stale fixture served after source swap"
        # the first fixture is untouched (other readers may hold it)
        assert os.path.isdir(first)
    finally:
        shutil.rmtree(first, ignore_errors=True)
        if second:
            shutil.rmtree(second, ignore_errors=True)


def test_stale_build_dir_and_tmp_sink_files_are_invisible(spark, tmp_path):
    import tempfile

    from taipei_bi_etl_spark.queries.tar_ingest import (
        _fixture_dir,
        tar_shard_ingest,
    )
    from taipei_bi_etl_spark.sources.tar_shards import read_tar_samples

    sf = _private_corpus(tmp_path)
    # a killed run's leftover build dir (never renamed into place)
    junk = tempfile.mkdtemp(prefix="taipei_tar_build_deadbeef_")
    with open(os.path.join(junk, "docs-000.tar"), "wb") as f:
        f.write(b"garbage that is not a tar")
    fixture = _fixture_dir(sf)
    try:
        n1 = tar_shard_ingest(spark, sf).count()
        assert n1 > 0
        # a crashed writer's staged .tmp file inside the PUBLISHED dir:
        # readers glob *.tar only, so it must not change the result
        with open(os.path.join(fixture, "docs-000.tar.tmp.999"), "wb") as f:
            f.write(b"partial garbage")
        n2 = read_tar_samples(
            spark, os.path.join(fixture, "*.tar")
        ).count()
        assert n2 == n1
    finally:
        shutil.rmtree(junk, ignore_errors=True)
        shutil.rmtree(fixture, ignore_errors=True)
