"""WebDataset-style tar-shard ingestion: shards built with stdlib
tarfile, read back distributedly, samples reassembled exactly."""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import functions as F

from taipei_bi_etl_spark.sources.tar_shards import (
    _split_key,
    read_tar_members,
    read_tar_samples,
)


def _make_shard(path: str, samples: dict[str, dict[str, bytes]]) -> None:
    with tarfile.open(path, "w") as tf:
        for key, parts in samples.items():
            for ext, payload in parts.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))


def _corpus(tmp_path):
    s0 = {
        "000001": {"txt": b"hello world", "json": b'{"lang":"en"}'},
        "000002": {"txt": b"second", "json": b"{}", "img.png": b"\x89PNG"},
    }
    s1 = {
        "sub/000003": {"txt": b"third sample"},
    }
    _make_shard(os.path.join(tmp_path, "shard-000.tar"), s0)
    _make_shard(os.path.join(tmp_path, "shard-001.tar"), s1)
    return s0, s1


def test_split_key_webdataset_rule():
    assert _split_key("000123.jpg") == ("000123", "jpg")
    assert _split_key("a/b/000123.seg.png") == ("a/b/000123", "seg.png")
    assert _split_key("x.json") == ("x", "json")


def test_members_roundtrip(spark, tmp_path):
    s0, s1 = _corpus(tmp_path)
    got = read_tar_members(spark, f"{tmp_path}/*.tar").collect()
    want = set()
    for shard, samples in (("shard-000.tar", s0), ("shard-001.tar", s1)):
        for key, parts in samples.items():
            for ext, payload in parts.items():
                want.add((shard, key, f"{key}.{ext}", ext, payload))
    assert {
        (r.shard, r.key, r.member, r.ext, bytes(r.payload)) for r in got
    } == want
    assert all(r.n_bytes == len(bytes(r.payload)) for r in got)


def test_samples_reassemble(spark, tmp_path):
    s0, s1 = _corpus(tmp_path)
    rows = {
        (r.shard, r.key): r
        for r in read_tar_samples(spark, f"{tmp_path}/*.tar").collect()
    }
    assert set(rows) == {
        ("shard-000.tar", "000001"),
        ("shard-000.tar", "000002"),
        ("shard-001.tar", "sub/000003"),
    }
    r2 = rows[("shard-000.tar", "000002")]
    assert r2.n_members == 3
    assert list(r2.exts) == ["img.png", "json", "txt"]
    assert bytes(r2.parts["img.png"]) == b"\x89PNG"
    assert r2.n_bytes == sum(len(p) for p in s0["000002"].values())


def test_member_stream_is_zero_shuffle(spark, tmp_path):
    _corpus(tmp_path)
    plan = (
        read_tar_members(spark, f"{tmp_path}/*.tar")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_duplicate_member_names_last_wins(spark, tmp_path):
    """Tar archives legally contain duplicate member names; extraction
    semantics are last-wins (r03 ADVICE #1 — this used to raise
    DUPLICATE_MAP_KEY)."""
    with tarfile.open(os.path.join(tmp_path, "dup.tar"), "w") as tf:
        for payload in (b"old", b"newer", b"newest"):
            info = tarfile.TarInfo(name="000009.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        info = tarfile.TarInfo(name="000009.json")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"{}"))
    r = read_tar_samples(spark, f"{tmp_path}/*.tar").collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_members == 4
    assert row.n_bytes == len(b"old") + len(b"newer") + len(b"newest") + 2
    assert bytes(row.parts["txt"]) == b"newest"
    assert list(row.exts) == ["json", "txt"]


def test_write_tar_shards_roundtrip(spark, tmp_path):
    """Sink → source identity: write samples as tar shards, read them
    back, get byte-identical payloads and exact manifest accounting."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.sources.tar_shards import write_tar_shards

    rows = [(i, i % 3, f"{i:06d}", f"text-{i}".encode(), f"m{i}".encode())
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "id long, shard_id long, key string, txt binary, meta binary"
    )
    out = f"{tmp_path}/shards"
    manifest = write_tar_shards(
        df, out, part_cols={"txt": "txt", "meta": "meta"}
    )
    m = {r.shard_id: r for r in manifest.collect()}
    assert set(m) == {0, 1, 2}
    assert sum(r.n_samples for r in m.values()) == 20
    assert all(r.n_members == 2 * r.n_samples for r in m.values())

    back = read_tar_samples(spark, f"{out}/*.tar").collect()
    assert len(back) == 20
    for r in back:
        i = int(r.key)
        assert r.shard == f"shard-{i % 3:05d}.tar"
        assert bytes(r.parts["txt"]) == f"text-{i}".encode()
        assert bytes(r.parts["meta"]) == f"m{i}".encode()


def test_trimmed_trailing_padding_contract(spark, tmp_path):
    """r06 ADVICE #2: writers that trim the trailing zero-block padding
    produce legal archives.  A short all-zero tail is byte-identical to
    a truncation landing exactly on a member boundary (which SILENTLY
    drops members — the r06 hostile find), so acceptance is an explicit
    OPT-IN: strict default rejects loudly, ``allow_trimmed_eof=True``
    reads cleanly, and a NON-ZERO short tail fails in both modes."""
    import pytest

    s = {"000001": {"txt": b"hello"}, "000002": {"txt": b"world"}}
    full = os.path.join(tmp_path, "full.tar")
    _make_shard(full, s)
    blob = open(full, "rb").read()
    # last member ends at the last 512-boundary before the zero padding
    data_end = len(blob.rstrip(b"\x00"))
    last_end = (data_end + 511) // 512 * 512

    trimmed_dir = tmp_path / "trimmed"
    trimmed_dir.mkdir()
    # (a) padding fully trimmed; (b) a short all-zero tail
    (trimmed_dir / "a.tar").write_bytes(blob[:last_end])
    (trimmed_dir / "b.tar").write_bytes(blob[: last_end + 512])
    with pytest.raises(Exception, match="truncated tar"):
        read_tar_members(spark, f"{trimmed_dir}/*.tar").count()
    rows = read_tar_members(
        spark, f"{trimmed_dir}/*.tar", allow_trimmed_eof=True
    ).collect()
    assert len(rows) == 4  # both shards, both members each
    assert {bytes(r.payload) for r in rows} == {b"hello", b"world"}

    # non-zero garbage tail shorter than the marker: loud in both modes
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "c.tar").write_bytes(blob[:last_end] + b"\x00garbage")
    for trimmed in (False, True):
        with pytest.raises(Exception, match="truncated tar"):
            read_tar_members(
                spark, f"{bad_dir}/*.tar", allow_trimmed_eof=trimmed
            ).count()

    # sample view passes the flag through
    samples = read_tar_samples(
        spark, f"{trimmed_dir}/*.tar", allow_trimmed_eof=True
    ).collect()
    assert len(samples) == 4


def test_split_key_closure_copy_agrees(spark, tmp_path):
    """read_tar_members' worker-side split_key is a by-value COPY of
    _split_key (self-contained-closure requirement); pin the two
    implementations against each other on the tricky shapes — first
    dot splits, multi-dot extensions, nested member paths."""
    import io
    import tarfile

    names = [
        "000123.txt",
        "000123.seg.png",
        "a/b/000456.meta.json.gz",
        "plain",
    ]
    t = tmp_path / "drift.tar"
    with tarfile.open(t, "w") as tf:
        for n in names:
            data = n.encode()
            info = tarfile.TarInfo(name=n)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = {
        r.member: (r.key, r.ext)
        for r in read_tar_members(spark, str(t)).collect()
    }
    assert got == {n: _split_key(n) for n in names}
