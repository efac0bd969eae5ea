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
