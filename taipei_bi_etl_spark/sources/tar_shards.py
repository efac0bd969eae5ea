"""WebDataset-style tar-shard ingestion: training corpora for
multimodal models ship as directories of ``.tar`` shards whose members
group by key stem (``000123.jpg`` + ``000123.txt`` + ``000123.json``
belong to one sample).  This reads shards distributedly and reassembles
samples without any per-file driver work.

Design (Spark-first):
* ``spark.read.format("binaryFile")`` lists and reads whole shards —
  Spark's own distributed file scan does the partitioning, so one task
  decodes one (or a few) shards and NO shard ever crosses tasks
  half-read.
* The tar walk is stdlib ``tarfile`` over an in-memory buffer inside
  Arrow-batched ``mapInPandas`` — per-SHARD Python cost, not per-row;
  payloads stay ``bytes`` end to end.
* Sample reassembly (members → one row per key with a member-name →
  payload map) is a plain ``groupBy(shard, key)`` — the only shuffle,
  keyed on the sample key, exactly what downstream decode stages
  partition by anyway.

Scale: shards are the unit of parallelism (the WebDataset contract);
1000 executors × N-shard splits stream independently.
``maxPartitionBytes`` never splits a shard mid-file because binaryFile
reads are whole-file.  At 100 TB the groupBy is optional — members of
one sample are adjacent in a well-formed shard, so
``reassemble=False`` keeps the zero-shuffle member stream for
map-only pipelines.
"""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset key rule: the sample key is the member path up to the
    FIRST dot of the basename (so ``a/b/000123.seg.png`` → key
    ``a/b/000123``, ext ``seg.png``)."""
    head, base = posixpath.split(name)
    stem, _, ext = base.partition(".")
    return (posixpath.join(head, stem) if head else stem), ext


def read_tar_members(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per tar member: (shard, key, member, ext, n_bytes,
    payload).  Zero shuffle — binaryFile scan + per-shard decode."""
    shards = spark.read.format("binaryFile").load(path_glob)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for spath, blob in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(spath)
                with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        payload = tf.extractfile(m).read()
                        key, ext = _split_key(m.name)
                        rows.append(
                            (shard, key, m.name, ext, len(payload), payload)
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "key", "member", "ext", "n_bytes", "payload",
                ],
            )

    return shards.select("path", "content").mapInPandas(
        decode, schema=_MEMBER_SCHEMA
    )


def read_tar_samples(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per SAMPLE: (shard, key, exts, parts map<ext, binary>,
    n_members, n_bytes) — the WebDataset sample view.  One shuffle,
    keyed on (shard, key)."""
    members = read_tar_members(spark, path_glob)
    return (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("ext", "payload"))
                )
            ).alias("parts"),
            F.array_sort(F.collect_set("ext")).alias("exts"),
            F.count(F.lit(1)).cast("int").alias("n_members"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
        )
    )
