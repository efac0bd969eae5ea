"""WebDataset tar-shard ingestion under the driver oracle gate
(VERDICT r03 item #3).

The fixture corpus is built DETERMINISTICALLY from the ``documents``
table itself (stdlib ``tarfile``, one member set per document, shards
assigned by ``doc_id % N_SHARDS``), so the DuckDB twin can recompute
every output column — member counts, byte totals, payload md5s —
straight from ``documents`` without ever touching a tar file.  That
puts the ENTIRE ingestion path (binaryFile shard scan → per-shard
``mapInPandas`` tar walk → last-wins sample reassembly) under the
driver's rows+schema+hash gate like every other operator.

Every document with ``doc_id % 97 == 0`` carries a DUPLICATE ``.txt``
member (payload ``text || '!v2'`` appended later in the archive), so
the tar-extraction last-wins rule and the duplicate-ext reassembly fix
(r03 ADVICE #1) are pinned by the gate, not just by unit tests.

Reference parity: the reference ingests blob containers as opaque
paged fetches (`tasks/base.py` get_arraylike_api_data); tar shards are
this engine's large-scale multimodal equivalent (SURVEY §2.1 S4 family).
"""

from __future__ import annotations

import io
import os
import tarfile
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import query

N_SHARDS = 8
DUP_MOD = 97  # doc_id % DUP_MOD == 0 → duplicate .txt member, last wins


def _fixture_dir(sf_dir: str) -> str:
    """Build (once, atomically) the tar-shard fixture for ``sf_dir``'s
    documents table under /tmp; return the shard directory.

    Deterministic: docs sorted by doc_id, member order fixed
    (txt, [dup txt], lang, src), payloads are the raw utf-8 column
    bytes.  Concurrency-safe: build into a temp dir, ``os.rename`` into
    place, lose-the-race falls back to the winner's directory.
    """
    import pyarrow.parquet as pq

    from taipei_bi_etl_spark.io import content_keyed_fixture

    src = os.path.join(sf_dir, "documents.parquet")

    def build(data: str) -> None:
        os.makedirs(data)
        t = pq.read_table(src, columns=["doc_id", "text", "lang", "source"])
        docs = sorted(
            zip(
                t["doc_id"].to_pylist(),
                t["text"].to_pylist(),
                t["lang"].to_pylist(),
                t["source"].to_pylist(),
            )
        )
        tars = [
            tarfile.open(os.path.join(data, f"docs-{s:03d}.tar"), "w")
            for s in range(N_SHARDS)
        ]

        def add(tf: tarfile.TarFile, name: str, payload: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

        for doc_id, text, lang, source in docs:
            if text is None or lang is None or source is None:
                # a tar member cannot carry NULL — such docs are
                # excluded from the WebDataset (and the oracle's WHERE)
                continue
            tf = tars[doc_id % N_SHARDS]
            k = f"{doc_id:08d}"
            add(tf, f"{k}.txt", text.encode("utf-8"))
            if doc_id % DUP_MOD == 0:
                add(tf, f"{k}.txt", (text + "!v2").encode("utf-8"))
            add(tf, f"{k}.lang", lang.encode("utf-8"))
            add(tf, f"{k}.src", source.encode("utf-8"))
        for tf in tars:
            tf.close()

    return content_keyed_fixture(
        sf_dir, "documents.parquet", "taipei_tar_fixture", "v4", build
    )


_TAR_ORACLE = f"""
SELECT doc_id,
       CAST(CASE WHEN doc_id % {DUP_MOD} = 0 THEN 4 ELSE 3 END AS INT)
         AS n_members,
       CAST(strlen(text) + strlen(lang) + strlen(source)
            + CASE WHEN doc_id % {DUP_MOD} = 0
                   THEN strlen(text || '!v2') ELSE 0 END AS BIGINT)
         AS n_bytes,
       'lang,src,txt' AS exts_csv,
       md5(CASE WHEN doc_id % {DUP_MOD} = 0 THEN text || '!v2' ELSE text END)
         AS txt_md5,
       md5(lang) AS lang_md5,
       md5(source) AS src_md5
FROM documents
WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
"""


@query(
    "tar_shard_ingest",
    oracle=_TAR_ORACLE,
    tags=("source", "multimodal", "extension"),
)
def tar_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the documents table through WebDataset tar shards:
    build {N_SHARDS} shards from ``documents`` (stdlib, deterministic),
    read them back with the distributed binaryFile + per-shard tar-walk
    reader, reassemble samples with last-wins duplicate handling, and
    emit per-document member counts, byte totals and payload md5s the
    DuckDB twin recomputes directly from the table.

    Scale: shards are the unit of parallelism — the binaryFile scan
    assigns whole shards to tasks, the tar walk is per-shard Python
    (Arrow-batched), and reassembly shuffles on the bounded
    (shard, key, ext) / (shard, key) keys; nothing is ever collected to
    the driver.  See `sources/tar_shards.py` for the 100 TB notes.
    """
    from taipei_bi_etl_spark.sources.tar_shards import read_tar_samples

    fixture = _fixture_dir(sf_dir)
    samples = read_tar_samples(spark, os.path.join(fixture, "*.tar"))
    return samples.select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.col("n_members"),
        F.col("n_bytes"),
        F.array_join("exts", ",").alias("exts_csv"),
        F.md5(F.col("parts")["txt"]).alias("txt_md5"),
        F.md5(F.col("parts")["lang"]).alias("lang_md5"),
        F.md5(F.col("parts")["src"]).alias("src_md5"),
    )


_SINK_ORACLE = """
SELECT doc_id,
       3 AS n_members,
       CAST(strlen(text) + strlen(lang) + strlen(source) AS BIGINT)
         AS n_bytes,
       'lang,src,txt' AS exts_csv,
       md5(text) AS txt_md5,
       md5(lang) AS lang_md5,
       md5(source) AS src_md5
FROM documents
WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
"""


@query(
    "tar_shard_sink_roundtrip",
    oracle=_SINK_ORACLE,
    tags=("sink", "multimodal", "extension"),
)
def tar_shard_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink-side twin of `tar_shard_ingest`: the documents table is
    written through the engine's OWN WebDataset writer
    (`sources.tar_shards.write_tar_shards` — repartition-by-shard,
    per-shard streaming tar build, manifest out), read back with the
    distributed reader, and hashed against the DuckDB twin computed
    straight from the table — sink → source identity under the driver
    gate.

    Scale: writer and reader both treat the shard as the unit of
    parallelism; the only shuffles are the writer's repartition on
    shard_id and the reader's bounded (shard, key, ext) reassembly
    keys.
    """
    import shutil
    import tempfile

    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.sources.tar_shards import (
        read_tar_samples,
        write_tar_shards,
    )

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("source").isNotNull()  # tar members cannot carry NULL
    ).select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard_id"),
        # format_string pads to 8 but NEVER truncates (lpad truncates ids
        # longer than 8 digits — key corruption at >=1e8 doc_ids)
        F.format_string("%08d", F.col("doc_id")).alias("key"),
        F.encode("text", "UTF-8").alias("txt"),
        F.encode("lang", "UTF-8").alias("lang"),
        F.encode("source", "UTF-8").alias("src"),
    )
    out = tempfile.mkdtemp(prefix="taipei_tar_sink_")
    try:
        write_tar_shards(
            docs,
            out,
            part_cols={"txt": "txt", "lang": "lang", "src": "src"},
        )
        samples = read_tar_samples(spark, os.path.join(out, "*.tar"))
        result = samples.select(
            F.col("key").cast("bigint").alias("doc_id"),
            F.col("n_members"),
            F.col("n_bytes"),
            F.array_join("exts", ",").alias("exts_csv"),
            F.md5(F.col("parts")["txt"]).alias("txt_md5"),
            F.md5(F.col("parts")["lang"]).alias("lang_md5"),
            F.md5(F.col("parts")["src"]).alias("src_md5"),
        )
        # the reader plan must outlive the temp dir — pin the rows
        return result.localCheckpoint()
    finally:
        # safe: localCheckpoint materialized the result above
        shutil.rmtree(out, ignore_errors=True)
