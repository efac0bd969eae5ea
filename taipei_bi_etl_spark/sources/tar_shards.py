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
        T.StructField("pos", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset key rule: the sample key is the member path up to the
    FIRST dot of the basename (so ``a/b/000123.seg.png`` → key
    ``a/b/000123``, ext ``seg.png``).

    This is the DOCUMENTED REFERENCE of the rule; ``read_tar_members``
    carries a by-value copy inside its worker closure (self-contained
    closures are mandatory — see the module docstring gotcha), and
    ``tests/test_tar_shards.py::test_split_key_closure_copy_agrees``
    pins the two against each other so they cannot drift."""
    head, base = posixpath.split(name)
    stem, _, ext = base.partition(".")
    return (posixpath.join(head, stem) if head else stem), ext


def read_tar_members(
    spark: SparkSession,
    path_glob: str,
    allow_trimmed_eof: bool = False,
) -> DataFrame:
    """One row per tar member: (shard, key, member, ext, pos, n_bytes,
    payload) where ``pos`` is the member's ordinal within its shard.
    Zero shuffle — binaryFile scan + per-shard decode.

    END-OF-ARCHIVE CONTRACT (r06 ADVICE #2): by default the reader is
    STRICT — an archive must extend ≥1024 bytes (the POSIX two-zero-block
    end-of-archive marker) past its last member, because python tarfile
    treats an abruptly-ending archive as clean EOF and a truncation that
    lands exactly on a member boundary would otherwise SILENTLY DROP
    every member after the cut (hostile pass #5 found this live; the
    boundary-cut case is byte-indistinguishable from a trimmed-padding
    writer, so no check can accept one and reject the other).  Writers
    that legally trim trailing zero blocks exist; for archives from such
    writers pass ``allow_trimmed_eof=True``, which accepts an all-ZERO
    tail shorter than the marker (a cut INTO a member or a non-zero
    garbage tail still fails loudly in both modes — the per-member
    payload-length check is unconditional)."""
    shards = spark.read.format("binaryFile").load(path_glob)
    _allow_trimmed = bool(allow_trimmed_eof)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # self-contained closure: no references to module-level helpers,
        # so cloudpickle ships it by VALUE and the Python workers never
        # need this package importable (the driver may run from a
        # foreign cwd with the repo only on the driver's sys.path)
        import io
        import os
        import posixpath
        import tarfile

        import pandas as pd

        def split_key(name: str) -> tuple[str, str]:
            head, base = posixpath.split(name)
            stem, _, ext = base.partition(".")
            return (posixpath.join(head, stem) if head else stem), ext

        for pdf in batches:
            rows = []
            for spath, blob in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(spath)
                # Truncation must fail LOUDLY (hostile pass #5, r06):
                # python tarfile treats an abruptly-ending archive as a
                # clean stop, silently dropping every member after the
                # cut.  Two checks make corruption an error: (a) each
                # member's payload reads back exactly header-size
                # bytes; (b) the archive extends past the last parsed
                # member by the mandatory 1024-byte end-of-archive
                # marker (every valid writer pads at least that much).
                last_end = 0
                with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                    for pos, m in enumerate(tf):
                        last_end = (
                            m.offset_data + ((m.size + 511) // 512) * 512
                        )
                        if not m.isfile():
                            continue
                        payload = tf.extractfile(m).read()
                        if len(payload) != m.size:
                            raise ValueError(
                                f"truncated tar member {m.name!r} in "
                                f"{shard}: {len(payload)} of {m.size} "
                                "bytes"
                            )
                        key, ext = split_key(m.name)
                        rows.append(
                            (shard, key, m.name, ext, pos, len(payload),
                             payload)
                        )
                # End-of-archive check — see the docstring contract:
                # strict mode requires the full 1024-byte marker (a
                # boundary-landing truncation is indistinguishable from
                # trimmed padding, so strictness is the only way to
                # catch it); trimmed mode accepts an all-zero short
                # tail for writers that legally trim trailing blocks.
                tail = blob[last_end:]
                if len(tail) < 1024 and (
                    not _allow_trimmed or tail.strip(b"\x00")
                ):
                    raise ValueError(
                        f"truncated tar shard {shard}: {len(tail)} "
                        f"bytes after the last member (expected the "
                        "1024-byte end-of-archive marker; pass "
                        "allow_trimmed_eof=True for writers that trim "
                        "trailing zero padding)"
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "key", "member", "ext", "pos", "n_bytes",
                    "payload",
                ],
            )

    return shards.select("path", "content").mapInPandas(
        decode, schema=_MEMBER_SCHEMA
    )


def read_tar_samples(
    spark: SparkSession,
    path_glob: str,
    allow_trimmed_eof: bool = False,
) -> DataFrame:
    """One row per SAMPLE: (shard, key, exts, parts map<ext, binary>,
    n_members, n_bytes) — the WebDataset sample view.
    ``allow_trimmed_eof`` passes through to :func:`read_tar_members`
    (see its end-of-archive contract).

    Tar archives legally contain duplicate member names; extraction
    semantics are LAST WINS, so ``parts`` keeps, per ext, the payload
    of the highest-``pos`` member (deterministic — no
    ``DUPLICATE_MAP_KEY`` at runtime), while ``n_members``/``n_bytes``
    still count every raw member.  Two shuffles, keyed on
    (shard, key, ext) then (shard, key) — the first combines map-side
    and carries one payload per ext into the second.
    """
    members = read_tar_members(
        spark, path_glob, allow_trimmed_eof=allow_trimmed_eof
    )
    per_ext = members.groupBy("shard", "key", "ext").agg(
        F.max_by("payload", "pos").alias("payload"),
        F.count(F.lit(1)).cast("int").alias("ext_members"),
        F.sum("n_bytes").cast("long").alias("ext_bytes"),
    )
    return (
        per_ext.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("ext", "payload"))
                )
            ).alias("parts"),
            F.array_sort(F.collect_list("ext")).alias("exts"),
            F.sum("ext_members").cast("int").alias("n_members"),
            F.sum("ext_bytes").cast("long").alias("n_bytes"),
        )
    )


def write_tar_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    key_col: str = "key",
    part_cols: dict[str, str] | None = None,
) -> DataFrame:
    """WebDataset tar-shard SINK: one row per sample in ``df`` (an int
    ``shard_col`` assignment, a string ``key_col``, and one binary
    column per member ext in ``part_cols`` = {ext: column}) → one
    ``shard-<id>.tar`` per shard id under ``path``, members named
    ``<key>.<ext>`` in sorted-key order (deterministic bytes for a
    given assignment).  Returns the materialized manifest (shard_id,
    n_samples, n_members, n_bytes) — the write has already happened
    exactly once when this function returns (eager localCheckpoint),
    so re-using the manifest never re-runs the writer.

    Spark-first shape: ``repartition(shard_col)`` co-locates each
    shard's samples, a self-contained ``mapInPandas`` closure streams
    each shard's tar to disk exactly once (a partition may hold several
    whole shards, never a fraction of one), and the manifest is the
    stage output — no driver-side iteration over samples.  This writer
    targets a locally-mounted path (local mode / NFS / FUSE); on a
    hadoop-scheme filesystem, point it at a local staging dir and
    promote with `io.write_audit_publish`.
    """
    import pandas as pd  # noqa: F401 — documents the worker dependency

    part_cols = part_cols or {"bin": "payload"}
    exts = sorted(part_cols)
    sel = (
        df.select(
            F.col(shard_col).cast("long").alias("__shard"),
            F.col(key_col).cast("string").alias("__key"),
            *[F.col(part_cols[e]).alias(f"__p_{e}") for e in exts],
        )
        .repartition("__shard")
    )
    out_schema = T.StructType(
        [
            T.StructField("shard_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_members", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def write(batches):
        # self-contained (cloudpickle by value — no package import on
        # the workers); buffers one PARTITION of samples, i.e. a few
        # whole shards, never a fraction of one
        import io as _io
        import os as _os
        import tarfile as _tarfile

        import pandas as _pd

        rows = []
        for pdf in batches:
            rows.append(pdf)
        if not rows:
            yield _pd.DataFrame(
                [], columns=["shard_id", "n_samples", "n_members", "n_bytes"]
            )
            return
        all_rows = _pd.concat(rows, ignore_index=True)
        out = []
        for shard, g in all_rows.groupby("__shard"):
            g = g.sort_values("__key")
            n_members = 0
            n_bytes = 0
            fname = _os.path.join(path, f"shard-{int(shard):05d}.tar")
            # stage-then-rename commit (r04 ADVICE #4): a retried or
            # speculatively-executed task writes its own temp file and
            # PUBLISHES atomically — concurrent attempts cannot
            # interleave bytes in the final tar, a failed task leaves
            # only a .tmp a later read_tar_samples never globs, and the
            # last rename wins with a complete, identical file (the
            # bytes are deterministic for a given shard assignment).
            tmp = f"{fname}.tmp.{_os.getpid()}"
            with _tarfile.open(tmp, "w") as tf:
                for _, r in g.iterrows():
                    for col in sorted(c for c in g.columns if c.startswith("__p_")):
                        payload = bytes(r[col])
                        info = _tarfile.TarInfo(
                            name=f"{r['__key']}.{col[len('__p_'):]}"
                        )
                        info.size = len(payload)
                        tf.addfile(info, _io.BytesIO(payload))
                        n_members += 1
                        n_bytes += len(payload)
            _os.replace(tmp, fname)
            out.append((int(shard), len(g), n_members, n_bytes))
        yield _pd.DataFrame(
            out, columns=["shard_id", "n_samples", "n_members", "n_bytes"]
        )

    os.makedirs(path, exist_ok=True)
    return sel.mapInPandas(write, schema=out_schema).localCheckpoint()
