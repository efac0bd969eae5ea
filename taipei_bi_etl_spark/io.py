"""Sources and sinks.

Reference parity (SURVEY.md §2.1): the reference extracts from HTTP APIs,
GCS, BigQuery, local files and constants (``/root/reference/tasks/base.py:
318-607``) and loads date-partitioned jsonl/csv plus a ``latest`` snapshot
(``tasks/base.py:686-876``) and BigQuery day-partitioned tables with
idempotent partition rewrite (``tasks/bigquery.py:182-266``).

Spark-first re-expression:
  * scans   → ``spark.read.{parquet,json,csv}`` with explicit schemas;
              globs replace the reference's per-page file loops (S4).
  * const   → ``spark.createDataFrame`` (S5).
  * sinks   → columnar parquet ``partitionBy(date)`` with dynamic
              partition overwrite (K1/K7), append+mergeSchema (K4/K5),
              ``latest`` view aliasing the newest partition (K2).

At 100 TB the scan layer is where scale is won: explicit schemas keep
column pruning exact, date partition dirs give static+dynamic partition
pruning, and ``maxPartitionBytes`` controls split granularity — all
engine-side, nothing here ever collects data to the driver.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Tables the test harness provides (TESTDATA.md).
TEST_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# ---------------------------------------------------------------------------
# Scans
# ---------------------------------------------------------------------------

def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic benchmark table (columnar parquet).

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; we read nanos as long (legacy conf, runtime-settable
    so it works on any session the driver hands us) and convert to a
    microsecond timestamp losslessly with integer division.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Timestamp values are UTC-naive; pin the session tz so epoch→timestamp
    # and NTZ→LTZ conversions below are correct on sessions we didn't create.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Naive parquet timestamps (timestamp[us], isAdjustedToUTC=false) read
    # as TIMESTAMP_NTZ under inferTimestampNTZ; normalize to session-zone
    # TIMESTAMP (UTC) so epoch math (unix_millis & co) and window functions
    # see one uniform type whichever physical type the generator used.
    # Epoch-preserving because the session tz is pinned to UTC above.
    for col_name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp_ltz"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TEST_TABLES
) -> dict[str, DataFrame]:
    """Scan several tables; returns name → DataFrame (lazy, no action)."""
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TEST_TABLES
) -> None:
    """Register the benchmark tables as temp views for ``spark.sql``."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def read_json(
    spark: SparkSession,
    path_or_glob: str | Sequence[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """JSON/jsonl scan (S4/S6).  The reference concatenates per-page files
    ``{date}.{page}.jsonl`` in a Python loop (``tasks/base.py:318-384``);
    a glob hands the same set to Spark's distributed reader.

    Pass ``schema`` in production — inference is a full extra pass.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(list(path_or_glob) if isinstance(path_or_glob, (list, tuple)) else path_or_glob)


def read_json_quarantine(
    spark: SparkSession,
    path_or_glob: str | Sequence[str],
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """JSON scan with row-level error quarantine: returns
    ``(good, bad)`` where ``bad`` carries the raw line of every record
    that failed to parse or conform to ``schema``.

    Extends the reference's all-or-nothing validation (V1-V6 hard
    asserts, ``/root/reference/tasks/base.py:670-674``) with the
    warehouse-standard alternative: PERMISSIVE mode routes malformed
    rows into a ``_corrupt_record`` column instead of failing the job
    or silently dropping rows (DROPMALFORMED), so a 100 TB ingest
    survives a bad producer and the quarantine table preserves the
    evidence for replay after a fix.

    Both returned frames come from ONE scan subtree; a caller that
    writes both should persist the parsed frame first.  Spark requires
    caching/materialization before filtering on ``_corrupt_record`` —
    the raw-zone pattern (write good/bad out immediately) satisfies
    that naturally; for the in-memory path we cache here.
    """
    corrupt = "_corrupt_record"
    full = T.StructType(schema.fields + [T.StructField(corrupt, T.StringType())])
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
    )
    df = reader.json(
        list(path_or_glob)
        if isinstance(path_or_glob, (list, tuple))
        else path_or_glob
    ).cache()
    good = df.filter(F.col(corrupt).isNull()).drop(corrupt)
    bad = df.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_record")
    )
    return good, bad


def read_csv(

    spark: SparkSession,
    path_or_glob: str,
    schema: T.StructType | None = None,
    header: bool = True,
    names: Sequence[str] | None = None,
) -> DataFrame:
    """CSV scan with optional injected header (S8,
    ``/root/reference/utils/marshalling.py:52-56``)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path_or_glob)
    if names is not None:
        df = df.toDF(*names)
    return df


def const_relation(
    spark: SparkSession,
    values: Sequence[dict] | Sequence[tuple],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Constant relation (S5, ``tasks/base.py:594-607``)."""
    return spark.createDataFrame(values, schema=schema)


# ---------------------------------------------------------------------------
# Sinks
# ---------------------------------------------------------------------------

def write_partitioned(
    df: DataFrame,
    path: str,
    date_col: str = "utc_date",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Date-partitioned sink (K1) with idempotent partition rewrite (K7).

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    session.get_spark) ``mode='overwrite'`` rewrites ONLY the partitions
    present in ``df`` — the Spark-native equivalent of the reference's
    ``DELETE WHERE execution_date = '{d}'`` + append
    (``tasks/bigquery.py:182-195``, ``sql/cleanup_generic.sql``).
    """
    df.write.mode(mode).partitionBy(date_col).format(fmt).save(path)


def write_append_evolving(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Append with schema evolution (K4/K5 ``ALLOW_FIELD_ADDITION``,
    ``tasks/bigquery.py:329-335``).  Readers opt in via
    ``spark.read.option('mergeSchema', 'true')``."""
    df.write.mode("append").option("mergeSchema", "true").format(fmt).save(path)


def latest_partition(spark: SparkSession, path: str, date_col: str = "utc_date") -> DataFrame:
    """'latest' snapshot (K2, ``tasks/base.py:781-821``): instead of copying
    the newest file, expose a view over the max partition — constant-time
    metadata lookup, no data movement."""
    df = spark.read.parquet(path)
    mx = df.select(F.max(date_col).alias("mx"))
    # bounded: 1-row max-date aggregate
    return df.join(F.broadcast(mx), df[date_col] == mx["mx"], "left_semi")


def overwrite_days(
    df: DataFrame, path: str, days: Sequence[str], date_col: str = "utc_date"
) -> None:
    """Backfill (K8): rewrite the trailing partitions in one dynamic
    overwrite — the reference loops re-clean+re-append per day
    (``tasks/bigquery.py:42-55,464-474``)."""
    write_partitioned(df.filter(F.col(date_col).isin(list(days))), path, date_col)


def write_training_shards(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    tokens_per_shard: int = 100_000,
) -> int:
    """Write a document frame as size-targeted training shards
    (``shard_id=K/`` partitions averaging ``tokens_per_shard``
    whitespace tokens) — the sink a tokenize/pack stage consumes.

    Sharding is content-addressed hash assignment, NOT a global
    cumulative sum: the shard count comes from one 1-row total, and
    each doc routes to ``xxhash64(md5(text)) mod n_shards`` — zero
    global sort, one shuffle (the write's repartition by shard),
    deterministic under any input partitioning, and per-shard totals
    concentrate around the target (law of large numbers at ~200-token
    docs; variance ∝ 1/sqrt(docs per shard)).  A global prefix-sum
    would give exact boundaries but serializes at 100 TB — the
    avoided scale bug.

    Returns the shard count.
    """
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    ).cast("long")
    total = df.select(F.sum(n_tokens).alias("t")).collect()[0].t or 0
    n_shards = max(1, int((total + tokens_per_shard - 1) // tokens_per_shard))
    out = df.withColumn(
        "shard_id", F.pmod(F.xxhash64(F.md5(F.col(text_col))), F.lit(n_shards))
    )
    out.repartition("shard_id").write.mode("overwrite").partitionBy(
        "shard_id"
    ).parquet(path)
    return n_shards


def compact_parquet_dir(
    spark: SparkSession, path: str, target_mb: int = 128
) -> int:
    """Compact a parquet directory to ~``target_mb`` files: the
    maintenance pass that keeps a 100 TB warehouse readable after many
    small incremental appends (thousands of KB-files per partition turn
    every scan into a metadata storm).

    Sizes from the actual on-disk bytes (not row counts), rewrites via
    a temp dir + atomic rename — the read and the overwrite never race.
    Returns the output file count.
    """
    import math
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compacting"
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    shutil.rmtree(path)
    os.replace(tmp, path)
    return n_files


def upsert_partitioned(
    spark: SparkSession,
    df_new: DataFrame,
    path: str,
    keys: Sequence[str],
    order_col: str,
    date_col: str = "utc_date",
) -> None:
    """MERGE-style upsert into a date-partitioned parquet warehouse:
    per key keep the row with the greatest ``order_col`` across
    existing ∪ new — the reference's pandasql max-datetime dedup-merge
    (J10, ``tasks/revenue.py:147-167``) productized at the sink.

    Plain parquet has no row-level MERGE, so the upsert is: union the
    incoming batch with ONLY the partitions it touches (static
    partition pruning on the existing scan), window keep-latest, and
    dynamically overwrite those partitions.  Cost ∝ touched partitions,
    never the whole table; ties break toward the incoming batch.
    """
    if not os.path.exists(path):
        write_partitioned(df_new, path, date_col)
        return
    from pyspark.sql import Window

    touched = [r[0] for r in df_new.select(date_col).distinct().collect()]
    existing = spark.read.parquet(path).filter(F.col(date_col).isin(touched))
    merged = existing.withColumn("__new", F.lit(0)).unionByName(
        df_new.withColumn("__new", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("__new").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__new")
    )
    write_partitioned(latest, path, date_col)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``:
    ``repartitionByRange`` (sampled range boundaries → one contiguous
    key range per output file) + ``sortWithinPartitions`` (sorted row
    groups inside each file).

    This is the data-layout lever for 100 TB scans that partitioning
    can't give: partitionBy(date) prunes directories, but WITHIN a
    partition a filter like ``l_shipdate BETWEEN x AND y`` or
    ``user_id = k`` still reads every file unless file/row-group
    min-max statistics are tight.  Range clustering makes the parquet
    footer stats disjoint across files, so the reader's stats filter
    (and any engine's — DuckDB, Trino — reading the same files) skips
    whole files and row groups.  The equivalent of a warehouse
    CLUSTER BY / Delta OPTIMIZE ZORDER for the single-column-prefix
    case, built from two public primitives.

    Cost: one range-exchange (sampling pass + shuffle) and an in-
    partition sort — no global sort; each task sorts only its slice.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def assign_dense_ids(df: DataFrame, id_col: str = "row_id") -> DataFrame:
    """Assign dense unique ids 0..n-1 WITHOUT a global sort — the scale
    replacement for ``row_number() OVER (ORDER BY ...)`` (whose empty/
    global window collapses 100 TB onto one task) and for
    ``monotonically_increasing_id`` (unique but sparse, useless where a
    dense sample index is required, e.g. training-shard addressing).

    Two passes: (1) per-partition row counts (a tiny driver collect —
    one long per partition), folded into exclusive prefix offsets;
    (2) an Arrow-batched ``mapInPandas`` that adds partition offset +
    local position.  No shuffle at all; cost is one extra scan.

    Contract: ids are dense and unique for a FIXED partitioning of a
    DETERMINISTIC input (both passes re-evaluate ``df``; a file scan
    or any deterministic plan yields identical partitions).  Persist
    ``df`` first if its lineage is nondeterministic (sampling, now()).
    The assignment itself is layout-dependent by design — use the
    content-addressed splitters (`corpus_hash_split`) when stability
    under re-layout matters more than density.
    """
    counts = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets[int(r["__pid"])] = acc
        acc += int(r["count"])
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_col, T.LongType(), False)]
    )
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    def add_ids(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[id_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return df.mapInPandas(add_ids, schema)


def write_audit_publish(
    df: DataFrame,
    path: str,
    checks: Callable[[DataFrame], None] | None = None,
    fmt: str = "parquet",
) -> None:
    """Write-audit-publish: materialize ``df`` into a staging directory
    next to ``path``, re-read and run ``checks`` against what was
    ACTUALLY written (not the lazy plan), and only then atomically
    promote staging to ``path`` (rename; the previous version is kept
    at ``path + ".prev"`` until the next publish).

    This is the sink-side idempotency contract the reference
    approximates with delete-then-append (K7) carried to its safe
    conclusion: a failed audit leaves the live path byte-identical —
    readers never observe a half-written or invalid table.  ``checks``
    raising aborts the publish and removes staging.

    Promotion caveat (ADVICE r01): POSIX offers no two-directory atomic
    swap, so promotion is rename(path→prev); rename(staging→path) with
    a crash window between them in which ``path`` is momentarily
    absent.  This implementation shrinks the window to the two renames
    (no data copying inside it) and, if the second rename fails,
    restores ``prev`` back to ``path`` so the previous version is live
    again.  True atomicity needs a pointer indirection — a symlink
    swap, a metastore pointer, or a format-level commit
    (Delta/Iceberg); on an object store use those — the
    staging-audit-promote sequence is identical.
    """
    import shutil

    staging = path + ".staging"
    prev = path + ".prev"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df.write.mode("overwrite").format(fmt).save(staging)
    try:
        if checks is not None:
            checks(df.sparkSession.read.format(fmt).load(staging))
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    if os.path.exists(prev):
        shutil.rmtree(prev)
    had_live = os.path.exists(path)
    if had_live:
        os.rename(path, prev)
    try:
        os.rename(staging, path)
    except BaseException:
        if had_live and not os.path.exists(path):
            os.rename(prev, path)  # roll the old version back live
        raise


def cached_extract(
    spark: SparkSession,
    cache_path: str,
    extract_fn: Callable[[], DataFrame],
    date: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """K9 — the reference's raw-extract cache
    (``utils/cache.py::check_extract_cache``, ``tasks/base.py:449``
    decorator): run ``extract_fn`` only on a cache MISS, persist the
    raw result, and serve every later call from the cached copy — the
    write-once raw zone that makes re-runs hit storage instead of the
    upstream API.

    ``date`` partitions the cache per execution date (the reference
    keys cache files by date); a dated entry is
    ``cache_path/date=<d>``.  Hit = the directory was PROMOTED by a
    completed write (staging-rename, the same pattern as
    ``write_audit_publish``) — a crashed write that left some valid
    parquet footers is still readable but incomplete, so readability
    alone is not a hit test.  Crashed writes only ever leave a
    ``.staging`` directory, which is ignored and overwritten on the
    next call; the live path appears atomically via ``os.rename``.

    Scale: the cache IS the raw zone — one extract per (source, date)
    ever, any number of downstream reads, each a plain parquet scan
    with partition pruning.

    LOCAL-FILESYSTEM, SINGLE-WRITER ONLY (r03 ADVICE #4): the
    hit-test/staging/promote steps are ``os.path`` + ``os.rename``, so
    a hadoop-scheme ``cache_path`` (``s3://``, ``hdfs://``, ``gs://``)
    would silently probe and write a literal local directory — rejected
    up front below.  Concurrent callers are not coordinated (two
    writers can race rmtree/rename); for a shared multi-writer cache
    use ``write_audit_publish``'s committed-marker protocol on a
    distributed filesystem instead.
    """
    import shutil

    if "://" in cache_path:
        raise ValueError(
            f"cached_extract requires a bare local filesystem path, got "
            f"{cache_path!r}; use write_audit_publish for distributed "
            "filesystems"
        )
    path = cache_path if date is None else os.path.join(
        cache_path, f"date={date}"
    )
    if os.path.exists(path):
        try:
            return spark.read.format(fmt).load(path)
        except Exception:
            # pre-promotion-era partial write (or external corruption):
            # clear it so the staging rename below can land
            shutil.rmtree(path, ignore_errors=True)
    staging = path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)  # crashed previous attempt
    df = extract_fn()
    df.write.mode("overwrite").format(fmt).save(staging)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    os.rename(staging, path)
    return spark.read.format(fmt).load(path)


def read_unsplittable_text(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    target_partitions: int | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Read whole-file-compressed text sources (``.jsonl.gz``,
    ``.csv.gz`` …) and restore parallelism.

    Gzip (and zstd-without-seekable-frames) is UNSPLITTABLE: Spark
    assigns ONE task per file regardless of size, so a 10 GB
    ``.jsonl.gz`` becomes one 10 GB task and a single straggler core —
    the classic 100 TB ingest trap (splittable formats and bounded
    file sizes are the upstream fix; this helper is the downstream
    one).  Reads the files as-is, then immediately round-robin
    ``repartition``s so everything AFTER the decode runs wide; the one
    repartition shuffle is the documented price of the codec.

    ``fmt`` is any DataFrameReader format (``json``, ``csv``, ``text``);
    pass an explicit ``schema`` to skip the inference pass (inference
    re-reads — and re-decompresses — every file).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.format(fmt).load(path)
    n = target_partitions or spark.sparkContext.defaultParallelism
    return df.repartition(n)


def publish_fixture(out: str, build) -> str:
    """Atomic publish for content-keyed /tmp fixtures (r06 code review:
    this discipline existed as three hand-rolled copies in tar_ingest /
    variant_ingest / mango_materialized).

    If ``out`` already exists it is returned untouched.  Otherwise
    ``build(data_path)`` writes the fixture into a fresh temp location
    (creating it), and an atomic ``os.rename`` publishes it.  A LOST
    PUBLISH RACE is benign — the winner's fixture is byte-equivalent
    because every build is a pure function of the content key in
    ``out`` — but any other rename failure surfaces here rather than
    as a PATH_NOT_FOUND in an unrelated downstream read.  The build
    temp dir is always cleaned up."""
    import shutil
    import tempfile

    if os.path.isdir(out):
        return out
    build_dir = tempfile.mkdtemp(
        prefix=os.path.basename(out) + "_build_"
    )
    data = os.path.join(build_dir, "data")
    try:
        build(data)
        try:
            os.rename(data, out)
        except OSError:
            if not os.path.isdir(out):
                raise
    finally:
        shutil.rmtree(build_dir, ignore_errors=True)
    return out


def content_keyed_fixture(
    sf_dir: str,
    source_file: str,
    prefix: str,
    version: str,
    build,
) -> str:
    """The content-keyed /tmp fixture discipline in ONE code path (r06
    VERDICT #4 — this existed as three hand-rolled copies in
    tar_ingest / variant_ingest / mango_materialized):

    * the cache key is the md5 of ``(abs sf_dir, content_key(source),
      version)`` — a TRUE content digest of the source parquet bytes,
      computed BEFORE any table read, so doctored corpora (hostile /
      scale sweeps) always get their own builds and a cache hit never
      loads the corpus just to derive its key;
    * ``version`` re-keys when the fixture SCHEMA changes (a code
      change that alters what ``build`` writes must bump it);
    * publish is atomic via :func:`publish_fixture` (build into temp +
      ``os.rename``; lost race falls back to the byte-equivalent
      winner).

    ``build(data_path)`` writes the fixture into ``data_path``.
    Callers adding a new fixture get tests/test_fixture_hostility.py's
    source-swap/stale-dir coverage by joining its caller
    parametrization."""
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, source_file)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{content_key(src)}:{version}".encode()
    ).hexdigest()[:16]
    out = os.path.join(tempfile.gettempdir(), f"{prefix}_{key}")
    return publish_fixture(out, build)


#: resolved path -> (stats fingerprint, digest).  Keyed by PATH with the
#: fingerprint as part of the VALUE (r06 ADVICE #3): a rewrite replaces
#: the entry instead of accumulating one dead tuple per rebuild, so a
#: long-lived session rebuilding fixtures holds O(paths) memo entries,
#: not O(paths × rebuilds × directory size).
_CONTENT_KEYS: dict[str, tuple[tuple, str]] = {}


def content_key(path: str) -> str:
    """md5 digest of a parquet table's bytes — one file (testdata) or a
    Spark-written directory of part-files (relative paths folded in so
    same-named parts in different subdirs cannot collide).  Memoized so
    fixture-cache hits skip the re-hash — the digest is the CONTENT key
    for /tmp fixture caches (tar shards, VARIANT ingest; r04 ADVICE #3
    + r05 review).

    Stats fingerprint (r05 ADVICE #3): for a FILE, (mtime, size); for a
    DIRECTORY, the sorted tuple of every contained file's
    (relpath, mtime, size) — a directory's own stat does not change
    when a part-file is rewritten in place (and its st_size is
    meaningless as a content proxy), so fingerprinting the directory
    stat could serve a stale digest within a process."""
    import hashlib
    import pathlib as _pl

    p = _pl.Path(path)
    files = (
        sorted(
            f for f in p.rglob("*")
            if f.is_file() and not f.name.startswith((".", "_"))
        )
        if p.is_dir()
        else [p]
    )
    if p.is_dir():
        stats = [(f, f.stat()) for f in files]  # one stat per file
        fingerprint = tuple(
            (str(f.relative_to(p)), st.st_mtime, st.st_size)
            for f, st in stats
        )
    else:
        st = p.stat()
        fingerprint = (st.st_mtime, st.st_size)
    memo_key = str(p.resolve())
    hit = _CONTENT_KEYS.get(memo_key)
    if hit is not None and hit[0] == fingerprint:
        return hit[1]
    h = hashlib.md5()
    for f in files:
        h.update(str(f.relative_to(p) if p.is_dir() else f.name).encode())
        with open(f, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
    digest = h.hexdigest()
    _CONTENT_KEYS[memo_key] = (fingerprint, digest)
    return digest
