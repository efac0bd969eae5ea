"""Scale strategies: skew-salted joins, bucketed co-located joins, and
partition-size planning.

AQE (enabled by :mod:`session`) handles most runtime skew; these
utilities cover the cases it can't:

* ``salted_join`` — explicit N-way salting for a *known* hot key whose
  single post-split partition still exceeds executor memory (AQE splits
  skewed sort-merge partitions but each join key still lands in one
  task on the build side of a shuffled hash join).
* ``write_bucketed`` / ``read_bucketed`` — persistent bucketing so
  repeated large-large joins on a stable key (e.g. user_id across the
  RFE tables) shuffle ZERO bytes at read time.
* ``plan_partitions`` — sizes ``spark.sql.shuffle.partitions`` /
  ``files.maxPartitionBytes`` from data volume so a 100 TB input gets
  ~128 MB tasks instead of 200 default partitions of 500 GB each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small``: big rows get a
    random-but-deterministic salt in [0, n_salts); small rows are
    replicated n_salts times; the join key becomes (key, salt), spreading
    one hot key across n_salts tasks.

    ``small`` must be the replicable side (each row duplicated n_salts×).
    Deterministic: the salt is hash-derived from the full big row's
    monotonically increasing id surrogate — stable for a given input
    partitioning; use a column-derived hash for cross-run stability.
    """
    salt_b = F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).alias("_salt")
    b = big.select("*", salt_b)
    s = small.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table: subsequent
    equi-joins / aggregations on ``key`` between tables bucketed the same
    way run shuffle-free (and merge-sort-free when sorted)."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_partitions(
    input_bytes: int,
    target_partition_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 32,
    max_partitions: int = 200_000,
) -> int:
    """Shuffle-partition count for a given input volume: ~128 MB per
    task.  At 100 TB → ~800k capped to 200k (AQE coalesces the excess);
    at 1 GB → the floor, so small jobs don't fragment."""
    n = max(min_partitions, input_bytes // target_partition_bytes)
    return int(min(n, max_partitions))


def widen_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition an under-parallel scan up to the
    session's default parallelism (optimization guide §2.5 "input
    skew": one unsplittable file → repartition immediately after the
    read; §6: ``minPartitionNum`` cannot split a single row group).

    A parquet file with one row group yields exactly ONE scan task, so
    every map-side expression before the first exchange — ping parse,
    shingle explode, LSH signatures, the D4 cascade — runs on one core
    regardless of ``local[N]`` / cluster size.  Measured at sf0.1
    (r10): the mango cascade chain 10.07 → 5.16 s and the embedding
    LSH 8.84 → 6.95 s medians, interleaved in one session, purely from
    widening the scan to 32 tasks.

    Scale-adaptive by construction, NOT a local-mode constant:

    * ``target`` defaults to ``sparkContext.defaultParallelism``
      (= total cores), so the driver's lower-core bench runs widen to
      their own width, and a cluster widens to the cluster's.
    * When the scan already plans ``>= target`` partitions (the 100 TB
      case — thousands of files / row groups), this is a NO-OP: no
      exchange is added, the plan is byte-identical.
    * When it fires, the exchange moves the RAW scan output (apply it
      directly on the read, before derived columns), so the cost is a
      one-pass shuffle of the input bytes — trivially amortized by the
      map chain it parallelizes.

    Round-robin keeps results identical: Spark sorts before round-robin
    repartition (``sortBeforeRepartition``, SPARK-23207) so the
    row→partition assignment is deterministic, and no engine operator
    depends on intra-partition order (hash-checked oracles gate this).
    """
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def explain_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    """Plan-inspection helper used by tests and tuning sessions: which of
    the given physical-plan markers appear in df's formatted explain."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return {n: n in plan for n in needles}


from contextlib import contextmanager


@contextmanager
def runtime_bloom_filters(
    spark: SparkSession,
    creation_side_threshold: str = "100MB",
    application_side_threshold: str = "10GB",
):
    """Enable Spark's runtime row-level (bloom) filtering for the scope:
    a selective filter on one side of a shuffled large-large join is
    turned into a ``might_contain`` pre-filter on the OTHER side's scan,
    so non-matching fact rows never enter the exchange.

    This is the large-large complement to broadcasting: when neither
    side fits a broadcast but one side is selectively filtered, the
    bloom filter (built from the filtered side's join keys) prunes the
    probe scan before the shuffle.  Thresholds are surfaced because the
    defaults (10 MB creation side) are tuned for clusters; tests pin
    the injection with permissive values.  Restores prior conf on exit.
    """
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": creation_side_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": application_side_threshold,
    }
    old: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of N non-negative integer columns,
    ``bits`` bits each — the multi-dimensional clustering key for data
    layout: sort/range-partition a write by this key and rows close in
    EVERY dimension land in the same files, so parquet min/max file
    skipping prunes selective filters on ANY of the dimensions (not
    just the leading sort column).

    Callers map raw values into [0, 2^bits) first (e.g. bucketized
    timestamps, hashed ids).  Values are clamped, so out-of-range
    inputs degrade to the boundary instead of corrupting the key.
    Pure Column arithmetic (shifts and masks) — codegen'd, no UDF.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    clamped = [
        F.greatest(F.lit(0), F.least(c.cast("long"), F.lit((1 << bits) - 1)))
        for c in cs
    ]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(clamped):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + i).cast("long")
            )
    return key


def shuffle_hash_join(
    left: DataFrame, right: DataFrame, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join with the SHUFFLE_HASH strategy hint on the (smaller) right
    side: both sides shuffle, but the right side builds an in-memory
    hash map per partition instead of BOTH sides sorting.

    When to reach for it at 100 TB: large⋈medium joins where the
    medium side exceeds the broadcast threshold but one partition of
    it fits in executor memory — SHJ skips two O(n log n) sorts and
    the sort spill files.  When NOT to: skewed or memory-tight
    partitions (SHJ build side can't spill the map the way sort-merge
    spills runs) — that asymmetry is why Spark defaults to SMJ and
    why this is an explicit, per-join decision (`preferSortMergeJoin`
    stays untouched globally).
    """
    return left.join(right.hint("shuffle_hash"), on, how)


def merge_join(
    left: DataFrame, right: DataFrame, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join with the MERGE (sort-merge) strategy hint — the explicit
    spill-safe choice for large⋈large joins with unknown skew; pairs
    with `write_bucketed` to delete the shuffle entirely when both
    sides share bucketing."""
    return left.join(right.hint("merge"), on, how)


def skew_report(df: DataFrame, key_cols: list[str] | str, top_k: int = 10) -> dict:
    """Quantify join/agg key skew BEFORE committing to a plan: returns
    the top-k heaviest keys, total rows, distinct keys, and the
    max/mean frequency ratio — the number that decides between a plain
    shuffle join (ratio ≈ 1), AQE skew splitting (moderate), and
    explicit salting via `salted_join` (ratio ≫ partitions).

    One aggregation pass; the report itself is top-k + 1-row scalars,
    so the cost is a map-side-combined count regardless of table size.
    Run it on a sample (`df.sample(0.01)`) at 100 TB — frequency
    RATIOS are stable under uniform sampling.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    freq = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    stats = freq.agg(
        F.sum("n").alias("rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("n").alias("max_freq"),
    ).collect()[0]
    if not stats.rows:
        # empty input: sum/max aggregates come back None — report
        # cleanly instead of TypeError-ing on None arithmetic
        return {
            "rows": 0,
            "distinct_keys": 0,
            "max_freq": 0,
            "skew_ratio": 0.0,
            "top": [],
        }
    top = [
        {**{k: r[k] for k in keys}, "n": r["n"]}
        for r in freq.orderBy(F.desc("n"), *keys).limit(top_k).collect()
    ]
    mean = stats.rows / max(1, stats.distinct_keys)
    return {
        "rows": stats.rows,
        "distinct_keys": stats.distinct_keys,
        "max_freq": stats.max_freq,
        "skew_ratio": round(stats.max_freq / mean, 2),
        "top": top,
    }


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (optimized-plan statistics:
    file sizes for scans, filter/projection selectivity heuristics
    above them) — the number the planner itself uses for broadcast
    decisions."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def assert_broadcastable(df: DataFrame, limit_mb: int = 512) -> DataFrame:
    """Guard an explicit ``F.broadcast(df)``: raise if Catalyst's size
    estimate exceeds ``limit_mb``.  An explicit broadcast hint OVERRIDES
    the planner's 10 MB auto-threshold — on a 100 TB run, hinting a
    dimension that quietly grew to 50 GB OOMs every executor at once.
    This turns that failure mode into a planning-time error with the
    estimate in the message.  Returns ``df`` unchanged so it wraps
    inline: ``F.broadcast(assert_broadcastable(dim))``.
    """
    est = estimated_size_bytes(df)
    if est > limit_mb * 1024 * 1024:
        raise ValueError(
            f"refusing to broadcast ~{est / 1e6:.0f} MB (> {limit_mb} MB "
            f"limit); repartition/bucket this join instead"
        )
    return df


def bcast_dim(df: DataFrame, limit_mb: int = 512) -> DataFrame:
    """A GUARDED broadcast hint for SF-scaling dimension frames
    (customer/part/supplier/labeled-corpus…): at bench scale it hints
    exactly like ``F.broadcast``, but the hint is refused at planning
    time once Catalyst's size estimate crosses ``limit_mb`` — turning
    the 100 TB failure mode (every executor OOMs unpacking a 50 GB
    "dimension") into an immediate, explainable error.

    House policy (enforced by tests/test_plan_audit.py's source lint):
    every ``F.broadcast`` site in this package is either routed through
    this guard or carries a ``# bounded:`` tag naming why its payload
    cannot scale with the data (nation/region, top-K vocab, codebook,
    scalar aggregate, LIMIT'd query set, …).
    """
    from pyspark.sql import functions as F  # local: avoid cycle at import

    return F.broadcast(assert_broadcastable(df, limit_mb))
