"""SparkSession factory tuned for the engine.

Reference parity: the reference has no session concept (pandas in-process
+ BigQuery server-side, ``/root/reference/tasks/base.py:39-100``); here the
SparkSession *is* the engine. Defaults are chosen for correctness-first
oracle comparison (UTC session timezone; Spark 4's ANSI default stays ON —
the engine's expressions are written overflow-safe) and for scale
(AQE on, skew-join handling on, partition coalescing on).

On a real cluster only ``master``/memory change; the SQL conf here is
scale-independent policy.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Policy conf applied to every session the engine creates.  Kept as data so
# tests / bench / entrypoints stay consistent.
ENGINE_CONF: dict[str, str] = {
    # Let AQE re-plan at runtime: coalesce tiny shuffle partitions, turn
    # sort-merge joins into broadcast joins when the built side turns out
    # small, and split skewed partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas_udf / toPandas hot paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Idempotent date-partitioned rewrites (reference daily_cleanup →
    # partition overwrite, see io.write_partitioned).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Parquet: read INT96/ns timestamps as NTZ exactly like the oracle.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}


def get_spark(
    app_name: str = "taipei_bi_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores).  ``shuffle_partitions`` defaults to the local core count — on a
    real cluster pass ~2-3× total executor cores instead; AQE coalesces
    the excess either way.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    # Local-mode driver heap defaults to 1g and the driver IS the
    # executor: a bench/test session running many cache-using queries
    # back to back exhausts it (GCLocker allocation-retry storms, then
    # OOM).  Honored only at JVM launch — a no-op on getOrCreate reuse,
    # which is fine: the first engine session in a process sets it.
    builder = builder.config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions)
    )
    builder = builder.config("spark.ui.showConsoleProgress", "false")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
