"""Materialized pre-cascade mango surface (r05 VERDICT next-round #3).

`mango_feature_surface_rollup` — 26% of the headline bench — re-derives
the ping parse → unnest → cleanup → kv-metric → extra-flatten chain on
every run, even though the production DAG already materializes exactly
that intermediate as a table (``plans/mango_dag.py`` writes
``mango_events_unnested``, mirroring reference
``tasks/bigquery.py:416-461``: the reference, too, persists the
unnested events table and lets every downstream consumer read it).

This module applies the ``variant_ingest.py`` precedent: the
``FLAT_SURFACE_COLS`` frame (everything BEFORE the D4 cascade) is
written once to a content-keyed parquet fixture under /tmp, and
`mango_feature_surface_materialized` runs cascade + fan-out + rollup
over the materialized rows — the warehouse shape where the flat events
table exists as a daily-partitioned table and N downstream queries
read it.  Hash-checked against the SAME oracle as the live-chain form,
so the two entries are proven row-identical.

At 100 TB: the flat surface is written once per day-partition at
ingest; every downstream consumer (this rollup, RFE sessions, cohort
tables) then starts from a columnar scan with pruning instead of
re-running the parse chain — the same N-consumers argument as the
VARIANT ingest, one level higher in the DAG.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.mango_parity import _SURFACE_ORACLE


def _flat_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per source-content digest) the pre-cascade
    flat events surface; return the table path.  Same discipline as
    ``variant_ingest._variant_events_dir``: md5 of the SOURCE PARQUET
    BYTES keys the cache, build-into-temp + atomic rename publishes,
    so doctored corpora (hostile / scale sweeps) get their own builds."""
    from taipei_bi_etl_spark.io import content_keyed_fixture
    from taipei_bi_etl_spark.plans.telemetry_pipeline import (
        flat_events_full,
        synthesize_full_pings,
        unnest_events_full,
    )

    def build(data: str) -> None:
        flat_events_full(
            unnest_events_full(synthesize_full_pings(spark, sf_dir))
        ).write.mode("overwrite").parquet(data)

    # flat_v2 (r10): the widened synthesis chain writes the surface as
    # one file PER SCAN PARTITION instead of one file total, so the
    # cascade over the materialized read parallelizes from the file
    # layout alone (guide §6 output sizing) — v1 fixtures on disk have
    # a single file and would pin the cascade to one scan task.
    return content_keyed_fixture(
        sf_dir, "events.parquet", "taipei_mango_flat", "flat_v2", build
    )


def read_mango_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized pre-cascade surface (``FLAT_SURFACE_COLS``).

    widen_scan is a layout guard: a no-op on the multi-file flat_v2
    fixture, but an externally-provided single-file surface still gets
    the cascade parallelized (SCALE.md r10)."""
    from taipei_bi_etl_spark.scale import widen_scan

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return widen_scan(spark.read.parquet(_flat_events_dir(spark, sf_dir)))


@query(
    "mango_feature_surface_materialized",
    oracle=_SURFACE_ORACLE,
    tags=("mango", "D4", "U1", "extension", "scale-path"),
)
def mango_feature_surface_materialized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`mango_feature_surface_rollup` fed from the MATERIALIZED flat
    events table: D4 cascade + 3-way fan-out + daily rollup over a
    columnar scan of the pre-computed surface (same oracle text as the
    live-chain form — row-identical, the parse chain is amortized into
    the ingest write exactly as the production DAG and the reference
    both do for mango_events_unnested)."""
    from taipei_bi_etl_spark.plans.telemetry_pipeline import (
        mapped_fanout_from,
    )

    fm = mapped_fanout_from(read_mango_flat(spark, sf_dir))
    return fm.groupBy("submission_date", "feature_type", "feature_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("client_id").alias("n_clients"),
        *[
            F.coalesce(F.sum(c), F.lit(-1))
            .cast("long")
            .alias(f"sum_{c}")
            for c in (
                "session_time", "url_counts", "app_link_install",
                "app_link_open", "show_keyboard",
            )
        ],
    )
