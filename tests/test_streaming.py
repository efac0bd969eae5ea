"""Streaming-runtime gates beyond the oracle: stateful-operator
invariants and late-data/watermark behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.streaming import (
    run_available_now,
    stream_events,
    user_rfe_state,
)
from tests.conftest import SF_DIR


def test_stateful_rfe_matches_batch_aggregate(spark):
    got = {
        r.user_id: (r.n_events, r.sum_value_micros)
        for r in run_available_now(
            user_rfe_state(stream_events(spark, SF_DIR)), output_mode="update"
        ).collect()
    }
    want = {
        r.user_id: (r.n, r.sv)
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias("sv"),
        )
        .collect()
    }
    assert got == want


def test_stateful_rfe_last_seen_is_max_ts(spark):
    got = {
        r.user_id: r.last_seen
        for r in run_available_now(
            user_rfe_state(stream_events(spark, SF_DIR)), output_mode="update"
        ).collect()
    }
    want = {
        r.user_id: r.mx
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("mx"))
        .collect()
    }
    assert got == want
