"""Streaming-runtime gates beyond the oracle: stateful-operator
invariants and late-data/watermark behavior."""

from __future__ import annotations

import os

import pandas as pd
import pytest
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


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once incremental ingest across job restarts: a second
    availableNow run over the same checkpoint must process ONLY files
    that arrived since the first run — the streaming analog of the
    reference's raw-cache idempotency (K9) and the property that makes
    a daily file-drop pipeline re-runnable without double counting."""
    import shutil

    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    src = tmp_path / "incoming"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "batch1.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    probed = dict(spark.read.parquet(str(src / "batch1.parquet")).dtypes)["ts"]

    def run_once():
        from taipei_bi_etl_spark.streaming.jobs import _events_raw_schema
        from pyspark.sql import types as T

        ts_type = T.LongType() if probed == "bigint" else T.TimestampNTZType()
        raw = (
            spark.readStream.schema(_events_raw_schema(ts_type))
            .format("parquet")
            .load(str(src))
        )
        q = (
            raw.select("event_id")
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(str(sink)).count()
    base = spark.read.parquet(str(src / "batch1.parquet")).count()
    assert n1 == base

    # restart with NO new files: nothing must be reprocessed
    run_once()
    assert spark.read.parquet(str(sink)).count() == n1

    # drop a second batch (fresh ids) and restart: only it is ingested
    spark.read.parquet(str(src / "batch1.parquet")).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    ).write.mode("overwrite").parquet(str(tmp_path / "b2"))
    b2 = [p for p in (tmp_path / "b2").glob("*.parquet")]
    for i, p in enumerate(b2):
        shutil.copy(p, src / f"batch2_{i}.parquet")
    run_once()
    out = spark.read.parquet(str(sink))
    assert out.count() == 2 * n1
    assert out.select("event_id").distinct().count() == 2 * n1


def test_foreachbatch_warehouse_sink_is_idempotent(spark, tmp_path):
    """Streaming rollup → dynamic-partition-overwrite warehouse: a
    re-run of the same input must leave the warehouse unchanged (K7
    idempotency on the streaming path), and the landed rows must equal
    the batch rollup."""
    from pyspark.sql import functions as F
    from taipei_bi_etl_spark.streaming import stream_events, daily_type_rollup
    from taipei_bi_etl_spark.streaming.jobs import stream_to_warehouse
    from tests.conftest import SF_DIR

    wh = str(tmp_path / "wh")

    def run(ck: str):
        agg = daily_type_rollup(stream_events(spark, SF_DIR)).withColumn(
            "day_str", F.col("day").cast("string")
        )
        stream_to_warehouse(agg, wh, str(tmp_path / ck), date_col="day_str")

    run("ck1")
    first = sorted(
        map(tuple, spark.read.parquet(wh).drop("day_str").collect())
    )
    assert first
    run("ck2")  # fresh checkpoint: the whole input replays
    second = sorted(
        map(tuple, spark.read.parquet(wh).drop("day_str").collect())
    )
    assert first == second


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4 transformWithStateInPandas twin of the stateful RFE
    accumulator.  Environment-gated: the TWS python runner needs a
    working google.protobuf; where absent (this container) the test
    skips and the applyInPandasWithState twin above carries coverage."""
    from taipei_bi_etl_spark.streaming import tws

    if not tws.tws_available():
        pytest.skip("google.protobuf unavailable: TWS runner cannot start")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    pd.DataFrame(
        {"user_id": ["a", "a", "b"], "value_micros": [100, 250, 40]}
    ).to_parquet(src + "/batch0.parquet")
    stream = spark.readStream.schema(
        "user_id string, value_micros long"
    ).parquet(src)
    out = tws.stream_running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["user_id"]: (r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM tws_totals").collect()
    }
    assert rows == {"a": (2, 350), "b": (1, 40)}


def test_state_store_reader_exposes_aggregation_state(spark, tmp_path):
    """Ops surface: the State Data Source reads a checkpoint's state
    store as a DataFrame — the debugging/repair path for 100 TB
    streaming jobs (inspect skewed keys, verify state after an
    incident) without touching the running query."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    pd.DataFrame(
        {"user_id": ["a", "a", "b"], "v": [1, 2, 3]}
    ).to_parquet(src + "/b0.parquet")
    ck = str(tmp_path / "ckpt")
    st = spark.readStream.schema("user_id string, v long").parquet(src)
    agg = st.groupBy("user_id").agg(F.sum("v").alias("s"))
    q = (
        agg.writeStream.format("memory")
        .queryName("state_reader_probe")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = spark.read.format("statestore").load(ck)
    got = {r.key.user_id: r.value.sum for r in state.collect()}
    assert got == {"a": 3, "b": 3}


def test_max_files_per_trigger_paces_backfill(spark, tmp_path):
    """Ingestion pacing: maxFilesPerTrigger=1 must split a 3-file
    backlog into 3 micro-batches — the backpressure lever that keeps a
    100 TB backfill from loading the whole history into one batch's
    state/shuffle."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    for i in range(3):
        pd.DataFrame({"k": [i], "v": [i * 10]}).to_parquet(
            src + f"/f{i}.parquet"
        )
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    batches = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append((bid, df.count()))
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) == 3, batches
    assert all(n == 1 for _, n in batches), batches


def test_watermark_drops_late_rows_observably(spark, tmp_path):
    """Late-data semantics made observable: a row older than the
    watermark must be DROPPED by the stateful aggregation, and the drop
    must be visible in the query's progress metrics
    (numRowsDroppedByWatermark) — the ops counter a production pipeline
    alerts on (silent late-drop is how daily totals quietly thin)."""
    import json as _json
    import time as _time

    src = str(tmp_path / "in")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-02 10:00:00")

    def _write(path, ts, v):
        # micros, not pandas' default nanos (nanos read as LONG under
        # the session's nanosAsLong conf)
        pd.DataFrame({"ts": [ts], "v": [v]}).to_parquet(
            path, coerce_timestamps="us", allow_truncated_timestamps=True
        )

    _write(src + "/f0.parquet", base, 1)

    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.sum("v").alias("s"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_probe")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark advances to 09:50
        # a row 2 HOURS late — far below the watermark
        _write(src + "/f1.parquet", base - pd.Timedelta(hours=2), 100)
        q.processAllAvailable()
        dropped = 0
        for p in q.recentProgress:
            for op in (p.get("stateOperators") or []):
                dropped += op.get("numRowsDroppedByWatermark", 0)
    finally:
        q.stop()
    assert dropped >= 1, [
        _json.dumps(p.get("stateOperators")) for p in q.recentProgress
    ]
    # and the late row's value must NOT appear in any emitted window
    sums = [r.s for r in spark.sql("SELECT s FROM late_drop_probe").collect()]
    assert 100 not in sums, sums


def test_streaming_observe_metrics_ride_progress(spark, tmp_path):
    """Observed metrics on a STREAM: validation counters (rows, nulls,
    value sums) attach to the streaming plan and surface per micro-batch
    in progress.observedMetrics — zero-cost in-flight data quality, the
    streaming twin of the batch observe-manifest in plans/dag.py."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    pd.DataFrame({"k": [1, 2, None], "v": [10, 20, 30]}).to_parquet(
        src + "/b0.parquet"
    )
    stream = spark.readStream.schema("k double, v long").parquet(src)
    observed = stream.observe(
        "dq",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.sum("v").alias("v_sum"),
    )
    q = (
        observed.writeStream.format("memory")
        .queryName("observe_probe")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        metrics = {}
        for p in q.recentProgress:
            om = p.get("observedMetrics") or {}
            if "dq" in om:
                m = om["dq"]
                metrics = {
                    "rows": m["rows"],
                    "null_keys": m["null_keys"],
                    "v_sum": m["v_sum"],
                }
    finally:
        q.stop()
    assert metrics == {"rows": 3, "null_keys": 1, "v_sum": 60}, metrics
