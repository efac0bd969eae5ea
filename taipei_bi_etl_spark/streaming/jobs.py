"""Streaming jobs over the ``events`` stream.

Scale notes (these shapes are what survive a real cluster):

* State stores are keyed by (user_id | window) — bounded keys, and the
  watermark expires state; without it session state grows unboundedly.
* Aggregation sums use scaled-integer micros, not doubles: streaming
  re-ordering makes float sums non-deterministic; integer sums are
  associative-commutative-exact.
* ``applyInPandasWithState`` processes whole key-groups per Arrow batch
  — the custom-stateful-operator escape hatch for logic session_window
  can't express.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from taipei_bi_etl_spark import functions as FN
from taipei_bi_etl_spark.scale import bcast_dim

SESSION_GAP = "30 minutes"

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    """Explicit source schema — a streaming file source cannot infer.

    ``ts_type`` adapts to the generator's physical type: TIMESTAMP(NANOS)
    parquet needs ``spark.sql.legacy.parquet.nanosAsLong`` + LongType and
    a div-1000 conversion; timestamp[us] parquet reads directly as
    TimestampNTZType (cast to session-UTC TIMESTAMP below — same policy
    as io.read_table).
    """
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

_sink_counter = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet (file source; in prod the
    same program runs on Kafka by swapping the reader)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Probe the batch reader once for the physical ts type (cheap footer
    # read), then declare the matching streaming schema.
    import os

    probed = dict(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes
    ).get("ts", "bigint")
    nanos_as_long = probed == "bigint"
    ts_type = T.LongType() if nanos_as_long else T.TimestampNTZType()
    # the file source's basePath must be a directory; select just the
    # events file out of it with a glob filter
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if nanos_as_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ltz"))


def run_available_now(
    stream_df: DataFrame,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming query over all currently-available data and
    return the result as a batch DataFrame (memory sink) — the batch
    entry point the driver/oracle comparison uses.

    ``state_partitions`` sizes the state store count for the run: each
    shuffle partition carries a state store instance with fixed
    maintenance cost, so size it to key cardinality / cluster size, not
    to the batch default (a real deployment sets this once per job)."""
    spark = stream_df.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    name = f"stream_sink_{next(_sink_counter)}"
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    # sink names are unique per call, so the in-memory table stays
    # valid for the session — return it lazily (no python timestamp
    # roundtrip, which would re-interpret values in the OS timezone).
    return stream_df.sparkSession.table(name)


def sessionize(events: DataFrame) -> DataFrame:
    """Session windows with a 30-min gap — the streaming-native form of
    the reference's LEAD rewrite (W2/W3).  Watermark bounds state."""
    return (
        events.withWatermark("ts", "1 day")
        .groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1_000_000).cast("long")
            ).alias("sum_value_micros"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value_micros",
        )
    )


def daily_type_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-day windows per event_type with watermark — the
    streaming analog of the reference's one-partition-per-day tables."""
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact COUNT DISTINCT is unsupported in streaming aggs;
            # integer micros sum is exact and order-independent
            F.sum(
                F.floor(F.col("value") * 1_000_000).cast("long")
            ).alias("sum_value_micros"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


def enriched_nation_rollup(events: DataFrame, customer_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join + tumbling rollup: each micro-batch
    hash-joins the broadcast customer dimension (no state, no shuffle of
    the stream side), then aggregates per (day, nation) with watermarked
    windows.  This is the streaming form of the reference's
    user→channel attribution joins (SURVEY §2.3 J1/J9): dimension
    lookups stay broadcast; only the windowed aggregation keeps state.
    """
    dim = bcast_dim(customer_dim.select("c_custkey", "c_nationkey"))
    enriched = events.join(dim, events.user_id == dim.c_custkey)
    return (
        enriched.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1_000_000).cast("long")
            ).alias("sum_value_micros"),
        )
        .select(
            FN.unix_us("w.start").alias("day_start_us"),
            "c_nationkey",
            "n_events",
            "sum_value_micros",
        )
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: incremental per-user RFE accumulation
# (recency/frequency/engagement, the reference's mango_user_rfe_* family
# computed incrementally instead of via 28-day re-scans).
# ---------------------------------------------------------------------------

RFE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_micros", T.LongType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)

RFE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_micros", T.LongType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)


def user_rfe_state(events: DataFrame) -> DataFrame:
    """Per-user running RFE via ``applyInPandasWithState`` — arbitrary
    stateful logic beyond built-in windows; state is one tiny tuple per
    user, expired by the processing-timeout policy in production.

    The update fn is a runtime closure (pickled by value) so workers
    don't need this package on their import path."""

    def rfe_update(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, sv, last = state.get
        else:
            n, sv, last = 0, 0, 0
        for pdf in pdf_iter:
            n += len(pdf)
            sv += int((pdf["value"] * 1_000_000).apply(int).sum())
            if len(pdf):
                last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, sv, last))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value_micros": [sv],
                "last_seen": [pd.Timestamp(last, unit="us")],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            rfe_update,
            outputStructType=RFE_OUTPUT_SCHEMA,
            stateStructType=RFE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedupe_stream(events: DataFrame, key: str = "event_id") -> DataFrame:
    """Streaming exactly-once-per-key dedup: drop re-deliveries of the
    same ``key`` arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes — bounded state, unlike a global distinct).

    The batch analog is the reference's raw-cache idempotency (K9,
    ``utils/cache.py:11-61``): never ingest the same payload twice.
    """
    return events.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
        [key]
    )


def click_purchase_interval_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding hour — the attribution join run
    *online* (the batch as-of/range joins in queries/temporal.py are
    its offline twins).

    Both sides carry a 1-hour watermark and the join condition bounds
    click_ts to [purchase_ts - 1h, purchase_ts], so the state store
    retains at most one watermark-horizon of each side per key — the
    textbook bounded-state stream-stream join.  Inner joins emit in
    append mode as soon as both sides arrive.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
        ),
        "inner",
    ).select(
        "purchase_id",
        "click_id",
        (FN.unix_ms("purchase_ts") - FN.unix_ms("click_ts")).alias("lag_ms"),
    )


def click_purchase_left_outer_join(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase, matched
    to the same user's clicks in the preceding hour OR emitted once
    with a NULL click after the watermark proves no match can arrive.

    The semantics the outer side adds: an unmatched purchase row sits
    in the state store until the global watermark (lagged min of both
    streams' max event times) passes its purchase_ts — only then is
    "no click" a safe claim, and the null row is emitted by the state
    eviction pass (a no-data micro-batch if the data is exhausted).
    Purchases younger than the final watermark are still "open" and
    never emit — the batch oracle must encode that finalization rule,
    which is exactly what makes this a different operator from the
    inner join, not a syntax variant.

    State bound: identical to the inner join (one watermark horizon
    per side per user); the outer semantics change emission, not
    retention.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
        ),
        "left_outer",
    ).select(
        "purchase_id",
        # unmatched marker: -1 instead of NULL so the row multiset is
        # totally ordered for the cross-engine hash compare
        F.coalesce("click_id", F.lit(-1).cast("long")).alias("click_id"),
    )


def stream_to_warehouse(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    date_col: str = "day",
) -> None:
    """foreachBatch sink: land a streaming aggregate in the
    date-partitioned warehouse with DYNAMIC PARTITION OVERWRITE per
    micro-batch — idempotent under batch replay (a re-delivered batch
    rewrites its days instead of double-appending), which is how the
    streaming path meets the batch layer's K7 idempotency contract.

    The plain file sink can only append; update-mode aggregates need
    exactly this upsert-by-partition pattern.
    """

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(date_col)
            .parquet(path)
        )

    (
        stream_df.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )


def attributed_daily_rollup(events: DataFrame) -> DataFrame:
    """CHAINED stateful operators: the stream-stream interval join's
    output aggregated by a tumbling daily window — two state stores in
    one continuous query (supported since multiple-stateful-operator
    chaining landed; the watermark from the join's inputs propagates
    into the window operator).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    j = purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
        ),
        "inner",
    )
    return (
        j.groupBy(F.window("purchase_ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(F.col("w.start").cast("date").alias("day"), "n_pairs")
    )


def sliding_wau(events: DataFrame) -> DataFrame:
    """Sliding 7-day / 1-day-slide weekly-active-users — the streaming
    form of the reference's WAU re-scan (SURVEY §2.9,
    ``/root/reference/sql/mango_active_user_count.sql:40-84``).

    Exact COUNT DISTINCT is unsupported in streaming aggregation, so
    the plan chains two stateful operators instead: each event expands
    to the 7 day-aligned windows that contain it, dropDuplicates on
    (user, window) keeps one row per user per window, and a count per
    window is then an *exact* distinct-user count, incrementally
    maintained.  (Deduping on (user, day) instead would count
    user-days, not users — a user active on 3 days of a window must
    still count once.)

    State: one row per (user, window) pair — 7× the user-day
    cardinality.  A production run bounds it with
    dropDuplicatesWithinWatermark keyed the same way; availableNow
    batch-over-stream runs complete-mode with full state, which is
    what the oracle comparison needs.
    """
    expanded = events.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
    ).select(
        "user_id", F.date_sub("day", F.col("i")).alias("window_start")
    )
    return (
        expanded.dropDuplicates(["user_id", "window_start"])
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
