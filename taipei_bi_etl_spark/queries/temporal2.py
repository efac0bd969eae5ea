"""Second temporal batch — three time-series shapes a hypertable layer
serves natively, built here from Catalyst primitives: OHLC bucket
downsampling (first/max/min/last), sweep-line peak concurrency, and
heartbeat gap / downtime detection.

These extend the reference's sessionization family (SURVEY §2.5 W2/W3,
``sql/mango_user_rfe_daily_session.sql:66-114``): W2's LEAD-to-next-event
is exactly the gap detector's core, and the 30-minute activity horizon
reappears as the sweep-line's interval length.  All values ride exact
integer cents / milliseconds so the hashes are order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# OHLC downsampling — first/max/min/last per bucket, one aggregation pass.
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH t AS (
    SELECT event_type,
           CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS bucket,
           ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
), w AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY ts ASC, event_id ASC) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM t
)
SELECT event_type, bucket,
       CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM w GROUP BY event_type, bucket
"""


@query("ohlc_downsample", oracle=_OHLC_ORACLE, tags=("temporal", "ext", "W2"))
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) per event_type — the canonical
    time-series downsample (candlesticks, sensor rollups).

    Spark-first shape: ``min_by``/``max_by`` keyed on the struct
    ``(ts, event_id)`` — a total order, so "first" and "last" are
    deterministic even under timestamp collisions — fold open and close
    into the SAME single aggregation pass as high/low/count.  One
    shuffle on (event_type, bucket), map-side partials, no window, no
    second scan.  The oracle takes the window-function road (two
    ROW_NUMBERs + conditional max) to pin the semantics independently.

    At 100 TB the bucket column prefixes the shuffle key, so a
    date-partitioned source aggregates each partition's buckets locally
    — partial state is 4 longs per (type, bucket), mergeable across any
    partition split.
    """
    from taipei_bi_etl_spark.queries.timegrid import _typed_valued_events

    e = _typed_valued_events(spark, sf_dir)  # oracle WHERE twin
    cents = F.round(F.col("value") * 100, 0).cast("long")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.select(
            "event_type",
            F.floor(F.unix_millis("ts") / F.lit(3600000)).alias("bucket"),
            cents.alias("cents"),
            ordkey.alias("ord"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.min_by("cents", F.col("ord")).alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", F.col("ord")).alias("close_cents"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency — interval overlap via +1/-1 deltas.
# ---------------------------------------------------------------------------

ACTIVITY_MINUTES = 30  # each event opens a 30-minute activity interval

_CONCURRENCY_ORACLE = f"""
WITH pts AS (
    SELECT event_type, ts AS t, 1 AS delta
    FROM events WHERE event_type IS NOT NULL
    UNION ALL
    SELECT event_type, ts + INTERVAL {ACTIVITY_MINUTES} MINUTE, -1
    FROM events WHERE event_type IS NOT NULL
), c AS (
    SELECT event_type, t,
           SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                            ROWS UNBOUNDED PRECEDING) AS conc
    FROM pts
)
SELECT event_type, date_trunc('day', t) AS day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency
FROM c GROUP BY event_type, day
"""


@query(
    "max_concurrent_intervals",
    oracle=_CONCURRENCY_ORACLE,
    tags=("temporal", "ext", "W3"),
)
def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-open {ACTIVITY_MINUTES}-minute
    activity intervals per event_type per day — the sweep-line answer
    to "how many sessions were live at once", the capacity-planning
    twin of W3's session duration.

    Each interval contributes a +1 at its start and a -1 at its end;
    the running sum over (t, delta) is the live count.  Ordering by
    ``delta`` within a timestamp processes ends before starts, so
    touching intervals don't count as overlapping.  Within a tie group
    the running sum is monotone (+1s only increase, -1s only decrease),
    so the per-day MAX is deterministic even though individual tie-row
    prefixes are not — the oracle exploits the same invariant.

    Scale: one shuffle on event_type for the window, one (type, day)
    aggregation of the result.  A single giant event_type serializes
    its window partition — the fix at 100 TB is the same two-pass
    range-partitioned prefix sum documented for token_budget_sample
    (per-range partials + broadcast offsets), plan shape unchanged.
    """
    # untyped events have no concurrency series (oracle WHERE twin)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    starts = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = e.select(
        "event_type",
        (F.col("ts") + F.expr(f"INTERVAL {ACTIVITY_MINUTES} MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends)
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        pts.withColumn("conc", F.sum("delta").over(w))
        .groupBy("event_type", F.to_date("t").alias("day"))
        .agg(F.max("conc").alias("peak_concurrency"))
    )


# ---------------------------------------------------------------------------
# Heartbeat gap / downtime detection — LEAD over a total order.
# ---------------------------------------------------------------------------

GAP_MS = 3_600_000  # gaps longer than 1 hour count as downtime

_GAP_ORACLE = f"""
WITH s AS (
    SELECT user_id, ts, event_id,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS nxt
    FROM events
), g AS (
    SELECT user_id,
           CASE WHEN nxt IS NOT NULL
                 AND datediff('millisecond', ts, nxt) > {GAP_MS}
                THEN datediff('millisecond', ts, nxt) END AS gap_ms
    FROM s
)
SELECT user_id,
       CAST(COUNT(gap_ms) AS BIGINT) AS n_gaps,
       CAST(COALESCE(SUM(gap_ms), 0) AS BIGINT) AS downtime_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id
"""


@query("heartbeat_gap_downtime", oracle=_GAP_ORACLE, tags=("temporal", "W2"))
def heartbeat_gap_downtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user downtime profile: the number and total duration of
    inter-event gaps longer than {GAP_MS} ms — uptime monitoring /
    heartbeat-loss detection, and the exact inverse of W3's session
    logic (W3 *caps* long gaps, this one *keeps only* them; same LEAD
    core, ``/root/reference/sql/mango_user_rfe_daily_session.sql:82-103``).

    LEAD orders by (ts, event_id) — a total order, so each row's
    successor (and hence the gap multiset) is deterministic under
    timestamp ties.  Gap lengths are exact integer milliseconds.

    Scale: ONE shuffle on user_id serves both the window sort and the
    final group-by (Catalyst reuses the partitioning; the aggregation
    is partial-ready).  State per row is one timestamp — no buffering
    beyond the sort, and a date-partitioned source needs only
    partition-boundary stitching (carry last event per user across
    days), the same pattern the incremental-dedup family documents.
    """
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.lead("ts").over(w)) - F.unix_millis(F.col("ts"))
    g = e.select(
        "user_id",
        F.when(gap_ms > GAP_MS, gap_ms).alias("gap_ms"),
    )
    return g.groupBy("user_id").agg(
        F.count("gap_ms").alias("n_gaps"),
        F.coalesce(F.sum("gap_ms"), F.lit(0)).alias("downtime_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
