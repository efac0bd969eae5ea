"""Temporal join operators the reference lacks but a Spark-first engine
should offer (SURVEY.md §7.1 step 8 extensions): as-of join, bounded
range join, grouping-sets rollup, and time-bucket gap-fill (hypertable
rollup).  Each is a composition of built-in DataFrame ops — no UDFs, no
range explosion — with a DuckDB oracle twin.

Scale notes are on each query: the as-of join is the one-shuffle
union+window form (never a per-row backward scan); the range join is
bucketed so candidate pairs are bounded by bucket width, not |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark import functions as FN

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


# ---------------------------------------------------------------------------
# As-of join: attach to each purchase the most recent click at-or-before
# it by the same user (last-touch attribution).  The reference's nearest
# analog is the LEAD sessionization (sql/mango_user_rfe_daily_session.sql:82-84)
# — this generalizes it across two event streams.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe
    FROM events
    WHERE event_type IN ('purchase', 'click')
), attributed AS (
    SELECT user_id, ts, event_id, is_probe,
           LAST_VALUE(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS)
               OVER w AS click_ts,
           LAST_VALUE(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS)
               OVER w AS click_value
    FROM tagged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_probe, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS purchase_ts_us,
       CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END AS attributed,
       COALESCE(CAST(epoch_us(click_ts) AS BIGINT), -1) AS click_ts_us,
       COALESCE(click_value, 0.0) AS click_value,
       COALESCE(epoch_ms(ts) - epoch_ms(click_ts), -1) AS lag_ms
FROM attributed
WHERE is_probe = 1
"""


@query("asof_join_attribution", oracle=_ASOF_ORACLE, tags=("ext", "asof", "W2"))
def asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward ≤) join as ONE shuffle: union both streams tagged,
    hash-partition by user, sort within partition, carry the last
    reference row forward with ``last(..., ignorenulls)``, keep probes.

    At 100 TB this beats every alternative: no range/theta join (which
    Spark executes as BroadcastNestedLoop or a cartesian-per-key), no
    per-probe subquery; the exchange moves each row once and the sort is
    the same one the downstream sessionization already needs.  Ties are
    deterministic: refs sort before probes at equal ts (≤ semantics),
    event_id breaks ref-ref ties.
    """
    ev = read_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0)).alias(
            "is_probe"
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ref_ts = F.when(F.col("is_probe") == 0, F.col("ts"))
    ref_val = F.when(F.col("is_probe") == 0, F.col("value"))
    attributed = tagged.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.last(ref_ts, ignorenulls=True).over(w).alias("click_ts"),
        F.last(ref_val, ignorenulls=True).over(w).alias("click_value"),
        "is_probe",
    )
    # Null-free output convention (driver value-hash): unattributed
    # purchases carry an explicit flag + -1/zero sentinels.  Timestamps
    # go out as unix micros — raw TIMESTAMPs collect() in the OS
    # timezone, which the driver may set to anything.
    return attributed.filter(F.col("is_probe") == 1).select(
        "purchase_id",
        "user_id",
        FN.unix_us("purchase_ts").alias("purchase_ts_us"),
        F.when(F.col("click_ts").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "attributed"
        ),
        F.coalesce(FN.unix_us("click_ts"), F.lit(-1)).alias("click_ts_us"),
        F.coalesce("click_value", F.lit(0.0)).alias("click_value"),
        F.coalesce(
            FN.unix_ms("purchase_ts") - FN.unix_ms("click_ts"), F.lit(-1)
        ).alias("lag_ms"),
    )


# ---------------------------------------------------------------------------
# Bounded range join: errors in the hour before each purchase.
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     r AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
SELECT p.event_id AS purchase_id, p.user_id,
       CAST(COUNT(r.ts) AS BIGINT) AS n_errors_1h
FROM p LEFT JOIN r
  ON r.user_id = p.user_id
 AND r.ts >= p.ts - INTERVAL 1 HOUR
 AND r.ts <  p.ts
GROUP BY 1, 2
"""


@query("range_join_error_window", oracle=_RANGE_ORACLE, tags=("ext", "rangejoin"))
def range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join executed as a bucketed equi-join: quantize ts to 1-hour
    buckets, duplicate each reference row into the two buckets whose
    probes it can reach (its own and the next), equi-join on
    (user_id, bucket), then apply the exact range predicate.

    A naive ``r.ts BETWEEN p.ts - 1h AND p.ts`` join has no equi key →
    Spark plans a per-user cartesian; at 100 TB a hot user with 1M
    events is 10^12 candidate pairs.  Bucketing bounds candidates to
    pairs within adjacent hours (2× ref duplication, constant), keeps
    the join a plain shuffled hash join on (user_id, bucket), and each
    qualifying pair matches exactly once (cover buckets are distinct).
    """
    ev = read_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(FN.unix_ms(c) / F.lit(3600000))  # noqa: E731
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        bucket(F.col("ts")).alias("bucket"),
    )
    refs = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
            bucket(F.col("ts")).alias("b0"),
        )
        .select(
            "r_user", "r_ts", F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket")
        )
    )
    joined = probes.join(
        refs,
        (probes.user_id == refs.r_user)
        & (probes.bucket == refs.bucket)
        & (refs.r_ts >= probes.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (refs.r_ts < probes.p_ts),
        "left",
    )
    return joined.groupBy("purchase_id", "user_id").agg(
        F.count("r_ts").alias("n_errors_1h")
    )


# ---------------------------------------------------------------------------
# Grouping sets (CUBE) — absent from the reference (SURVEY §2.4 "no
# grouping sets / cube / rollup"); table stakes for an analytics engine.
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0, 2) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("grouping_sets_pricing", oracle=_CUBE_ORACLE, tags=("ext", "cube", "A1"))
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with exact-cents sums.

    Plan shape: one Expand (4 grouping sets) feeding a single partial →
    final HashAggregate; the exchange carries |groups|×4 rows, not the
    input.  Sums are exact integer cents so subtotal rows equal the sum
    of their children bit-for-bit under any partitioning.
    """
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.select("l_returnflag", "l_linestatus", cents.alias("cents"))
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("cents") / F.lit(100.0), 2).alias("sum_price"),
        )
        # gid disambiguates a genuine 'ALL' value from a subtotal row;
        # null-free output per the driver value-hash convention
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "gid",
            "n",
            "sum_price",
        )
    )


# ---------------------------------------------------------------------------
# Time-bucket gap-fill (hypertable-style dense rollup).
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH b AS (
    SELECT CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS hour_bucket, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2
), bounds AS (SELECT MIN(hour_bucket) AS mn, MAX(hour_bucket) AS mx FROM b),
   hours AS (SELECT UNNEST(generate_series(mn, mx)) AS hour_bucket FROM bounds),
   types AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL)
SELECT hours.hour_bucket, types.event_type,
       COALESCE(b.n, 0) AS n,
       COALESCE(b.value_cents, 0) AS value_cents
FROM hours CROSS JOIN types
LEFT JOIN b ON b.hour_bucket = hours.hour_bucket AND b.event_type = types.event_type
"""


@query("time_bucket_gapfill", oracle=_GAPFILL_ORACLE, tags=("ext", "gapfill", "A1"))
def time_bucket_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup per event_type with a dense, zero-filled time axis.

    The heavy side (the rollup) is one map-side-combined aggregation;
    the axis is generated from the rollup's own 1-row bounds via
    ``sequence`` + ``explode`` (driver never sees data), cross-joined
    with the tiny distinct-type dim, then LEFT-joined back.  Axis size ∝
    time span, independent of input rows, and both axis inputs are
    broadcast — the 100 TB cost is exactly the one rollup shuffle.

    Buckets are epoch-hour longs, not truncated TIMESTAMPs: Spark's
    ``date_trunc`` truncates in the *session* timezone, so a raw hour
    column would shift under a non-UTC driver.
    """
    from taipei_bi_etl_spark.queries.timegrid import _typed_valued_events

    ev = _typed_valued_events(spark, sf_dir)  # oracle WHERE twin
    b = (
        ev.groupBy(
            F.floor(FN.unix_ms("ts") / F.lit(3600000)).alias("hour_bucket"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        )
    )
    hours = (
        b.agg(F.min("hour_bucket").alias("mn"), F.max("hour_bucket").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("hour_bucket"))
    )
    types = ev.select("event_type").distinct()
    # bounded: hour grid x event-type domain
    axis = F.broadcast(hours).crossJoin(F.broadcast(types))
    return (
        axis.join(b, ["hour_bucket", "event_type"], "left")
        .select(
            "hour_bucket",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
        )
    )


_ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS l_returnflag,
       COALESCE(l_linestatus, '<all>') AS l_linestatus,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_pricing", oracle=_ROLLUP_ORACLE, tags=("ext", "cube", "A1"))
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — the hierarchical subset of CUBE
    (`grouping_sets_pricing`): per (flag, status), per flag, and grand
    total in one pass.  ROLLUP expands to 3 grouping sets instead of
    CUBE's 4 — a strictly smaller Expand, the right choice when the
    drill path is hierarchical.  Exact cents; grouping_id
    disambiguates real NULL keys from subtotal rows.
    """
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "revenue_cents",
            "n_lines",
            F.col("gid").cast("long").alias("gid"),
        )
    )
