"""Streaming operators registered as driver queries: each runs a real
Structured Streaming job (availableNow over the events parquet, memory
sink) and returns the batch result, so the DuckDB oracle can check the
*semantics* — session windows and tumbling windows — even though the
execution path is the streaming runtime with state stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from taipei_bi_etl_spark import functions as FN

from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.streaming import (
    daily_type_rollup,
    run_available_now,
    sessionize,
    stream_events,
    user_rfe_state,
)

# Gaps-and-islands twin of session_window: a session breaks when the
# gap to the previous event is >= 30 min (session_window extends
# [ts, ts+gap) and merges only strictly-earlier next events).
_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_micros,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros
FROM sess GROUP BY user_id, sid
"""


@query("streaming_sessionize", oracle=_SESSION_ORACLE, tags=("streaming", "W2", "W3"))
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(30 min) on the streaming runtime vs a batch
    gaps-and-islands oracle — proves the streaming session operator has
    exactly the reference's LEAD-rewrite semantics (SURVEY §2.9).

    The session start is exposed as exact unix micros: raw TIMESTAMP
    columns round-trip through collect() in the OS timezone, which the
    driver may set to anything."""
    from pyspark.sql import functions as F

    out = run_available_now(sessionize(stream_events(spark, sf_dir)))
    return out.select(
        "user_id",
        FN.unix_us("session_start").alias("session_start_micros"),
        "n_events",
        "sum_value_micros",
    )


_DAILY_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros
FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
"""


@query("streaming_daily_rollup", oracle=_DAILY_ORACLE, tags=("streaming",))
def streaming_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window + watermark on the streaming runtime — the
    streaming analog of the reference's day-partitioned tables."""
    from pyspark.sql import functions as F

    # untyped events have no rollup group (oracle WHERE twin)
    return run_available_now(
        daily_type_rollup(
            stream_events(spark, sf_dir).filter(
                F.col("event_type").isNotNull()
            )
        )
    )


@query("streaming_stateful_rfe", oracle=None, tags=("streaming", "extension"))
def streaming_stateful_rfe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): incremental
    per-user RFE.  Rows-only: arbitrary-stateful streaming has no ANSI
    twin; invariants are pytest-checked in tests/test_streaming.py."""
    return run_available_now(
        user_rfe_state(stream_events(spark, sf_dir)), output_mode="update"
    )


_DEDUP_STREAM_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_ids
FROM events
"""


@query("streaming_dedupe", oracle=_DEDUP_STREAM_ORACLE, tags=("streaming", "dedup"))
def streaming_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on the event stream: output count
    must equal the batch COUNT(DISTINCT event_id) (and the source has
    unique ids, so both equal COUNT(*))."""
    from pyspark.sql import functions as F
    from taipei_bi_etl_spark.streaming.jobs import dedupe_stream

    deduped = run_available_now(
        dedupe_stream(stream_events(spark, sf_dir)), output_mode="append"
    )
    return deduped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct_ids"),
    )


_INTERVAL_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       CAST(epoch_ms(p.ts) - epoch_ms(c.ts) AS BIGINT) AS lag_ms
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
"""


@query(
    "streaming_interval_join",
    oracle=_INTERVAL_JOIN_ORACLE,
    tags=("streaming", "join", "extension"),
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases × same-user clicks within
    the trailing hour) on the streaming runtime, checked against the
    batch range-join oracle — the online form of asof/range attribution.
    Inner stream-stream joins emit in append mode; watermarks + the
    two-sided time bound keep join state bounded."""
    from taipei_bi_etl_spark.streaming import click_purchase_interval_join

    return run_available_now(
        click_purchase_interval_join(stream_events(spark, sf_dir)),
        output_mode="append",
    )


_ENRICHED_ORACLE = """
SELECT CAST(epoch_us(date_trunc('day', e.ts)) AS BIGINT) AS day_start_us,
       c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(e.value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


@query(
    "streaming_enriched_rollup", oracle=_ENRICHED_ORACLE, tags=("streaming", "J9")
)
def streaming_enriched_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (broadcast customer dim onto the event stream)
    feeding a watermarked daily rollup per nation — the streaming form
    of the reference's attribution-dimension joins.  Oracle = the batch
    join+rollup; window starts go out as epoch micros (tz-proof)."""
    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.streaming.jobs import enriched_nation_rollup

    dim = read_table(spark, sf_dir, "customer")
    return run_available_now(
        enriched_nation_rollup(stream_events(spark, sf_dir), dim)
    )


# Append mode emits a day's window only once the watermark (the lagged
# minimum of both input streams' max event times) passes its end — the
# oracle encodes exactly that finalization rule, so the comparison
# checks the chained pipeline AND the emission semantics.
_ATTRIB_ORACLE = """
WITH pairs AS (
    SELECT p.ts AS purchase_ts
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
), wm AS (
    SELECT least(
        (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
    ) - INTERVAL 1 HOUR AS w
)
SELECT CAST(date_trunc('day', purchase_ts) AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs, wm
GROUP BY 1, wm.w
HAVING CAST(date_trunc('day', MIN(purchase_ts)) AS DATE)
       + INTERVAL 1 DAY <= wm.w
"""


@query(
    "streaming_attributed_rollup",
    oracle=_ATTRIB_ORACLE,
    tags=("streaming", "extension"),
)
def streaming_attributed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained stateful operators in ONE continuous query:
    stream-stream interval join → tumbling daily rollup of attributed
    pairs.  The oracle replays both the computation and append-mode's
    watermark finalization rule (only days whose window closed before
    the lagged min-of-both-streams watermark emit)."""
    from taipei_bi_etl_spark.streaming.jobs import attributed_daily_rollup

    return run_available_now(
        attributed_daily_rollup(stream_events(spark, sf_dir)),
        output_mode="append",
    )


# LEFT OUTER adds a finalization rule on top of the inner interval
# join: an unmatched purchase emits its NULL-click row only once the
# global watermark (lagged min of both streams' max event times) has
# passed its purchase_ts — younger unmatched purchases are still open
# and must NOT appear.  The oracle encodes exactly that rule; the
# strict `<` mirrors the state-eviction predicate.
_LEFT_OUTER_ORACLE = """
WITH clicks AS (
    SELECT event_id AS click_id, user_id, ts FROM events
    WHERE event_type = 'click'
), purchases AS (
    SELECT event_id AS purchase_id, user_id, ts FROM events
    WHERE event_type = 'purchase'
), wm AS (
    SELECT least((SELECT MAX(ts) FROM clicks),
                 (SELECT MAX(ts) FROM purchases))
           - INTERVAL 1 HOUR AS w
), matched AS (
    SELECT p.purchase_id, c.click_id
    FROM purchases p JOIN clicks c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
), unmatched AS (
    SELECT p.purchase_id, CAST(-1 AS BIGINT) AS click_id
    FROM purchases p, wm
    WHERE p.ts < wm.w
      AND NOT EXISTS (
          SELECT 1 FROM clicks c
          WHERE c.user_id = p.user_id
            AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR)
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


@query(
    "streaming_left_outer_join",
    oracle=_LEFT_OUTER_ORACLE,
    tags=("streaming", "join"),
)
def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase with its
    prior-hour clicks, plus a NULL-click row for purchases the
    watermark has PROVEN unmatched — the operator where emission time
    is part of the semantics (see the oracle's finalization rule).
    State retention is identical to the inner join; only the eviction
    pass changes (null emission via no-data micro-batch once input is
    exhausted)."""
    from taipei_bi_etl_spark.streaming.jobs import (
        click_purchase_left_outer_join,
    )

    return run_available_now(
        click_purchase_left_outer_join(stream_events(spark, sf_dir)),
        output_mode="append",
    )


def _streaming_fm_oracle() -> str:
    from taipei_bi_etl_spark.queries.mango_parity import _full_fm_cte

    return f"""
WITH {_full_fm_cte()}
SELECT submission_date AS day, feature_type, feature_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(session_time), -1) AS BIGINT) AS sum_session_time,
       CAST(COALESCE(SUM(url_counts), -1) AS BIGINT) AS sum_url_counts
FROM fanned
GROUP BY 1, 2, 3
"""


@query(
    "streaming_feature_usage",
    oracle=_streaming_fm_oracle(),
    tags=("streaming", "D4", "mango"),
)
def streaming_feature_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL mango feature-mapping chain — ping synthesis, JSON
    parse, D2 cleanup, kv session metrics, outer-lateral extras, the
    150-rule D4 cascade, 3-way fan-out — running under Structured
    Streaming, rolled into a watermarked daily window per feature.

    This is the reference's daily batch chain as a stream: every stage
    before the rollup is a STATELESS map, so the chain needs no state
    store at all until the windowed aggregate (state = one row per
    (day, feature)).  The oracle is the same closed-form DuckDB
    derivation that checks the batch surface rollup — streaming and
    batch must hash-match exactly (COUNT DISTINCT is unsupported in
    streaming aggs, so the rollup carries counts and sums only).
    """
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.plans.telemetry_pipeline import (
        full_pings_from,
        map_features_full,
        unnest_events_full,
    )

    ev = stream_events(spark, sf_dir)
    fm = map_features_full(unnest_events_full(full_pings_from(ev)))
    rolled = (
        fm.withWatermark("submission_timestamp", "1 day")
        .groupBy(
            F.window("submission_timestamp", "1 day").alias("w"),
            "feature_type",
            "feature_name",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("session_time"), F.lit(-1))
            .cast("long")
            .alias("sum_session_time"),
            F.coalesce(F.sum("url_counts"), F.lit(-1))
            .cast("long")
            .alias("sum_url_counts"),
        )
    )
    out = run_available_now(rolled)
    return out.select(
        F.to_date("w.start").alias("day"),
        "feature_type",
        "feature_name",
        "n_rows",
        "sum_session_time",
        "sum_url_counts",
    )
