"""Telemetry-shaped analytics queries (the reference's core pipeline),
re-phrased over the synthetic ``events`` table.

Covers SURVEY.md §2 rows: A5 retention pivot, W1 rank-dedup, W2/W3
lead-sessionization, A3/A14 active-user counts, A6/F18 kv extraction,
J10 upsert-dedup, D5-style CASE mapping, F16 week bucketing.

``events`` schema: event_id, ts, user_id, event_type, value, props(json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark import functions as FN

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


# ---------------------------------------------------------------------------
# D1-D4 + U1 — the full reference telemetry chain (mango_events →
# unnested → feature_mapping fan-out).  The 150-rule D4 cascade is
# compiled to DuckDB SQL by the SAME rule table that builds the Spark
# plan (feature_mapping.feature_mapping_sql), so the end-to-end chain is
# exact-oracle-checked — including the JSON ping parse round-trip, which
# the oracle skips by computing the synthesized fields directly (the
# payload is deterministic modular arithmetic over event_id).
# ---------------------------------------------------------------------------


def _fanout_oracle() -> str:
    from taipei_bi_etl_spark.feature_mapping import feature_mapping_sql
    from taipei_bi_etl_spark.plans import telemetry_pipeline as tp

    def pick(vocab: list[str], salt: int) -> str:
        lst = "[" + ", ".join(f"'{x}'" for x in vocab) + "]"
        return f"({lst})[((event_id + {salt}) % {len(vocab)}) + 1]"

    fm = feature_mapping_sql()
    lists = ", ".join(
        f"{sql} AS l_{name.lower()}" for name, sql in fm.items()
    )
    nonempty = {name: f"len(l_{name.lower()}) > 0" for name in fm}
    cascade = " ".join(f"WHEN {c} THEN l_{n.lower()}" for n, c in nonempty.items())
    vert_case = " ".join(f"WHEN {c} THEN '{n}'" for n, c in nonempty.items())
    any_match = " OR ".join(nonempty.values())
    return f"""
WITH base AS (
  SELECT user_id AS client_id,
         CAST(ts AS DATE) AS submission_date,
         {pick(tp._METHODS, 1)} AS event_method,
         {pick(tp._OBJECTS, 3)} AS event_object,
         {pick(tp._VALUES, 5)} AS event_value,
         {pick(tp._VERTICALS, 7)} AS event_vertical,
         {pick(tp._SOURCES, 11)} AS src,
         'google' AS settings_search_engine
  FROM events
), extra_rows AS (
  SELECT *, 'vertical' AS extra_key, event_vertical AS extra_value FROM base
  UNION ALL
  SELECT *, 'source' AS extra_key, src AS extra_value FROM base
), listed AS (
  SELECT *, {lists} FROM extra_rows
), mapped AS (
  SELECT client_id, submission_date,
         CASE {cascade} ELSE ['feature: others'] END AS features,
         CASE {vert_case} ELSE 'Others' END AS vertical,
         CASE WHEN {any_match} THEN 'App' ELSE 'Others' END AS app
  FROM listed
), fanned AS (
  SELECT submission_date, client_id, 'Feature' AS feature_type,
         UNNEST(features) AS feature_name FROM mapped
  UNION ALL
  SELECT submission_date, client_id, 'Vertical', vertical FROM mapped
  UNION ALL
  SELECT submission_date, client_id, 'App', app FROM mapped
)
SELECT submission_date, feature_type, feature_name,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT client_id) AS BIGINT) AS n_clients
FROM fanned
GROUP BY 1, 2, 3
"""


@query(
    "telemetry_feature_fanout",
    oracle=_fanout_oracle(),
    tags=("D1", "D2", "D3", "D4", "U1", "J8"),
)
def telemetry_feature_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ping parse (D1 VARIANT) → explode → cleanup (D2) → kv extract (A6)
    → outer lateral extra (J8) → rule cascade (D4) → 3-way fan-out (U1)
    → daily per-feature rollup.

    Oracle: the D4 rule table compiles itself to DuckDB SQL
    (`feature_mapping_sql`), so all ~150 rules are hash-verified
    cross-engine — stronger than the reference's own tests, which never
    check the JS rules' output (SURVEY §5)."""
    from taipei_bi_etl_spark.plans.telemetry_pipeline import feature_usage_rollup

    return feature_usage_rollup(spark, sf_dir)

# ---------------------------------------------------------------------------
# A5 — cohort retention pivot (the reference centerpiece:
# sql/mango_cohort_retained_users.sql:6-26 — COUNT(DISTINCT CASE WHEN
# occur_day = N THEN client_id END) over a 112-day cohort window).
# ---------------------------------------------------------------------------

_RETENTION_DAYS = (1, 3, 7, 14, 28)

_RETENTION_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, MIN(day) AS cohort_date FROM days GROUP BY user_id
), occ AS (
  SELECT d.user_id, c.cohort_date,
         datediff('day', c.cohort_date, d.day) AS occur_day
  FROM days d JOIN cohort c USING (user_id)
)
SELECT cohort_date,
       COUNT(DISTINCT user_id) AS cohort_size,
       COUNT(DISTINCT CASE WHEN occur_day = 1  THEN user_id END) AS d1_retained,
       COUNT(DISTINCT CASE WHEN occur_day = 3  THEN user_id END) AS d3_retained,
       COUNT(DISTINCT CASE WHEN occur_day = 7  THEN user_id END) AS d7_retained,
       COUNT(DISTINCT CASE WHEN occur_day = 14 THEN user_id END) AS d14_retained,
       COUNT(DISTINCT CASE WHEN occur_day = 28 THEN user_id END) AS d28_retained
FROM occ GROUP BY cohort_date
"""


@query("cohort_retention", oracle=_RETENTION_ORACLE, tags=("A5", "A2", "F3", "flagship"))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention pivot (A5).

    Scale notes: ONE shuffle on user_id builds each user's distinct day
    set (collect_set dedups map-side in the partial aggregate, so the
    exchange carries day sets, not events) and the cohort date is just
    array_min of that set — no window, no sort, no second exchange that
    a distinct-then-window formulation pays.  The final
    groupBy(cohort_date) shuffles one narrow row per (user, active day).
    Per-user state is bounded by the calendar (≤ window length days), so
    the set agg cannot blow up on hot users.
    """
    ev = read_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    occ = per_user.select(
        F.array_min("days").alias("cohort_date"),
        F.explode("days").alias("day"),
    ).withColumn("occur_day", F.datediff("day", "cohort_date"))
    # (user_id, day) is unique after the distinct and cohort_date is
    # functionally determined by user_id, so within a cohort_date group
    # each user contributes exactly one row per occur_day value — every
    # COUNT(DISTINCT CASE ...) collapses to a plain conditional COUNT
    # (occur_day=0 marks each user once → cohort_size).  This removes
    # Spark's 6-way Expand for multi-countDistinct: single-pass hash agg.
    aggs = [
        F.count(F.when(F.col("occur_day") == 0, 1)).alias("cohort_size")
    ] + [
        F.count(F.when(F.col("occur_day") == n, 1)).alias(f"d{n}_retained")
        for n in _RETENTION_DAYS
    ]
    return occ.groupBy("cohort_date").agg(*aggs)


# ---------------------------------------------------------------------------
# W1 — RANK()=1 dedup (sql/mango_user_channels.sql:133-137): keep one
# attribution row per user, ordered by a deterministic key.
# ---------------------------------------------------------------------------

_RANK_DEDUP_ORACLE = """
SELECT user_id, event_id, event_type, CAST(ts AS DATE) AS day
FROM (
  SELECT user_id, event_id, event_type, ts,
         RANK() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS r
  FROM events
) WHERE r = 1
"""


@query("rank_dedup_first_touch", oracle=_RANK_DEDUP_ORACLE, tags=("W1", "O3"))
def rank_dedup_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch dedup via RANK()=1 (W1).  The (ts, event_id) ordering is
    a total order per user, so RANK matches the reference's creative_token
    tie-break exactly while staying deterministic."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("r", F.rank().over(w))
        .filter(F.col("r") == 1)
        .select("user_id", "event_id", "event_type", F.to_date("ts").alias("day"))
    )


# ---------------------------------------------------------------------------
# W2/W3 — LEAD sessionization with 30-min gap cap
# (sql/mango_user_rfe_daily_session.sql:66-114).
# ---------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts,
         LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_ts
  FROM events
), durations AS (
  SELECT user_id, day,
         CASE
           WHEN next_ts IS NULL THEN 0
           WHEN datediff('millisecond', ts, next_ts) > 30 * 60 * 1000 THEN 0
           ELSE datediff('millisecond', ts, next_ts)
         END AS dur_ms
  FROM seq
)
SELECT user_id, day,
       CAST(SUM(dur_ms) AS BIGINT) AS session_time_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM durations GROUP BY user_id, day
"""


@query("lead_sessionize", oracle=_SESSION_ORACLE, tags=("W2", "W3", "F6"))
def lead_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily session time: LEAD to next event, gaps > 30 min count
    as 0 (W2/W3).  One shuffle on user_id serves both the window and the
    final (user_id, day) aggregation (Catalyst reuses the hash partitioning
    because user_id prefixes the grouping key)."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    diff_ms = FN.unix_ms(F.lead("ts", 1).over(w)) - FN.unix_ms(F.col("ts"))
    dur = F.when(diff_ms.isNull(), F.lit(0)).when(
        diff_ms > 30 * 60 * 1000, F.lit(0)
    ).otherwise(diff_ms)
    return (
        ev.withColumn("dur_ms", dur)
        .withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(
            F.sum("dur_ms").alias("session_time_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# A3/A14 — DAU/WAU/MAU-style active-user counts
# (sql/mango_active_user_count.sql:17-105): per-day distinct users, plus
# distinct "new" users (first-day) — two countDistincts in one pass, then
# left-join assembly of the rolling windows.
# ---------------------------------------------------------------------------

_ACTIVE_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), firstday AS (
  SELECT user_id, MIN(day) AS first_day FROM days GROUP BY user_id
), dau AS (
  SELECT d.day,
         COUNT(DISTINCT d.user_id) AS dau,
         COUNT(DISTINCT CASE WHEN d.day = f.first_day THEN d.user_id END) AS new_dau
  FROM days d JOIN firstday f USING (user_id)
  GROUP BY d.day
), wau AS (
  SELECT d1.day, COUNT(DISTINCT d2.user_id) AS wau
  FROM (SELECT DISTINCT day FROM days) d1
  JOIN days d2 ON d2.day > d1.day - 7 AND d2.day <= d1.day
  GROUP BY d1.day
)
SELECT dau.day, dau.dau, dau.new_dau, wau.wau
FROM dau LEFT JOIN wau USING (day)
"""


@query("active_user_counts", oracle=_ACTIVE_ORACLE, tags=("A14", "A3", "J5"))
def active_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + new-user DAU + 7-day WAU (A14/J5).

    The WAU rolling window is computed by fanning each (user, day) row out
    to the ≤7 window days it contributes to (sequence+explode) — a single
    shuffle on day, instead of a per-day re-scan of 7 partitions like the
    reference, and no range join.  At 100 TB the fan-out factor (7×) is
    bounded and map-side, while a range join would be quadratic-ish.
    """
    ev = read_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.withColumn("first_day", F.min("day").over(W.partitionBy("user_id")))
    dau = first.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau"),
        F.countDistinct(
            F.when(F.col("day") == F.col("first_day"), F.col("user_id"))
        ).alias("new_dau"),
    )
    # fan (user, day) → the 7 calendar days whose trailing window contains it,
    # keep only days that actually occur in the data.
    wau_days = days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    )
    present = days.select(F.col("day").alias("win_day")).distinct()
    wau = (
        wau_days.join(present, "win_day")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("win_day", "day")
    )
    return dau.join(wau, "day", "left").select("day", "dau", "new_dau", "wau")


# ---------------------------------------------------------------------------
# A6/F18 — key-value extraction from JSON props (the reference pulls
# settings values with a scalar subquery over UNNEST; here the props are
# JSON text → get_json_object, F18 sql/user_rfe.sql:8).
# ---------------------------------------------------------------------------

_KV_ORACLE = r"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN regexp_matches(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k'),
                              '^\s*-?[0-9]+\s*$')
                      THEN TRY_CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)
                 END) AS BIGINT) AS sum_k,
       CAST(MAX(CASE WHEN regexp_matches(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k'),
                              '^\s*-?[0-9]+\s*$')
                      THEN TRY_CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)
                 END) AS BIGINT) AS max_k
FROM events
WHERE event_type IS NOT NULL AND props IS NOT NULL AND json_valid(props)
GROUP BY event_type
""".replace(  # strict-validity gate: dup-key / bare-nan shapes (r06)
    "json_valid(props)", FN.json_valid_strict_sql("props")
)


@query("json_kv_extract", oracle=_KV_ORACLE, tags=("A6", "F18", "A2"))
def json_kv_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a typed value from a JSON props column and aggregate (F18 +
    A1/A2).  get_json_object stays JVM-side; no Python."""
    # strict-props precondition (r07 closes the last one-way shapes):
    # functions.json_strict = both lenient-parser terms PLUS the
    # textual contract (object root / balance / no concatenated roots /
    # no repeated key text), mirrored exactly by the DuckDB twin
    # functions.json_valid_strict_sql — trailing garbage and nested
    # dup-key shapes are now excluded IDENTICALLY in both engines
    # (hostile battery rows pin it).
    # Non-numeric k values are valid JSON → NULL via try_cast BOTH sides.
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & FN.json_strict(F.col("props"))
    )
    # integral-text contract (functions.int_text) — see history.py
    k = FN.int_text(F.get_json_object("props", "$.k"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# J10 — upsert / keep-latest-per-key merge (tasks/revenue.py:147-167's
# pandasql max-datetime dedup) as a window.
# ---------------------------------------------------------------------------

_UPSERT_ORACLE = """
SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type,
       CAST(ts AS DATE) AS latest_day
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@query("upsert_keep_latest", oracle=_UPSERT_ORACLE, tags=("J10",))
def upsert_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the newest record per key (J10): row_number over (key, ts desc)
    — the distributed MERGE-dedup.  event_id desc breaks ts ties
    deterministically (the reference relies on max(datetime) alone)."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_event_type"),
            F.to_date("ts").alias("latest_day"),
        )
    )


# ---------------------------------------------------------------------------
# D5/D6-style CASE mapping + F16 week bucketing
# (udf/map_channels.sql:1-27, sql/mango_user_feature_occurrence.sql:57-58).
# ---------------------------------------------------------------------------

_CHANNEL_ORACLE = """
SELECT CASE
         WHEN event_type IN ('signup', 'login') THEN 'Acquisition'
         WHEN event_type = 'purchase' THEN 'Revenue'
         WHEN event_type IN ('view', 'click') THEN 'Engagement'
         ELSE 'Others'
       END AS channel,
       CAST(FLOOR(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS week_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


@query("channel_week_rollup", oracle=_CHANNEL_ORACLE, tags=("D5", "F16", "A1", "A3"))
def channel_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-type CASE mapping (D5, udf/map_channels.sql ported to a
    when-chain — stays in codegen) rolled up by FLOOR week bucket (F16)."""
    ev = read_table(spark, sf_dir, "events")
    channel = (
        F.when(F.col("event_type").isin("signup", "login"), "Acquisition")
        .when(F.col("event_type") == "purchase", "Revenue")
        .when(F.col("event_type").isin("view", "click"), "Engagement")
        .otherwise("Others")
    )
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("long")
    return (
        ev.withColumn("channel", channel)
        .withColumn("week_no", week)
        .groupBy("channel", "week_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# D6/D8/D12/D13 — market mapping, target-country whitelist and the
# presentation-ordering keys (udf/map_markets.sql, udf/
# match_target_countries.sql, udf/order_markets.sql, udf/
# order_target_countries.sql) exercised over a deterministic
# nationkey→ISO recode of the synthetic nation table.
# ---------------------------------------------------------------------------

_ISO = [
    "IN", "ID", "TW", "HK", "SG", "PH", "VN", "TH", "MY", "BD", "MM", "KH",
    "LA", "BN", "US", "DE", "FR", "JP", "CN", "BR", "GB", "KR", "MX", "NG",
    "RU",
]
_ISO_SQL = "[" + ", ".join(f"'{c}'" for c in _ISO) + "]"

_MARKET_ORACLE = f"""
WITH coded AS (
  SELECT c_custkey, {_ISO_SQL}[n_nationkey % 25 + 1] AS country
  FROM customer JOIN nation ON c_nationkey = n_nationkey
), mapped AS (
  SELECT c_custkey, country,
         CASE WHEN country IN ('IN','ID') THEN country
              WHEN country IN ('TW','HK','SG') THEN 'THS'
              WHEN country IN ('PH','VN','TH','MY') THEN 'PVTM'
              WHEN country IN ('BD','MM','KH','LA','BN') THEN 'BMKLB'
              WHEN country IS NULL THEN 'Unknown'
              ELSE 'Others' END AS market,
         country IN ('IN','ID','TH','PH','VN','TW','HK','SG','MY','BD','KH','LA','MM','BN')
           AS is_target
  FROM coded
)
SELECT market,
       CAST(CASE market WHEN 'Overall' THEN 0 WHEN 'IN' THEN 1 WHEN 'ID' THEN 2
            WHEN 'THS' THEN 3 WHEN 'PVTM' THEN 4 WHEN 'BMKLB' THEN 5
            WHEN 'Unknown' THEN 99 WHEN 'Others' THEN 100 ELSE 9999 END AS INT)
         AS market_order,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) FILTER (WHERE is_target) AS BIGINT) AS n_target_customers
FROM mapped GROUP BY market
"""


@query(
    "market_presentation_rollup",
    oracle=_MARKET_ORACLE,
    tags=("D6", "D8", "D12", "D13", "O4"),
)
def market_presentation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market grouping (D6) + target whitelist (D8) + presentation order
    key (D12) — all pure when-chains (no UDF tax), resolved map-side
    before a tiny rollup."""
    from taipei_bi_etl_spark.udfs import (
        map_markets,
        match_target_countries,
        order_markets,
    )

    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    iso = F.element_at(
        F.array(*[F.lit(x) for x in _ISO]),
        (F.col("n_nationkey") % 25 + 1).cast("int"),
    )
    coded = c.join(
        # bounded: nation (25 rows)
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).select("c_custkey", iso.alias("country"))
    mapped = coded.select(
        "c_custkey",
        map_markets(F.col("country")).alias("market"),
        match_target_countries(F.col("country")).alias("is_target"),
    )
    return mapped.groupBy("market").agg(
        order_markets(F.col("market")).cast("int").alias("market_order"),
        F.count(F.lit(1)).alias("n_customers"),
        F.count(F.when(F.col("is_target"), 1)).alias("n_target_customers"),
    )


_BATCH_SESSION_ORACLE = """
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
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_value_micros
FROM sess GROUP BY user_id, sid
"""


@query(
    "batch_session_window",
    oracle=_BATCH_SESSION_ORACLE,
    tags=("W2", "W3", "session"),
)
def batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window`` run as a plain BATCH aggregation — the same
    DataFrame program `streaming_sessionize` executes on the streaming
    runtime, proving the batch/streaming unification both ways (one
    oracle, two runtimes; the reference needs a LEAD rewrite for this,
    SURVEY §2.9).

    Scale: one shuffle on user_id; session merging is a sort within
    the partition — no state store in batch mode, no self-join.
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias(
                "sum_value_micros"
            ),
        )
        .select(
            "user_id",
            FN.unix_us(F.col("w.start")).alias("session_start_micros"),
            "n_events",
            "sum_value_micros",
        )
    )
