"""Driver-facing parity queries for the full 18-task mango DAG
(plans/mango_dag.py): each new pipeline node's SHAPE as a one-shot
query with a DuckDB oracle twin, so the driver hash-checks the exact
semantics the DAG materializes (the DAG's write/cleanup mechanics are
gated separately in tests/test_mango_full_dag.py).

The oracle side re-derives the synthesized telemetry surface in closed
form — every field of ``synthesize_full_pings`` / ``map_features_full``
is deterministic digit-stride modular arithmetic over event_id/user_id
(plans/telemetry_pipeline.py), and the D4 rule cascade compiles itself
to DuckDB SQL (`feature_mapping.feature_mapping_sql`), so the WHOLE
chain — JSON ping parse, D2 cleanup (url_counts+1 workaround), kv
session metrics, outer-lateral extras, 150-rule cascade, 3-way fan-out
— is hash-verified cross-engine, then each downstream table shape on
top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


def _lst(vocab) -> str:
    return "[" + ", ".join("'" + x + "'" for x in vocab) + "]"


def _full_fm_cte() -> str:
    """DuckDB WITH-chain ending in ``fanned`` — the full
    mango_events_feature_mapping surface (one row per (event, extra,
    fan-arm)) mirroring plans/telemetry_pipeline.py exactly."""
    from taipei_bi_etl_spark.feature_mapping import feature_mapping_sql
    from taipei_bi_etl_spark.plans import telemetry_pipeline as tp

    fm = feature_mapping_sql()
    lists = ", ".join(f"{sql} AS l_{name.lower()}" for name, sql in fm.items())
    nonempty = {name: f"len(l_{name.lower()}) > 0" for name in fm}
    cascade = " ".join(
        f"WHEN {c} THEN l_{n.lower()}" for n, c in nonempty.items()
    )
    vert_case = " ".join(f"WHEN {c} THEN '{n}'" for n, c in nonempty.items())
    any_match = " OR ".join(nonempty.values())
    carried = (
        "client_id, submission_date, os, country, event_timestamp, "
        "event_method, event_object, event_value, extra_key, extra_value, "
        "event_vertical, session_time, url_counts, app_link_install, "
        "app_link_open, show_keyboard"
    )
    return f"""
base AS (
  SELECT user_id AS client_id,
         CAST(ts AS DATE) AS submission_date,
         ({_lst(tp._OSES)})[(user_id % {len(tp._OSES)}) + 1] AS os,
         ({_lst(tp._COUNTRIES)})[(user_id % {len(tp._COUNTRIES)}) + 1]
           AS country,
         epoch_ms(ts) AS event_timestamp,
         ({_lst(tp._METHODS_FULL)})[((event_id + 1) % 8) + 1] AS event_method,
         ({_lst(tp._OBJECTS_FULL)})[((event_id // 8 + 3) % 8) + 1]
           AS event_object,
         ({_lst(tp._VALUES)})[((event_id // 64 + 5) % 8) + 1] AS event_value,
         ({_lst(tp._VERTICALS)})[((event_id // 5 + 7) % 6) + 1]
           AS event_vertical,
         ({_lst(tp._SOURCES)})[((event_id // 7 + 11) % 4) + 1] AS src,
         'google' AS settings_search_engine,
         CASE WHEN event_id % 3 = 0 THEN (event_id * 37) % 200000 END
           AS session_time,
         CASE WHEN event_id % 3 = 0 THEN (event_id % 7) + 1 END
           AS url_counts,  -- +1: the D2 cleanup_extra bug workaround
         CASE WHEN event_id % 11 = 0 THEN 1 END AS app_link_install,
         CASE WHEN event_id % 11 = 1 THEN 1 END AS app_link_open,
         CASE WHEN event_id % 13 = 0 THEN 1 END AS show_keyboard,
         event_id
  FROM events
), extra_rows AS (
  SELECT *, 'vertical' AS extra_key, event_vertical AS extra_value FROM base
  UNION ALL
  SELECT *, 'source', src FROM base
  UNION ALL
  SELECT *, 'session_time', CAST((event_id * 37) % 200000 AS VARCHAR)
  FROM base WHERE event_id % 3 = 0
  UNION ALL
  SELECT *, 'url_counts', CAST((event_id % 7) + 1 AS VARCHAR)
  FROM base WHERE event_id % 3 = 0
  UNION ALL
  SELECT *, 'app_link', 'install' FROM base WHERE event_id % 11 = 0
  UNION ALL
  SELECT *, 'app_link', 'open' FROM base WHERE event_id % 11 = 1
  UNION ALL
  SELECT *, 'show_keyboard', 'true' FROM base WHERE event_id % 13 = 0
), listed AS (
  SELECT *, {lists} FROM extra_rows
), mapped AS (
  SELECT {carried},
         CASE {cascade} ELSE ['feature: others'] END AS features,
         CASE {vert_case} ELSE 'Others' END AS vertical,
         CASE WHEN {any_match} THEN 'App' ELSE 'Others' END AS app
  FROM listed
), fanned AS (
  SELECT {carried}, 'Feature' AS feature_type,
         UNNEST(features) AS feature_name
  FROM mapped
  UNION ALL
  SELECT {carried}, 'Vertical', vertical FROM mapped
  UNION ALL
  SELECT {carried}, 'App', app FROM mapped
)"""


def _spark_fm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from taipei_bi_etl_spark.plans.telemetry_pipeline import (
        map_features_full,
        synthesize_full_pings,
        unnest_events_full,
    )

    return map_features_full(
        unnest_events_full(synthesize_full_pings(spark, sf_dir))
    )


# ---------------------------------------------------------------------------
# mango_events_feature_mapping — the full-surface chain, rolled up.
# ---------------------------------------------------------------------------

_SURFACE_ORACLE = f"""
WITH {_full_fm_cte()}
SELECT submission_date, feature_type, feature_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT client_id) AS BIGINT) AS n_clients,
       CAST(SUM(session_time) AS BIGINT) AS sum_session_time,
       CAST(SUM(url_counts) AS BIGINT) AS sum_url_counts,
       CAST(SUM(app_link_install) AS BIGINT) AS sum_app_link_install,
       CAST(SUM(app_link_open) AS BIGINT) AS sum_app_link_open,
       CAST(SUM(show_keyboard) AS BIGINT) AS sum_show_keyboard
FROM fanned
GROUP BY 1, 2, 3
"""


@query(
    "mango_feature_surface_rollup",
    oracle=_SURFACE_ORACLE,
    tags=("mango", "D1", "D2", "D4", "U1", "A6"),
)
def mango_feature_surface_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full mango_events_feature_mapping column surface
    (sql/mango_events_feature_mapping.sql:1-106) hash-checked end to
    end: ping parse → D2 cleanup (incl. the url_counts+1 workaround) →
    kv session metrics → outer-lateral extras → D4 cascade → 3-way
    fan-out, rolled up per (day, feature).  This is the load-bearing
    correctness gate for the whole DAG: every downstream cohort / RFE /
    retention table consumes exactly these rows.

    Scale: the chain is map-side until this rollup's single hash
    aggregate; the fan-out explode multiplies rows before the shuffle
    but the partial aggregate collapses them map-side."""
    fm = _spark_fm(spark, sf_dir)
    return fm.groupBy("submission_date", "feature_type", "feature_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("client_id").alias("n_clients"),
        F.sum("session_time").alias("sum_session_time"),
        F.sum("url_counts").alias("sum_url_counts"),
        F.sum("app_link_install").alias("sum_app_link_install"),
        F.sum("app_link_open").alias("sum_app_link_open"),
        F.sum("show_keyboard").alias("sum_show_keyboard"),
    )


# ---------------------------------------------------------------------------
# mango_user_channels — the 5-arm attribution union, snapshot form.
# ---------------------------------------------------------------------------

AS_OF = "2024-01-30"


def _channel_dim_values() -> str:
    rows = []
    for i in range(1, 9):
        rows.append(
            f"('net{i % 4}', 'nt{i}', 'camp{i % 3}', 'ct{i}', "
            f"'adg{i % 2}', 'at{i}', 'cre{i}', 'crt{i}')"
        )
    return ",\n    ".join(rows)


def _user_channels_oracle() -> str:
    from taipei_bi_etl_spark.plans import telemetry_pipeline as tp

    toks = ", ".join(
        "NULL" if t is None else f"'{t}'" for t in tp._TRACKER_TOKENS
    )
    arm_cols = """settings.client_id, settings.tracker_token,
           settings.install_referrer,
           ch.network_name, ch.network_token, ch.campaign_name,
           ch.campaign_token, ch.adgroup_name, ch.adgroup_token,
           ch.creative_name, ch.creative_token, settings.execution_date"""
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT {arm_cols}
  FROM settings JOIN channels ch ON settings.tracker_token = ch.{alt}"""
        for alt in (
            "network_token", "campaign_token", "adgroup_token",
            "creative_token",
        )
    )
    return f"""
WITH channels(network_name, network_token, campaign_name, campaign_token,
              adgroup_name, adgroup_token, creative_name, creative_token)
AS (
  VALUES
    {_channel_dim_values()}
),
settings AS (
  SELECT user_id AS client_id,
         ([{toks}])[(user_id % 6) + 1] AS tracker_token,
         'ref-' || CAST(user_id % 4 AS VARCHAR) AS install_referrer,
         MAX(CAST(ts AS DATE)) AS execution_date
  FROM events
  WHERE CAST(ts AS DATE) <= DATE '{AS_OF}'
  GROUP BY 1, 2, 3
),
unioned AS (
{arms}
  UNION ALL
  SELECT client_id, tracker_token, install_referrer,
         NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, execution_date
  FROM settings WHERE tracker_token IS NULL
),
defaults AS (
  SELECT client_id, tracker_token, install_referrer,
         COALESCE(network_name, 'unknown') AS network_name,
         COALESCE(network_token, '0') AS network_token,
         COALESCE(campaign_name, 'unknown') AS campaign_name,
         COALESCE(campaign_token, '0') AS campaign_token,
         COALESCE(adgroup_name, 'unknown') AS adgroup_name,
         COALESCE(adgroup_token, '0') AS adgroup_token,
         COALESCE(creative_name, 'unknown') AS creative_name,
         COALESCE(creative_token, '0') AS creative_token,
         execution_date
  FROM unioned
)
SELECT * FROM defaults
QUALIFY RANK() OVER (PARTITION BY client_id ORDER BY creative_token ASC) = 1
"""


@query(
    "mango_user_channels_snapshot",
    oracle=_user_channels_oracle(),
    tags=("mango", "J1", "U2", "W1"),
)
def mango_user_channels_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mango_user_channels as a one-shot snapshot
    (init_mango_user_channels.sql semantics, as-of {AS_OF}): per-client
    tracker settings (kv MAX over the settings array) → 5-arm alt-key
    union against the broadcast tracker dim → IFNULL defaults →
    RANK()=1 creative-token dedup, preserving the reference's
    keep-ties RANK (not ROW_NUMBER) semantics.

    Scale: the dim side is broadcast in all four arms (tokens are
    disjoint across levels so each settings row matches ≤1 arm); the
    only shuffle is the per-client window, keyed on client_id."""
    from taipei_bi_etl_spark.plans.mango_dag import (
        tracker_settings,
        user_channels_from,
    )
    from taipei_bi_etl_spark.plans.telemetry_pipeline import (
        channel_mapping_table,
        synthesize_full_pings,
    )

    pings = synthesize_full_pings(spark, sf_dir).withColumn(
        "day", F.col("submission_date")
    )
    settings = tracker_settings(pings, AS_OF, lo_date="1970-01-01")
    return user_channels_from(
        settings, channel_mapping_table(spark)
    ).drop("day")


# ---------------------------------------------------------------------------
# mango_revenue_google — searches explode + outlier cap + rate join.
# ---------------------------------------------------------------------------


def _revenue_oracle() -> str:
    from taipei_bi_etl_spark.plans import telemetry_pipeline as tp

    rates = ",\n    ".join(
        f"('{c}', {round(0.001 * (i + 1), 6)})"
        for i, c in enumerate(tp._COUNTRIES)
    )
    return f"""
WITH rps(country, rps) AS (
  VALUES
    {rates}
),
core AS (
  SELECT user_id AS client_id,
         CAST(ts AS DATE) AS submission_date,
         CASE WHEN event_id % 41 = 0 THEN 'OtherApp' ELSE 'Zerda' END
           AS app_name,
         ({_lst(tp._OSES)})[(user_id % {len(tp._OSES)}) + 1] AS os,
         CASE WHEN event_id % 29 = 0 THEN '??'
              ELSE ({_lst(tp._COUNTRIES)})[(user_id % {len(tp._COUNTRIES)}) + 1]
         END AS geo_country,
         ({_lst(tp._ENTRYPOINTS)})[(event_id % {len(tp._ENTRYPOINTS)}) + 1]
           AS entrypoint,
         CASE WHEN event_id % 97 = 0 THEN 20000
              ELSE (event_id * 13) % 50 + 1 END AS volume
  FROM events
),
vol AS (
  SELECT submission_date AS utc_date, geo_country AS country, entrypoint,
         SUM(volume) AS volume
  FROM core
  WHERE app_name = 'Zerda' AND os = 'Android'
    AND volume < 10000 AND entrypoint LIKE '%google%'
  GROUP BY 1, 2, 3
)
SELECT 'estimated' AS conversion_status,
       'Android' AS os,
       vol.country,
       utc_date,
       '+00:00' AS tz,
       'google' AS source,
       CAST(volume AS DOUBLE) AS sales_amount,
       ROUND(volume * CAST(rps.rps AS DOUBLE), 6) AS payout,
       'USD' AS currency,
       entrypoint AS fx_defined1
FROM vol
LEFT JOIN rps ON vol.country = rps.country
"""


@query(
    "mango_revenue_google_estimate",
    oracle=_revenue_oracle(),
    tags=("mango", "J7", "J9", "P9"),
)
def mango_revenue_google_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mango_revenue_google (sql/mango_revenue_google.sql:1-43) over
    the whole core stream: searches-map explode (J7), the <10000
    outlier cap (P9), the %google% entrypoint filter (P5), and the
    broadcast rate join (J9) producing estimated revenue rows.

    Scale: explode fans each ping to |searches| rows map-side; the
    rollup is one hash aggregate on (date, country, entrypoint) —
    bounded keys — and the rate dim broadcasts."""
    from taipei_bi_etl_spark.plans.telemetry_pipeline import (
        google_rps_table,
        synthesize_core_pings,
    )

    core = synthesize_core_pings(spark, sf_dir)
    vol = (
        core.filter((F.col("app_name") == "Zerda") & (F.col("os") == "Android"))
        .select(
            F.col("submission_date").alias("utc_date"),
            F.col("geo_country").alias("country"),
            F.explode("searches").alias("entrypoint", "v"),
        )
        .filter((F.col("v") < 10000) & F.col("entrypoint").like("%google%"))
        .groupBy("utc_date", "country", "entrypoint")
        .agg(F.sum("v").alias("volume"))
    )
    rps = google_rps_table(spark)
    return vol.join(F.broadcast(rps), "country", "left").select(
        F.lit("estimated").alias("conversion_status"),
        F.lit("Android").alias("os"),
        "country",
        "utc_date",
        F.lit("+00:00").alias("tz"),
        F.lit("google").alias("source"),
        F.col("volume").cast("double").alias("sales_amount"),
        F.round(F.col("volume") * F.col("rps"), 6).alias("payout"),
        F.lit("USD").alias("currency"),
        F.col("entrypoint").alias("fx_defined1"),
    )
