"""The reference's core telemetry chain re-expressed Spark-first:

  mango_events (sql/mango_events.sql: ping scan + daily filter)
  → mango_events_unnested (sql/mango_events_unnested.sql: UNNEST(events)
    + D1 positional parse + D2/D3 cleanup)
  → mango_events_feature_mapping (sql/mango_events_feature_mapping.sql:
    kv extraction + LEFT JOIN UNNEST extra + D4 rule engine + 3-way
    feature/vertical/app fan-out)

The synthetic ``events`` table lacks telemetry ping structure, so
:func:`synthesize_pings` derives a deterministic ping stream from it
(vocabulary chosen to exercise the D4 rule-sets).  Everything after that
is the faithful operator chain; at 100 TB the chain is shuffle-free until
the final rollup (parse/explode/mapping are all map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark import functions as FN

from taipei_bi_etl_spark.feature_mapping import feature_mapping
from taipei_bi_etl_spark.functions import kv_get
from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.udfs import cleanup_extra, json_extract_events

_METHODS = ["click", "open", "change", "launch", "show", "type_query", "end", "share"]
_OBJECTS = ["tab", "panel", "home", "search_bar", "content_tab", "toolbar", "app", "setting"]
_VALUES = ["link", "history", "lifefeed_ec", "tab_swipe", "share", "bookmark", "download", ""]
_VERTICALS = ["all", "shopping", "lifestyle", "game", "travel", ""]
_SOURCES = ["bukalapak", "google", "dailyhunt", "zzz"]


def synthesize_pings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a telemetry-ping-shaped stream from the synthetic events
    table: one ping per event with a positional-JSON events payload
    (the shape udf_js/json_extract_events.sql parses)."""
    ev = read_table(spark, sf_dir, "events")

    def pick(vocab: list[str], salt: int) -> F.Column:
        arr = F.array(*[F.lit(x) for x in vocab])
        return F.element_at(arr, (F.pmod(F.col("event_id") + salt, F.lit(len(vocab))) + 1).cast("int"))

    payload = F.concat(
        F.lit('[['), FN.unix_ms(F.col("ts")).cast("string"),
        F.lit(',"action","'), pick(_METHODS, 1),
        F.lit('","'), pick(_OBJECTS, 3),
        F.lit('","'), pick(_VALUES, 5),
        F.lit('",{"vertical":"'), pick(_VERTICALS, 7),
        F.lit('","source":"'), pick(_SOURCES, 11),
        F.lit('"}]]'),
    )
    return ev.select(
        F.col("user_id").alias("client_id"),
        F.col("ts").alias("submission_timestamp"),
        F.to_date("ts").alias("submission_date"),
        payload.alias("events_json"),
        F.array(
            F.struct(F.lit("Pref_Search_Engine").alias("key"), F.lit("google").alias("value"))
        ).alias("settings"),
    )


def unnest_events(pings: DataFrame) -> DataFrame:
    """mango_events_unnested: positional parse (D1) + per-event explode +
    extra cleanup (D2).  Pure map-side — no shuffle."""
    parsed = pings.withColumn("event", F.explode(json_extract_events("events_json")))
    return parsed.select(
        "client_id",
        "submission_timestamp",
        "submission_date",
        "settings",
        F.col("event.event_timestamp").alias("event_timestamp"),
        F.col("event.event_category").alias("event_category"),
        F.col("event.event_method").alias("event_method"),
        F.col("event.event_object").alias("event_object"),
        F.col("event.event_value").alias("event_value"),
        cleanup_extra(F.col("event.event_extra")).alias("event_extra"),
    )


def map_features(unnested: DataFrame) -> DataFrame:
    """mango_events_feature_mapping: kv extraction (A6), LEFT JOIN UNNEST
    of event_extra (J8/explode_outer), D4 rule cascade, then the 3-way
    feature/vertical/app fan-out (U1) as a single-pass explode."""
    enriched = unnested.select(
        "*",
        F.coalesce(kv_get("event_extra", "vertical"), F.lit("")).alias("event_vertical"),
        F.coalesce(F.lower(kv_get("settings", "pref_search_engine")), F.lit("")).alias(
            "settings_search_engine"
        ),
    )
    flat = enriched.select(
        "*",
        F.explode_outer("event_extra").alias("extra"),
    ).select(
        "*",
        F.coalesce(F.lower(F.col("extra.key")), F.lit("")).alias("extra_key"),
        F.coalesce(F.lower(F.col("extra.value")), F.lit("")).alias("extra_value"),
    )
    mapped = flat.withColumn(
        "map",
        feature_mapping(
            F.col("event_method"), F.col("event_object"), F.col("event_value"),
            F.col("extra_key"), F.col("extra_value"), F.col("event_vertical"),
            F.col("settings_search_engine"),
        ),
    )
    # 3-way fan-out: Feature rows (one per mapped feature) ∪ Vertical ∪ App,
    # expressed as one explode over a built array instead of 3 passes
    # (SURVEY §2.7 U1 preferred form).
    fan = F.concat(
        F.transform(
            F.col("map.feature"),
            lambda x: F.struct(F.lit("Feature").alias("feature_type"), x.alias("feature_name")),
        ),
        F.array(
            F.struct(F.lit("Vertical").alias("feature_type"), F.col("map.vertical").alias("feature_name")),
            F.struct(F.lit("App").alias("feature_type"), F.col("map.app").alias("feature_name")),
        ),
    )
    return mapped.select(
        "client_id", "submission_timestamp", "submission_date",
        "event_method", "event_object", "event_value",
        "extra_key", "extra_value", "event_vertical",
        F.explode(fan).alias("f"),
    ).select(
        "client_id", "submission_timestamp", "submission_date",
        "event_method", "event_object", "event_value",
        "extra_key", "extra_value", "event_vertical",
        F.col("f.feature_type").alias("feature_type"),
        F.col("f.feature_name").alias("feature_name"),
    )


def feature_usage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: pings → unnest → mapping → daily per-feature usage
    (the input to the reference's cohort/RFE chain)."""
    fanned = map_features(unnest_events(synthesize_pings(spark, sf_dir)))
    return fanned.groupBy("submission_date", "feature_type", "feature_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("client_id").alias("n_clients"),
    )
