"""VARIANT ingest for the events pipeline (r04 VERDICT #6).

`modern_api.variant_props_rollup` makes the 100 TB argument in-plan:
parse JSON once, extract typed fields from the binary VARIANT encoding.
This module materializes that argument as the INGEST stage it implies —
the events table is written once with ``props_v = try_parse_json(props)``
alongside the raw string, and every downstream JSON-reading query runs
against the materialized column with ZERO string parses:

  * parquet stores VARIANT **shredded** (Spark 4 writes a
    ``typed_value`` struct with per-field typed columns), so
    ``try_variant_get(props_v, '$.k', 'long')`` downstream is a typed
    column read, not even a variant-binary decode, and it stays inside
    the scan's column pruning;
  * the validity decision (``props_v IS NOT NULL``) is computed once at
    ingest and inherited by every consumer, instead of re-deciding
    per query with a fresh parse (the r04 triple-parse regression
    class, VERDICT #2);
  * at 100 TB the ingest cost is paid once per day-partition while the
    parse cost it removes recurs in every one of the N downstream
    queries — the delta is measured in SCALE.md.

The reference's pipeline re-parses ping JSON in every task that touches
it (`tasks/base.py` hands raw JSON to each transform); this is the
Spark-first counterpart with the parse hoisted into the sink.

The materialized table is a content-keyed fixture under /tmp (same
discipline as tar_ingest: md5 of the SOURCE PARQUET BYTES keys the
cache, build-into-temp + atomic rename publishes it), so the driver,
the hostile sweep and the scale sweep each get a fixture built from
exactly the corpus they doctored.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from taipei_bi_etl_spark import functions as FN
from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


def _variant_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per source-content digest) the events table
    with a parsed ``props_v`` VARIANT column; return the table path."""
    from taipei_bi_etl_spark.io import content_keyed_fixture

    def build(data: str) -> None:
        ev = read_table(spark, sf_dir, "events")
        ev.select(
            "event_id", "ts", "user_id", "event_type", "value", "props",
            F.try_parse_json("props").alias("props_v"),
            # the full strict-props decision (parser terms + textual
            # contract, functions.json_strict) computed ONCE at ingest
            # — downstream consumers read one boolean instead of
            # re-running four regexes per query (the same
            # hoist-the-parse argument as props_v itself)
            F.coalesce(
                FN.json_strict(F.col("props")), F.lit(False)
            ).alias("props_strict"),
        ).write.mode("overwrite").parquet(data)

    # :v2 — r07 adds the materialized props_strict bit (strict textual
    # contract); the version bump re-keys fixtures built before it
    return content_keyed_fixture(
        sf_dir, "events.parquet", "taipei_variant_events", "v2", build
    )


def read_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingested events table: raw columns + ``props_v`` VARIANT."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(_variant_events_dir(spark, sf_dir))


# Validity note (r07): inclusion below is the materialized
# ``props_strict`` bit — functions.json_strict computed once at ingest
# (parser terms + the textual contract closing trailing-garbage and
# nested-dup-key shapes in BOTH directions).  props_strict implies
# props_v IS NOT NULL (json_strict contains the try_parse_json term).
# The DuckDB twin is functions.json_valid_strict_sql.

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


@query(
    "variant_ingest_kv_rollup",
    oracle=_KV_ORACLE,
    tags=("A6", "F18", "extension", "modern"),
)
def variant_ingest_kv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`json_kv_extract` routed through the VARIANT ingest: identical
    result (same oracle text), zero downstream JSON parses — validity
    is the materialized ``props_strict`` bit, extraction is a typed
    offset lookup (shredded: a plain column read)."""
    ev = read_events_variant(spark, sf_dir).filter(
        F.col("event_type").isNotNull() & F.col("props_strict")
    )
    # extract as TEXT then apply the integral-text contract: a typed
    # variant get coerces booleans (true->1) and truncates decimals,
    # diverging from the oracle's text extraction (r05 code review)
    k = FN.int_text(F.try_variant_get("props_v", "$.k", "string"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


_SCD2_V_ORACLE = r"""
WITH src AS (
    SELECT user_id, ts, event_id,
           TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                          AND regexp_matches(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k'),
                                             '^\s*-?[0-9]+\s*$')
                         THEN json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') END AS INT)
             AS attr_k
    FROM events
), src2 AS (
    SELECT * FROM src WHERE attr_k IS NOT NULL
), marked AS (
    SELECT user_id, ts, event_id, attr_k,
           CASE WHEN LAG(attr_k) OVER w IS DISTINCT FROM attr_k
                THEN 1 ELSE 0 END AS changed
    FROM src2
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
    SELECT user_id, attr_k, ts,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_ts
    FROM marked WHERE changed = 1
)
SELECT user_id,
       attr_k,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(COALESCE(epoch_us(next_ts), -1) AS BIGINT) AS valid_to_us,
       CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current
FROM changes
""".replace(  # strict-validity gate: dup-key / bare-nan shapes (r06)
    "json_valid(props)", FN.json_valid_strict_sql("props")
)


@query(
    "variant_ingest_scd2",
    oracle=_SCD2_V_ORACLE,
    tags=("extension", "modern", "scd2"),
)
def variant_ingest_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`scd2_dimension_build` routed through the VARIANT ingest — the
    biggest JSON-reading query in the bench gets its attr extraction
    from the shredded typed column.  Hash-equal to the string-parse
    form (same oracle shape as history._SCD2_ORACLE)."""
    ev = read_events_variant(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    src = ev.select(
        "user_id",
        "ts",
        "event_id",
        # props_strict gate (r07): a variant-parseable doc that fails
        # the textual contract (e.g. trailing garbage) must not carry
        # an attribute — matches the oracle's strict WHERE
        F.when(
            F.col("props_strict"),
            FN.int_text(F.try_variant_get("props_v", "$.k", "string")),
        )
        .try_cast("int")
        .alias("attr_k"),
    ).filter(F.col("attr_k").isNotNull())
    marked = src.withColumn(
        "changed",
        F.when(
            ~F.lag("attr_k").over(w).eqNullSafe(F.col("attr_k")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    changes = marked.filter(F.col("changed") == 1).withColumn(
        "next_ts", F.lead("ts").over(w)
    )
    return changes.select(
        "user_id",
        "attr_k",
        FN.unix_us("ts").alias("valid_from_us"),
        F.coalesce(FN.unix_us("next_ts"), F.lit(-1)).alias("valid_to_us"),
        F.when(F.col("next_ts").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_current"
        ),
    )
