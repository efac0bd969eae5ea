"""Array set-algebra batch: day-over-day behavioral overlap computed on
collected sets with ``array_intersect`` — the native ArrayType analogue
of the reference's ARRAY<STRUCT<key,value>> handling (SURVEY §1.2,
§2.10 D2/D3 ``F.transform`` cleanups), exercising the collect_set →
array-function → scalar pipeline that classifier feature builders use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

_OVERLAP_ORACLE = """
WITH d AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
    FROM events WHERE event_type IS NOT NULL
), ca AS (
    SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_types
    FROM d GROUP BY user_id, day
), common AS (
    SELECT a.user_id, a.day, CAST(COUNT(*) AS BIGINT) AS n_common
    FROM d a
    JOIN d b ON a.user_id = b.user_id
            AND b.day = a.day + INTERVAL 1 DAY
            AND a.event_type = b.event_type
    GROUP BY a.user_id, a.day
)
SELECT t.user_id, t.day,
       t.n_types AS n_today,
       n.n_types AS n_next,
       COALESCE(c.n_common, 0) AS n_common,
       t.n_types + n.n_types - COALESCE(c.n_common, 0) AS n_union
FROM ca t
JOIN ca n ON t.user_id = n.user_id AND n.day = t.day + INTERVAL 1 DAY
LEFT JOIN common c ON c.user_id = t.user_id AND c.day = t.day
"""


@query(
    "array_day_overlap",
    oracle=_OVERLAP_ORACLE,
    tags=("ext", "arrays", "A3"),
)
def array_day_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day event-type overlap per user: for each consecutive
    pair of active days, the sizes of today's set, tomorrow's set,
    their intersection and union — the Jaccard numerator/denominator of
    behavioral stability (the retention family's "did the user do the
    same things again", SURVEY §2.4 A5's measure axis).

    Spark-first shape: ONE pass builds the per-(user, day) type set
    with ``collect_set`` (sets are tiny — bounded by |event_type|
    vocabulary, not event count); a single self-join on (user, day+1)
    then computes all four numbers with ``array_intersect`` — set
    algebra runs as codegen'd array expressions on already-aggregated
    rows.  The oracle has no array types, so it proves the same numbers
    the relational way (distinct + equi-join + inclusion-exclusion).

    Scale: events shuffle once on (user_id, day) for the collect_set;
    the self-join shuffles |user-days| rows (4k per sf0.01 unit — three
    orders smaller than events) on user_id.  No explode-back: the
    arrays never leave the aggregated cardinality.
    """
    # collect_set SKIPS NULLs while the oracle's DISTINCT keeps them —
    # the set is over TYPED events in both engines (observed divergence)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    sets = (
        e.select("user_id", F.to_date("ts").alias("day"), "event_type")
        .groupBy("user_id", "day")
        .agg(F.collect_set("event_type").alias("types"))
    )
    nxt = sets.select(
        F.col("user_id").alias("n_user_id"),
        F.col("day").alias("n_day"),
        F.col("types").alias("n_types_arr"),
    )
    joined = sets.join(
        nxt,
        (sets["user_id"] == nxt["n_user_id"])
        & (nxt["n_day"] == F.date_add(sets["day"], 1)),
    )
    n_today = F.size("types").cast("long")
    n_next = F.size("n_types_arr").cast("long")
    n_common = F.size(F.array_intersect("types", "n_types_arr")).cast("long")
    return joined.select(
        "user_id",
        "day",
        n_today.alias("n_today"),
        n_next.alias("n_next"),
        n_common.alias("n_common"),
        (n_today + n_next - n_common).alias("n_union"),
    )
