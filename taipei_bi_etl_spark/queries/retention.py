"""Full-width cohort retention pivot — the reference centerpiece at its
REAL grain (`/root/reference/sql/mango_cohort_retained_users.sql:1-36`):
22 conditional COUNT(DISTINCT)s over three calendar grains

  days   {0, 1, 3, 7, 14, 28, 56, 84}
  weeks  {0, 1, 2, 3, 4, 8, 12}      (occur_week  = floor(occur_day/7))
  months {0, 1, 2, 3}                (occur_month = floor(occur_day/28))

grouped by (os, country, measure_type, cohort_level, cohort_name,
cohort_date), windowed to the rolling 112 days ending at the execution
date (`:29-33`), with the execution date stamped on every row (`:6`).
The companion rolling-window wipe
(`sql/cleanup_mango_cohort_retained_users.sql`) is a DAG write policy —
see `plans/mango_dag.py`; HERE the whole window computes in one plan so
the oracle can hash-check all 22 columns.

The r01 `cohort_retention` query (6 aggregates, day grain only) stays
registered as the compact teaching form; this is the parity form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

AS_OF = "2024-01-30"
WINDOW_DAYS = 112

_DAY_POINTS = (1, 3, 7, 14, 28, 56, 84)
_WEEK_POINTS = (1, 2, 3, 4, 8, 12)
_MONTH_POINTS = (1, 2, 3)

# Deterministic user dims (same modular-arithmetic convention as the
# telemetry ping synthesis — the oracle mirrors it exactly).
_OSES = ["Android", "iOS"]
_COUNTRIES = ["ID", "IN", "TW", "TH", "VN"]


def _dims_sql() -> tuple[str, str]:
    os_l = "[" + ", ".join(f"'{x}'" for x in _OSES) + "]"
    cc_l = "[" + ", ".join(f"'{x}'" for x in _COUNTRIES) + "]"
    return (
        f"({os_l})[(user_id % {len(_OSES)}) + 1]",
        f"({cc_l})[(user_id % {len(_COUNTRIES)}) + 1]",
    )


def _retained_cols_sql() -> str:
    parts = [
        "COUNT(DISTINCT CASE WHEN occur_day = 0 THEN user_id END)"
        " AS daily_cohort_size"
    ]
    parts += [
        f"COUNT(DISTINCT CASE WHEN occur_day = {n} THEN user_id END)"
        f" AS d{n}_retained_users"
        for n in _DAY_POINTS
    ]
    parts.append(
        "COUNT(DISTINCT CASE WHEN occur_week = 0 THEN user_id END)"
        " AS weekly_cohort_size"
    )
    parts += [
        f"COUNT(DISTINCT CASE WHEN occur_week = {n} THEN user_id END)"
        f" AS w{n}_retained_users"
        for n in _WEEK_POINTS
    ]
    parts.append(
        "COUNT(DISTINCT CASE WHEN occur_month = 0 THEN user_id END)"
        " AS monthly_cohort_size"
    )
    parts += [
        f"COUNT(DISTINCT CASE WHEN occur_month = {n} THEN user_id END)"
        f" AS m{n}_retained_users"
        for n in _MONTH_POINTS
    ]
    return ",\n       ".join(parts)


def _full_retention_oracle() -> str:
    os_sql, cc_sql = _dims_sql()
    return f"""
WITH days AS (
  SELECT DISTINCT user_id,
         {os_sql} AS os,
         {cc_sql} AS country,
         event_type AS cohort_name,
         CAST(ts AS DATE) AS day
  FROM events
), cohort AS (
  SELECT user_id, os, country, cohort_name, MIN(day) AS cohort_date
  FROM days GROUP BY 1, 2, 3, 4
), occ AS (
  SELECT d.user_id, d.os, d.country, d.cohort_name, c.cohort_date,
         datediff('day', c.cohort_date, d.day) AS occur_day,
         datediff('day', c.cohort_date, d.day) // 7 AS occur_week,
         datediff('day', c.cohort_date, d.day) // 28 AS occur_month
  FROM days d
  JOIN cohort c USING (user_id, os, country, cohort_name)
  WHERE c.cohort_date <= DATE '{AS_OF}'
    AND c.cohort_date >= DATE '{AS_OF}' - {WINDOW_DAYS}
    AND d.day <= DATE '{AS_OF}'
    AND d.day >= DATE '{AS_OF}' - {WINDOW_DAYS}
    AND datediff('day', c.cohort_date, d.day) BETWEEN 0 AND {WINDOW_DAYS}
)
SELECT os, country,
       'feature' AS measure_type,
       'Feature' AS cohort_level,
       cohort_name,
       cohort_date,
       DATE '{AS_OF}' AS execution_date,
       {_retained_cols_sql()}
FROM occ
GROUP BY os, country, cohort_name, cohort_date
"""


@query(
    "cohort_retention_full",
    oracle=_full_retention_oracle(),
    tags=("A5", "A2", "F3", "F16", "flagship"),
)
def cohort_retention_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 22-aggregate retention pivot at reference grain.

    Scale design — the Expand-free rewrite generalized to three grains:
    a naive 22-way COUNT(DISTINCT CASE ...) makes Spark plan a 22-way
    Expand (22× the shuffle volume of the input).  Instead:

    1. ONE shuffle keyed on (user, os, country, cohort_name) builds, in
       the SAME aggregate, the true full-history cohort_date (MIN over
       unfiltered days — the reference precomputes first-activity over
       all history, so a user whose first day precedes AS_OF-112 must
       NOT be re-cohorted to their first in-window day) and the
       window-filtered distinct-day set (collect_set over a
       null-when-out-of-window projection; collect_set drops nulls, so
       per-user state stays bounded at ≤113 days even on full history).
    2. Per user-cohort, the day set maps to three BOUNDED arrays of
       distinct (grain, index) pairs — occur days, array_distinct of
       floor(d/7), floor(d/28) — ≤ 113+17+5 entries regardless of how
       hot the user is.
    3. One explode of the tagged concat yields rows UNIQUE per
       (user-cohort, grain, index) by construction, so every
       COUNT(DISTINCT CASE) collapses to a plain conditional COUNT —
       single-pass hash aggregate, no Expand, exact.

    The 112-day window filters land BEFORE the explode, so the state the
    second shuffle carries is the retention calendar, not raw events.
    """
    as_of = F.lit(AS_OF).cast("date")
    lo = F.date_sub(as_of, WINDOW_DAYS)
    ev = read_table(spark, sf_dir, "events")
    os_c = F.element_at(
        F.array(*[F.lit(x) for x in _OSES]),
        (F.col("user_id") % len(_OSES) + 1).cast("int"),
    )
    cc_c = F.element_at(
        F.array(*[F.lit(x) for x in _COUNTRIES]),
        (F.col("user_id") % len(_COUNTRIES) + 1).cast("int"),
    )
    per_user = (
        ev.select(
            "user_id",
            os_c.alias("os"),
            cc_c.alias("country"),
            F.col("event_type").alias("cohort_name"),
            F.to_date("ts").alias("day"),
        )
        .groupBy("user_id", "os", "country", "cohort_name")
        .agg(
            F.min("day").alias("cohort_date"),
            F.collect_set(
                F.when(
                    (F.col("day") <= as_of) & (F.col("day") >= lo),
                    F.col("day"),
                )
            ).alias("days"),
        )
        .filter(
            (F.col("cohort_date") <= as_of) & (F.col("cohort_date") >= lo)
        )
    )
    # distinct occur-day / -week / -month indices per user-cohort,
    # tagged so one explode serves all three grains
    occ_days = F.filter(
        F.transform(
            "days", lambda d: F.datediff(d, F.col("cohort_date"))
        ),
        lambda x: (x >= 0) & (x <= WINDOW_DAYS),
    )
    tagged = F.concat(
        F.transform(
            occ_days,
            lambda d: F.struct(F.lit("d").alias("g"), d.alias("i")),
        ),
        F.transform(
            F.array_distinct(
                F.transform(occ_days, lambda d: F.floor(d / 7))
            ),
            lambda w: F.struct(F.lit("w").alias("g"), w.cast("int").alias("i")),
        ),
        F.transform(
            F.array_distinct(
                F.transform(occ_days, lambda d: F.floor(d / 28))
            ),
            lambda m: F.struct(F.lit("m").alias("g"), m.cast("int").alias("i")),
        ),
    )
    occ = per_user.select(
        "os", "country", "cohort_name", "cohort_date",
        F.explode(tagged).alias("t"),
    ).select(
        "os", "country", "cohort_name", "cohort_date",
        F.col("t.g").alias("g"), F.col("t.i").alias("i"),
    )

    def cnt(g: str, i: int, alias: str):
        return F.count(
            F.when((F.col("g") == g) & (F.col("i") == i), 1)
        ).alias(alias)

    aggs = [cnt("d", 0, "daily_cohort_size")]
    aggs += [cnt("d", n, f"d{n}_retained_users") for n in _DAY_POINTS]
    aggs += [cnt("w", 0, "weekly_cohort_size")]
    aggs += [cnt("w", n, f"w{n}_retained_users") for n in _WEEK_POINTS]
    aggs += [cnt("m", 0, "monthly_cohort_size")]
    aggs += [cnt("m", n, f"m{n}_retained_users") for n in _MONTH_POINTS]
    return (
        occ.groupBy("os", "country", "cohort_name", "cohort_date")
        .agg(*aggs)
        .select(
            "os",
            "country",
            F.lit("feature").alias("measure_type"),
            F.lit("Feature").alias("cohort_level"),
            "cohort_name",
            "cohort_date",
            F.lit(AS_OF).cast("date").alias("execution_date"),
            *[
                c
                for c in [
                    "daily_cohort_size",
                    *[f"d{n}_retained_users" for n in _DAY_POINTS],
                    "weekly_cohort_size",
                    *[f"w{n}_retained_users" for n in _WEEK_POINTS],
                    "monthly_cohort_size",
                    *[f"m{n}_retained_users" for n in _MONTH_POINTS],
                ]
            ],
        )
    )
