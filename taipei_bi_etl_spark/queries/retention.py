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
  FROM events WHERE event_type IS NOT NULL
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


_PIVOT_COLS = (
    "daily_cohort_size",
    *[f"d{n}_retained_users" for n in _DAY_POINTS],
    "weekly_cohort_size",
    *[f"w{n}_retained_users" for n in _WEEK_POINTS],
    "monthly_cohort_size",
    *[f"m{n}_retained_users" for n in _MONTH_POINTS],
)


def _user_day_dims(ev: DataFrame) -> DataFrame:
    """(user_id, os, country, cohort_name, day) projection with the
    deterministic modular user dims."""
    os_c = F.element_at(
        F.array(*[F.lit(x) for x in _OSES]),
        (F.col("user_id") % len(_OSES) + 1).cast("int"),
    )
    cc_c = F.element_at(
        F.array(*[F.lit(x) for x in _COUNTRIES]),
        (F.col("user_id") % len(_COUNTRIES) + 1).cast("int"),
    )
    # a cohort needs a NAME: untyped events join no cohort (oracle
    # WHERE twin; also shared by ivm_store.retention_state_*)
    return ev.filter(F.col("event_type").isNotNull()).select(
        "user_id",
        os_c.alias("os"),
        cc_c.alias("country"),
        F.col("event_type").alias("cohort_name"),
        F.to_date("ts").alias("day"),
    )


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
    return _full_pivot(spark, sf_dir, AS_OF)


def _full_pivot(spark: SparkSession, sf_dir: str, as_of_str: str) -> DataFrame:
    return _pivot_from_events(read_table(spark, sf_dir, "events"), as_of_str)


def _pivot_from_events(ev: DataFrame, as_of_str: str) -> DataFrame:
    """The full 22-aggregate pivot from an arbitrary events frame —
    shared by the sf_dir-reading queries above and the stored-state IVM
    (`taipei_bi_etl_spark.ivm_store`) so both derive from one body."""
    as_of = F.lit(as_of_str).cast("date")
    lo = F.date_sub(as_of, WINDOW_DAYS)
    per_user = (
        _user_day_dims(ev)
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
            F.lit(as_of_str).cast("date").alias("execution_date"),
            *_PIVOT_COLS,
        )
    )


# ---------------------------------------------------------------------------
# Incremental (IVM) maintenance of the retention pivot — VERDICT r03 #5.
# ---------------------------------------------------------------------------

AS_OF_PREV = "2024-01-29"  # AS_OF - 1 day


@query(
    "cohort_retention_incremental",
    oracle=_full_retention_oracle(),
    tags=("A5", "ivm", "streaming", "extension"),
)
def cohort_retention_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL incremental pattern
    (`sql/mango_feature_cohort_date.sql:20-35` merges yesterday's
    cohort table with today's new users;
    `sql/mango_cohort_retained_users.sql:30-33` appends today's
    occurrences) applied as true delta maintenance of the 22-aggregate
    pivot — the `ivm.py` Δ-join idea specialized to retention.

    Key invariant that makes the pivot delta-maintainable: a cell
    (cohort c, offset n) counts distinct users occurring at day c+n,
    and since c ≥ T−112 implies every occurrence day c+n ≥ T−112, the
    window clip never removes occurrences from in-window cohorts —
    cells are FROZEN once written.  Moving the execution date T−1 → T
    therefore only (a) drops cohorts that age past T−112, (b) adds the
    c = T cohort, and (c) increments cells touched by day-T events:
    the day-offset cell n = T−c always (calendar days are distinct per
    user), the week/month cells only when day T opens a NEW week/month
    bucket for that user — decided against the user's prior-day state,
    exactly the append-only occurrence table the reference maintains.

    This query materializes yesterday's state with the full path (the
    simulation of the warehouse's T−1 artifacts), applies the day-T
    delta, and returns the updated pivot; its oracle is the FULL
    recompute at T, so the driver gate hash-proves
    incremental == full — the IVM equivalence, not a weaker rows-only
    check.

    Scale: the delta side touches ONE day of events joined against the
    bounded per-user window state (≤113 days/user), then a cohort-key
    merge against yesterday's pivot — cost ∝ |day T|, flat as history
    grows (tools/retention_ivm_stress.py measures this).
    """
    t = F.lit(AS_OF).cast("date")
    lo_t = F.date_sub(t, WINDOW_DAYS)
    ud = _user_day_dims(read_table(spark, sf_dir, "events"))
    # the scaffold's day-partition split (r09, VERDICT r08 #6):
    # history = strictly before T (≡ day ≤ T−1), today = T's partition
    from taipei_bi_etl_spark.queries.incremental import date_cut_split

    hist_ud, today_ud = date_cut_split(ud, "day", AS_OF)

    # --- yesterday's per-user state (the occurrence/cohort tables):
    # full-history cohort min through T-1 + in-window distinct days
    prior = hist_ud.groupBy(
        "user_id", "os", "country", "cohort_name"
    ).agg(
        F.min("day").alias("prior_cohort"),
        F.collect_set(
            F.when(F.col("day") >= lo_t, F.col("day"))
        ).alias("prior_days"),
    )

    # --- today's deduped activity
    today = today_ud.select(
        "user_id", "os", "country", "cohort_name"
    ).distinct()

    # --- yesterday's materialized pivot
    prev = _full_pivot(spark, sf_dir, AS_OF_PREV)
    return retention_delta_update(today, prior, prev, AS_OF)


def retention_delta_update(
    today: DataFrame,
    prior: DataFrame,
    prev_pivot: DataFrame,
    as_of_str: str,
) -> DataFrame:
    """Apply one day's retention delta: ``today`` is the deduped day-T
    activity (user_id, os, country, cohort_name), ``prior`` the
    maintained per-user state (… prior_cohort, prior_days — the
    cohort/occurrence tables), ``prev_pivot`` yesterday's materialized
    pivot.  Pure frame-in/frame-out so the IVM stress harness can time
    the delta against pre-materialized state
    (tools/retention_ivm_stress.py)."""
    t = F.lit(as_of_str).cast("date")
    lo_t = F.date_sub(t, WINDOW_DAYS)
    keys = ["user_id", "os", "country", "cohort_name"]
    j = (
        today.join(prior, keys, "left")
        .withColumn("cohort_date", F.coalesce("prior_cohort", t))
        .filter(F.col("cohort_date") >= lo_t)
        .withColumn("n", F.datediff(t, F.col("cohort_date")))
        .withColumn("wb", F.floor(F.col("n") / 7).cast("int"))
        .withColumn("mb", F.floor(F.col("n") / 28).cast("int"))
    )
    prior_wbs = F.array_distinct(
        F.transform(
            F.coalesce("prior_days", F.array()),
            lambda d: F.floor(F.datediff(d, F.col("cohort_date")) / 7).cast(
                "int"
            ),
        )
    )
    prior_mbs = F.array_distinct(
        F.transform(
            F.coalesce("prior_days", F.array()),
            lambda d: F.floor(F.datediff(d, F.col("cohort_date")) / 28).cast(
                "int"
            ),
        )
    )
    j = j.withColumn(
        "new_week", ~F.array_contains(prior_wbs, F.col("wb"))
    ).withColumn("new_month", ~F.array_contains(prior_mbs, F.col("mb")))

    def dcnt(cond, alias):
        return F.count(F.when(cond, 1)).alias(alias)

    gkeys = ["os", "country", "cohort_name", "cohort_date"]
    delta_aggs = [dcnt(F.col("n") == 0, "daily_cohort_size")]
    delta_aggs += [
        dcnt(F.col("n") == n, f"d{n}_retained_users") for n in _DAY_POINTS
    ]
    delta_aggs += [
        dcnt(F.col("new_week") & (F.col("wb") == 0), "weekly_cohort_size")
    ]
    delta_aggs += [
        dcnt(F.col("new_week") & (F.col("wb") == n), f"w{n}_retained_users")
        for n in _WEEK_POINTS
    ]
    delta_aggs += [
        dcnt(F.col("new_month") & (F.col("mb") == 0), "monthly_cohort_size")
    ]
    delta_aggs += [
        dcnt(F.col("new_month") & (F.col("mb") == n), f"m{n}_retained_users")
        for n in _MONTH_POINTS
    ]
    delta = j.groupBy(*gkeys).agg(*delta_aggs)

    prev = prev_pivot.filter(F.col("cohort_date") >= lo_t).drop(
        "execution_date", "measure_type", "cohort_level"
    )
    p = prev.select(
        *gkeys, *[F.col(c).alias(f"p_{c}") for c in _PIVOT_COLS]
    )
    d = delta.select(
        *gkeys, *[F.col(c).alias(f"q_{c}") for c in _PIVOT_COLS]
    )
    merged = p.join(d, gkeys, "full_outer")
    return merged.select(
        "os",
        "country",
        F.lit("feature").alias("measure_type"),
        F.lit("Feature").alias("cohort_level"),
        "cohort_name",
        "cohort_date",
        F.lit(as_of_str).cast("date").alias("execution_date"),
        *[
            (
                F.coalesce(F.col(f"p_{c}"), F.lit(0))
                + F.coalesce(F.col(f"q_{c}"), F.lit(0))
            ).alias(c)
            for c in _PIVOT_COLS
        ],
    )
