"""History / lifecycle operators extending the reference's upsert +
latest-snapshot family (SURVEY §2.1 K2, §2.3 J10): SCD type-2 interval
build and a staged conversion funnel.  Both are pure DataFrame
compositions with DuckDB oracle twins.

Reference lineage: J10's keep-latest upsert (tasks/revenue.py:147-167)
and K2's latest-file snapshot (tasks/base.py:781-821) are the type-1
forms; SCD2 is the general form that keeps the full validity history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark import functions as FN

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


# ---------------------------------------------------------------------------
# SCD2: collapse each user's attribute stream (props.k) into validity
# intervals [valid_from, valid_to), open interval flagged current.
# ---------------------------------------------------------------------------

# Malformed/NULL props yield a NULL attribute (the Spark
# get_json_object semantics) — the event still advances the SCD2
# timeline; DuckDB's json_extract_string would ERROR without the guard.
_SCD2_ORACLE = r"""
WITH src AS (
    SELECT user_id, ts, event_id,
           TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                          AND regexp_matches(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k'),
                                             '^\s*-?[0-9]+\s*$')
                         THEN json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') END AS INT)
             AS attr_k
    FROM events
    -- agreed textual prefilter (r07, both engines): a row can carry
    -- $.k only if the literal key text '"k"' appears; evaluating the
    -- cheap substring test ahead of the parse/regex guard stack skips
    -- the expensive path for non-carrying rows.  Deliberate semantic
    -- narrowing, pinned by a battery row: a unicode-ESCAPED key
    -- ('{"\\u006b": 1}') is excluded in BOTH engines.
    WHERE props LIKE '%"k"%'
), src2 AS (
    -- only attribute-carrying events update the dimension (SCD rule)
    SELECT * FROM src WHERE attr_k IS NOT NULL
), marked AS (
    SELECT user_id, ts, event_id, attr_k,
           CASE WHEN LAG(attr_k) OVER w IS DISTINCT FROM attr_k
                THEN 1 ELSE 0 END AS changed
    FROM src2
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
    SELECT user_id, ts, attr_k,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
    FROM marked WHERE changed = 1
)
SELECT user_id, attr_k,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       COALESCE(CAST(epoch_us(next_ts) AS BIGINT), -1) AS valid_to_us,
       CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current
FROM changes
""".replace(  # strict-validity gate: dup-key / bare-nan shapes (r06)
    "json_valid(props)", FN.json_valid_strict_sql("props")
)


@query("scd2_dimension_build", oracle=_SCD2_ORACLE, tags=("ext", "scd2", "J10", "K2"))
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build in one shuffle: partition
    by user, sort by (ts, event_id), keep change rows
    (``lag`` null-safe-≠ current), then ``lead`` the next change's ts as
    the exclusive upper bound.  Open intervals get -1 / is_current=1.

    Both window passes share the same hashpartitioning(user_id) — Spark
    plans ONE exchange.  At 100 TB this is the standard way to derive a
    dimension-history table from an event log without a self-join
    (the MERGE-per-day alternative reads the dimension N times).

    r07 prefilter: a cheap ``contains('"k"')`` conjunct ahead of the
    guard stack (the pushed filter inlines one full copy of the
    parse/regex guard — not preventable, so make rows cheap to reject:
    ~25% measured at sf0.1).  This is an AGREED TEXTUAL EXCLUSION
    applied identically in the oracle (``LIKE '%"k"%'``): a
    unicode-escaped key (``{"\\u006b": 1}``) no longer updates the
    dimension in EITHER engine — battery-pinned.  COUPLED-CHANGE RULE
    (r07 ADVICE): if the attribute key ever changes from ``k``, three
    sites must move together — this ``contains`` literal, the oracle's
    ``LIKE '%"k"%'`` conjunct, and the hostile battery's escaped-key /
    escaped-sibling rows — or the engines diverge on escaped keys.
    """
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: the strict-props JSON parse terms are evaluated in
    # the scan stage before the window's user_id exchange — a single
    # unsplittable file parses on one core (measured 1.11× at sf0.1,
    # SCALE.md r10)
    ev = widen_scan(read_table(spark, sf_dir, "events")).filter(
        F.col("props").contains('"k"')
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Strict-props guard (r07): functions.json_strict — parser terms +
    # the textual contract, the exact twin of the oracle's
    # json_valid_strict_sql, so trailing-garbage and dup-key shapes are
    # excluded IDENTICALLY in both engines.  STAGED into its own
    # projection: int_text(col) references its argument twice
    # (rlike guard + try_cast), and inlining would evaluate the whole
    # regex/parse guard stack 2x per row — the r07 bench tripwire
    # caught exactly that (scd2 1.7 -> 7.3 s).  A non-cheap alias
    # referenced twice blocks CollapseProject (the r03 atom-projection
    # mechanism), so the guard evaluates ONCE per row here.
    src = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            FN.json_strict(F.col("props")),
            F.get_json_object("props", "$.k"),
        ).alias("__k_text"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        FN.int_text(F.col("__k_text")).try_cast("int").alias("attr_k"),
    ).filter(  # only attribute-carrying events update the dimension
        F.col("attr_k").isNotNull()
    )
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


# ---------------------------------------------------------------------------
# Conversion funnel: signup → first click after signup → first purchase
# after that click; per-stage user counts in one row.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s AS (
    SELECT user_id, MIN(ts) AS s_ts FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS c_ts
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'click' AND e.ts >= s.s_ts
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS p_ts
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
    GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_signup,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after_click
"""


@query("funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("ext", "funnel"))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel.  Each stage filters the event log,
    aggregates first-touch per user (map-side partial min), and joins
    the previous stage's timestamps; stage frames shrink monotonically,
    so the join build sides broadcast (BroadcastHashJoin at test scale;
    at 100 TB AQE keeps them broadcast once a stage fits, else SMJ on
    the shared user_id key).  The final counts are 1-row aggregates
    combined by cross join — no driver round-trip.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_signup")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff — FULL OUTER join of two daily snapshots.
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH base AS (
    SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0 FROM events
), s AS (
    SELECT user_id,
           date_diff('day', base.d0, CAST(date_trunc('day', ts) AS DATE))
             AS rd,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS v
    FROM events, base GROUP BY 1, 2
), a AS (SELECT user_id, v FROM s WHERE rd = 10),
   b AS (SELECT user_id, v FROM s WHERE rd = 11)
SELECT COALESCE(a.user_id, b.user_id) AS user_id,
       CASE WHEN a.user_id IS NULL THEN 'added'
            WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.v = b.v THEN 'same'
            ELSE 'changed' END AS status,
       COALESCE(b.v, 0) - COALESCE(a.v, 0) AS delta_micros
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
"""


@query("snapshot_diff_cdc", oracle=_CDC_ORACLE, tags=("ext", "cdc", "join"))
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff of two consecutive daily per-user
    snapshots (relative days 10 and 11): FULL OUTER join classifies
    every user as added / removed / changed / same with an exact
    integer delta — the comparison V6 runs as a check, productized as
    a diff feed (and the engine's FULL OUTER join coverage).

    The day axis is relative to the data's own MIN(day) (an in-plan
    1-row broadcast, no driver round-trip).  Scale: both snapshots
    come from ONE scan + one (user, day) rollup; the diff join
    partitions on user_id — at 100 TB this is the standard
    partition-to-partition CDC join, no side ever broadcast.
    """
    ev = read_table(spark, sf_dir, "events")
    day = F.to_date(FN.as_utc_ts("ts"))
    d0 = ev.agg(F.min(day).alias("d0"))
    s = (
        # bounded: 1-row min-day aggregate
        ev.crossJoin(F.broadcast(d0))
        .select(
            "user_id",
            F.datediff(day, F.col("d0")).alias("rd"),
            F.floor(F.col("value") * 1000000).cast("long").alias("v"),
        )
        .groupBy("user_id", "rd")
        .agg(F.sum("v").alias("v"))
    )
    a = s.filter(F.col("rd") == 10).select("user_id", F.col("v").alias("va"))
    b = s.filter(F.col("rd") == 11).select("user_id", F.col("v").alias("vb"))
    j = a.join(b, "user_id", "full")
    return j.select(
        "user_id",
        F.when(F.col("va").isNull(), F.lit("added"))
        .when(F.col("vb").isNull(), F.lit("removed"))
        .when(F.col("va") == F.col("vb"), F.lit("same"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        (F.coalesce("vb", F.lit(0)) - F.coalesce("va", F.lit(0))).alias(
            "delta_micros"
        ),
    )


# ---------------------------------------------------------------------------
# Point-in-time dimension lookup — time-travel join against SCD2.
# ---------------------------------------------------------------------------

_PIT_ORACLE = r"""
WITH src AS (
    SELECT user_id, ts, event_id,
           TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                          AND regexp_matches(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k'),
                                             '^\s*-?[0-9]+\s*$')
                         THEN json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') END AS INT)
             AS attr_k
    FROM events
), src2 AS (
    -- only attribute-carrying events update the dimension (SCD rule)
    SELECT * FROM src WHERE attr_k IS NOT NULL
), marked AS (
    SELECT user_id, ts, event_id, attr_k,
           CASE WHEN LAG(attr_k) OVER w IS DISTINCT FROM attr_k
                THEN 1 ELSE 0 END AS changed
    FROM src2
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), iv AS (
    SELECT user_id, attr_k, ts AS f,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
    FROM marked WHERE changed = 1
), p AS (
    SELECT user_id, event_id AS purchase_id, ts FROM events
    WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       COALESCE(iv.attr_k, -1) AS attr_k_at_ts
FROM p LEFT JOIN iv
  ON p.user_id = iv.user_id
 AND p.ts >= iv.f AND (iv.t IS NULL OR p.ts < iv.t)
""".replace(  # strict-validity gate: dup-key / bare-nan shapes (r06)
    "json_valid(props)", FN.json_valid_strict_sql("props")
)


@query(
    "pit_dimension_lookup", oracle=_PIT_ORACLE, tags=("ext", "scd2", "asof")
)
def pit_dimension_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: each purchase tagged with the dimension
    attribute that was valid AT its timestamp — the time-travel join
    every SCD2 history exists to answer (the oracle runs the literal
    validity-interval join).

    Implementation is the union+window form, not an interval join:
    dimension changes and probes union into one frame, one window per
    user ordered by (ts, is_probe, event_id) carries the last
    attribute forward onto each probe — two user_id-keyed shuffles
    (change detection, then the union window), plan-pinned.  Changes sort before probes
    at equal ts — valid_from is inclusive, matching the interval
    semantics exactly.  No join node, no interval explosion for
    long-lived attribute versions (the bucketed-range-join trick would
    fan long validity windows out across every bucket they span).
    """
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Strict-props guard (r07): functions.json_strict — parser terms +
    # the textual contract, the exact twin of the oracle's
    # json_valid_strict_sql, so trailing-garbage and dup-key shapes are
    # excluded IDENTICALLY in both engines.  STAGED into its own
    # projection: int_text(col) references its argument twice
    # (rlike guard + try_cast), and inlining would evaluate the whole
    # regex/parse guard stack 2x per row — the r07 bench tripwire
    # caught exactly that (scd2 1.7 -> 7.3 s).  A non-cheap alias
    # referenced twice blocks CollapseProject (the r03 atom-projection
    # mechanism), so the guard evaluates ONCE per row here.
    src = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            FN.json_strict(F.col("props")),
            F.get_json_object("props", "$.k"),
        ).alias("__k_text"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        FN.int_text(F.col("__k_text")).try_cast("int").alias("attr_k"),
    ).filter(  # only attribute-carrying events update the dimension
        F.col("attr_k").isNotNull()
    )
    changes = (
        src.withColumn(
            "changed",
            F.when(
                ~F.lag("attr_k").over(w).eqNullSafe(F.col("attr_k")), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .filter(F.col("changed") == 1)
        .select(
            "user_id",
            "ts",
            "event_id",
            "attr_k",
            F.lit(0).alias("is_probe"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).try_cast("int").alias("attr_k"),
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("purchase_id"),
    )
    uw = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        changes.unionByName(probes)
        .withColumn("pit_attr", F.last("attr_k", ignorenulls=True).over(uw))
        .filter(F.col("is_probe") == 1)
        .select(
            "purchase_id",
            "user_id",
            FN.unix_us("ts").alias("ts_us"),
            F.coalesce("pit_attr", F.lit(-1)).alias("attr_k_at_ts"),
        )
    )
