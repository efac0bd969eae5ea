"""User-journey analytics over the event log: transition matrix and
ordered funnel conversion — the flow-analysis pair every telemetry
warehouse runs next to retention (reference domain:
`sql/mango_events.sql` event streams feed exactly this kind of
analysis; the reference computes retention/RFE but ships raw events for
ad-hoc flow work — these make the two standard ad-hoc shapes
first-class and oracled).

100 TB design: both operators shuffle ONCE on user_id (the same
hashpartitioning every per-user window in the engine shares); the
transition rollup then aggregates on the bounded (prev, cur) event-type
key space, and the funnel is three conditional MIN aggregates inside
the one per-user pass — no self-joins, no re-scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark import functions as FN

#: The standing funnel: signup → view → purchase, in timestamp order
#: (strictly increasing ts across steps; ties broken by event_id so
#: same-timestamp step pairs are ordered deterministically in both
#: engines).
FUNNEL_STEPS = ("signup", "view", "purchase")

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
  WHERE event_type IS NOT NULL
), pairs AS (
  SELECT prev_type, event_type AS cur_type FROM seq
  WHERE prev_type IS NOT NULL
), totals AS (
  SELECT prev_type, COUNT(*) AS n_from FROM pairs GROUP BY 1
)
SELECT p.prev_type, p.cur_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(t.n_from AS BIGINT) AS n_from,
       ROUND(COUNT(*) * 1.0 / t.n_from, 8) AS share
FROM pairs p JOIN totals t USING (prev_type)
GROUP BY 1, 2, t.n_from
"""


@query(
    "event_transition_matrix",
    oracle=_TRANSITION_ORACLE,
    tags=("telemetry", "W1", "extension"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    per user: (prev_type, cur_type, n, n_from, share).  One shuffle on
    user_id for the lag, one bounded-key rollup; the per-row share is a
    division of identical integers in both engines (ROUND 8 stable)."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("cur_type"))
    )
    counts = pairs.groupBy("prev_type", "cur_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "cur_type",
        "n",
        F.sum("n").over(wt).alias("n_from"),
        F.round(F.col("n") / F.sum("n").over(wt), 8).alias("share"),
    )


def _funnel_oracle() -> str:
    a, b, c = FUNNEL_STEPS
    return f"""
WITH e AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE event_type IN ('{a}', '{b}', '{c}')
), s1 AS (
  SELECT user_id, MIN(ROW(ts, event_id)) AS k1
  FROM e WHERE event_type = '{a}' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(ROW(e.ts, e.event_id)) AS k2
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = '{b}' AND ROW(e.ts, e.event_id) > s1.k1
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(ROW(e.ts, e.event_id)) AS k3
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = '{c}' AND ROW(e.ts, e.event_id) > s2.k2
  GROUP BY 1
)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS step1_users,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS step2_users,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS step3_users,
       ROUND((SELECT COUNT(*) FROM s2) * 1.0
             / NULLIF((SELECT COUNT(*) FROM s1), 0), 8) AS conv_1_2,
       ROUND((SELECT COUNT(*) FROM s3) * 1.0
             / NULLIF((SELECT COUNT(*) FROM s2), 0), 8) AS conv_2_3,
       ROUND((SELECT COUNT(*) FROM s3) * 1.0
             / NULLIF((SELECT COUNT(*) FROM s1), 0), 8) AS conv_1_3
"""


@query(
    "funnel_conversion_fold",
    oracle=_funnel_oracle(),
    tags=("telemetry", "A2", "extension"),
)
def funnel_conversion_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel {FUNNEL_STEPS} as ONE per-user pass — the
    single-shuffle twin of `history.funnel_conversion` (which chains
    three filter+join stages): per user, the sorted (ts, event_id,
    type) array folds left through the step list (array `aggregate`
    over a bounded per-user event set — no self-joins; the oracle
    computes the same chain with three windowless MIN-key subqueries).
    A user converts step k only with an event STRICTLY after their
    step-(k-1) completion in (ts, event_id) order.

    Scale: the fold runs on each user's own events (bounded per key);
    the only shuffle is the user_id groupBy; the final frame is one
    row."""
    a, b, c = FUNNEL_STEPS
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_STEPS)
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )
    # fold: state = (stage reached, key of last step completion); a
    # step-k event advances the state iff its (ts, event_id) is
    # strictly greater than the stage-(k-1) completion key.
    step = F.array(*[F.lit(s) for s in FUNNEL_STEPS])
    state0 = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("k_ts"),
        F.lit(None).cast("long").alias("k_id"),
    )
    def advance(st, e):
        # clamp: at the final stage element_at(step, 4) would be
        # out-of-bounds (ANSI throws); the `take` guard then rejects
        wants = F.element_at(
            step, F.least(st["stage"] + 1, F.lit(len(FUNNEL_STEPS)))
        )
        later = st["stage"].eqNullSafe(F.lit(0)) | (
            (e["ts"] > st["k_ts"])
            | ((e["ts"] == st["k_ts"]) & (e["event_id"] > st["k_id"]))
        )
        take = (
            (st["stage"] < len(FUNNEL_STEPS))
            & (e["event_type"] == wants)
            & later
        )
        return F.when(
            take,
            F.struct(
                (st["stage"] + 1).alias("stage"),
                e["ts"].alias("k_ts"),
                e["event_id"].alias("k_id"),
            ),
        ).otherwise(st)

    staged = per_user.select(
        F.aggregate("evs", state0, advance)["stage"].alias("stage")
    )
    agg = staged.agg(
        F.sum(F.when(F.col("stage") >= 1, 1).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("stage") >= 2, 1).otherwise(0)).alias("s2"),
        F.sum(F.when(F.col("stage") >= 3, 1).otherwise(0)).alias("s3"),
    )
    return agg.select(
        F.col("s1").cast("long").alias("step1_users"),
        F.col("s2").cast("long").alias("step2_users"),
        F.col("s3").cast("long").alias("step3_users"),
        F.round(F.col("s2") / F.nullif(F.col("s1"), F.lit(0)), 8).alias(
            "conv_1_2"
        ),
        F.round(F.col("s3") / F.nullif(F.col("s2"), F.lit(0)), 8).alias(
            "conv_2_3"
        ),
        F.round(F.col("s3") / F.nullif(F.col("s1"), F.lit(0)), 8).alias(
            "conv_1_3"
        ),
    )


# ---------------------------------------------------------------------------
# Top session paths: the third journey shape — which opening event
# sequences dominate sessions (onboarding/abandonment analysis over
# the same 30-min-gap sessions the engine's W2/W3 operators use).
# ---------------------------------------------------------------------------

PATH_LEN = 4       # first K event types form the path
PATH_TOP = 20      # report the top N paths

_PATH_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
               OR datediff('millisecond', LAG(ts) OVER w, ts)
                  > 30 * 60 * 1000
              THEN 1 ELSE 0 END AS is_start
  FROM events WHERE event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_start) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS session_no
  FROM marked
), paths AS (
  SELECT user_id, session_no,
         array_to_string(
             (list(event_type ORDER BY ts, event_id))[1:{PATH_LEN}], '>')
           AS path,
         COUNT(*) AS n_events
  FROM sess GROUP BY 1, 2
), counted AS (
  SELECT path,
         CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(SUM(n_events) AS BIGINT) AS n_events
  FROM paths GROUP BY 1
)
SELECT path, n_sessions, n_events,
       CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS INT)
         AS rank
FROM counted
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP}
"""


@query(
    "session_path_topk",
    oracle=_PATH_ORACLE,
    tags=("telemetry", "W2", "extension"),
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top {PATH_TOP} session-opening paths (first {PATH_LEN} event
    types, 30-min-gap sessions — the same session definition as
    lead_sessionize/W2): (path, n_sessions, n_events, rank).

    Scale: one user_id shuffle serves the gap window AND the
    per-session rollup (session keys prefix with user_id); path counts
    aggregate on the bounded path-string key space; the final top-k is
    TakeOrderedAndProject (local heaps, no global sort).

    Gap semantics: ``FN.unix_ms`` truncate-then-subtract — the exact
    twin of the oracle's ``datediff('millisecond', …)`` boundary count
    (the house W2 pattern from lead_sessionize).  A fractional-ms diff
    (``unix_micros/1000``) diverges on this corpus's sub-ms timestamps
    whenever a user's gap straddles the 30-min boundary inside one
    millisecond — caught by the r07 review pass."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = FN.unix_ms(F.col("ts")) - FN.unix_ms(F.lag("ts").over(w))
    marked = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_ms > 30 * 60 * 1000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn("session_no", F.sum("is_start").over(w))
    paths = sess.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                PATH_LEN,
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
    ranked = counted.orderBy(
        F.col("n_sessions").desc(), F.col("path")
    ).limit(PATH_TOP)
    wr = Window.orderBy(F.col("n_sessions").desc(), F.col("path"))
    return ranked.select(
        "path",
        "n_sessions",
        "n_events",
        F.row_number().over(wr).cast("int").alias("rank"),
    )
