"""Sequence / time-frame analytics and fuzzy string dedup.

Fills the remaining window-frame gap (SURVEY §2.5 notes the reference
uses no frame specs at all; ``relational3.moving_avg_frame`` covers ROWS
frames, this module adds the time-based RANGE frame), adds deterministic
per-group mode and Markov-style event-transition counts (sequence
analytics a telemetry user expects next), and an edit-distance near-dup
operator extending the dedup family (exact / MinHash / SimHash / n-gram
Jaccard / embedding-cosine → + Levenshtein).

All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Time-based RANGE frame — trailing 30-day spend per customer order.
# ---------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = """
SELECT o_orderkey, COALESCE(o_custkey, -1) AS o_custkey,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE)
           RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS trailing_30d_cents
FROM orders
WHERE o_orderdate IS NOT NULL
"""


@query("range_interval_frame", oracle=_RANGE_FRAME_ORACLE, tags=("ext", "frame"))
def range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day spend per order: a time-based RANGE frame.

    The reference never leaves the default frame (SURVEY §2.5); RANGE
    over an interval is the canonical "rolling metric without a
    self-join" shape.  The DataFrame API's ``rangeBetween`` takes longs,
    so the order key is the epoch-day integer — identical semantics to
    ``RANGE BETWEEN INTERVAL 30 DAY PRECEDING`` because peers (same day)
    enter the frame together, which also makes the result deterministic
    under ties.  Exact cents (bigint) keep the hash float-free.

    Scale: one shuffle on o_custkey; the frame is evaluated by a single
    sort within each partition — no per-row self-join, no explode.
    """
    # a time-range frame is meaningless for a NULL time — excluded in
    # BOTH engines; the NULL-custkey partition stays (both engines group
    # NULL keys together) with the key coalesced only in the OUTPUT for
    # the driver compare's row sort (hostile relational sweep)
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_orderkey",
        F.coalesce("o_custkey", F.lit(-1)).alias("o_custkey"),
        F.sum(cents).over(w).alias("trailing_30d_cents"),
    )


# ---------------------------------------------------------------------------
# Deterministic mode — most frequent event_type per user.
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH counted AS (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
), ranked AS (
    SELECT user_id, event_type, n,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY n DESC, event_type ASC) AS r
    FROM counted
)
SELECT user_id, event_type AS top_event_type, n AS top_n
FROM ranked WHERE r = 1
"""


@query("mode_event_type", oracle=_MODE_ORACLE, tags=("ext", "agg"))
def mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type with a deterministic tie-break
    (highest count, then lexicographically smallest type).

    Built-in ``F.mode`` breaks ties arbitrarily, so the engine's mode is
    the count + row_number form — hash-stable cross-engine.  Scale: the
    groupBy partial-aggregates map-side to at most |users|×|types| rows,
    and the window partitions by the same leading key, so Catalyst
    reuses the exchange: one effective shuffle.
    """
    ev = read_table(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        counted.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("top_event_type"),
            F.col("n").alias("top_n"),
        )
    )


# ---------------------------------------------------------------------------
# Event transition matrix — Markov-style (from, to) counts.
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events WHERE event_type IS NOT NULL
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@query("event_transition_counts", oracle=_TRANSITION_ORACLE, tags=("ext", "seq"))
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (from → to) transition counts over each user's
    time-ordered event sequence — the input to any Markov / next-action
    model on product telemetry.

    The LEAD window orders by (ts, event_id) — a total order, so the
    pairing is deterministic.  Scale: one shuffle on user_id for the
    sequence; the closing groupBy is on a tiny (|types|²) domain so its
    partial aggregation collapses map-side — AQE coalesces the final
    exchange to a handful of partitions.
    """
    # untyped events cannot transition (oracle WHERE twin)
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("next_type", F.lead("event_type", 1).over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup — Levenshtein within content blocks.
# ---------------------------------------------------------------------------

#: Prefix length compared and the max edit distance accepted.
_ED_PREFIX = 48
_ED_MAX = 4
#: Length-bucket width for blocking.
_ED_BUCKET = 16

_EDIT_DIST_ORACLE = f"""
WITH d AS (
    SELECT doc_id, lang, source, n_chars // {_ED_BUCKET} AS len_bucket,
           substring(text, 1, {_ED_PREFIX}) AS prefix
    FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_distance
FROM d a JOIN d b
  ON a.lang = b.lang AND a.source = b.source
 AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= {_ED_MAX}
"""


@query("dedup_edit_distance", oracle=_EDIT_DIST_ORACLE, tags=("ext", "dedup"))
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by Levenshtein distance on a fixed prefix,
    blocked by (lang, source, length bucket).

    Blocking semantics (documented, mirrored exactly in the oracle):
    candidate pairs share language, source, and a {_ED_BUCKET}-char
    length bucket — the standard ed-join pruning that turns an O(n²)
    all-pairs scan into per-block self-joins.  The distance itself is
    the JVM built-in ``levenshtein`` (codegen, no Python), computed on a
    {_ED_PREFIX}-char prefix so the DP cost is constant per pair.

    Scale: the self-join is a shuffled hash join on the block key; block
    sizes are bounded by the (lang × source × length) fan-out, and a
    skewed block would be split by AQE.  At 100 TB the same shape holds
    — no broadcast of the corpus, no cross join.
    """
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        (F.col("n_chars") / _ED_BUCKET).cast("long").alias("len_bucket"),
        F.substring("text", 1, _ED_PREFIX).alias("prefix"),
    )
    a = d.alias("a")
    b = d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= _ED_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("long").alias("edit_distance"),
        )
    )


# ---------------------------------------------------------------------------
# Co-occurrence lift — market-basket association over user baskets.
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH u AS (
    SELECT DISTINCT user_id, event_type FROM events
), totals AS (
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
), singles AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY event_type
), pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both
    FROM u a JOIN u b ON a.user_id = b.user_id
         AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both, sa.n AS n_a, sb.n AS n_b,
       t.n_users,
       ROUND(CAST(p.n_both AS DOUBLE) * t.n_users / (sa.n * sb.n), 6)
         AS lift
FROM pairs p
JOIN singles sa ON p.type_a = sa.event_type
JOIN singles sb ON p.type_b = sb.event_type
CROSS JOIN totals t
"""


@query(
    "event_cooccurrence_lift", oracle=_LIFT_ORACLE, tags=("ext", "basket")
)
def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over per-user event baskets:
    P(A∧B)/(P(A)·P(B)) for every unordered event-type pair, from exact
    distinct-user counts (the "users who did X also did Y" feed).

    Shape: distinct (user, type) collapses the raw events once; the
    pair self-join runs on that |users|·|types|-bounded frame keyed by
    user_id (never the raw events); singles and the 1-row user total
    broadcast onto the tiny pair frame.  At 100 TB the only big
    exchanges are the distinct and the user-keyed pair join — both
    bounded by baskets, not events.
    """
    ev = read_table(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct().persist()
    totals = u.select(F.countDistinct("user_id").alias("n_users"))
    singles = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = u.alias("a"), u.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        # bounded: per-event-type sizes (bounded domain)
        pairs.join(F.broadcast(sa), "type_a")
        # bounded: per-event-type sizes (bounded domain)
        .join(F.broadcast(sb), "type_b")
        # bounded: 1-row total
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            "n_users",
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
