"""Fourth relational batch: classic warehouse join/subquery shapes the
reference's BigQuery layer delegates to Dremel — a 6-table star join
(TPC-H Q5 shape) and a correlated-scalar-subquery filter (TPC-H Q17
shape, written decorrelated) — plus a cumulative token-budget sampler
for the curation family.

All oracle-checked with exact integer arithmetic (cents / integral
quantities) so the hashes are float-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim

# ---------------------------------------------------------------------------
# Six-table star join — TPC-H Q5 shape (local supplier volume).
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n.n_name,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@query("region_nation_revenue", oracle=_Q5_ORACLE, tags=("relational", "join", "J4"))
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for orders placed in 1996 where
    the line's supplier sits in the customer's (ASIA) nation — the
    canonical 6-table star join with a correlated key constraint
    (c_nationkey = s_nationkey) that no single broadcast can satisfy.

    Plan shape at scale: lineitem⋈orders⋈customer are the big legs —
    shuffled hash joins on their natural keys with AQE free to reorder;
    supplier/nation/region broadcast (region filter prunes nation and
    transitively suppliers *before* the big probe via the broadcast
    chain).  The date predicate pushes to the orders scan
    (PushedFilters) and prunes partitions when orders is date-
    partitioned — exactly the reference's partition-pruning discipline
    (SURVEY §4) on a join BigQuery would plan server-side.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            bcast_dim(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        # bounded: nation (25 rows)
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        # bounded: region (5 rows)
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery, decorrelated — TPC-H Q17 shape.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_partkey
)
SELECT COALESCE(l.l_returnflag, '(null)') AS l_returnflag,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS small_line_cents,
       CAST(COUNT(*) AS BIGINT) AS n_small_lines
FROM lineitem l JOIN per_part p USING (l_partkey)
WHERE CAST(l.l_quantity AS BIGINT) * 5 * p.cnt < p.sum_qty
GROUP BY 1
"""


@query(
    "avg_quantity_subquery_filter",
    oracle=_Q17_ORACLE,
    tags=("relational", "subquery"),
)
def avg_quantity_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines whose quantity is below 20% of their
    part's average — the correlated scalar subquery
    (``l_quantity < (SELECT 0.2*avg(l_quantity) ... WHERE same part)``)
    written in its decorrelated form: aggregate per part once, join
    back, filter.  The threshold compares exactly in integers
    (qty < 0.2·sum/cnt ⇔ 5·qty·cnt < sum, quantities are integral) —
    no float boundary flaps in the hash.

    Scale: one partial+final aggregation on l_partkey and one shuffled
    self-join on the same key — Catalyst reuses the partitioning, so
    the fact effectively shuffles once.  This decorrelation is exactly
    what the reference's array-scalar subqueries (SURVEY §4) get at
    authoring time.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
        .groupBy(
            # coalesced in both engines (driver-compare sort, hostile sweep)
            F.coalesce("l_returnflag", F.lit("(null)")).alias("l_returnflag")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "small_line_cents"
            ),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Cumulative token-budget sampling — curation-family extension.
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 20_000  # per-source token budget

_BUDGET_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, md5(text) AS h,
           CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens
    FROM documents
), c AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS tokens_before
    FROM t
)
SELECT doc_id, source, n_tokens, tokens_before
FROM c WHERE tokens_before < {TOKEN_BUDGET}
"""


@query(
    "token_budget_sample",
    oracle=_BUDGET_ORACLE,
    tags=("curation", "sampling", "extension"),
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a {TOKEN_BUDGET}-token budget per source with docs taken in
    content-hash order — the "give me N tokens of X" sampler every
    mixture builder needs.  A doc is kept iff the budget isn't
    exhausted when it starts, so the kept set is a deterministic
    function of corpus content: stable under repartitioning, re-
    ingestion, and appends that don't reshuffle the hash order.

    The cumulative sum orders by (md5, doc_id) — a total order, so ROWS
    frames are deterministic even for duplicate texts.  Scale: one
    window shuffle on source; if a single source's doc list exceeds a
    task, range-partition by (source, h) and two-pass the prefix sums
    (per-range partials + broadcast offsets) — plan shape unchanged.
    """
    d = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    ).cast("long")
    t = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.withColumn(
            "tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
        .filter(F.col("tokens_before") < TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens", "tokens_before")
    )


# ---------------------------------------------------------------------------
# Top-k per group — window-ranked, never a global sort.
# ---------------------------------------------------------------------------

TOP_K = 3

_TOPK_GROUP_ORACLE = f"""
WITH spend AS (
    SELECT o_custkey,
           CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), -1)
                AS BIGINT) AS spend_cents
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT COALESCE(c.c_nationkey, -1) AS c_nationkey,
           s.o_custkey AS custkey, s.spend_cents,
           ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                              ORDER BY s.spend_cents DESC, s.o_custkey ASC)
             AS rnk
    FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
)
SELECT c_nationkey, custkey, spend_cents, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


@query(
    "topk_per_group", oracle=_TOPK_GROUP_ORACLE, tags=("relational", "topk", "O3")
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} customers by lifetime spend within each nation —
    the grouped top-k that generalizes W1's keep-first dedup (top-1).
    Deterministic under ties (spend desc, custkey asc = total order).

    Scale: spend aggregates with map-side combine on o_custkey; the
    rank is a per-nation window over the *aggregated* frame (one row
    per customer, not per order).  No global sort anywhere — each
    partition sorts only its nations' customers; with huge groups this
    swaps to a per-partition bounded heap, same semantics.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    # an all-NULL-price customer's spend is NULL: sentinel it to -1 in
    # BOTH engines (it sorts deterministically under DESC and survives
    # the driver compare's row sort); nation key coalesced likewise
    # (hostile relational sweep, second pass)
    spend = o.groupBy("o_custkey").agg(
        F.coalesce(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")),
            F.lit(-1),
        ).cast("long").alias("spend_cents")
    )
    return (
        spend.join(c, spend["o_custkey"] == c["c_custkey"])
        .select(
            F.coalesce("c_nationkey", F.lit(-1)).alias("c_nationkey"),
            F.col("o_custkey").alias("custkey"),
            "spend_cents",
        )
        .withColumn("rnk", F.row_number().over(
            W.partitionBy("c_nationkey").orderBy(
                F.col("spend_cents").desc(), F.col("custkey").asc()
            )
        ))
        .filter(F.col("rnk") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# Column-profile summary — melt-then-profile, one pass.
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
    for c in _PROFILE_COLS
)


@query(
    "table_profile_summary",
    oracle=_PROFILE_ORACLE,
    tags=("ext", "profiling", "V1"),
)
def table_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of ``orders`` (row/null/distinct counts)
    — the ANALYZE/profiling pass a warehouse runs before trusting a
    feed; extends the reference's assertion checks (V1–V6) from
    pass/fail to measured stats.

    Shape: melt the table to (col_name, value-as-string) with a single
    Expand (stack), then one groupBy(col_name) with count / null-count
    / distinct — the whole profile is ONE aggregation pass whatever
    the column count, instead of |cols| separate scans (the UNION-ALL
    oracle runs the naive form).  Distinctness counts are unaffected
    by the string cast (injective per column).  At 100 TB swap the
    exact distinct for approx_count_distinct at the call site —
    identical plan shape, mergeable sketch.
    """
    o = read_table(spark, sf_dir, "orders")
    melted = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("m")
    ).select("m.col_name", "m.v")
    return melted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_nulls"),
        F.countDistinct("v").alias("n_distinct"),
    )
