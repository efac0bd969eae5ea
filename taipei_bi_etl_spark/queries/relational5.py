"""Fifth relational batch: the remaining classic warehouse subquery
shapes the reference's BigQuery layer would delegate to Dremel —
count-of-counts distribution (TPC-H Q13), HAVING + join-back (Q18),
fraction-of-global-total threshold (Q11), and max-of-aggregate self
lookup (Q15) — each written decorrelated / broadcast-scalar so the plan
survives a 100 TB fact table.

The reference never writes these literal queries, but their building
blocks are all in SURVEY §2: outer joins with extra predicates (J5),
HAVING-style post-aggregation filters (A10's ratio gates), and global
scalar factors broadcast back onto a frame (A12, ``tasks/rps.py:135-168``
rps factor).  All oracles use exact integer cents so the value hashes
are float-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Count-of-counts distribution — TPC-H Q13 shape.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH co AS (
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
"""


@query(
    "order_count_distribution",
    oracle=_Q13_ORACLE,
    tags=("relational", "join", "J5"),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N qualifying
    orders — a LEFT join whose *join condition* carries the filter (so
    non-matching customers survive with count 0), then a second
    aggregation over the first's output (count-of-counts).

    The filter must stay in the ON clause: pushed into WHERE it would
    silently turn the join inner and drop zero-order customers — the
    exact outer-join trap SURVEY §2.3 J5 calls out.

    Scale: orders aggregates after shuffling on o_custkey; customer
    joins on the same key (partitioning reused).  The second group-by
    runs on |customers| rows collapsing to ~tens of distinct counts —
    partial aggregation makes the final shuffle a few rows per
    partition.  No broadcast needed anywhere: both legs are "big" but
    the join key is the natural distribution key.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    co = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# HAVING filter + join-back — TPC-H Q18 shape.
# ---------------------------------------------------------------------------

BIG_ORDER_QTY = 250  # sum-of-line-quantity threshold (top ~2% at any sf)

_Q18_ORACLE = f"""
WITH big AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > {BIG_ORDER_QTY}
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       b.total_qty
FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
"""


@query(
    "large_order_having_filter",
    oracle=_Q18_ORACLE,
    tags=("relational", "subquery", "A10"),
)
def large_order_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds
    {BIG_ORDER_QTY} — the classic ``IN (SELECT ... GROUP BY ... HAVING)``
    membership test, written as aggregate → filter → join-back.

    Scale: lineitem aggregates on its natural key (map-side partials
    collapse ~4 lines/order before the shuffle); the HAVING filter cuts
    the aggregate to ~2% *before* the orders join, so the join probe is
    tiny — at 100 TB the filtered aggregate is broadcast-able and AQE
    converts the join to broadcast at runtime (the plan leaves that
    choice to AQE rather than pinning it, since the survivor count
    depends on the threshold).  Quantities are integral doubles → exact
    BIGINT sums, no float boundary at the HAVING cut.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > BIG_ORDER_QTY)
    )
    return o.join(big, o["o_orderkey"] == big["l_orderkey"]).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("total_cents"),
        "total_qty",
    )


# ---------------------------------------------------------------------------
# Fraction-of-global-total threshold — TPC-H Q11 shape.
# ---------------------------------------------------------------------------

# keep parts whose revenue share exceeds 1.25x the mean part share:
#   part_cents * n_parts * SHARE_DEN > total_cents * SHARE_NUM
SHARE_NUM, SHARE_DEN = 5, 4

_Q11_ORACLE = f"""
WITH pp AS (
    SELECT l_partkey,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS part_cents
    FROM lineitem GROUP BY l_partkey
), tot AS (
    SELECT CAST(SUM(part_cents) AS BIGINT) AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM pp
)
SELECT pp.l_partkey, pp.part_cents
FROM pp, tot
WHERE pp.part_cents * tot.n_parts * {SHARE_DEN}
      > tot.total_cents * {SHARE_NUM}
"""


@query(
    "value_share_threshold",
    oracle=_Q11_ORACLE,
    tags=("relational", "subquery", "A12"),
)
def value_share_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds {SHARE_NUM}/{SHARE_DEN}
    of the *mean* part's share of global revenue — a per-group aggregate
    filtered against a grand-total scalar, the same broadcast-a-scalar
    pattern as the reference's RSF factor (A12,
    ``/root/reference/tasks/rps.py:135-168``) but kept fully
    distributed: the scalar rides a 1-row broadcast cross join instead
    of a ``.collect()``.

    The share test cross-multiplies in BIGINT (part·n·den > tot·num) —
    no division, no float epsilon at the cut.  Scale: one shuffle on
    l_partkey for the aggregate; the global total re-aggregates the
    per-part partials (2000 rows per sf unit, not the raw fact), and
    the cross join moves ONE row to every partition.
    """
    li = read_table(spark, sf_dir, "lineitem")
    pp = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "part_cents"
        )
    )
    tot = pp.agg(
        F.sum("part_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        # bounded: 1-row total
        pp.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_cents") * F.col("n_parts") * SHARE_DEN
            > F.col("total_cents") * SHARE_NUM
        )
        .select("l_partkey", "part_cents")
    )


# ---------------------------------------------------------------------------
# Max-of-aggregate self lookup — TPC-H Q15 shape.
# ---------------------------------------------------------------------------

_Q15_WINDOW = ("1996-01-01", "1996-04-01")

_Q15_ORACLE = f"""
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS total_rev_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q15_WINDOW[0]}'
      AND l_shipdate <  TIMESTAMP '{_Q15_WINDOW[1]}'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev_cents
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev_cents = (SELECT MAX(total_rev_cents) FROM rev)
"""


@query(
    "max_revenue_supplier",
    oracle=_Q15_ORACLE,
    tags=("relational", "subquery", "A2"),
)
def max_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top-revenue supplier(s) for one quarter —
    an aggregate compared against the max of the SAME aggregate (the
    reference's "create view revenue / select where = max" two-step).
    Keeping *all* suppliers tied at the max (rather than row_number=1)
    preserves Q15's exact semantics; ties are well-defined because the
    revenue is an exact BIGINT cents sum.

    Scale: the ship-date predicate pushes to the lineitem scan before
    the l_suppkey aggregation, and the fact is scanned exactly ONCE —
    the max is taken as a global window over the already-aggregated
    ``rev`` frame (|suppliers| rows, not |lineitem|), so no second
    subplan re-derives it.  The empty-frame window funnels |suppliers|
    rows through one partition, which is fine at any TPC-H scale
    (suppliers ≪ fact); the naive "WHERE rev = (SELECT MAX ...)" form
    would instead plan the fact aggregation twice unless exchange reuse
    kicks in.  The supplier join broadcasts the 1-to-few winner side.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_WINDOW[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_WINDOW[1]).cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
        ).alias("total_rev_cents")
    )
    winners = (
        rev.withColumn(
            "max_rev_cents",
            F.max("total_rev_cents").over(W.partitionBy()),
        )
        .filter(F.col("total_rev_cents") == F.col("max_rev_cents"))
        .drop("max_rev_cents")
    )
    return s.join(
        # bounded: global-argmax rows (ties only)
        F.broadcast(winners), s["s_suppkey"] == winners["l_suppkey"]
    ).select("s_suppkey", "s_name", "total_rev_cents")
