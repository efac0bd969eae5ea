"""Seventh relational batch — the remaining classic TPC-H-family plan
shapes, adapted to the synthetic tables' columns: correlated-MIN
supplier selection (Q2), aggregate-then-global-top-k (Q3), correlated
EXISTS priority counts (Q4), group-and-top-20 reporting (Q10), and the
scalar-average + NOT-EXISTS anti-join (Q22).

As with the earlier batches these matter as PLAN shapes, not as TPC-H
trivia: Q2 is the correlated scalar subquery decorrelated into a window
MIN (keep-all-ties), Q3/Q10 are TakeOrderedAndProject over an
aggregate (never a global sort), Q4 is a conditioned LEFT SEMI, and
Q22 cross-multiplies the global average so the threshold is exact
BIGINT arithmetic (the float policy: no engine-dependent division in
any hashed value).

Reference parity: the correlated-subquery and EXISTS shapes extend the
anti/semi-join family of SURVEY §2.3 (J3 `sql/mango_feature_cohort_date.sql:35`);
the scalar-average threshold is A12's grand-total pattern
(`tasks/rps.py:135-165`) pushed into a filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim

_CENTS = "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Min-cost supplier — TPC-H Q2 shape (correlated MIN decorrelated).
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH cat AS (
    SELECT l_partkey, l_suppkey,
           MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
    FROM lineitem GROUP BY 1, 2
), asia AS (
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
), pc AS (
    SELECT c.l_partkey, a.s_name, c.cost_cents,
           MIN(c.cost_cents) OVER (PARTITION BY c.l_partkey) AS min_cost
    FROM cat c JOIN asia a ON c.l_suppkey = a.s_suppkey
)
SELECT p.p_partkey, pc.s_name, pc.cost_cents
FROM pc
JOIN part p ON pc.l_partkey = p.p_partkey
WHERE p.p_size < 10 AND pc.cost_cents = pc.min_cost
"""


@query(
    "min_cost_supplier",
    oracle=_Q2_ORACLE,
    tags=("relational", "subquery", "window"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the ASIA supplier(s) whose
    cheapest observed line price hits the per-part regional minimum —
    the classic correlated scalar subquery ``ps_supplycost = (SELECT
    MIN(...) WHERE partkey = outer.partkey AND region = ...)``.

    Decorrelation: the "supply catalog" (per part×supplier min cents,
    derived from lineitem since the synthetic schema has no partsupp)
    is built ONCE, the region restriction is applied BEFORE the
    per-part minimum, and the correlated MIN becomes a window MIN over
    the catalog — the aggregate-then-self-join form would plan the
    catalog subtree twice.  Ties keep every qualifying supplier (Q15
    discipline).

    Scale: the only wide shuffle is the catalog aggregation keyed on
    (l_partkey, l_suppkey); the window's per-part re-cluster is a
    hash-on-subset the catalog exchange already satisfies in AQE's
    eyes only if keys match exactly, so the plan pre-partitions the
    catalog on l_partkey and lets the (partkey, suppkey) aggregation
    run as a partial on top.  Supplier×nation×region and the filtered
    part side are broadcast (dims, ~2% survivors).
    """
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)

    # nation⋈region pre-reduced to the ASIA nation-key list (bounded),
    # then a SEMI join against supplier: region membership is a filter,
    # and the semi join's size estimate is the supplier scan itself —
    # not the size-only join product — so bcast_dim judges real bytes.
    # bounded: nation keys in one region (<= 25 rows)
    asia_keys = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    asia = s.join(
        # bounded: nation key list (25 rows)
        F.broadcast(asia_keys),
        s["s_nationkey"] == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")
    line_cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    cat = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(line_cents).alias("cost_cents"))
    )
    pc = cat.join(bcast_dim(asia), cat["l_suppkey"] == asia["s_suppkey"])
    w = W.partitionBy("l_partkey")
    pc = pc.withColumn("min_cost", F.min("cost_cents").over(w))
    return (
        pc.filter(F.col("cost_cents") == F.col("min_cost"))
        .join(bcast_dim(p), pc["l_partkey"] == p["p_partkey"])
        .select("p_partkey", "s_name", "cost_cents")
    )


# ---------------------------------------------------------------------------
# Unshipped-order shipping priority — TPC-H Q3 shape.
# ---------------------------------------------------------------------------

_Q3_CUT = "1998-06-01"

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUT}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUT}'
GROUP BY 1, CAST(o.o_orderdate AS DATE), 4
ORDER BY revenue_cents DESC, l.l_orderkey
LIMIT 10
"""


@query(
    "unshipped_order_priority",
    oracle=_Q3_ORACLE,
    tags=("relational", "topk"),
)
def unshipped_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the 10 highest-revenue orders placed before the
    cutoff but still (partly) unshipped after it, for one market
    segment — join two big tables through a dimension filter, aggregate
    per order, then take a GLOBAL top-k by the aggregate.

    Scale: the segment filter shrinks customer to ~20% and broadcasts;
    both date predicates push to the parquet scans; the only wide
    shuffle is the per-order aggregation (keyed l_orderkey — the join
    key, so AQE can reuse the orders-join exchange).  The top-10 is
    `orderBy(...).limit(10)` which plans as TakeOrderedAndProject —
    a per-partition heap + driver merge of 10-row heaps, NEVER a
    global sort of the aggregate.  Tie-break on l_orderkey makes the
    selection deterministic cross-engine.
    """
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_CUT).cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_CUT).cast("timestamp")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(bcast_dim(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "l_orderkey",
            # DATE, not raw timestamp: DateType is tz-free on collect,
            # TimestampType renders in the consumer's OS zone (tz policy)
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(cents).alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Order-priority EXISTS counts — TPC-H Q4 shape.
# ---------------------------------------------------------------------------

_Q4_WINDOW = ("1997-07-01", "1997-10-01")
_Q4_LATE_DAYS = 60

_Q4_ORACLE = f"""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_WINDOW[0]}'
  AND o.o_orderdate <  TIMESTAMP '{_Q4_WINDOW[1]}'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY)
GROUP BY 1
"""


@query(
    "order_priority_exists",
    oracle=_Q4_ORACLE,
    tags=("relational", "semi_join", "J3"),
)
def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority counts of one quarter's orders that
    have at least one line shipped {late} days after the order date — a
    correlated EXISTS whose predicate references BOTH sides
    (l_shipdate vs o_orderdate), so it cannot be precomputed on
    lineitem alone.

    Spark form: LEFT SEMI join with the mixed condition in the join
    clause — the semi join keeps each order at most once regardless of
    how many late lines it has (no post-join dedup needed, unlike an
    inner join + distinct).  The quarter filter pushes to the orders
    scan (~4% of rows), the semi join shuffles both sides on orderkey,
    and the final priority rollup is a 5-group map-side partial.
    """
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_WINDOW[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_WINDOW[1]).cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"]
        > F.date_add(o["o_orderdate"], _Q4_LATE_DAYS).cast("timestamp")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Returned-item reporting — TPC-H Q10 shape.
# ---------------------------------------------------------------------------

_Q10_WINDOW = ("1999-01-01", "1999-04-01")

_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{_Q10_WINDOW[0]}'
  AND o.o_orderdate <  TIMESTAMP '{_Q10_WINDOW[1]}'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT 20
"""


@query(
    "returned_revenue_topk",
    oracle=_Q10_ORACLE,
    tags=("relational", "topk", "A1"),
)
def returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in one quarter — fact×fact join narrowed by pushed-down date and
    returnflag predicates, per-customer aggregation, nation name
    through a broadcast, global top-20 via TakeOrderedAndProject.

    Scale: order of operations is the whole game — filter BOTH facts
    at the scan (quarter ≈ 4% of orders, 'R' ≈ a third of lines), join
    on orderkey, then aggregate on custkey (one re-shuffle; the group
    count is bounded by |customers| so the heap-based top-20 sees a
    small frame).  Nation is broadcast AFTER the aggregation — joining
    dims post-agg keeps the shuffled rows narrow.
    """
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_WINDOW[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_WINDOW[1]).cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("revenue_cents"))
    )
    return (
        per_cust.join(bcast_dim(c), per_cust["o_custkey"] == c["c_custkey"])
        # bounded: nation (25 rows)
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("c_custkey", "c_name", "n_name", "revenue_cents")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Idle high-balance customers — TPC-H Q22 shape.
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH pos AS (
    SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM customer c, pos
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.total_cents
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


@query(
    "idle_customer_balance",
    oracle=_Q22_ORACLE,
    tags=("relational", "anti_join", "A12"),
)
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of customers whose
    account balance beats the global positive-balance average but who
    have never placed an order — a scalar aggregate subquery feeding a
    filter, plus a NOT EXISTS anti-join.

    The average threshold is cross-multiplied (``bal_cents * n >
    total_cents``) so the comparison is exact BIGINT arithmetic — no
    float division whose rounding could differ between engines (the
    same move as the Q11-shape `value_share_threshold`).

    Scale: the 1-row (total, count) aggregate broadcasts via
    crossJoin; the anti-join is the only wide shuffle — customer
    against orders on custkey, where Catalyst prunes orders to the
    single o_custkey column before the exchange, and AQE converts to
    broadcast when the order side's distinct keys fit.  The nation
    rollup aggregates ≤25 groups map-side.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    bal_cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(bal_cents).alias("total_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        c.withColumn("bal", bal_cents)
        # bounded: 1-row aggregate
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal") * F.col("n") > F.col("total_cents"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("bal").alias("bal_cents"),
        )
    )
