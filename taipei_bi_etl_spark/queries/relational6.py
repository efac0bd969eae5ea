"""Sixth relational batch — the last classic TPC-H-family plan shapes:
a disjunctive bracket join (Q19), the sole-late-supplier double
aggregate (Q21's EXISTS/NOT-EXISTS written decorrelated), and a
conditional-sum ratio over a dimension join (Q14), each adapted to the
columns the synthetic tables carry.

These matter as PLAN shapes: Q19's OR-of-ANDs spans both join sides
(naively a nested-loop join — the implied single-side predicates must
be derived by hand), and Q21's correlated EXISTS pair collapses into
one per-(order, supplier) profile aggregation read twice.  Exact cents
throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim

# ---------------------------------------------------------------------------
# Disjunctive bracket join — TPC-H Q19 shape.
# ---------------------------------------------------------------------------

#: (brand, max p_size, qty lo, qty hi) brackets — OR'd together.
_BRACKETS = (
    ("Brand#12", 15, 1, 11),
    ("Brand#23", 25, 10, 20),
    ("Brand#3", 35, 20, 30),
)

_BRACKET_SQL = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {s}"
    f" AND l.l_quantity BETWEEN {lo} AND {hi})"
    for b, s, lo, hi in _BRACKETS
)

_Q19_ORACLE = f"""
SELECT CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {_BRACKET_SQL}
"""


@query(
    "disjunctive_bracket_join",
    oracle=_Q19_ORACLE,
    tags=("relational", "join", "P5"),
)
def disjunctive_bracket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from lines matching any of three
    (brand, size, quantity) brackets — a join predicate that is an OR
    of conjuncts SPANNING BOTH SIDES, the shape that defeats automatic
    pushdown (no single conjunct holds for every branch, so nothing
    crosses the join boundary on its own).

    The engine-side fix is authoring-time predicate derivation, the
    same move the reference makes placing filters in innermost CTEs
    (SURVEY §4): the disjunction IMPLIES p_brand ∈ {{brands}} and
    l_quantity ∈ [global lo, global hi], so those single-side
    predicates are added explicitly — they push to both parquet scans
    and shrink the part side to ~3 brands (broadcast-able) — while the
    exact OR runs as the post-join residual.  Catalyst keeps the join
    an equi hash join on p_partkey; without the derived predicates the
    same query scans both tables in full.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    brands = [b for b, *_ in _BRACKETS]
    qty_lo = min(lo for *_, lo, _hi in _BRACKETS)
    qty_hi = max(hi for *_, hi in _BRACKETS)
    # hand-derived implied predicates (pushable, single-side)
    p = p.filter(F.col("p_brand").isin(brands))
    li = li.filter(F.col("l_quantity").between(qty_lo, qty_hi))
    residual = None
    for b, s, lo, hi in _BRACKETS:
        branch = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, s)
            & F.col("l_quantity").between(lo, hi)
        )
        residual = branch if residual is None else (residual | branch)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(bcast_dim(p), li["l_partkey"] == p["p_partkey"])
        .filter(residual)
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Sole-late-supplier — TPC-H Q21 shape, decorrelated.
# ---------------------------------------------------------------------------

LATE_DAYS = 90

_Q21_ORACLE = f"""
WITH ls AS (
    SELECT l.l_orderkey, l.l_suppkey,
           MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
                    THEN 1 ELSE 0 END) AS is_late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
), prof AS (
    SELECT l_orderkey,
           COUNT(*) AS n_supp,
           SUM(is_late) AS n_late
    FROM ls GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM ls
JOIN prof USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
WHERE ls.is_late = 1 AND prof.n_supp > 1 AND prof.n_late = 1
GROUP BY s.s_name
"""


@query(
    "sole_late_supplier",
    oracle=_Q21_ORACLE,
    tags=("relational", "subquery", "J3"),
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier
    ({LATE_DAYS}+ days after order date) on a multi-supplier order —
    the classic EXISTS (another supplier on the order) + NOT EXISTS
    (another LATE supplier) pair, decorrelated into one per-(order,
    supplier) profile read twice: ``n_supp > 1`` is the EXISTS,
    ``n_late = 1`` (with this supplier late) is the NOT EXISTS.

    Scale: the fact is hash-partitioned on l_orderkey ONCE, up front —
    the orders join and the (order, supplier) flag aggregation both
    reuse that exchange (hash-on-subset satisfies the superset's
    clustered distribution), and the per-order counts come from a
    WINDOW over the aggregated flags rather than a re-aggregation
    joined back: the aggregate-then-self-join form plans the whole
    fact subtree TWICE (no exchange reuse across the join's two
    sides), which the window form rules out by construction.
    Plan-audited: the fact is scanned once and ≤3 exchanges total
    (fact repartition, orders leg, final tiny s_name rollup).
    """
    li = read_table(spark, sf_dir, "lineitem").repartition("l_orderkey")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate")
        > F.date_add(F.col("o_orderdate"), LATE_DAYS).cast("timestamp"),
        1,
    ).otherwise(0)
    ls = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w = W.partitionBy("l_orderkey")
    flagged = ls.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late"),
    )
    return (
        flagged
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(bcast_dim(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Conditional-sum ratio over a dim join — TPC-H Q14 shape.
# ---------------------------------------------------------------------------

_Q14_WINDOW = ("1996-01-01", "1996-03-01")

_Q14_ORACLE = f"""
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_WINDOW[0]}'
  AND l.l_shipdate <  TIMESTAMP '{_Q14_WINDOW[1]}'
"""


@query(
    "promo_revenue_share",
    oracle=_Q14_ORACLE,
    tags=("relational", "A10"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the promo share of two months' revenue — a
    conditional sum against a dimension attribute fetched through a
    join (the numerator condition lives on ``part``, the measure on
    ``lineitem``).  Numerator and denominator are returned as exact
    cents; the percentage is the consumer's division (A10's
    ratio-of-sums discipline — never average ratios).

    Scale: ship-date window pushes to the fact scan; part broadcasts
    (only p_partkey/p_type survive pruning); ONE pass, no shuffle at
    all before the final 1-row aggregate of partials.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_WINDOW[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_WINDOW[1]).cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(bcast_dim(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0)).alias(
                "promo_cents"
            ),
            F.sum(cents).alias("total_cents"),
        )
    )
