"""Relational completeness beyond the reference's surface (SURVEY §2.5
"Frame specs: none", §2.7 "No INTERSECT / EXCEPT"): set operators,
explicit window frames, and distribution ranking.  A user switching
from the reference loses nothing; a user of a general engine gains the
standard repertoire.  All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT — repeat vs churned customers across two years.
# ---------------------------------------------------------------------------

_SETOP_ORACLE = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31')
SELECT 'both' AS set_op, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'only_1995' AS set_op, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
"""


@query("set_intersect_except", oracle=_SETOP_ORACLE, tags=("ext", "setops"))
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (retained customers) and EXCEPT (churned) between two
    order years, discriminated in one result.

    Both set ops are distinct-based (`intersect` / `subtract`), which
    Spark executes as partial-aggregated hash joins on the full row —
    at scale each leg is one shuffle of the already-distinct key set,
    and the two legs share the same scan via Catalyst CTE dedup.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    y95 = o.filter(F.col("d").between("1995-01-01", "1995-12-31")).select(
        "o_custkey"
    ).distinct()
    y96 = o.filter(F.col("d").between("1996-01-01", "1996-12-31")).select(
        "o_custkey"
    ).distinct()
    both = y95.intersect(y96).select(F.lit("both").alias("set_op"), "o_custkey")
    only95 = y95.subtract(y96).select(
        F.lit("only_1995").alias("set_op"), "o_custkey"
    )
    return both.unionByName(only95)


# ---------------------------------------------------------------------------
# Explicit ROWS frame — 7-order moving average per customer.
# ---------------------------------------------------------------------------

_MOVAVG_ORACLE = """
SELECT o_orderkey, o_custkey,
       COALESCE(ROUND(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  OVER w AS BIGINT) / 100.0 / COUNT(*) OVER w, 6), -1) AS mov_avg_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE) NULLS FIRST, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@query("moving_avg_frame", oracle=_MOVAVG_ORACLE, tags=("ext", "frame", "W4"))
def moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-order moving average with an explicit ROWS frame (the
    reference never leaves the default frame).  Ordering is made total
    with the unique orderkey tie-break, so the frame contents — and the
    exact-cents sum inside it — are deterministic on both engines.

    One hashpartitioning(custkey) exchange; the frame is bounded (7
    rows) so window state is O(1) per row at any scale.
    """
    o = read_table(spark, sf_dir, "orders")
    # NULLS FIRST pinned explicitly (Spark default, DuckDB is
    # nulls-last); an all-NULL-price frame yields a -1 sentinel in both
    # engines — NULL in the first compare-sorted column crashes the
    # driver compare (hostile relational sweep)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.to_date("o_orderdate").asc_nulls_first(), "o_orderkey")
        .rowsBetween(-6, W.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.coalesce(
            F.round(
                F.sum(cents).over(w) / F.lit(100.0)
                / F.count(F.lit(1)).over(w),
                6,
            ),
            F.lit(-1.0),
        ).alias("mov_avg_price"),
    )


# ---------------------------------------------------------------------------
# NTILE + PERCENT_RANK — customer spend quartiles within nation.
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
WITH spend AS (
    SELECT COALESCE(c.c_nationkey, -1) AS c_nationkey, o.o_custkey,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
)
SELECT c_nationkey, o_custkey,
       CAST(NTILE(4) OVER w AS INT) AS spend_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM spend
WINDOW w AS (PARTITION BY c_nationkey ORDER BY cents NULLS FIRST, o_custkey)
"""


@query("ntile_spend_quartiles", oracle=_NTILE_ORACLE, tags=("ext", "ntile", "W1"))
def ntile_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) + PERCENT_RANK over per-nation customer spend.  The
    ordering key (exact cents, custkey) is total, so bucket boundaries
    are engine-independent.  The customer dim joins broadcast; the spend
    rollup and the window share the computation's only wide exchanges.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # nation key coalesced + NULLS FIRST pinned in BOTH engines: an
    # all-NULL-price customer's spend aggregates to NULL and feeds the
    # window order key (hostile relational sweep, second pass)
    spend = (
        o.join(bcast_dim(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.coalesce("c_nationkey", F.lit(-1)).alias("c_nationkey"),
            F.col("o_custkey"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("cents").asc_nulls_first(), "o_custkey"
    )
    return spend.select(
        "c_nationkey",
        "o_custkey",
        F.ntile(4).over(w).cast("int").alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# Salted skew join — hot-key mitigation with unchanged semantics.
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@query("salted_skew_join_rollup", oracle=_SALTED_ORACLE, tags=("ext", "scale"))
def salted_skew_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue rollup routed through ``scale.salted_join``
    (SCALE.md "Skew & co-location"): the fact side gets a hash-derived
    salt in [0, 8), the dim side is replicated 8x, and the join key
    becomes (suppkey, salt) — one hot supplier key spreads across 8
    tasks instead of stalling its reducer.

    The oracle is the PLAIN three-way join: salting is a physical
    rewrite with identical semantics, and this query pins that claim
    cross-engine.  At sf the replicated dim still broadcasts (so the
    salt is free); at 100 TB with a shuffle join the salted key is what
    bounds the largest reducer.  AQE skew-split handles *discovered*
    skew; ``salted_join`` is the tool for *known* hot keys.
    """
    from taipei_bi_etl_spark.scale import salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_cents"),
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = (
        # bounded: nation (25 rows)
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("l_suppkey", "n_name")
    )
    joined = salted_join(li, dim, "l_suppkey", n_salts=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("price_cents").alias("rev_cents"),
    )


_DIST_WINDOW_ORACLE = """
WITH v AS (
    SELECT COALESCE(o_orderpriority, '(null)') AS o_orderpriority,
           o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
)
SELECT o_orderpriority, o_orderkey,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume_dist
FROM v
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents NULLS FIRST)
"""


@query(
    "distribution_window_ranks",
    oracle=_DIST_WINDOW_ORACLE,
    tags=("ext", "window"),
)
def distribution_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK and CUME_DIST per order within its priority class —
    the remaining distribution window functions next to
    `ntile_spend_quartiles`.  Both are tie-stable (equal keys share the
    value), so the hash is deterministic without a tiebreak column;
    the division (rank-1)/(n-1) is the same double both engines
    compute.  One window shuffle on the partition key.
    """
    # key coalesced + NULLS FIRST pinned in both engines (hostile
    # relational sweep: NULL cents rank-shifted between engines)
    o = read_table(spark, sf_dir, "orders").withColumn(
        "o_orderpriority", F.coalesce("o_orderpriority", F.lit("(null)"))
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = W.partitionBy("o_orderpriority").orderBy(cents.asc_nulls_first())
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    )
