"""Relational operator coverage (SURVEY.md §2.2-2.8) over the TPC-H-ish
tables.  Each query exercises one or more inventory rows (tags) and has a
DuckDB oracle twin.

Float policy: every float aggregate is rounded identically on both sides
(sums of 2-decimal money → round 2; ratios/avgs/percentiles → round 6) so
cross-engine summation-order noise cannot reach the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


# ---------------------------------------------------------------------------
# A1/A9 — pricing summary (TPC-H Q1 shape; reference analog: the daily
# search-volume rollup sql/mango_revenue_google.sql:3-21).
# ---------------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 / COUNT(*), 6) AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_ORACLE, tags=("A1", "A9", "P4"))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash group-by with 5 aggregates + date predicate (A1/A9/P4).

    Plan shape to protect at scale: filter pushed to the parquet scan,
    partial HashAggregate before the exchange on the 2 grouping keys
    (few groups → tiny shuffle regardless of input size).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            # avg over 2-decimal doubles: sum exact cents (order-free),
            # divide once — no ROUND-midpoint flap between engines
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
                / F.lit(100.0)
                / F.count(F.lit(1)),
                6,
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P3/P4/P6 — computed CASE projection + range & IN predicates
# (sql/mango_core_normalized.sql:2-3, sql/mango_feature_cohort_date.sql:31).
# ---------------------------------------------------------------------------

_CASE_ORACLE = """
SELECT CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'partial' END AS status_label,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
  AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
GROUP BY 1, 2
"""


@query("case_projection_filter", oracle=_CASE_ORACLE, tags=("P3", "P4", "P6", "A1"))
def case_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE projection + half-open date window + NOT IN (P3/P4/P6)."""
    o = read_table(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
    )
    return (
        o.filter(
            (F.to_date("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
            & ~F.col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED")
        )
        .groupBy(status.alias("status_label"), "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# P5 — LIKE predicate set (sql/mango_user_rfe_daily_session.sql:49-56).
# ---------------------------------------------------------------------------

_LIKE_ORACLE = """
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 / COUNT(*), 6) AS avg_price
FROM part
WHERE (p_type LIKE '%BRASS%' OR p_type LIKE 'SMALL%' OR p_type LIKE '%POLISHED%')
  AND p_size < 30
GROUP BY p_brand
"""


@query("like_filter_rollup", oracle=_LIKE_ORACLE, tags=("P5", "P9", "A1"))
def like_filter_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-chain of LIKE patterns + numeric threshold (P5/P9)."""
    p = read_table(spark, sf_dir, "part")
    likes = (
        F.col("p_type").like("%BRASS%")
        | F.col("p_type").like("SMALL%")
        | F.col("p_type").like("%POLISHED%")
    )
    return (
        p.filter(likes & (F.col("p_size") < 30))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("long"))
                / F.lit(100.0)
                / F.count(F.lit(1)),
                6,
            ).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# P8/P10 — regex row filter + null-replace (tasks/rps.py:154,
# tasks/revenue.py:98, sql/mango_user_channels.sql:117-132).
# ---------------------------------------------------------------------------

_REGEX_ORACLE = """
SELECT COALESCE(NULLIF(c_mktsegment, 'HOUSEHOLD'), 'unknown') AS segment,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END), 2) AS pos_bal
FROM customer
WHERE regexp_matches(c_name, '^Customer#0*[0-9]*[02468]$')
GROUP BY 1
"""


@query("regex_null_normalize", oracle=_REGEX_ORACLE, tags=("P8", "P10", "F14"))
def regex_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex row filter (P8) + NULLIF/COALESCE normalization chain (P10/F14)."""
    c = read_table(spark, sf_dir, "customer")
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("HOUSEHOLD")), F.lit("unknown"))
    return (
        c.filter(F.col("c_name").rlike("^Customer#0*[0-9]*[02468]$"))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(0.0)), 2
            ).alias("pos_bal"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — anti join (sql/mango_feature_cohort_date.sql:35) & semi join.
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS customers_without_orders
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


@query("anti_join_new_only", oracle=_ANTI_ORACLE, tags=("J3",))
def anti_join_new_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the reference's LEFT JOIN + IS NULL new-cohort
    pattern expressed natively (J3); Spark skips materializing the nulls."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
    )


_SEMI_ORACLE = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS active_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
GROUP BY c_mktsegment
"""


@query("semi_join_active", oracle=_SEMI_ORACLE, tags=("J3",))
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) with a pushed predicate on the probe side."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )


# ---------------------------------------------------------------------------
# J4/J5 — left join chain over the dimension hierarchy
# (sql/mango_user_rfe_28d.sql:105-117 shape).
# ---------------------------------------------------------------------------

_CHAIN_ORACLE = """
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@query("dim_join_chain", oracle=_CHAIN_ORACLE, tags=("J4", "J5", "J9"))
def dim_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-join chain fact→dim→dim→dim (J4/J5).  nation/region are
    broadcast explicitly (J9 rate-table pattern) — at 100 TB the only
    shuffle is orders↔customer; customer itself would be broadcast or
    bucket-joined on a real cluster depending on its size."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        # bounded: nation (25 rows)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        # bounded: region (5 rows)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J1/U2 — alternative-key join fan-out united
# (sql/mango_user_channels.sql:14-111: 4 token levels + null branch).
# ---------------------------------------------------------------------------

_ALTKEY_ORACLE = """
SELECT 'part' AS match_level, p.p_brand AS match_name,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 2
UNION ALL
SELECT 'supplier' AS match_level, s.s_name AS match_name,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 2
"""


@query("alt_key_union_join", oracle=_ALTKEY_ORACLE, tags=("J1", "U2"))
def alt_key_union_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternative-key attribution joins united with a level discriminator
    (J1/U2).  Aggregation is pushed below the union so each branch ships
    only group counts through its own join."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    by_part = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("match_name"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .select(F.lit("part").alias("match_level"), "match_name", "n_lines")
    )
    by_supp = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("match_name"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .select(F.lit("supplier").alias("match_level"), "match_name", "n_lines")
    )
    return by_part.unionByName(by_supp)


# ---------------------------------------------------------------------------
# A10/A12 — ratio-of-sums + grand-total share (sql/mango_feature_roi.sql:
# 64-99; tasks/rps.py:135-168 scalar factor).
# ---------------------------------------------------------------------------

_SHARE_ORACLE = """
WITH nat_rev AS (
  SELECT n.n_name AS nation,
         SUM(o.o_totalprice) AS revenue,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                       THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS fin_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation,
       ROUND(revenue, 2) AS revenue,
       ROUND(fin_cents / CAST(rev_cents AS DOUBLE), 6) AS finished_ratio,
       ROUND(rev_cents / CAST(SUM(rev_cents) OVER () AS DOUBLE), 6) AS revenue_share
FROM nat_rev
"""


@query("ratio_and_total_share", oracle=_SHARE_ORACLE, tags=("A10", "A12"))
def ratio_and_total_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-sums per group (A10) + share of grand total (A12).

    The grand total is an unpartitioned window over the ~25 aggregated
    rows — O(groups), not O(input); never a driver-side collect.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        # bounded: nation (25 rows)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            # exact integer cents: ratio inputs must be order-independent
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "rev_cents"
            ),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.round(F.col("o_totalprice") * 100, 0).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("fin_cents"),
        )
    )
    return nat.select(
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("fin_cents") / F.col("rev_cents").cast("double"), 6).alias(
            "finished_ratio"
        ),
        F.round(
            F.col("rev_cents")
            / F.sum("rev_cents").over(W.partitionBy()).cast("double"),
            6,
        ).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# W4 — percentile rollup (sql/mango_feature_roi.sql:3-62's 27 window
# percentiles, rewritten as a group-by aggregate as SURVEY §2.5 directs).
# ---------------------------------------------------------------------------

_PCTL_ORACLE = """
SELECT COALESCE(o_orderpriority, '(null)') AS o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1
"""


@query("percentile_rollup", oracle=_PCTL_ORACLE, tags=("W4",))
def percentile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE_CONT p25/p50/p75 per group (W4) as a group-by
    aggregate — one shuffle on the grouping key instead of the reference's
    window + SELECT DISTINCT collapse.  For 100 TB hot paths switch to
    percentile_approx (t-digest, mergeable sketch)."""
    # key coalesced in BOTH engines: a NULL group key breaks the
    # driver compare's row sort (hostile relational sweep)
    o = read_table(spark, sf_dir, "orders").withColumn(
        "o_orderpriority", F.coalesce("o_orderpriority", F.lit("(null)"))
    )
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


_PCTL_APPROX_ORACLE = """
SELECT COALESCE(o_orderpriority, '(null)') AS o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25_exact,
       ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50_exact,
       ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75_exact,
       CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS approx_ok
FROM orders GROUP BY 1
"""


@query(
    "percentile_rollup_approx",
    oracle=_PCTL_APPROX_ORACLE,
    tags=("W4", "scale", "extension"),
)
def percentile_rollup_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of percentile_rollup: percentile_approx's
    mergeable GK sketch replaces the exact sort-based aggregate — same
    plan shape (one grouped shuffle, partial+final), but executor memory
    is bounded by the sketch (accuracy parameter), not the group size.

    Oracle-checked via the exact+gate pattern (the GK estimate itself
    has no ANSI twin): the query computes the exact percentiles AND the
    sketch estimates, then verifies the GK rank guarantee directly —
    the returned value v occupies rank interval
    [count(x < v) + 1, count(x ≤ v)], which must overlap
    q·n ± (⌈eps·n⌉ + 1).  The emitted row carries the exact values
    plus the ``approx_ok`` verdict; DuckDB computes the exact side and
    literal TRUE, so the driver hash-checks the row while the sketch
    still runs.  (A value-interval gate is a trap here: GK returns a
    DATA value, while interpolated percentiles at q ± eps form an open
    interval strictly between data values.)
    """
    # key coalesced in BOTH engines: beyond the sort-crash class, a
    # NULL key would also fall out of the verify equi-join (NULL never
    # equals NULL), silently dropping the group Spark-side only
    o = read_table(spark, sf_dir, "orders").withColumn(
        "o_orderpriority", F.coalesce("o_orderpriority", F.lit("(null)"))
    )
    acc = 10_000  # rank error <= n/acc per group
    qs = ((0.25, "p25"), (0.50, "p50"), (0.75, "p75"))
    gk = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.expr(f"percentile(o_totalprice, {q})"), 6).alias(
                f"{name}_exact"
            )
            for q, name in qs
        ],
        *[
            F.percentile_approx("o_totalprice", q, acc).alias(f"{name}_gk")
            for q, name in qs
        ],
    )
    joined = o.select("o_orderpriority", "o_totalprice").join(
        # bounded: per-priority percentile aggregate (5 rows)
        F.broadcast(gk), "o_orderpriority"
    )
    rank_aggs = []
    for _, name in qs:
        rank_aggs += [
            F.sum(
                F.when(F.col("o_totalprice") < F.col(f"{name}_gk"), 1).otherwise(0)
            ).alias(f"{name}_below"),
            F.sum(
                F.when(F.col("o_totalprice") <= F.col(f"{name}_gk"), 1).otherwise(0)
            ).alias(f"{name}_upto"),
        ]
    keep = ["n"] + [f"{name}_exact" for _, name in qs]
    ranked = joined.groupBy("o_orderpriority", *keep).agg(*rank_aggs)
    slack = F.ceil(F.col("n") / F.lit(acc)) + F.lit(1)
    ok = F.lit(True)
    for q, name in qs:
        target = F.col("n") * F.lit(q)
        ok = (
            ok
            & (F.col(f"{name}_below") + 1 <= target + slack)
            & (F.col(f"{name}_upto") >= target - slack)
        )
    return ranked.select(
        "o_orderpriority",
        "p25_exact",
        "p50_exact",
        "p75_exact",
        "n",
        ok.alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# A7/A8 — dedup via DISTINCT / group-by-all-columns
# (sql/mango_user_rfe_daily_session.sql:1-32).
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS distinct_rows FROM (
  SELECT DISTINCT o_orderstatus, o_orderpriority,
         CAST(o_orderdate AS DATE) AS order_day
  FROM orders
)
"""


@query("distinct_dedup", oracle=_DISTINCT_ORACLE, tags=("A7", "A8"))
def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates over a projection (A7/A8) — partial dedup happens
    map-side before the shuffle, so the exchange carries unique rows only."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderstatus", "o_orderpriority", F.to_date("o_orderdate").alias("order_day")
        )
        .dropDuplicates()
        .agg(F.count(F.lit(1)).alias("distinct_rows"))
    )


# ---------------------------------------------------------------------------
# O1 — deterministic top-k (LIMIT over total order; sql/user_rfe.sql:27).
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


@query("topk_orders", oracle=_TOPK_ORACLE, tags=("O1",))
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a total order (O1).  Spark executes
    TakeOrderedAndProject — per-partition heaps + driver merge of k rows,
    no global sort."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# U1 — 3-way fan-out union with discriminator
# (sql/mango_events_feature_mapping.sql:88-163) — single-pass explode form.
# ---------------------------------------------------------------------------

_FANOUT_ORACLE = """
SELECT dim_type, COALESCE(dim_value, '(null)') AS dim_value,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM (
  SELECT 'brand' AS dim_type, p_brand AS dim_value FROM part
  UNION ALL
  SELECT 'type' AS dim_type, p_type AS dim_value FROM part
  UNION ALL
  SELECT 'container_size' AS dim_type, CAST(p_size AS VARCHAR) AS dim_value FROM part
)
GROUP BY 1, 2
"""


@query("union_fanout_dims", oracle=_FANOUT_ORACLE, tags=("U1", "U3"))
def union_fanout_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 3-way UNION ALL fan-out expressed as a single-pass
    explode of (type, value) structs (SURVEY §2.7 preferred form) — one
    scan of the input instead of three."""
    p = read_table(spark, sf_dir, "part")
    dims = F.array(
        F.struct(F.lit("brand").alias("dim_type"), F.col("p_brand").alias("dim_value")),
        F.struct(F.lit("type").alias("dim_type"), F.col("p_type").alias("dim_value")),
        F.struct(
            F.lit("container_size").alias("dim_type"),
            F.col("p_size").cast("string").alias("dim_value"),
        ),
    )
    return (
        p.select(F.explode(dims).alias("d"))
        .select(
            "d.dim_type",
            # NULL dim values coalesced in BOTH engines (driver-compare
            # row sort; hostile part doctoring)
            F.coalesce("d.dim_value", F.lit("(null)")).alias("dim_value"),
        )
        .groupBy("dim_type", "dim_value")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# F1-F8 — date/time function pack over orders×lineitem.
# ---------------------------------------------------------------------------

_DATEFN_ORACLE = """
SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(AVG(datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))), 6)
         AS avg_ship_lag_days,
       MIN(CAST(l.l_shipdate AS DATE) - 7) AS min_shipdate_minus_7d
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate IS NOT NULL
GROUP BY 1
"""


@query("date_function_pack", oracle=_DATEFN_ORACLE, tags=("F1", "F2", "F3", "F7"))
def date_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_TRUNC / DATE_DIFF / DATE_SUB pack (F1-F8) on the fact join."""
    # NULL order dates carry no calendar meaning — excluded in BOTH
    # engines (hostile relational sweep: a NULL month group breaks the
    # driver compare's row sort)
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    li = read_table(spark, sf_dir, "lineitem")
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    return j.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.avg(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))), 6
        ).alias("avg_ship_lag_days"),
        F.min(F.date_sub(F.to_date("l_shipdate"), 7)).alias("min_shipdate_minus_7d"),
    )
