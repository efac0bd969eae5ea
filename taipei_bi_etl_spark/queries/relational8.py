"""Eighth relational batch — the multi-dimension TPC-H family: the pure
pushdown scan aggregate (Q6), bi-directional nation-pair volume (Q7),
market-share ratio by year (Q8), product profit rollup (Q9), the
distinct-supplier census with a NOT-IN exclusion (Q16), and the
dominant-supplier nested-aggregate semi-join (Q20) — each adapted to
the synthetic tables (lineitem doubles as the partsupp catalog).

Plan-shape notes: Q7's OR-of-nation-pairs is kept as a residual over a
pre-filtered 2-nation broadcast (the J1 alternative-key family); Q8/Q9
demonstrate that a 5–6 table star collapses to ONE fact shuffle when
every dimension broadcasts; Q16's NOT IN is an anti-join; Q20's
"more than half of the part's total" is a window share over an
aggregate, not an aggregate self-join.  Exact cents everywhere per the
repo float policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim

_REV_CENTS_SQL = (
    "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)"
)


def _rev_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")


# ---------------------------------------------------------------------------
# Forecast revenue delta — TPC-H Q6 shape (scan-only aggregate).
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(round(l.l_extendedprice * l.l_discount * 100)
                AS BIGINT)) AS BIGINT) AS delta_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND l.l_discount BETWEEN 0.05 AND 0.07
  AND l.l_quantity < 24
"""


@query("forecast_revenue_delta", oracle=_Q6_ORACLE, tags=("relational", "P4"))
def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue that would move if small low-discount
    orders lost their discount — a single-table filtered aggregate with
    ZERO joins and ZERO wide shuffles.

    This is the canonical pushdown/codegen microbench: all three
    predicates reach the parquet scan as PushedFilters, only three
    columns survive ReadSchema pruning, and the whole query is one
    WholeStageCodegen span ending in a 1-row partial+final aggregate.
    At 100 TB this query's cost is pure IO — any plan that shuffles
    here is wrong.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    delta = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100, 0
    ).cast("long")
    return li.agg(
        F.sum(delta).alias("delta_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Nation-pair shipping volume — TPC-H Q7 shape.
# ---------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_3", "NATION_7")

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
  AND l.l_shipdate <  TIMESTAMP '2000-01-01'
  AND ((n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
    OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}'))
GROUP BY 1, 2, 3
"""


@query("nation_pair_volume", oracle=_Q7_ORACLE, tags=("relational", "J1"))
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two years of trade volume between two nations,
    in both directions, by year — the nation-pair OR spans the
    supplier side and the customer side at once.

    Scale strategy: both nation legs are pre-filtered to the TWO named
    nations BEFORE joining (the disjunction implies n1 ∈ pair AND
    n2 ∈ pair — the same hand-derived implied-predicate move as the
    Q19 bracket join), so supplier and customer shrink to ~8% and
    broadcast; the exact direction constraint runs as a cheap residual
    after both broadcasts.  The fact is filtered by the pushed
    ship-date window and the supplier broadcast BEFORE the one wide
    shuffle (orders join on orderkey); the final (nation, nation,
    year) rollup has ~4 groups and aggregates map-side.
    """
    pair = list(_Q7_NATIONS)
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(
            # bounded: nation (25 rows)
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                 F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        read_table(spark, sf_dir, "customer")
        .join(
            # bounded: nation (25 rows)
            F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                                 F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders")
    direction_ok = (
        (F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1])
    ) | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
    return (
        li.join(bcast_dim(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast_dim(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(direction_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


# ---------------------------------------------------------------------------
# Market share by year — TPC-H Q8 shape.
# ---------------------------------------------------------------------------

_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_3"
_Q8_TYPE = "PROMO"

_Q8_ORACLE = f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = '{_Q8_NATION}'
                     THEN {_REV_CENTS_SQL} ELSE 0 END) AS BIGINT)
         AS nation_cents,
       CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS total_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
JOIN region r   ON n2.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}'
  AND o.o_orderdate >= TIMESTAMP '1998-01-01'
  AND o.o_orderdate <  TIMESTAMP '2000-01-01'
GROUP BY 1
"""


@query("market_share_by_year", oracle=_Q8_ORACLE, tags=("relational", "A10"))
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of {type}-part revenue sold
    into one region, by order year — an 8-table star whose answer is a
    conditional-sum ratio (numerator and denominator in exact cents;
    the division belongs to the consumer, per A10).

    Scale: every dimension leg broadcasts — part filtered to one type,
    region→nation→customer pre-joined into one ~20% customer broadcast,
    supplier carrying its nation name.  The fact is filtered by the
    pushed part broadcast and joins orders on the ONLY wide shuffle
    (orderkey).  Eight logical tables, one exchange: this is the shape
    that proves star-join cost is fact-scan cost.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(
            # bounded: nation (25 rows)
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                 F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    # nation⋈region pre-reduced to a key list (25×5 bounded), then a
    # SEMI join: customers-in-region is a filter, not an enrichment —
    # and a semi join's size estimate is the customer scan itself, not
    # the size-only join product, so bcast_dim judges the real payload.
    # bounded: nation x region key list (<= 25 rows)
    region_nations = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust_region = (
        read_table(spark, sf_dir, "customer")
        .join(
            # bounded: nation key list (25 rows)
            F.broadcast(region_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    rev = _rev_cents()
    return (
        li.join(bcast_dim(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(bcast_dim(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast_dim(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == _Q8_NATION, rev).otherwise(0)
            ).alias("nation_cents"),
            F.sum(rev).alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Product profit rollup — TPC-H Q9 shape.
# ---------------------------------------------------------------------------

_Q9_LIKE = "%gear%"

_Q9_ORACLE = f"""
SELECT n.n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV_CENTS_SQL}
                - CAST(round(p.p_retailprice * 10) AS BIGINT)
                  * CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
         AS profit_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '{_Q9_LIKE}'
GROUP BY 1, 2
"""


@query("product_profit_rollup", oracle=_Q9_ORACLE, tags=("relational", "A1"))
def product_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per supplier-nation per order-year profit on all
    parts whose name matches a substring — revenue minus a unit cost
    taken from the part dimension (10% of retail price, since the
    synthetic schema has no partsupp.ps_supplycost).

    The cost term is exact BIGINT: ``round(p_retailprice * 10)`` IS
    10% of the price in cents (retail*100/10), multiplied by the
    integral quantity — no float division anywhere near the hash.

    Scale: part (substring-filtered, ~15% survivors) and
    supplier×nation broadcast; the single wide shuffle is the orders
    join on orderkey; the (25 nations × 7 years) rollup aggregates
    map-side.  The LIKE cannot push to a parquet row-group statistic
    but DOES prune via the broadcast-hash-join's runtime filter on
    l_partkey.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like(_Q9_LIKE))
    n = read_table(spark, sf_dir, "nation")
    s = (
        read_table(spark, sf_dir, "supplier")
        # bounded: nation (25 rows)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    profit = _rev_cents() - (
        F.round(F.col("p_retailprice") * 10, 0).cast("long")
        * F.round(F.col("l_quantity"), 0).cast("long")
    )
    return (
        li.join(bcast_dim(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(bcast_dim(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_cents"))
    )


# ---------------------------------------------------------------------------
# Supplier census with NOT-IN exclusion — TPC-H Q16 shape.
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 7, 14, 21, 28, 35, 42, 49)

_Q16_ORACLE = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN {_Q16_SIZES}
  AND ps.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@query(
    "supplier_census_notin",
    oracle=_Q16_ORACLE,
    tags=("relational", "anti_join", "A3"),
)
def supplier_census_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (reputable) suppliers can
    deliver each (brand, type, size) combination — the supply catalog
    derived from lineitem, a NOT IN exclusion subquery, and a COUNT
    DISTINCT census.

    The NOT IN becomes a LEFT ANTI join against the (tiny, broadcast)
    blacklist of negative-balance suppliers — same plan as J3's
    left+IS NULL rewrite, minus the null-column scaffolding.  NOTE the
    semantic trap: SQL NOT IN returns no rows if the subquery yields a
    NULL; the blacklist key is non-null here, making anti-join exactly
    equivalent — the engine asserts that by construction (filter on a
    non-null column).

    Scale: the (partkey, suppkey) distinct is the one wide shuffle and
    doubles as the partial for the census: countDistinct over rows
    already unique per (part, supp) group needs no second expand.  The
    filtered part dim broadcasts after the catalog shrink.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(list(_Q16_SIZES))
    )
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    catalog = li.select("l_partkey", "l_suppkey").distinct()
    return (
        catalog.join(
            bcast_dim(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(bcast_dim(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Dominant-supplier semi-join — TPC-H Q20 shape.
# ---------------------------------------------------------------------------

_Q20_YEAR = ("1999-01-01", "2000-01-01")
_Q20_LIKE = "small%"

_Q20_ORACLE = f"""
WITH shipped AS (
    SELECT l.l_partkey, l.l_suppkey,
           CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '{_Q20_LIKE}'
      AND l.l_shipdate >= TIMESTAMP '{_Q20_YEAR[0]}'
      AND l.l_shipdate <  TIMESTAMP '{_Q20_YEAR[1]}'
    GROUP BY 1, 2
), tot AS (
    SELECT l_partkey, l_suppkey, qty,
           SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM shipped
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM tot
JOIN supplier s ON s.s_suppkey = tot.l_suppkey
WHERE tot.qty * 2 > tot.part_qty
"""


@query(
    "dominant_supplier_semi",
    oracle=_Q20_ORACLE,
    tags=("relational", "semi_join", "window"),
)
def dominant_supplier_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some
    small-part's annual volume — the nested aggregate subquery
    (``ps_availqty > 0.5 * (SELECT SUM(l_quantity) ...)``) expressed
    as a window share over one aggregation, then a DISTINCT semi-join
    into supplier.

    The half-share test is integer cross-multiplication (``qty * 2 >
    part_qty``) — exact, no 0.5 float factor.

    Scale: the part filter broadcasts into the fact scan, the per
    (part, supplier) aggregate is the one wide shuffle, and the window
    re-clusters on its prefix key l_partkey — a hash-on-subset the
    optimizer satisfies without a second exchange when the aggregate
    is pre-partitioned on l_partkey (same move as the Q2 catalog).
    The qualifying (supplier) set is tiny; DISTINCT collapses it
    map-side before the broadcast supplier join.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q20_YEAR[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q20_YEAR[1]).cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like(_Q20_LIKE))
    s = read_table(spark, sf_dir, "supplier")
    shipped = (
        li.join(bcast_dim(p), F.col("l_partkey") == F.col("p_partkey"))
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity", 0).cast("long")).alias("qty"))
    )
    w = W.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(bcast_dim(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Interpolated percentiles — PERCENTILE_CONT WITHIN GROUP (ordered-set
# aggregate), completing W4's distribution family.
# ---------------------------------------------------------------------------

_PCONT_ORACLE = """
SELECT COALESCE(l.l_returnflag, '(null)') AS l_returnflag,
       percentile_cont(0.25) WITHIN GROUP
         (ORDER BY CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS p25_cents,
       percentile_cont(0.50) WITHIN GROUP
         (ORDER BY CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS p50_cents,
       percentile_cont(0.75) WITHIN GROUP
         (ORDER BY CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS p75_cents
FROM lineitem l
GROUP BY 1
"""


@query(
    "percentile_cont_quartiles",
    oracle=_PCONT_ORACLE,
    tags=("relational", "W4"),
)
def percentile_cont_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated price quartiles per return flag via the ordered-set
    aggregate ``PERCENTILE_CONT(q) WITHIN GROUP`` — the ANSI spelling
    of the reference's 27-way `PERCENTILE_CONT ... OVER` rollup (W4,
    `sql/mango_feature_roi.sql:3-62`), which this engine rewrites as a
    GROUP BY aggregate (the window+DISTINCT form materializes every
    row once per percentile).

    Float-policy note: the inputs are exact integer cents and the
    quartile fractions are dyadic (1/4, 1/2, 3/4), so the linear
    interpolation ``lo + (hi-lo)·f`` is exactly representable — the
    one place a float crosses the oracle hash without rounding, safe
    by construction.  Scale: one shuffle on the group key; Spark's
    percentile aggregate buffers per-group values — bounded here by
    the 3-flag cardinality, the right plan when groups are few and
    wide (for high-cardinality groups see `percentile_rollup_approx`'s
    GK sketch).
    """
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    # coalesced in both engines (driver-compare sort, hostile sweep)
    w = li.select(
        F.coalesce("l_returnflag", F.lit("(null)")).alias("l_returnflag"),
        cents.alias("c"),
    )
    return w.groupBy("l_returnflag").agg(
        F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY c)").alias(
            "p25_cents"
        ),
        F.expr("percentile_cont(0.50) WITHIN GROUP (ORDER BY c)").alias(
            "p50_cents"
        ),
        F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY c)").alias(
            "p75_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit — warehouse ops as a query.
# ---------------------------------------------------------------------------

_FK_ORACLE = """
SELECT 'orders.o_custkey' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.l_orderkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem.l_partkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem.l_suppkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
"""


@query("fk_orphan_audit", oracle=_FK_ORACLE, tags=("checks", "anti_join"))
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign key
    in the star schema, one row per constraint — the warehouse ops
    query behind the reference's validation layer (V1–V6,
    `tasks/revenue.py:126-144`) generalized from column checks to
    cross-table constraints.

    Each constraint is a LEFT ANTI join + count.  Scale: the parent
    key sets (customer/part/supplier) broadcast after pruning to the
    key column; the orders-side parent of lineitem is large, so that
    anti join shuffles both sides on orderkey — at 100 TB you run
    this audit per ingested partition, not per table, and the counts
    union map-side (4 one-row frames).
    """
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    p = read_table(spark, sf_dir, "part").select("p_partkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey")

    def orphans(child: DataFrame, cond, parent: DataFrame, label: str) -> DataFrame:
        return (
            child.join(parent, cond, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    out = orphans(o, o["o_custkey"] == F.col("c_custkey"), c, "orders.o_custkey")
    out = out.unionByName(
        orphans(
            li,
            li["l_orderkey"] == o["o_orderkey"],
            o.select("o_orderkey"),
            "lineitem.l_orderkey",
        )
    )
    out = out.unionByName(
        orphans(li, li["l_partkey"] == F.col("p_partkey"), p, "lineitem.l_partkey")
    )
    return out.unionByName(
        orphans(li, li["l_suppkey"] == F.col("s_suppkey"), s, "lineitem.l_suppkey")
    )
