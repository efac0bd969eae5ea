"""Second tranche of relational operator coverage: lateral explodes
(J7/J8), composite-key enrichment joins (J2/J6), pivot tables (A11),
count-distinct-of-expression (A4), element-wise means across frames
(A13), schema-only LIMIT 0 (O2), narrow projections (P1/P2), nested
build + recursive unnest roundtrip (S7), running totals (window frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# J7 — CROSS JOIN UNNEST (lateral explode): token frequencies
# (sql/mango_revenue_google.sql:10-11 searches map → rows).
# ---------------------------------------------------------------------------

_TOKENS_ORACLE = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents
)
GROUP BY token
HAVING COUNT(*) >= 5
"""


@query("explode_token_counts", oracle=_TOKENS_ORACLE, tags=("J7", "A1", "A3", "text"))
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of a tokenized column (J7) → per-token stats.
    explode is generated map-side (no shuffle); the only exchange is the
    token groupBy, pre-combined by partial aggregation."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", r"\s+")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("occurrences") >= 5)
    )


# ---------------------------------------------------------------------------
# J8 — LEFT JOIN UNNEST (outer lateral explode): keep rows with no
# matches (sql/mango_events_feature_mapping.sql:47-50).
# ---------------------------------------------------------------------------

_OUTER_EXPLODE_ORACLE = """
WITH m AS (
  SELECT doc_id, lang, regexp_extract_all(text, 'quer[a-z]*') AS hits
  FROM documents WHERE text IS NOT NULL
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(hit) AS BIGINT) AS n_hits,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, lang,
         unnest(CASE WHEN len(hits) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE hits END) AS hit
  FROM m
)
GROUP BY lang
"""


@query("explode_outer_matches", oracle=_OUTER_EXPLODE_ORACLE, tags=("J8", "P8"))
def explode_outer_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer keeps parent rows whose array is empty (J8) — the
    BigQuery LEFT JOIN UNNEST semantic; COUNT(hit) vs COUNT(*) shows the
    preserved null rows."""
    # NULL text: Spark's explode_outer preserves the parent row for a
    # NULL array, DuckDB's unnest drops it (len(NULL) CASE is NULL) —
    # filter both sides; the J8 semantic under test is EMPTY arrays.
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.explode_outer(
                F.regexp_extract_all("text", F.lit("quer[a-z]*"), 0)
            ).alias("hit"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("hit").alias("n_hits"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# J2/J6 + A4 — composite-key enrichment join + COUNT DISTINCT of an
# expression (sql/mango_feature_cohort_date.sql:20-29,
# sql/mango_user_rfe_daily_partial.sql:21).
# ---------------------------------------------------------------------------

_COMPOSITE_ORACLE = """
WITH per_type AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         COUNT(*) AS n,
         COUNT(DISTINCT CONCAT(CAST(CAST(ts AS DATE) AS VARCHAR), '|', event_type)) AS type_day_keys
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2, 3
), totals AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS day_total
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
)
SELECT p.user_id, p.day, p.event_type,
       CAST(p.n AS BIGINT) AS n,
       CAST(p.type_day_keys AS BIGINT) AS type_day_keys,
       ROUND(CAST(p.n AS DOUBLE) / t.day_total, 6) AS share_of_day
FROM per_type p LEFT JOIN totals t ON p.user_id = t.user_id AND p.day = t.day
"""


@query("composite_key_enrich", oracle=_COMPOSITE_ORACLE, tags=("J2", "J6", "A4"))
def composite_key_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join on a composite (user_id, day) key enriching a finer
    aggregate with its coarser total (J2/J6); includes COUNT DISTINCT of a
    concat expression (A4).  Both aggregates hash-partition on user_id
    prefixes, so AQE keeps the join co-partitioned."""
    # typed rollup: NULL event_type would also make the A4 CONCAT key
    # diverge (Spark concat is NULL-propagating, DuckDB's skips NULLs)
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .withColumn("day", F.to_date("ts"))
    )
    per_type = ev.groupBy("user_id", "day", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.concat(F.col("day").cast("string"), F.lit("|"), F.col("event_type"))
        ).alias("type_day_keys"),
    )
    totals = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("day_total"))
    return (
        per_type.join(totals, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "event_type",
            "n",
            "type_day_keys",
            F.round(F.col("n").cast("double") / F.col("day_total"), 6).alias(
                "share_of_day"
            ),
        )
    )


# ---------------------------------------------------------------------------
# A11 — pivot table (tasks/rps.py:147 pd.pivot_table).
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT n.n_name AS nation,
       ROUND(SUM(CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0 END), 2) AS rev_f,
       ROUND(SUM(CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice ELSE 0 END), 2) AS rev_o,
       ROUND(SUM(CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice ELSE 0 END), 2) AS rev_p
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


@query("pivot_status_revenue", oracle=_PIVOT_ORACLE, tags=("A11",))
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on an explicit value list (A11) — giving Spark the values
    up-front skips the extra distinct-values job AND keeps the output
    schema static (a must for a 100 TB pipeline contract)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        # bounded: nation (25 rows)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .sum("o_totalprice")
    )
    return piv.select(
        "nation",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("rev_f"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("rev_o"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("rev_p"),
    )


# ---------------------------------------------------------------------------
# A13 — element-wise mean across N frames (tasks/rps.py:99-108: 17
# iterator frames averaged per country) → union then avg.
# ---------------------------------------------------------------------------

# avg over doubles is summation-order-dependent and can land on a
# ROUND midpoint that flips between engines; sum exact integer micros
# (order-independent) and divide once instead.
_FRAMES_ORACLE = """
SELECT user_id,
       CAST(CAST(SUM(CAST(floor(v * 1000000) AS BIGINT)) AS BIGINT)
            // COUNT(*) AS BIGINT) AS avg_micros,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM (
  SELECT user_id, value AS v FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, value AS v FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, value AS v FROM events WHERE event_type = 'purchase'
)
GROUP BY user_id
"""


@query("mean_across_frames", oracle=_FRAMES_ORACLE, tags=("A13", "U5"))
def mean_across_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-iterator frame averaging (A13) = union the
    frames and aggregate once; Catalyst collapses the three scans of the
    same source into one via filter OR-merge under union when possible."""
    ev = read_table(spark, sf_dir, "events")
    frames = [
        ev.filter(F.col("event_type") == t).select("user_id", F.col("value").alias("v"))
        for t in ("view", "click", "purchase")
    ]
    u = frames[0].unionByName(frames[1]).unionByName(frames[2])
    # exact integer mean (micros, floor division): a ROUND()ed double
    # average flipped its last digit between engines at sf0.1 — the
    # float policy applies to derived means too, not just sums
    return (
        u.groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("v") * 1_000_000).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .select(
            "user_id",
            F.expr("s DIV n_frames").alias("avg_micros"),
            "n_frames",
        )
    )


# ---------------------------------------------------------------------------
# O2 — LIMIT 0 schema-only relation (tasks/bigquery.py:287-297).
# ---------------------------------------------------------------------------

_LIMIT0_ORACLE = """
SELECT o_orderkey, o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
LIMIT 0
"""


@query("schema_only_limit0", oracle=_LIMIT0_ORACLE, tags=("O2",))
def schema_only_limit0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT 0 schema derivation (O2): the driver's schema check passes
    while Spark's LocalLimit(0) prunes all execution — the analyzed plan
    IS the schema, no data is read."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name")
        .limit(0)
    )


# ---------------------------------------------------------------------------
# P1/P2 — explicit narrow projection + SELECT * EXCEPT
# (sql/mango_core.sql:1-31, sql/mango_events_unnested.sql:4-12).
# ---------------------------------------------------------------------------

_NARROW_ORACLE = """
SELECT COALESCE(l_returnflag, '(null)') AS l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY 1
"""


@query("narrow_projection", oracle=_NARROW_ORACLE, tags=("P1", "P2", "A3"))
def narrow_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop() of 13 of 16 columns (P2) before aggregating — the parquet
    ReadSchema must shrink to the 2 surviving columns (verified in
    tests/test_plans.py)."""
    li = read_table(spark, sf_dir, "lineitem")
    narrow = li.drop(
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_linestatus", "l_shipdate",
    )
    return narrow.groupBy(
        # coalesced in BOTH engines: NULL group keys break the driver
        # compare's row sort (hostile relational sweep)
        F.coalesce("l_returnflag", F.lit("(null)")).alias("l_returnflag")
    ).agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# S7 — nested hierarchy build + recursive unnest roundtrip
# (utils/marshalling.py:137-183 adjust networks→campaigns→…).
# ---------------------------------------------------------------------------

_NESTED_ORACLE = """
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS total_balance
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


@query("nested_unnest_roundtrip", oracle=_NESTED_ORACLE, tags=("S7", "J7"))
def nested_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds the region→nation→customer hierarchy as nested
    ARRAY<STRUCT> (collect_list of structs), then flattens it back with
    chained explodes carrying ancestor fields — the Spark form of the
    reference's recursive json_unnest (S7).  The roundtrip oracle is the
    plain relational join, proving semantic identity."""
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    nations = (
        # bounded: nation (25 rows)
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.collect_list(
                F.struct(F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal"))
            ).alias("customers")
        )
        .groupBy("n_regionkey")
        .agg(
            F.collect_list(
                F.struct(F.col("n_name").alias("name"), F.col("customers").alias("customers"))
            ).alias("nations")
        )
    )
    # bounded: region (5 rows)
    nested = F.broadcast(r).join(nations, r.r_regionkey == nations.n_regionkey)
    # recursive flatten: one explode per hierarchy level, ancestors prefixed
    flat = (
        nested.select(F.col("r_name").alias("region"), F.explode("nations").alias("nat"))
        .select("region", F.col("nat.name").alias("nation"), F.explode("nat.customers").alias("cust"))
        .select("region", "nation", "cust.custkey", "cust.acctbal")
    )
    return flat.groupBy("region", "nation").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("acctbal"), 2).alias("total_balance"),
    )


# ---------------------------------------------------------------------------
# Window frames extension — running totals (beyond the reference's
# frame-less windows; Spark default frame = range unbounded→current).
# ---------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS BIGINT) AS order_seq
FROM orders
WHERE o_custkey % 100 = 0
"""


@query("running_total_per_customer", oracle=_RUNNING_ORACLE, tags=("W+", "extension"))
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer with an explicit ROWS frame — an
    extension beyond the reference's frame-less windows; single shuffle on
    o_custkey shared by both window functions."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    # NULLS FIRST pinned EXPLICITLY in both engines: Spark ASC defaults
    # to nulls-first, DuckDB to nulls-last — a NULL order date silently
    # shifts every running total after it (hostile relational sweep)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("order_day"),
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )
