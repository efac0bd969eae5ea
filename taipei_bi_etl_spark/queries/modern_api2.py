"""Modern SQL surfaces, part 2 — Spark 4 SQL pipe syntax and the
correlated LATERAL subquery (per-group top-k as a join, the Q-shape
twin of the window-rank form in `topk_per_group`).

These exist so a user of the reference (whose only query language was
BigQuery Standard SQL strings, `tasks/bigquery.py:315-319`) can migrate
templated SQL forward: pipe syntax is the modern authoring surface for
exactly the layered-CTE style the reference uses everywhere
(`sql/mango_user_rfe_daily_session.sql` is five stacked CTEs), and
LATERAL is the standard-SQL spelling of its UNNEST cross-joins (J7)
generalized to arbitrary correlated subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import register_views
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# SQL pipe syntax — Spark 4 authoring surface.
# ---------------------------------------------------------------------------

_PIPE_ORACLE = """
SELECT l.l_returnflag, l.l_linestatus,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
  AND l.l_quantity BETWEEN 5 AND 45
GROUP BY 1, 2
"""

_PIPE_QUERY = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1998-01-01'
   AND l_quantity BETWEEN 5 AND 45
|> EXTEND CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
     AS cents
|> AGGREGATE CAST(SUM(cents) AS BIGINT) AS revenue_cents,
             COUNT(*) AS n_lines
   GROUP BY l_returnflag, l_linestatus
"""


@query("pipe_syntax_rollup", oracle=_PIPE_ORACLE, tags=("modern", "sql"))
def pipe_syntax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing rollup written in Spark 4 SQL pipe syntax (`|>` stages:
    WHERE → EXTEND → AGGREGATE) — each stage reads top-to-bottom the
    way the plan executes, replacing the inside-out nested-CTE style
    of the reference's SQL files.

    Pipe syntax is pure surface: Catalyst parses it to the identical
    logical plan as the GROUP BY form, so pushdown, pruning, and
    map-side partial aggregation all apply unchanged — the oracle
    match proves the equivalence.
    """
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_PIPE_QUERY)


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery with LIMIT — per-order top-k as a join.
# ---------------------------------------------------------------------------

_LATERAL_CUT = "2001-01-01"

_LATERAL_ORACLE = f"""
SELECT o.o_orderkey, t.l_linenumber, t.cents
FROM orders o, LATERAL (
    SELECT l.l_linenumber,
           CAST(COALESCE(round(l.l_extendedprice * 100), -1) AS BIGINT) AS cents
    FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
    ORDER BY cents DESC, l.l_linenumber
    LIMIT 2) t
WHERE o.o_orderdate >= TIMESTAMP '{_LATERAL_CUT}'
"""

_LATERAL_QUERY = f"""
SELECT o.o_orderkey, t.l_linenumber, t.cents
FROM orders o JOIN LATERAL (
    SELECT l.l_linenumber,
           CAST(COALESCE(round(l.l_extendedprice * 100), -1) AS BIGINT) AS cents
    FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
    ORDER BY cents DESC, l.l_linenumber
    LIMIT 2) t
WHERE o.o_orderdate >= TIMESTAMP '{_LATERAL_CUT}'
"""


@query(
    "lateral_topk_per_order",
    oracle=_LATERAL_ORACLE,
    tags=("modern", "sql", "topk"),
)
def lateral_topk_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two priciest lines of each recent order via a correlated
    LATERAL subquery with ORDER BY + LIMIT — the standard-SQL spelling
    of "top-k per group as a join", and the generalization of the
    reference's `CROSS JOIN UNNEST` laterals (J7,
    `sql/mango_revenue_google.sql:10-11`) to arbitrary subqueries.

    Catalyst decorrelates this into a window-rank under the hood (no
    per-outer-row re-execution — the naive nested-loop reading would
    be quadratic), which is exactly the hand-written plan in
    `topk_per_group`; the deterministic tie-break (cents DESC,
    linenumber) makes the LIMIT stable cross-engine.  Scale: one
    orderkey shuffle for the decorrelated join+rank; the date filter
    pushes to the orders scan and prunes the fact via the join.
    """
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_LATERAL_QUERY)


# ---------------------------------------------------------------------------
# Parameterized SQL + IDENTIFIER clause — safe templating.
# ---------------------------------------------------------------------------

_PARAM_CUT = "2000-07-01"

_PARAM_ORACLE = f"""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_PARAM_CUT}'
GROUP BY 1
"""


@query("parameterized_sql_rollup", oracle=_PARAM_ORACLE, tags=("modern", "sql"))
def parameterized_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole query-compilation layer is string
    templating — ``read_string("sql/x.sql").format(project=, dataset=,
    start_date=, ...)`` (`tasks/bigquery.py:315-319`) — which splices
    raw values into SQL text.  This is its modern replacement:
    ``spark.sql(query, args={...})`` binds VALUES as typed literal
    parameters (`:cut`) and table names through the ``IDENTIFIER``
    clause (`:tbl`), so the engine sees parameters as parse-tree
    nodes, never as spliced text — templating without injection and
    without replanning-by-string-identity.

    Plan-wise the bound literal behaves exactly like an inlined one
    (pushed to the scan, constant-folded); the oracle match plus the
    shared plan shape proves parameterization is surface-only.
    """
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= CAST(:cut AS TIMESTAMP)
        GROUP BY 1
        """,
        args={"tbl": "orders", "cut": _PARAM_CUT},
    )


# ---------------------------------------------------------------------------
# mapInArrow — the zero-copy Arrow batch surface.
# ---------------------------------------------------------------------------

_ARROW_ORACLE = """
SELECT e.vec_id,
       CAST(round(sqrt(list_sum(list_transform(e.embedding,
                                x -> CAST(x AS DOUBLE) * x))) * 1000000)
            AS BIGINT) AS l2_micros
FROM embeddings e
WHERE embedding IS NOT NULL AND len(embedding) = 64
"""


@query("arrow_batch_norms", oracle=_ARROW_ORACLE, tags=("modern", "arrow"))
def arrow_batch_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norms computed in ``mapInArrow`` — the zero-copy
    sibling of the `multimodal.py` mapInPandas stages: batches arrive
    as raw ``pyarrow.RecordBatch`` (no pandas materialization, no
    object boxing), numpy reduces them vectorized, and one batch goes
    back out.  This is the right surface for numeric kernels over
    array columns where even the pandas conversion tax matters
    (embedding pipelines at 100 TB: ~2× less peak memory per batch
    than mapInPandas, same partition-parallel execution).

    Float policy: the norm is rounded to integer MICROS inside the
    kernel; numpy's pairwise summation over a 64-float vector differs
    from a sequential sum by < 1e-10 relative — far inside the 1e-6
    rounding quantum, so the hash is stable cross-engine (the oracle
    computes the same quantity in SQL).
    """
    import numpy as np
    import pyarrow as pa

    from taipei_bi_etl_spark.io import read_table

    from taipei_bi_etl_spark.queries.emb_common import read_embeddings

    # the numpy kernel flattens to (n, 64) — NULL/ragged rows must not
    # reach the worker (emb_common gate, mirrored in the oracle WHERE)
    emb = read_embeddings(spark, sf_dir).select("vec_id", "embedding")

    def norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            embs = batch.column("embedding")
            # list<float32> of FIXED dim → (n, d) numpy in one flatten;
            # ragged inputs would need the offsets array instead
            flat = np.asarray(embs.flatten(), dtype=np.float64)
            n = len(embs)
            d = len(flat) // n if n else 0
            m = flat.reshape(n, d) if n else flat.reshape(0, 0)
            l2 = np.sqrt((m * m).sum(axis=1))
            out = np.round(l2 * 1_000_000).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [vec_ids, pa.array(out, type=pa.int64())],
                names=["vec_id", "l2_micros"],
            )

    return emb.mapInArrow(norms, "vec_id long, l2_micros long")


# ---------------------------------------------------------------------------
# LISTAGG WITHIN GROUP — ordered string aggregation.
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
WITH ranked AS (
    SELECT COALESCE(c_mktsegment, '(null)') AS c_mktsegment, c_name,
           ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                        c_custkey) AS rn
    FROM customer
)
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY rn) AS top_names
FROM ranked WHERE rn <= 5
GROUP BY 1
"""


@query(
    "segment_top_spender_listagg",
    oracle=_LISTAGG_ORACLE,
    tags=("modern", "sql", "A2"),
)
def segment_top_spender_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each market segment's five highest-balance customers as ONE
    ordered, comma-joined string — ``LISTAGG ... WITHIN GROUP`` (Spark
    4's ordered-string aggregate; DuckDB spells it ``string_agg ...
    ORDER BY``), the presentation-layer reshape the reference does
    downstream in its BI tool.

    Determinism discipline for hashed string aggregation: the order
    key must be a TOTAL order (integer-cents balance, then custkey) —
    an ORDER BY with ties would hash differently per engine/run.  The
    rank-then-agg shape keeps the aggregated strings bounded (≤5
    names) no matter the group size; listagg over unbounded groups is
    the string version of collect_list and carries the same OOM
    caveat at scale.
    """
    from taipei_bi_etl_spark.io import read_table

    # segment key coalesced in BOTH engines (driver-compare sort,
    # hostile relational sweep)
    c = read_table(spark, sf_dir, "customer").withColumn(
        "c_mktsegment", F.coalesce("c_mktsegment", F.lit("(null)"))
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("c_mktsegment").orderBy(
            F.round(F.col("c_acctbal") * 100, 0).cast("long").desc(),
            F.col("c_custkey").asc(),
        )
    )
    ranked = c.withColumn("rn", rn).filter(F.col("rn") <= 5)
    return ranked.groupBy("c_mktsegment").agg(
        F.expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY rn)").alias(
            "top_names"
        )
    )


# ---------------------------------------------------------------------------
# try_* functions — ANSI-mode-safe arithmetic over dirty data.
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN li.qty > 0
                     THEN cents // li.qty ELSE NULL END) AS BIGINT)
         AS sum_unit_cents
FROM orders o
JOIN (
    SELECT l_orderkey,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY 1
) li ON li.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@query("ansi_safe_unit_price", oracle=_TRY_ORACLE, tags=("modern", "ansi"))
def ansi_safe_unit_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status order counts and summed integer unit prices, with the
    division guarded by ``try_divide`` — the ANSI-mode discipline:
    Spark 4 runs ANSI SQL by default, where ``x / 0`` and overflow
    RAISE instead of returning NULL/wrapping (a silent-corruption
    class the reference's pandas layer could never catch).  ``try_*``
    functions opt individual expressions back into NULL-on-error,
    turning "one bad row kills the 100 TB job at hour 9" into a
    NULL the aggregate skips — without disabling ANSI checks for the
    correct rows.

    The quotient is floored to integer cents (BIGINT `div`) per the
    float policy; the oracle spells the same guard as CASE WHEN.
    """
    from taipei_bi_etl_spark.io import read_table

    li = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
            F.sum(F.round("l_quantity", 0).cast("long")).alias("qty"),
        )
    )
    o = read_table(spark, sf_dir, "orders")
    unit = F.expr("try_divide(cents, qty)")
    floored = F.when(
        F.col("qty") > 0, F.expr("cents DIV qty")
    ).otherwise(F.lit(None).cast("long"))
    # try_divide proves the NULL-on-error path; the hashed value uses
    # the exact integer floor so no float crosses the oracle compare
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .withColumn("_guard", unit)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(floored).alias("sum_unit_cents"),
        )
    )


# ---------------------------------------------------------------------------
# SQL scripting — compound statements (Spark 4).
# ---------------------------------------------------------------------------

_SCRIPT_ORACLE = """
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
  AND o.o_totalprice > 1000.0
GROUP BY 1
"""


@query("sql_scripting_rollup", oracle=_SCRIPT_ORACLE, tags=("modern", "sql"))
def sql_scripting_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same rollup authored as a Spark 4 SQL SCRIPT (BEGIN…END with
    DECLARE'd variables and a computed threshold) — the in-engine form
    of the reference's Python driver loop (`tasks/bigquery.py:416-461`
    computes dates/params in Python, then splices them into SQL text).
    Variables resolve in the engine's own scope, so the "driver logic"
    ships WITH the query — one artifact, no host-language templating.

    The script's last statement is the result; Catalyst plans it
    exactly like the inlined-constant form (the oracle), with the
    variable references constant-folded.
    """
    from taipei_bi_etl_spark.io import register_views

    old = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        register_views(spark, sf_dir, ["orders"])
        return spark.sql(
            """
            BEGIN
              DECLARE cutoff TIMESTAMP DEFAULT TIMESTAMP '2000-01-01';
              DECLARE min_price DOUBLE DEFAULT 1000.0;
              SELECT o_orderstatus,
                     COUNT(*) AS n_orders,
                     CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS total_cents
              FROM orders
              WHERE o_orderdate >= cutoff AND o_totalprice > min_price
              GROUP BY 1;
            END
            """
        )
    finally:
        spark.conf.set("spark.sql.scripting.enabled", old)


# ---------------------------------------------------------------------------
# SQL UDFs — CREATE FUNCTION parity with the reference's UDF layer.
# ---------------------------------------------------------------------------

_SQL_UDF_ORACLE = """
SELECT CASE WHEN c.c_nationkey % 5 = 0 THEN 'IN'
            WHEN c.c_nationkey % 5 = 1 THEN 'ID'
            WHEN c.c_nationkey % 5 = 2 THEN 'THS'
            ELSE 'Others' END AS market,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM customer c
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1
"""


@query("sql_udf_rollup", oracle=_SQL_UDF_ORACLE, tags=("modern", "sql", "D6"))
def sql_udf_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole UDF lifecycle — ``CREATE OR REPLACE
    FUNCTION`` SQL UDFs registered per session, then referenced by
    templated queries (`tasks/bigquery.py:112-135`, `udf/map_markets.
    sql`) — reproduced on Spark 4's native SQL UDFs: a scalar function
    (`cents`, the float policy as a UDF), a CASE mapping function
    (`map_market`, D6's shape), and a TABLE function (`seg_customers`,
    a parameterized view) composed in one rollup.

    SQL UDFs inline into the plan at analysis time (no Python, no JS
    sandbox — unlike the reference's udf_js layer, codegen sees
    through them), so the oracle's inlined form plans identically.
    """
    from taipei_bi_etl_spark.io import register_views

    register_views(spark, sf_dir, ["customer"])
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)"
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION map_market(nk BIGINT)
           RETURNS STRING RETURN CASE WHEN nk % 5 = 0 THEN 'IN'
                                      WHEN nk % 5 = 1 THEN 'ID'
                                      WHEN nk % 5 = 2 THEN 'THS'
                                      ELSE 'Others' END"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION seg_customers(seg STRING)
           RETURNS TABLE(c_nationkey BIGINT, bal_cents BIGINT)
           RETURN SELECT c_nationkey, cents(c_acctbal)
                  FROM customer WHERE c_mktsegment = seg"""
    )
    return spark.sql(
        """SELECT map_market(c_nationkey) AS market,
                  COUNT(*) AS n_customers,
                  CAST(SUM(bal_cents) AS BIGINT) AS bal_cents
           FROM seg_customers('BUILDING')
           GROUP BY 1"""
    )
