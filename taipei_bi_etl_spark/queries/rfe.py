"""RFE (recency / frequency / engagement) — the reference's two-stage
materialization re-expressed:

* daily partial table (``sql/mango_user_rfe_daily_partial.sql``:
  per-user-per-day session counts) feeding
* a 28-day final rollup (``sql/mango_user_rfe_28d.sql:14-44``:
  frequency_days, active_days, recency over the trailing window,
  assembled with a left-join chain J4 ``:105-117``).

In Spark the partial/final split is free inside one query (partial +
final HashAggregate), but the cross-day materialized-partial pattern is
kept in ``plans/mango_dag.py``; HERE the whole 28-day semantics runs as
one plan so the oracle can check it end-to-end.

Also carries the §3.2 entry point: the same rollup phrased as a
templated ``spark.sql`` query over registered views — the reference's
``read_string(sql).format(**params)`` lifecycle
(``tasks/bigquery.py:315-319``) with Catalyst doing parse→analyze→
optimize→execute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

AS_OF = "2024-01-30"
WINDOW_DAYS = 28

_RFE_ORACLE = f"""
WITH daily_partial AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         COUNT(DISTINCT event_type) AS n_types,
         CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros
  FROM events
  WHERE CAST(ts AS DATE) > DATE '{AS_OF}' - {WINDOW_DAYS}
    AND CAST(ts AS DATE) <= DATE '{AS_OF}'
  GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS frequency_days,
       CAST(datediff('day', MAX(day), DATE '{AS_OF}') AS BIGINT) AS recency_days,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       CAST(MAX(n_types) AS BIGINT) AS max_daily_types,
       CAST(SUM(value_micros) AS BIGINT) AS engagement_micros
FROM daily_partial
GROUP BY user_id
"""


@query("rfe_28d_rollup", oracle=_RFE_ORACLE, tags=("A3", "A4", "J4", "F2", "F3"))
def rfe_28d_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """28-day RFE: daily partial agg → final rollup, one plan.

    Scale: both aggregations hash on user_id — Catalyst reuses the
    partial's partitioning for the final (no second shuffle); the date
    filter prunes to 28 day-partitions of a date-partitioned table.
    """
    ev = read_table(spark, sf_dir, "events")
    as_of = F.lit(AS_OF).cast("date")
    windowed = ev.withColumn("day", F.to_date("ts")).filter(
        (F.col("day") > F.date_sub(as_of, WINDOW_DAYS)) & (F.col("day") <= as_of)
    )
    daily = windowed.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias(
            "value_micros"
        ),
    )
    return daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("frequency_days"),
        F.datediff(as_of, F.max("day")).cast("long").alias("recency_days"),
        F.sum("n_events").alias("total_events"),
        F.max("n_types").alias("max_daily_types"),
        F.sum("value_micros").alias("engagement_micros"),
    )


# ---------------------------------------------------------------------------
# §3.2 — templated spark.sql entry point over registered views.
# ---------------------------------------------------------------------------

_SQL_TEMPLATE = """
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_buyers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM {orders} o
JOIN {customer} c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= '{start_date}'
GROUP BY c.c_mktsegment
"""

_TEMPLATE_PARAMS = {"start_date": "1996-01-01"}

_SQL_ORACLE = f"""
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_buyers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE CAST(o.o_orderdate AS DATE) >= DATE '{_TEMPLATE_PARAMS["start_date"]}'
GROUP BY c.c_mktsegment
"""


@query("sql_template_rollup", oracle=_SQL_ORACLE, tags=("S3", "3.2"))
def sql_template_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SQL-template task lifecycle (§3.2): interpolate
    params into a SQL string, run via ``spark.sql`` against registered
    views — Catalyst supplies the whole parse→optimize→execute chain the
    reference delegated to BigQuery."""
    for name in ("orders", "customer"):
        read_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    q = _SQL_TEMPLATE.format(
        orders="v_orders", customer="v_customer", **_TEMPLATE_PARAMS
    )
    return spark.sql(q)
