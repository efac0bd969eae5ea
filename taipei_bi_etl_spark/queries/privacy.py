"""Privacy-engineering audits — k-anonymity / l-diversity over
quasi-identifier groups.

The reference scrubs fixture data (`utils/anonymizer.py:12-32`, ported
as `functions.anonymize_columns`) and the engine has PII text scans
(`text_pii_scan` / `text_pii_redact`); this adds the DATASET-level
audit a release gate runs before publishing: every quasi-identifier
combination must be shared by ≥ k records (k-anonymity, Sweeney 2002),
and each group should carry ≥ l distinct values of the sensitive
attribute (l-diversity, Machanavajjhala 2007) so group membership does
not reveal it.

100 TB design: one shuffle on the BOUNDED quasi-identifier key space
(nation × segment here — audits group by low-cardinality dimensions by
definition); distinct-sensitive counts are per-group partial
aggregates.  No row ever leaves with its identifier — the audit emits
group statistics only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

K_ANON = 5  # minimum group size to count as anonymous

# Sensitive attribute = account-balance bucket (1000-wide).  The
# bucket is derived via the exact-cents pattern: round(x*100) is exact
# for 2-decimal currency in BOTH engines, and the single floor division
# on the integer cents is IEEE-identical (never floor a chained float
# division — SCALE.md decimal policy).  NULL balances are skipped by
# COUNT(DISTINCT …) in both engines.
_KANON_ORACLE = f"""
SELECT COALESCE(c_nationkey, -1) AS c_nationkey,
       COALESCE(c_mktsegment, '(null)') AS c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT CAST(floor(
           CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT))
         AS BIGINT) AS l_div,
       CASE WHEN COUNT(*) < {K_ANON} THEN 1 ELSE 0 END AS below_k
FROM customer
GROUP BY 1, 2
"""


@query(
    "k_anonymity_audit",
    oracle=_KANON_ORACLE,
    tags=("privacy", "validation", "extension"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per quasi-identifier group (nation, market segment): record
    count, l-diversity of the balance bucket, and a below-k flag
    (k = {K_ANON}).  A publishable extract requires zero ``below_k``
    groups (suppress or generalize those rows first); ``l_div`` = 1
    groups leak the sensitive attribute even when k-anonymous.
    NULL quasi-identifier values form their own SENTINEL group
    ((-1) / '(null)') in both engines — an audit must count them, and
    the sentinel keeps the driver's row sort total (None does not
    order against str; battery-covered by the NULL-dims customer)."""
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    bucket = F.floor(cents / F.lit(100000.0)).cast("long")
    return (
        read_table(spark, sf_dir, "customer")
        .select(
            F.coalesce("c_nationkey", F.lit(-1)).alias("c_nationkey"),
            F.coalesce("c_mktsegment", F.lit("(null)")).alias(
                "c_mktsegment"
            ),
            bucket.alias("bkt"),
        )
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("bkt").cast("long").alias("l_div"),
            F.when(F.count(F.lit(1)) < K_ANON, F.lit(1))
            .otherwise(F.lit(0))
            .alias("below_k"),
        )
    )
