"""Revenue task (``/root/reference/tasks/revenue.py:19-216``) as
DataFrame transforms:

* upsert of yesterday+today batches keeping each source's latest rows
  by update datetime (J10, the pandasql max-datetime dedup
  ``tasks/revenue.py:147-167``)
* approved-conversion filter (P11 ``:197``)
* empty→null normalization (P10 ``:98``)
* country-local → UTC timestamps via the frozen F20 table (``:102,202``)
* schema-conforming projection (J12 ``:185-195``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taipei_bi_etl_spark.geo import to_utc_from_country, tz_offset_col
from taipei_bi_etl_spark.tasks.base import EtlTask

REVENUE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("os", T.StringType()),
        T.StructField("utc_datetime", T.TimestampType()),
        T.StructField("utc_date", T.DateType()),
        T.StructField("tz", T.StringType()),
        T.StructField("currency", T.StringType()),
        T.StructField("sales_amount", T.DoubleType()),
        T.StructField("payout", T.DoubleType()),
    ]
)


def upsert_keep_latest(
    old: DataFrame, new: DataFrame, key: str = "source", ts_col: str = "updated_at"
) -> DataFrame:
    """The J10 merge: union old+new batches, keep only rows whose
    ``ts_col`` equals the per-``key`` maximum (the reference keeps ALL
    rows of the winning batch, ties included — RANK, not row_number)."""
    comb = old.unionByName(new)
    w = Window.partitionBy(key).orderBy(F.desc(ts_col))
    return comb.withColumn("_r", F.rank().over(w)).filter(F.col("_r") == 1).drop("_r")


class RevenueTask(EtlTask):
    """Transform layer only — sources are injected by the caller/test
    as const/file configs (the production HTTP configs plug into the
    same class via ``type='api'`` + fetcher)."""

    def transform_bukalapak(
        self, bukalapak: DataFrame, bukalapak_old: DataFrame | None = None
    ) -> DataFrame:
        df = bukalapak
        if bukalapak_old is not None:
            df = upsert_keep_latest(bukalapak_old, df)
        approved = df.filter(F.col("conversion_status") == "approved")
        cleaned = approved.replace("", None)  # P10 empty→NaN
        utc_dt = to_utc_from_country(F.col("created_at"), F.col("country"))
        return cleaned.select(
            F.lit("bukalapak").alias("source"),
            F.col("country"),
            F.coalesce(F.col("os"), F.lit("unknown")).alias("os"),
            utc_dt.alias("utc_datetime"),
            F.to_date(utc_dt).alias("utc_date"),
            tz_offset_col(F.col("country")).alias("tz"),
            F.col("currency"),
            F.col("sales_amount").cast("double").alias("sales_amount"),
            F.col("payout").cast("double").alias("payout"),
        )
