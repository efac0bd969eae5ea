"""RPS task (``/root/reference/tasks/rps.py:20-174``) as DataFrame
transforms — revenue-per-search index:

* iterator fan-out frames averaged element-wise per country (A13
  ``tasks/rps.py:99-108``; here the 17 frames carry an ``iter_id``
  column and average in one groupBy instead of a pandas Series loop)
* ISO alpha-3 → alpha-2 recode via the frozen F21 table (``:87-91``)
* CPI market-share re-weighting android/ios (F23 ``:110-133``)
* search-volume pivot-sum per country (A11 ``:147``)
* regex country filter + positivity filters (P8/P9 ``:154``)
* scalar RPS factor: package / Σ(volume·cost_idx), rps =
  cost_idx_latest · factor (F24/A12 ``:135-168``) — the scalar never
  leaves the plan (cross-join broadcast, no ``collect``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taipei_bi_etl_spark.geo import alpha2_col
from taipei_bi_etl_spark.tasks.base import EtlTask

ANDROID_SHARE = 72.63
IOS_SHARE = 19.65
MOBILE_BASE = ANDROID_SHARE + IOS_SHARE


def avg_index(frames: DataFrame, col: str) -> DataFrame:
    """A13: element-wise mean of the per-iterator index frames.
    ``frames`` = union of all iterator pulls with an ``iter_id`` col."""
    recoded = frames.select(
        alpha2_col("country_code").alias("country"), F.col(col), "iter_id"
    ).dropna(subset=["country"])
    # reference drop_duplicates per frame: one row per (iter, country)
    deduped = recoded.dropDuplicates(["iter_id", "country"])
    return deduped.groupBy("country").agg(F.avg(col).alias(col))


def weight_cpi(cb_index: DataFrame) -> DataFrame:
    """F23: android + ios CPI re-weighted by 2017 market share."""
    base = cb_index.filter(
        (F.col("category") == "Average") & (F.col("cpi") > 0)
    )
    android = base.filter(F.col("platform") == "Google Play").select(
        F.col("country_code").alias("country"),
        (F.col("cpi") / MOBILE_BASE * ANDROID_SHARE).alias("cpi_android"),
    )
    ios = base.filter(F.col("platform") == "iOS").select(
        F.col("country_code").alias("country"),
        (F.col("cpi") / MOBILE_BASE * IOS_SHARE).alias("cpi_ios"),
    )
    return (
        android.join(ios, "country")
        .select("country", (F.col("cpi_android") + F.col("cpi_ios")).alias("cpi"))
        .filter(F.col("cpi") > 0)
    )


class RpsTask(EtlTask):
    def transform_google_search_rps(
        self,
        google_search_rps: DataFrame,
        fb_index: DataFrame = None,
        fb_index_latest: DataFrame = None,
        cb_index: DataFrame = None,
        global_package: DataFrame = None,
    ) -> DataFrame:
        vol = google_search_rps.groupBy("country").agg(
            F.sum("volume").alias("volume")
        )
        base = avg_index(fb_index, "cost_index").withColumnRenamed(
            "cost_index", "cost_idx_base"
        )
        latest = avg_index(fb_index_latest, "cost_index").withColumnRenamed(
            "cost_index", "cost_idx_latest"
        )
        cb = weight_cpi(cb_index).withColumnRenamed("cpi", "cost_idx_cb")
        df = (
            # bounded: per-country frame
            vol.join(F.broadcast(base), "country", "left")
            # bounded: per-country frame
            .join(F.broadcast(latest), "country", "left")
            # bounded: per-country frame
            .join(F.broadcast(cb), "country", "left")
            .filter(
                F.col("country").rlike("^[0-9A-Z]{2}$")
                & (F.col("cost_idx_base") > 0)
                & (F.col("volume") > 0)
            )
        )
        # A12 scalar aggregates as broadcast cross-joins — stays in-plan
        pkg = global_package.select(F.col("package").alias("_pkg"))
        denom = df.agg(
            F.sum(F.col("volume") * F.col("cost_idx_base")).alias("_fb_denom"),
            F.sum(F.col("volume") * F.col("cost_idx_cb")).alias("_cb_denom"),
        )
        # bounded: scalar aggregates (1 row each)
        out = df.crossJoin(F.broadcast(pkg)).crossJoin(F.broadcast(denom))
        return out.select(
            "country",
            "volume",
            "cost_idx_base",
            "cost_idx_latest",
            "cost_idx_cb",
            (F.col("cost_idx_latest") * (F.col("_pkg") / F.col("_fb_denom"))).alias(
                "rps"
            ),
            (F.col("cost_idx_cb") * (F.col("_pkg") / F.col("_cb_denom"))).alias(
                "rps_cb"
            ),
        ).withColumn("cb_rps_ratio", F.col("rps_cb") / F.col("rps"))
