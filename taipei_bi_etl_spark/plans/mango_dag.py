"""The reference's daily telemetry DAG (§3.3) as a Pipeline instance:

  pings → events_unnested(view) → feature_mapping(view)
        → feature_usage_daily(table, partition-overwrite, backfill 2d)
        → feature_cohort_date(table, incremental self-referencing
          anti-join — sql/mango_feature_cohort_date.sql:20-35)
        → cohort_retained_users(table — sql/mango_cohort_retained_users.sql)

Covers the reference patterns K4/K7 (partitioned table + idempotent
rewrite), K8 (backfill window), view chaining, and the incremental
self-reference with init bootstrap (§2.9 "incremental state").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taipei_bi_etl_spark.plans.dag import Pipeline, TaskContext, TaskSpec
from taipei_bi_etl_spark.plans.telemetry_pipeline import (
    map_features,
    synthesize_pings,
    unnest_events,
)


def build_mango_pipeline(sf_dir: str, warehouse: str) -> Pipeline:
    def pings(ctx: TaskContext) -> DataFrame:
        return synthesize_pings(ctx.spark, sf_dir).withColumn(
            "day", F.col("submission_date")
        )

    def unnested(ctx: TaskContext) -> DataFrame:
        return unnest_events(ctx.src("pings"))

    def mapped(ctx: TaskContext) -> DataFrame:
        return map_features(ctx.src("events_unnested"))

    def usage_daily(ctx: TaskContext) -> DataFrame:
        return (
            ctx.src("feature_mapping")
            .groupBy(
                F.col("submission_date").alias("day"),
                "feature_type",
                "feature_name",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("client_id").alias("n_clients"),
            )
        )

    def cohort_new_rows(ctx: TaskContext) -> DataFrame:
        """New (client, feature) cohort rows for the execution date:
        anti-join against the task's own destination (J3 + read_dest)."""
        todays = (
            ctx.src("feature_mapping")
            .filter(F.col("submission_date") == F.lit(ctx.date))
            .select(
                "client_id",
                "feature_type",
                "feature_name",
                F.col("submission_date").alias("cohort_date"),
            )
            .groupBy("client_id", "feature_type", "feature_name")
            .agg(F.min("cohort_date").alias("cohort_date"))
            .withColumn("day", F.col("cohort_date"))
        )
        existing = ctx.read_dest()
        if existing is None:
            return todays
        return todays.join(
            existing.select("client_id", "feature_type", "feature_name"),
            ["client_id", "feature_type", "feature_name"],
            "left_anti",
        )

    def cohort_bootstrap(ctx: TaskContext) -> DataFrame:
        """init query (sql/init_mango_feature_cohort_date.sql): full
        history before the first daily run."""
        return (
            ctx.src("feature_mapping")
            .filter(F.col("submission_date") < F.lit(ctx.date))
            .groupBy("client_id", "feature_type", "feature_name")
            .agg(F.min("submission_date").alias("cohort_date"))
            .withColumn("day", F.col("cohort_date"))
        )

    def retained(ctx: TaskContext) -> DataFrame:
        """Retention pivot (A5) re-derived from the cohort table."""
        cohort = ctx.src("feature_cohort_date").select(
            "client_id", "feature_type", "feature_name", "cohort_date"
        )
        activity = ctx.src("feature_mapping").select(
            "client_id",
            "feature_type",
            "feature_name",
            F.col("submission_date").alias("active_date"),
        )
        occ = cohort.join(
            activity, ["client_id", "feature_type", "feature_name"]
        ).withColumn(
            "occur_day", F.datediff("active_date", "cohort_date")
        )
        aggs = [
            F.countDistinct(
                F.when(F.col("occur_day") == n, F.col("client_id"))
            ).alias(f"d{n}_retained")
            for n in (0, 1, 3, 7)
        ]
        return (
            occ.groupBy(
                F.col("cohort_date").alias("day"), "feature_type", "feature_name"
            )
            .agg(F.countDistinct("client_id").alias("cohort_size"), *aggs)
        )

    return Pipeline(
        [
            TaskSpec("pings", pings, kind="view"),
            TaskSpec("events_unnested", unnested, deps=["pings"], kind="view"),
            TaskSpec(
                "feature_mapping", mapped, deps=["events_unnested"], kind="view"
            ),
            TaskSpec(
                "feature_usage_daily",
                usage_daily,
                deps=["feature_mapping"],
                backfill_days=(1, 2),
            ),
            TaskSpec(
                "feature_cohort_date",
                cohort_new_rows,
                deps=["feature_mapping"],
                init_fn=cohort_bootstrap,
            ),
            TaskSpec(
                "cohort_retained_users",
                retained,
                deps=["feature_mapping", "feature_cohort_date"],
                backfill_days=(1, 2, 3, 4, 5, 6, 7),
            ),
        ],
        warehouse,
    )
