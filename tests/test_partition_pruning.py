"""Partition-pruning gate: the date-partitioned warehouse layout must
actually prune — a daily query over a year of partitions reads one
directory, not 365."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table, write_partitioned
from taipei_bi_etl_spark.scale import explain_has
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_warehouse(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_wh") / "events")
    ev = read_table(spark, SF_DIR, "events").withColumn(
        "utc_date", F.to_date("ts")
    )
    write_partitioned(ev, path)
    return path


def test_day_filter_prunes_partitions(spark, events_warehouse):
    df = spark.read.parquet(events_warehouse).filter(
        F.col("utc_date") == "2024-01-15"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # static partition pruning shows up as a PartitionFilters entry
    assert "PartitionFilters" in plan
    assert "utc_date" in plan.split("PartitionFilters", 1)[1][:200]
    # and the result is exactly that day's data
    days = {str(r.utc_date) for r in df.select("utc_date").distinct().collect()}
    assert days == {"2024-01-15"}


def test_partitioned_roundtrip_preserves_rows(spark, events_warehouse):
    n_src = read_table(spark, SF_DIR, "events").count()
    n_wh = spark.read.parquet(events_warehouse).count()
    assert n_src == n_wh


def test_dynamic_partition_pruning_from_dim_filter(spark, events_warehouse):
    """DPP: joining the date-partitioned fact against a dim filtered to
    a few days must inject a dynamicpruning subquery on the fact SCAN —
    at 100 TB this is the difference between reading 3 partitions and
    reading all of them when the day list is only known via the join."""
    fact = spark.read.parquet(events_warehouse)
    days = (
        fact.select("utc_date").distinct().orderBy("utc_date").limit(3)
    )
    # materialize the dim so the day filter is NOT statically foldable
    dim = spark.createDataFrame(
        [(r.utc_date, 1) for r in days.collect()], "utc_date date, tag int"
    )
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    joined = fact.join(dim.filter(F.col("tag") == 1), "utc_date")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    got_days = {
        str(r.utc_date) for r in joined.select("utc_date").distinct().collect()
    }
    assert len(got_days) == 3
