"""Gates for the Arrow-vectorized escape hatches: each pandas-API query
must agree with an independent pure-Column computation."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries.pandas_api import (
    approx_distinct_dau,
    grouped_apply_zscore,
    pandas_udf_scaled_value,
)
from tests.conftest import SF_DIR


def test_pandas_udf_matches_column_form(spark):
    got = {
        r.event_type: (r.n, r.mean_scaled)
        for r in pandas_udf_scaled_value(spark, SF_DIR).collect()
    }
    ev = read_table(spark, SF_DIR, "events")
    w = Window.partitionBy("event_type")
    rng = F.max("value").over(w) - F.min("value").over(w)
    scaled = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            (F.col("value") - F.min("value").over(w))
            / F.when(rng > 0, rng).otherwise(F.lit(1.0)),
        ),
    )
    want = {
        r.event_type: (r.n, r.mean_scaled)
        for r in ev.withColumn("scaled", scaled)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.floor(F.col("scaled") * 1_000_000).cast("long"))
                / F.lit(1_000_000.0)
                / F.count(F.lit(1)),
                6,
            ).alias("mean_scaled"),
        )
        .collect()
    }
    assert got == want


def test_grouped_zscore_counts(spark):
    rows = grouped_apply_zscore(spark, SF_DIR).collect()
    d = read_table(spark, SF_DIR, "documents")
    per_source = {
        r.source: r.n for r in d.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert {r.source: r.n_docs for r in rows} == per_source
    assert all(0 <= r.n_outliers <= r.n_docs for r in rows)


def test_approx_dau_within_tolerance(spark):
    """The query self-gates (hll_ok column); its exact side must agree
    with an independent countDistinct."""
    rows = approx_distinct_dau(spark, SF_DIR).collect()
    assert all(r.hll_ok for r in rows)
    got_exact = {str(r.day): r.exact_dau for r in rows}
    ev = read_table(spark, SF_DIR, "events")
    exact = {
        str(r.day): r.dau
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    assert got_exact == exact
