"""Arrow-vectorized Python escape hatches, each on its idiomatic API:

* scalar ``@pandas_udf``      — vectorized per-row compute (the 10-100×
  faster alternative to row-at-a-time Python UDFs, SURVEY §4)
* grouped ``applyInPandas``   — whole-group pandas logic
* (``mapInPandas`` lives in multimodal.py, ``applyInPandasWithState``
  in streaming/jobs.py — together the full pandas-on-Spark surface)

plus the approximate-distinct scale path (HLL) for DAU-style counts.

All Python functions here are runtime closures (pickled by value) so
executors never need this package importable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


@query("pandas_udf_scaled_value", oracle=None, tags=("pandas", "extension"))
def pandas_udf_scaled_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: per-type min-max scaling of event values
    (vectorized numpy inside, Arrow batches outside).  Rows-only: the
    semantics are checked against a pure-Column computation in
    tests/test_pandas_api.py — which is also the point: prefer the
    Column form in production; this query exists to keep the vectorized
    escape hatch exercised."""
    @F.pandas_udf(T.DoubleType())
    def clip01(v: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
        rng = (hi - lo).where(hi > lo, 1.0)
        return ((v - lo) / rng).clip(0.0, 1.0)

    ev = read_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    scaled = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type", clip01("value", "lo", "hi").alias("scaled")
    )
    return scaled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.floor(F.col("scaled") * 1_000_000).cast("long"))
            / F.lit(1_000_000.0)
            / F.count(F.lit(1)),
            6,
        ).alias("mean_scaled"),
    )


@query("grouped_apply_zscore", oracle=None, tags=("pandas", "extension"))
def grouped_apply_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas: per-source robust z-score outlier counts
    over document lengths — whole-group pandas logic (median/MAD need
    the full group).  Semantics gated in tests/test_pandas_api.py."""
    out_schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("n_outliers", T.LongType()),
        ]
    )

    def per_group(pdf):
        import pandas as pd

        lens = pdf["n_chars"].astype(float)
        med = lens.median()
        mad = (lens - med).abs().median()
        scale = mad if mad > 0 else 1.0
        z = (lens - med).abs() / scale
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "n_outliers": [int((z > 3.5).sum())],
            }
        )

    d = read_table(spark, sf_dir, "documents").select("source", "n_chars")
    return d.groupBy("source").applyInPandas(per_group, schema=out_schema)


@query("approx_distinct_dau", oracle=None, tags=("A3", "scale", "extension"))
def approx_distinct_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog DAU — the 100 TB path for distinct-user counts (exact
    countDistinct shuffles every distinct value; HLL ships one mergeable
    sketch per partition).  Error tolerance gated in tests (rsd 2%)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_dau"))
    )
