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


_SCALED_ORACLE = """
WITH bounds AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type
), scaled AS (
  SELECT e.event_type,
         LEAST(GREATEST(
           (e.value - b.lo)
             / (CASE WHEN b.hi > b.lo THEN b.hi - b.lo ELSE 1.0 END),
           0.0), 1.0) AS s
  FROM events e JOIN bounds b USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(FLOOR(s * 1000000) AS BIGINT)) AS BIGINT)
             / 1000000.0 / COUNT(*), 6) AS mean_scaled
FROM scaled GROUP BY event_type
"""


@query(
    "pandas_udf_scaled_value",
    oracle=_SCALED_ORACLE,
    tags=("pandas", "extension"),
)
def pandas_udf_scaled_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: per-type min-max scaling of event values
    (vectorized numpy inside, Arrow batches outside).  Also gated against
    a pure-Column computation in tests/test_pandas_api.py — which is the
    point: prefer the Column form in production; this query keeps the
    vectorized escape hatch exercised.  The float path is hash-safe:
    identical IEEE double ops on both engines, floored to integer micros
    before the order-insensitive sum."""
    @F.pandas_udf(T.DoubleType())
    def clip01(v: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
        rng = (hi - lo).where(hi > lo, 1.0)
        return ((v - lo) / rng).clip(0.0, 1.0)

    ev = read_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    # bounded: per-event-type min/max (bounded domain)
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


_ZSCORE_ORACLE = """
WITH med AS (
  SELECT source, median(CAST(n_chars AS DOUBLE)) AS med
  FROM documents GROUP BY source
), madt AS (
  SELECT d.source,
         median(abs(CAST(d.n_chars AS DOUBLE) - m.med)) AS mad
  FROM documents d JOIN med m USING (source) GROUP BY d.source
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN abs(CAST(d.n_chars AS DOUBLE) - m.med)
                          / (CASE WHEN t.mad > 0 THEN t.mad ELSE 1.0 END)
                          > 3.5
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM documents d
JOIN med m USING (source)
JOIN madt t ON d.source = t.source
GROUP BY d.source
"""


@query(
    "grouped_apply_zscore", oracle=_ZSCORE_ORACLE, tags=("pandas", "extension")
)
def grouped_apply_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas: per-source robust z-score outlier counts
    over document lengths — whole-group pandas logic (median/MAD need
    the full group).  Semantics also gated in tests/test_pandas_api.py.
    Hash-safe vs the oracle: medians of small integers are exact doubles
    (midpoint interpolation is exact), outputs are integer counts."""
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


_APPROX_DAU_ORACLE = """
SELECT CAST(ts AS DATE) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_dau,
       TRUE AS hll_ok
FROM events GROUP BY 1
"""


@query(
    "approx_distinct_dau",
    oracle=_APPROX_DAU_ORACLE,
    tags=("A3", "scale", "extension"),
)
def approx_distinct_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog DAU — the 100 TB path for distinct-user counts (exact
    countDistinct shuffles every distinct value; HLL ships one mergeable
    sketch per partition).

    Oracle-checked via the exact+gate pattern: one pass computes both
    the exact count and the HLL++ estimate (register-max merges are
    commutative, so the estimate is deterministic under any
    partitioning) and emits the exact value plus ``hll_ok`` asserting
    the estimate within 3× the configured rsd; DuckDB computes the
    exact side and literal TRUE.
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("exact_dau"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("hll_dau"),
        )
        .select(
            "day",
            "exact_dau",
            (
                F.abs(F.col("hll_dau") - F.col("exact_dau"))
                <= F.greatest(
                    F.lit(3), F.col("exact_dau") * F.lit(0.06)
                )
            ).alias("hll_ok"),
        )
    )


_GROUPED_AGG_ORACLE = """
WITH v AS (
    SELECT event_type,
           CAST(floor(value * 1000000) AS BIGINT) AS v_micros,
           CAST(length(props) AS BIGINT) AS w
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
      AND props IS NOT NULL
)
SELECT event_type,
       CAST(SUM(v_micros * w) AS BIGINT) AS weighted_sum,
       CAST(SUM(w) AS BIGINT) AS total_w
FROM v GROUP BY event_type
"""


@query(
    "pandas_grouped_agg_weighted",
    oracle=_GROUPED_AGG_ORACLE,
    tags=("pandas", "extension"),
)
def pandas_grouped_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf — the fourth pandas surface (scalar /
    grouped-map / map / with-state live elsewhere): a weighted sum per
    group computed as one Arrow batch per group in numpy.

    Accumulation is int64 (value micros × weight), so the result is
    independent of within-group arrival order — the float-sum
    non-determinism a naive pandas ``(v*w).sum()`` of doubles would
    smuggle in.  At scale a grouped-agg pandas_udf ships each whole
    group to Python — right only when groups are bounded (they are:
    one per event type); unbounded groups belong in JVM aggregates.
    """
    import pandas as pd

    from taipei_bi_etl_spark.io import read_table

    @F.pandas_udf(T.LongType())
    def wsum(v: pd.Series, w: pd.Series) -> int:
        return int((v.astype("int64") * w.astype("int64")).sum())

    @F.pandas_udf(T.LongType())
    def tsum(w: pd.Series) -> int:
        return int(w.astype("int64").sum())

    # NULLs cannot reach the int64 numpy kernel (NaN astype crashes);
    # oracle WHERE twin
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("props").isNotNull()
    )
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("v_micros"),
        F.length("props").cast("long").alias("w"),
    )
    return v.groupBy("event_type").agg(
        wsum(F.col("v_micros"), F.col("w")).alias("weighted_sum"),
        tsum(F.col("w")).alias("total_w"),
    )
