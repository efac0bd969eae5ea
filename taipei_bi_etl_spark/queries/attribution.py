"""Multi-touch attribution — the natural extension of the reference's
channel-attribution machinery (J1 alternative-key joins +
W1 first-touch rank-dedup, ``/root/reference/sql/mango_user_channels.sql``)
from single-touch to position-weighted multi-touch, in exact integer
parts-per-million so every conversion's credit sums to 1,000,000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

LOOKBACK_DAYS = 7

# U-shaped credit: 40% first touch, 40% last, 20% split over middles
# (integer division; remainder credited to the first touch so totals
# are exactly 1,000,000 ppm).
_MT_ORACLE = f"""
WITH p AS (
    SELECT event_id AS conv_id, user_id, ts AS conv_ts
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT event_id AS touch_id, user_id, ts AS touch_ts
    FROM events WHERE event_type = 'click'
), t AS (
    SELECT p.conv_id, p.user_id, c.touch_id,
           ROW_NUMBER() OVER (PARTITION BY p.conv_id
                              ORDER BY c.touch_ts, c.touch_id) AS rnk,
           COUNT(*) OVER (PARTITION BY p.conv_id) AS n_touches
    FROM p JOIN c
      ON c.user_id = p.user_id
     AND c.touch_ts <= p.conv_ts
     AND c.touch_ts > p.conv_ts - INTERVAL {LOOKBACK_DAYS} DAY
)
SELECT conv_id, user_id, touch_id,
       CAST(rnk AS BIGINT) AS touch_rank,
       CAST(n_touches AS BIGINT) AS n_touches,
       CAST(CASE WHEN n_touches = 1 THEN 1000000
                 WHEN n_touches = 2 THEN 500000
                 WHEN rnk = 1 THEN 400000 + 200000 % (n_touches - 2)
                 WHEN rnk = n_touches THEN 400000
                 ELSE 200000 // (n_touches - 2) END AS BIGINT) AS weight_ppm
FROM t
"""


@query(
    "multi_touch_attribution",
    oracle=_MT_ORACLE,
    tags=("ext", "attribution", "J1", "W1"),
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: every purchase distributes
    exactly 1,000,000 ppm of credit across the user's clicks in the
    prior {LOOKBACK_DAYS} days — 40% to the first touch, 40% to the
    last, 20% split over the middles (single/double-touch cases
    degenerate to 100% / 50-50).  Integer division with the remainder
    credited to the first touch keeps the per-conversion total exactly
    1,000,000 — no float credit leakage, property-tested.

    This upgrades the reference's first-touch-only attribution (W1
    keeps rank=1 and drops the rest) to the weighting marketers
    actually reconcile revenue against.

    Scale: the touch expansion is a user_id-keyed equi join with a
    time-bracket residual — per-user fan-out bounded by the lookback
    horizon, never a cross join.  The rank/count windows shuffle once
    on conv_id; weights are pure codegen arithmetic.  The {LOOKBACK_DAYS}-day
    bracket is the same bounded-state horizon the streaming interval
    join uses — this batch form backfills, the streaming twin serves
    the live path.
    """
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("touch_ts"),
    )
    t = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            > F.col("conv_ts") - F.expr(f"INTERVAL {LOOKBACK_DAYS} DAYS")
        ),
    )
    wuser = W.partitionBy("conv_id")
    t = t.select(
        "conv_id",
        "user_id",
        "touch_id",
        F.row_number()
        .over(wuser.orderBy("touch_ts", "touch_id"))
        .cast("long")
        .alias("touch_rank"),
        F.count(F.lit(1)).over(wuser).alias("n_touches"),
    )
    n, r = F.col("n_touches"), F.col("touch_rank")
    weight = (
        F.when(n == 1, F.lit(1_000_000))
        .when(n == 2, F.lit(500_000))
        .when(r == 1, F.lit(400_000) + F.lit(200_000) % (n - 2))
        .when(r == n, F.lit(400_000))
        .otherwise(F.expr("200000 div (n_touches - 2)"))
    )
    return t.withColumn("weight_ppm", weight.cast("long"))
