"""Sliding-window active users, two scale paths:

* ``streaming_sliding_wau`` — exact WAU on the streaming runtime via
  chained stateful ops (dedupe → sliding window), oracle-checked.
* ``sketch_wau_rollup`` — mergeable HLL sketches materialized per day,
  unioned into weeks WITHOUT re-scanning raw events (rows-only; a
  tolerance test gates it against the exact count).

Together they re-express the reference's WAU/MAU re-scan
(``/root/reference/sql/mango_active_user_count.sql:40-84``) the way a
100 TB deployment would: the daily table stores a sketch column, every
rolling window is a cheap sketch union over |days| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.streaming import run_available_now, sliding_wau, stream_events

_WAU_ORACLE = """
WITH d AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), x AS (
    SELECT user_id, day - CAST(g.i AS INT) AS window_start
    FROM d, LATERAL (SELECT UNNEST(generate_series(0, 6)) AS i) g
)
SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM x GROUP BY window_start
"""


@query(
    "streaming_sliding_wau",
    oracle=_WAU_ORACLE,
    tags=("streaming", "sliding", "A3"),
)
def streaming_sliding_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day WAU on the streaming runtime: dropDuplicates on
    (user, day) then a 7-day/1-day-slide window count — two chained
    stateful operators standing in for the unsupported streaming
    COUNT DISTINCT, giving an *exact* distinct count maintained
    incrementally (no nightly re-scan of 7 partitions).

    The oracle expands each active user-day into the 7 windows that
    contain it and counts distinct users per window — window
    emission matches because Spark's 1-day slide aligns windows to
    day boundaries.

    Scale: dedupe state is one row per (user, day) inside the
    watermark horizon; the window agg state is 7 counters per day.
    Each event shuffles twice (dedupe key, then window key) — both
    keyed, both bounded.
    """
    return run_available_now(sliding_wau(stream_events(spark, sf_dir)))


@query("sketch_wau_rollup", oracle=None, tags=("sketch", "scale", "A3"))
def sketch_wau_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAU from materialized daily HLL sketches: build one
    ``hll_sketch_agg(user_id)`` per day (the mergeable column a daily
    table would persist), then answer every 7-day window by
    ``hll_union_agg`` over ≤7 sketch rows — raw events are scanned
    once ever, each rolling window costs |days| sketch merges instead
    of a 7-partition re-scan.  This is the 100 TB upgrade path for the
    reference's WAU/MAU queries; the exact streaming twin above stays
    the correctness anchor (tests gate this one within HLL error of
    exact).

    No oracle: DuckDB's HLL implementation differs; the driver records
    rows-only and ``tests/test_sketches.py`` asserts ±5% of exact.
    """
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("users_sketch")
    )
    # expand each day's sketch into the 7 windows that contain it,
    # then union per window — |days|×7 rows, trivially small forever
    win = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
        "users_sketch",
    ).select(
        F.date_sub("day", F.col("i")).alias("window_start"), "users_sketch"
    )
    return (
        win.groupBy("window_start")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("users_sketch")).alias("wau_est"))
    )


@query("cms_heavy_hitters", oracle=None, tags=("sketch", "scale", "A1"))
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter event counts from materialized daily Count-Min
    sketches — the frequency twin of the HLL rollup above: the daily
    table persists one mergeable ``count_min_sketch(user_id)`` blob
    per day, and ANY later window answers "how often did key K appear"
    by merging |days| sketches and probing, without re-scanning raw
    events.

    The probe set here is the exact top-20 users (so the output is
    deterministic and the tolerance test can compare est vs exact);
    in production the candidates come from per-partition local top-k.
    Sketch merge + probe run on the driver via Spark's public
    CountMinSketch sketch library — |days| × 100 KB blobs, constant
    work regardless of event volume.

    No oracle: CMS estimates are implementation-defined (DuckDB has no
    CMS); the driver records rows-only and ``tests/test_sketches.py``
    gates: est ≥ exact (one-sided error) and est ≤ exact + eps·N.
    """
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("count_min_sketch(user_id, 0.0001d, 0.99d, 42)").alias("cms"),
        F.count(F.lit(1)).alias("n"),
    )
    blobs = daily.select("cms").collect()
    jvm = spark.sparkContext._jvm
    merged = None
    for r in blobs:
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytearray(r.cms)
        )
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(20)
        .collect()
    )
    rows = [
        (int(r.user_id), int(r.exact_n), int(merged.estimateCount(int(r.user_id))))
        for r in top
    ]
    return spark.createDataFrame(
        rows, "user_id long, exact_n long, cms_est long"
    )


@query(
    "bitmap_wau_rollup",
    oracle=_WAU_ORACLE,
    tags=("sketch", "scale", "A3"),
)
def bitmap_wau_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sliding WAU from materialized daily roaring-style bitmaps
    (Spark 4 ``bitmap_construct_agg`` over per-32k-bucket bit
    positions) — the third point on the WAU cost/accuracy frontier:

    * streaming exact (state per (user, window)),
    * HLL sketch (±2%, constant bytes/day),
    * THIS: exact AND mergeable — the daily table persists one bitmap
      per (day, 32k-id bucket); a 7-day window is ``bitmap_or_agg``
      per bucket + ``bitmap_count`` summed, so raw events are scanned
      once ever and every window costs |days|·|buckets| small-blob
      ORs.  Bytes scale with the live id range (4 KB per dense 32k
      bucket) instead of HLL's fixed sketch — the right trade when ids
      are dense and exactness is required (billing-grade WAU).

    Because the result is exact, this path gets a full DuckDB oracle
    (the same exact-WAU SQL as the streaming twin) — unlike the HLL
    path, which is tolerance-gated only.
    """
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    win = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day", "bkt", "bm"
    ).select(F.date_sub("day", F.col("i")).alias("window_start"), "bkt", "bm")
    per_bucket = win.groupBy("window_start", "bkt").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm))").alias("cnt")
    )
    return per_bucket.groupBy("window_start").agg(
        F.sum("cnt").cast("long").alias("wau")
    )


_TOPK_SKETCH_ORACLE = """
SELECT e.event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events e GROUP BY 1
"""


@query(
    "approx_top_k_events",
    oracle=_TOPK_SKETCH_ORACLE,
    tags=("sketch", "A1"),
)
def approx_top_k_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type frequencies via the ``approx_top_k`` sketch aggregate
    — the enumeration-capable heavy-hitter sketch (CMS above answers
    point probes; this one RETURNS the heavy items), mergeable across
    partitions like every sketch in this family.

    Oracle-checkable by construction: the tracked-item budget exceeds
    the event-type cardinality, and within budget the sketch counts
    are EXACT (it only approximates once evicted items recycle their
    counters) — so ``k = |event types|`` makes the result identical
    to the exact GROUP BY, which is precisely the regime boundary the
    test pins.  At 100 TB cardinality ≫ budget and the same call
    returns ε-approximate heavy hitters in one pass, no shuffle of
    the long tail.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.agg(F.expr("approx_top_k(event_type, 16)").alias("tk"))
        .select(F.explode("tk").alias("x"))
        .select(
            F.col("x.item").alias("item"),
            F.col("x.count").cast("long").alias("cnt"),
        )
    )
