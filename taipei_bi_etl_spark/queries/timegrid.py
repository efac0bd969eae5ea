"""Dense-time-grid operators: LOCF interpolation and metric unpivot.

`time_bucket_gapfill` (temporal.py) fills missing buckets with zeros —
the counting semantics.  This module adds the *state* semantics:
last-observation-carried-forward (the hypertable `locf()` /
`gap_fill ... interpolate` shape every metrics store offers), plus the
wide→long UNPIVOT reshape (the reference pivots with pandas
`pivot_table`, SURVEY §2.4 A11; unpivot is its inverse and has no
reference analog — extension).

Both oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark import functions as FN
from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# LOCF gap-fill — carry the last observed hourly sum forward.
# ---------------------------------------------------------------------------

def _typed_valued_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with the timeseries-family preconditions applied: an
    event_type (the series key) and a value (the metric).  Untyped or
    valueless events cannot join a typed metric series — filtered in
    BOTH engines (each oracle carries the matching WHERE)."""
    return read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )


_LOCF_ORACLE = """
WITH b AS (
    SELECT CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS hour_bucket,
           event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2
), bounds AS (SELECT MIN(hour_bucket) AS mn, MAX(hour_bucket) AS mx FROM b),
   hours AS (SELECT UNNEST(generate_series(mn, mx)) AS hour_bucket FROM bounds),
   types AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
   grid AS (
    SELECT hours.hour_bucket, types.event_type, b.value_cents,
           CASE WHEN b.value_cents IS NOT NULL THEN 1 ELSE 0 END AS is_observed
    FROM hours CROSS JOIN types
    LEFT JOIN b ON b.hour_bucket = hours.hour_bucket
               AND b.event_type = types.event_type
)
SELECT hour_bucket, event_type, is_observed,
       COALESCE(
         last_value(value_cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour_bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ), -1) AS locf_value_cents
FROM grid
"""


@query("locf_gapfill", oracle=_LOCF_ORACLE, tags=("ext", "gapfill", "timeseries"))
def locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid per event_type where missing buckets carry the
    last observed value forward (LOCF; -1 before the first observation).

    Same axis construction as ``time_bucket_gapfill`` (rollup bounds →
    broadcast sequence × broadcast type dim); the fill is one window
    per series — ``last(value, ignorenulls=True)`` over an unbounded
    preceding ROWS frame.  hour_bucket is unique within a series, so
    the frame is deterministic.

    Scale: one rollup shuffle + one window shuffle keyed by the series
    id.  Series count, not row count, drives window parallelism — at
    100 TB the series key would be (entity, metric), which is exactly
    how this partitioning scales out; the dense axis stays ∝ time span.
    """
    ev = _typed_valued_events(spark, sf_dir)
    b = ev.groupBy(
        F.floor(FN.unix_ms("ts") / F.lit(3600000)).alias("hour_bucket"),
        "event_type",
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents")
    )
    hours = b.agg(
        F.min("hour_bucket").alias("mn"), F.max("hour_bucket").alias("mx")
    ).select(F.explode(F.sequence("mn", "mx")).alias("hour_bucket"))
    types = ev.select("event_type").distinct()
    grid = (
        # bounded: hour grid
        F.broadcast(hours)
        # bounded: event-type domain
        .crossJoin(F.broadcast(types))
        .join(b, ["hour_bucket", "event_type"], "left")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.select(
        "hour_bucket",
        "event_type",
        F.when(F.col("value_cents").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_observed"),
        F.coalesce(
            F.last("value_cents", ignorenulls=True).over(w), F.lit(-1)
        ).alias("locf_value_cents"),
    )


# ---------------------------------------------------------------------------
# UNPIVOT — wide per-nation metrics to (nation, metric, value) long form.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
    SELECT COALESCE(c_nationkey, -1) AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents_total,
           CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents_max
    FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT c_nationkey, 'acctbal_cents_total', acctbal_cents_total FROM wide
UNION ALL
SELECT c_nationkey, 'acctbal_cents_max', acctbal_cents_max FROM wide
"""


@query("unpivot_metrics", oracle=_UNPIVOT_ORACLE, tags=("ext", "reshape"))
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-nation customer metrics unpivoted to long
    (nation, metric, value) form — the inverse of the reference's
    pandas ``pivot_table`` (A11) and the standard feed for
    metric-store / BI long tables.

    ``DataFrame.unpivot`` plans as a single Expand over the aggregated
    (25-row) frame — map-side, no extra shuffle beyond the one rollup;
    at any scale the long form is metrics× the group count, never the
    input rows.
    """
    # nation key coalesced in BOTH engines (driver-compare sort,
    # hostile relational sweep)
    c = read_table(spark, sf_dir, "customer").withColumn(
        "c_nationkey", F.coalesce("c_nationkey", F.lit(-1))
    )
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    wide = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(cents).alias("acctbal_cents_total"),
        F.max(cents).alias("acctbal_cents_max"),
    )
    return wide.unpivot(
        ids=["c_nationkey"],
        values=["n_customers", "acctbal_cents_total", "acctbal_cents_max"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Trailing z-score anomaly flags — exact-integer three-sigma test.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH b AS (
    SELECT CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS hour_bucket,
           event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2
), w AS (
    SELECT hour_bucket, event_type, x,
           CAST(COUNT(*) OVER t AS BIGINT) AS n,
           CAST(SUM(x) OVER t AS BIGINT) AS s,
           CAST(SUM(x * x) OVER t AS BIGINT) AS ss
    FROM b
    WINDOW t AS (PARTITION BY event_type ORDER BY hour_bucket
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT hour_bucket, event_type, x, n,
       CASE WHEN n >= 12
                 AND (n * x - s) * (n * x - s) > 9 * (n * ss - s * s)
            THEN 1 ELSE 0 END AS is_anomaly
FROM w
"""


@query(
    "anomaly_zscore_trailing",
    oracle=_ZSCORE_ORACLE,
    tags=("ext", "timeseries", "anomaly"),
)
def anomaly_zscore_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-sigma outlier flags on each event_type's hourly series
    against its own trailing 24-bucket window.

    The test is the z-score inequality cleared of division —
    ``(n·x − Σ)² > 9·(n·Σx² − Σ²)`` ⇔ ``(x − μ)² > 9σ²`` — evaluated
    entirely in BIGINT, so the flags are bit-exact cross-engine (a
    float z-score would flap at threshold boundaries).  Windows
    shorter than 12 buckets don't flag (warm-up).

    Scale: one rollup shuffle + one window shuffle on the series key,
    O(1) state per row (running sums).  The integer headroom bounds:
    cents·n < 2^31 per bucket keeps every product under 2^63; wider
    series switch x to a coarser unit, same plan.
    """
    ev = _typed_valued_events(spark, sf_dir)
    b = ev.groupBy(
        F.floor(FN.unix_ms("ts") / F.lit(3600000)).alias("hour_bucket"),
        "event_type",
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("x"))
    t = (
        W.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(-23, 0)
    )
    n = F.count(F.lit(1)).over(t)
    s = F.sum("x").over(t)
    ss = F.sum(F.col("x") * F.col("x")).over(t)
    dev = n * F.col("x") - s
    return b.select(
        "hour_bucket",
        "event_type",
        "x",
        n.alias("n"),
        F.when(
            (n >= 12) & (dev * dev > 9 * (n * ss - s * s)), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average — duration-weighted mean per series.
# ---------------------------------------------------------------------------

_TWA_ORACLE = """
WITH seq AS (
    SELECT event_type,
           CAST(floor(value * 1000000) AS BIGINT) AS v_micros,
           epoch_ms(LEAD(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id))
             - epoch_ms(ts) AS dur_ms
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type,
       CAST(SUM(CAST(v_micros AS DECIMAL(38,0)) * dur_ms)
            AS DECIMAL(38,0)) AS weighted_sum,
       CAST(SUM(dur_ms) AS BIGINT) AS total_ms
FROM seq WHERE dur_ms IS NOT NULL AND dur_ms > 0
GROUP BY event_type
"""


@query(
    "time_weighted_avg", oracle=_TWA_ORACLE, tags=("ext", "timeseries", "W2")
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean value per event type: each observation
    counts for the milliseconds until the same user's next event (the
    hypertable ``time_weight('locf')`` shape — a plain AVG over
    irregular samples over-weights bursts).

    Weights come from one LEAD window on (user_id; ts, event_id — a
    total order), then a map-side-combined rollup; exact integer
    micros·ms products keep the hash portable.  Scale: one user_id
    shuffle + one tiny per-type aggregation, same two-exchange shape
    as lead_sessionize.
    """
    ev = _typed_valued_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    dur_ms = FN.unix_ms(F.lead("ts", 1).over(w)) - FN.unix_ms(F.col("ts"))
    seq = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("v_micros"),
        dur_ms.alias("dur_ms"),
    ).filter(F.col("dur_ms").isNotNull() & (F.col("dur_ms") > 0))
    # DECIMAL(38,0), not BIGINT: micros-x-ms products summed over the
    # fact OVERFLOW int64 around sf0.1 (ANSI mode rightly raised) — a
    # weighted sum's width grows with data volume, so the accumulator
    # type must out-scale the data.  The quotient (the actual TWA)
    # belongs to the consumer per the A10 ratio-of-sums discipline.
    return seq.groupBy("event_type").agg(
        F.sum(
            F.col("v_micros").cast("decimal(38,0)") * F.col("dur_ms")
        ).cast("decimal(38,0)").alias("weighted_sum"),
        F.sum("dur_ms").alias("total_ms"),
    )


# ---------------------------------------------------------------------------
# Correlation / regression aggregates — exact-integer moment sums.
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH pts AS (
    SELECT event_type,
           CAST(floor(epoch_ms(ts) / 3600000) % 24 AS BIGINT) AS hod,
           CAST(floor(value * 1000000) AS BIGINT) AS v
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), m AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(hod) AS BIGINT) AS sx,
           CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(CAST(hod AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(hod * hod) AS BIGINT) AS sxx
    FROM pts GROUP BY event_type
)
SELECT event_type, n, sx, sy, sxy, sxx,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx), 6) AS slope_micros_per_hour
FROM m
"""


@query(
    "correlation_stats", oracle=_CORR_ORACLE, tags=("ext", "stats", "A1")
)
def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type regression of value on hour-of-day from the five moment
    sums (n, Σx, Σy, Σxy, Σx²) — the sufficient statistics every
    corr/covar/regr_* aggregate derives from, accumulated as exact
    BIGINTs so they combine associatively (order-independent under any
    partitioning) and hash-check cross-engine; only the final slope is
    a (rounded) float.

    The built-in ``corr``/``covar_pop`` compute running floats whose
    value depends on partition order — unusable for a cross-engine
    hash; this moment-sum form is also the textbook map-side-combine
    shape: one shuffle carrying 5 longs per group.
    """
    ev = _typed_valued_events(spark, sf_dir)
    pts = ev.select(
        "event_type",
        (F.floor(FN.unix_ms("ts") / F.lit(3600000)) % 24).alias("hod"),
        F.floor(F.col("value") * 1000000).cast("long").alias("v"),
    )
    # volume-growing sums (Σy, Σxy) accumulate in DECIMAL(38,0): the
    # int64 ceiling arrives near 1e9 rows per group (the same latent
    # class the sf0.1 sweep caught in time_weighted_avg); per-row
    # factors bounded by constants (Σx, Σx² with x<24) stay BIGINT
    m = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("hod").alias("sx"),
        F.sum(F.col("v").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("hod").cast("decimal(38,0)") * F.col("v"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("hod") * F.col("hod")).alias("sxx"),
    )
    slope = F.round(
        (
            F.col("n").cast("decimal(38,0)") * F.col("sxy")
            - F.col("sx").cast("decimal(38,0)") * F.col("sy")
        ).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return m.select(
        "event_type", "n", "sx", "sy", "sxy", "sxx",
        slope.alias("slope_micros_per_hour"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram — ntile buckets with exact bounds.
# ---------------------------------------------------------------------------

N_DEPTH_BUCKETS = 10

_EQUIDEPTH_ORACLE = f"""
WITH v AS (
    SELECT event_type,
           CAST(floor(value * 1000000) AS BIGINT) AS v_micros,
           NTILE({N_DEPTH_BUCKETS}) OVER (
               PARTITION BY event_type
               ORDER BY CAST(floor(value * 1000000) AS BIGINT), event_id
           ) AS bucket
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type, CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(v_micros) AS BIGINT) AS lo_micros,
       CAST(MAX(v_micros) AS BIGINT) AS hi_micros
FROM v GROUP BY event_type, bucket
"""


@query(
    "equidepth_histogram",
    oracle=_EQUIDEPTH_ORACLE,
    tags=("ext", "profiling", "stats"),
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) value histogram per event type — the
    quantile-bucket profile optimizers and drift monitors want where
    `numeric_histogram_profile` gives equi-width.  NTILE over the
    (value, event_id) total order makes bucket assignment
    deterministic under ties; bounds are exact micros.

    Scale: one window shuffle per series + a rollup that reuses the
    same partitioning prefix.  For 100 TB series swap NTILE for
    approx_percentile cut-points (mergeable sketch) and bucket by
    range — same output schema, no total sort.
    """
    ev = _typed_valued_events(spark, sf_dir)
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("v_micros"),
        "event_id",
    )
    w = W.partitionBy("event_type").orderBy("v_micros", "event_id")
    return (
        v.withColumn("bucket", F.ntile(N_DEPTH_BUCKETS).over(w))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v_micros").alias("lo_micros"),
            F.max("v_micros").alias("hi_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchical rollup pyramid — hour → day → week from partials.
# ---------------------------------------------------------------------------

_PYRAMID_ORACLE = """
WITH hourly AS (
    SELECT CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS b,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
), daily AS (
    SELECT b // 24 AS b, event_type,
           CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS cents
    FROM hourly GROUP BY 1, 2
), weekly AS (
    SELECT b // 7 AS b, event_type,
           CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS cents
    FROM daily GROUP BY 1, 2
)
SELECT 'hour' AS grain, b, event_type, n, cents FROM hourly
UNION ALL SELECT 'day', b, event_type, n, cents FROM daily
UNION ALL SELECT 'week', b, event_type, n, cents FROM weekly
"""


@query(
    "hierarchical_rollup", oracle=_PYRAMID_ORACLE, tags=("ext", "rollup", "A1")
)
def hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour → day → week rollup pyramid where each coarser grain
    re-aggregates the next finer grain's PARTIALS, never the raw rows —
    the materialized-rollup discipline the reference applies to its
    daily-partial → 28-day chain (SURVEY §2.4), extended to a full
    pyramid.

    Scale: the raw scan feeds exactly one (hour, type) aggregation; the
    day and week levels run over frames whose size is the bucket count
    (∝ time span), so their cost is independent of input rows.  The
    hourly frame persists across its two consumers; at 100 TB each
    level is what you'd materialize as a table, and incremental
    refresh touches only the trailing buckets.
    """
    ev = read_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.floor(FN.unix_ms("ts") / F.lit(3600000)).alias("b"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .persist()
    )
    daily = (
        hourly.groupBy(
            (F.col("b") / 24).cast("long").alias("b"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .persist()
    )
    weekly = daily.groupBy(
        (F.col("b") / 7).cast("long").alias("b"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    lvl = lambda df, g: df.select(  # noqa: E731
        F.lit(g).alias("grain"), "b", "event_type", "n", "cents"
    )
    return lvl(hourly, "hour").unionByName(lvl(daily, "day")).unionByName(
        lvl(weekly, "week")
    )


# ---------------------------------------------------------------------------
# EWMA smoothing — recursive fold over the ordered hourly series.
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH b AS (
    SELECT event_type,
           CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS hb,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2
), s AS (
    SELECT event_type,
           list_sort(list(struct_pack(hb := hb, x := x))) AS pts
    FROM b GROUP BY event_type
)
SELECT event_type,
       CAST(len(pts) AS BIGINT) AS n_buckets,
       ROUND(list_reduce(list_transform(pts, p -> CAST(p.x AS DOUBLE)),
                         (acc, x) -> 0.5 * x + 0.5 * acc), 6) AS ewma
FROM s
"""


@query("ewma_smoothing", oracle=_EWMA_ORACLE, tags=("ext", "timeseries"))
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of each
    event_type's hourly series — the recursive smoother
    (s_t = α·x_t + (1−α)·s_{t−1}) that windows can't express because
    each output depends on ALL preceding inputs.

    Expressed as an ordered fold: the hourly rollup collects into a
    bucket-sorted array per series and a single Catalyst ``aggregate``
    replays the recurrence.  α = 1/2 keeps every step a halving —
    exactly representable, so the fold is bit-identical cross-engine.

    Scale: state is one array per SERIES (∝ time-span buckets, not raw
    rows — the rollup collapses rows first).  Series too long for one
    array chunk into segments whose partial (value, weight) pairs
    compose associatively — same plan, one extra rollup level.
    """
    ev = _typed_valued_events(spark, sf_dir)
    b = ev.groupBy(
        "event_type",
        F.floor(FN.unix_ms("ts") / F.lit(3600000)).alias("hb"),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("x"))
    s = b.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("hb", "x"))).alias("pts")
    )
    ewma = F.aggregate(
        F.transform(F.col("pts"), lambda p: p["x"].cast("double")),
        F.lit(0.0),
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    return s.select(
        "event_type",
        F.size("pts").cast("long").alias("n_buckets"),
        F.round(ewma, 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Winsorization — percentile-clamped robust aggregates.
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH v AS (
    SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v_micros
    FROM events
), cuts AS (
    SELECT event_type,
           CAST(ceil(quantile_cont(v_micros, 0.05)) AS BIGINT) AS lo,
           CAST(floor(quantile_cont(v_micros, 0.95)) AS BIGINT) AS hi
    FROM v GROUP BY event_type
)
SELECT v.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN v_micros < lo OR v_micros > hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
       CAST(SUM(greatest(lo, least(hi, v_micros))) AS BIGINT)
         AS winsorized_sum_micros,
       ROUND(CAST(SUM(greatest(lo, least(hi, v_micros))) AS DOUBLE)
             / COUNT(*), 6) AS winsorized_mean
FROM v JOIN cuts ON v.event_type = cuts.event_type
GROUP BY v.event_type
"""


@query(
    "winsorize_values", oracle=_WINSOR_ORACLE, tags=("ext", "stats", "W4")
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clamped) per-type value aggregates — the
    robust-statistics cleaning step for long-tailed telemetry.  The
    interpolated `percentile` cut-points (cross-engine equivalence
    pinned by the W4 rollup) integerize to [ceil(p05), floor(p95)] so
    the clamped sum stays an exact BIGINT — order-independent under
    any partitioning, per the global float policy.

    Plan: cut-points aggregate per type (tiny frame, broadcast back
    onto the scan), then one clamped rollup — two exchanges, the
    second carrying only group partials.  At 100 TB swap `percentile`
    for `percentile_approx` at the call site (mergeable sketch, same
    shape) and the clamp is unchanged.
    """
    ev = read_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("v_micros"),
    )
    cuts = v.groupBy("event_type").agg(
        F.ceil(F.expr("percentile(v_micros, 0.05)")).cast("long").alias("lo"),
        F.floor(F.expr("percentile(v_micros, 0.95)")).cast("long").alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v_micros")))
    return (
        # bounded: per-event-type quantile cuts
        v.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("v_micros") < F.col("lo"))
                    | (F.col("v_micros") > F.col("hi")),
                    1,
                ).otherwise(0)
            ).alias("n_clamped"),
            F.sum(clamped).alias("winsorized_sum_micros"),
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)), 6
            ).alias("winsorized_mean"),
        )
    )
