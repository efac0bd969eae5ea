"""Ninth batch — function-surface completeness packs: the analytic
window functions beyond LEAD/RANK (first/last/nth value, lag with
default), the regexp family beyond rlike (extract-all, count, substr,
replace), and the higher-order array functions as one oracle-checked
query each.

The reference touches each family at one point (W2 LEAD, P8 rlike,
A6 array scalar-subquery); these packs pin the REST of each family so
a user migrating arbitrary BigQuery SQL finds the functions present
and cross-engine-consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Analytic window value functions.
# ---------------------------------------------------------------------------

_WINVAL_ORACLE = """
WITH seq AS (
    SELECT user_id, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS v_micros,
           ts
    FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id,
       FIRST_VALUE(v_micros) OVER w AS first_v,
       LAST_VALUE(v_micros) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_v,
       NTH_VALUE(v_micros, 2) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_v,
       LAG(v_micros, 1, -1) OVER w AS prev_v,
       v_micros - LAG(v_micros, 1, 0) OVER w AS delta_v
FROM seq
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("window_value_pack", oracle=_WINVAL_ORACLE, tags=("window", "W2"))
def window_value_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic value functions the reference never needed but a
    migrating user will: FIRST_VALUE / LAST_VALUE / NTH_VALUE (with
    the full-partition frame — the default frame stops at CURRENT ROW,
    the classic LAST_VALUE gotcha, spelled explicitly here) and LAG
    with a default, all over one total-ordered per-user window.

    Scale: all five functions share ONE window spec family (same
    partition key, same order), so the plan is a single user_id
    exchange + one sort feeding every Window operator — pinning that
    functions-sharing-a-window don't multiply shuffles.  Values are
    integer micros end-to-end.
    """
    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = F.floor(F.col("value") * 1_000_000).cast("long")
    seq = e.select(
        "user_id", "event_id", v.alias("v_micros"), "ts"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return seq.select(
        "user_id",
        "event_id",
        F.first("v_micros").over(w).alias("first_v"),
        F.last("v_micros").over(wfull).alias("last_v"),
        F.nth_value("v_micros", 2).over(wfull).alias("second_v"),
        F.lag("v_micros", 1, -1).over(w).alias("prev_v"),
        (F.col("v_micros") - F.lag("v_micros", 1, 0).over(w)).alias("delta_v"),
    )


# ---------------------------------------------------------------------------
# Regexp function family.
# ---------------------------------------------------------------------------

_REGEX_ORACLE = """
SELECT d.doc_id,
       CAST(len(regexp_extract_all(d.text, '[a-z]+a[a-z]*')) AS BIGINT)
         AS n_a_words,
       regexp_extract(d.text, '([a-z]{5,})', 1) AS first_long,
       CAST(CASE WHEN regexp_matches(d.text, 'spark|hash') THEN 1 ELSE 0 END
            AS BIGINT) AS mentions_engine,
       length(regexp_replace(d.text, '[aeiou]', '', 'g')) AS len_novowel
FROM documents d
"""


@query("regex_function_pack", oracle=_REGEX_ORACLE, tags=("text", "P8"))
def regex_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regexp family beyond the reference's single `str.match` (P8,
    `tasks/rps.py:154`): extract-all count, first-match extract with a
    capture group, boolean match, and global replace — one pass, all
    codegen'd JVM regex (no Python).

    Dialect note pinned by the oracle: Spark `regexp_replace` is
    global by default where DuckDB needs the 'g' flag, and
    `regexp_extract` returns '' (not NULL) on no-match in BOTH
    engines with group 1 — the cross-engine surface a migration
    actually has to verify, which is exactly what the hash check does.
    Scale: scan-only, zero shuffles, ~profiles the regex throughput
    ceiling on a 100 TB text corpus.
    """
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        # Spark's regexp_extract_all defaults to group 1 — the pattern
        # must carry a capture group (DuckDB returns the full match
        # either way; group 1 spans the whole pattern so counts agree)
        F.size(F.expr(r"regexp_extract_all(text, '([a-z]+a[a-z]*)')"))
        .cast("long")
        .alias("n_a_words"),
        F.regexp_extract("text", r"([a-z]{5,})", 1).alias("first_long"),
        F.when(F.col("text").rlike("spark|hash"), 1)
        .otherwise(0)
        .cast("long")
        .alias("mentions_engine"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("len_novowel"),
    )


# ---------------------------------------------------------------------------
# Higher-order array functions.
# ---------------------------------------------------------------------------

_HOF_ORACLE = """
WITH t AS (
    SELECT d.doc_id, string_split(d.text, ' ') AS words
    FROM documents d
)
SELECT doc_id,
       CAST(len(list_filter(words, w -> length(w) > 4)) AS BIGINT)
         AS n_long,
       CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
         AS total_chars,
       CAST(CASE WHEN length(words[1]) >= 1 THEN 1 ELSE 0 END AS BIGINT)
         AS head_nonempty,
       array_to_string(list_transform(words[1:3], w -> upper(w)), '-')
         AS head3_upper
FROM t
"""


@query("hof_array_pack", oracle=_HOF_ORACLE, tags=("arrays", "A6"))
def hof_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the tokenized text — filter,
    transform+aggregate, element access, slice+transform+join — the
    family the engine uses internally everywhere (D2/D3 cleanups are
    `F.transform`, A6 kv-extract is `F.filter` + `element_at`) pinned
    once as a user-facing pack.

    All lambdas run inside Catalyst (codegen'd, JVM) — the point of
    higher-order functions is exactly that per-element logic does NOT
    leave the executor loop for Python.  Scan-only, zero shuffle; the
    words array lives only inside the projection (never shuffled or
    materialized), so memory cost is one row's tokens at a time.
    """
    d = read_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(words, lambda w: F.length(w) > 4))
        .cast("long")
        .alias("n_long"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.when(F.length(F.element_at(words, 1)) >= 1, 1)
        .otherwise(0)
        .cast("long")
        .alias("head_nonempty"),
        F.array_join(
            F.transform(F.slice(words, 1, 3), lambda w: F.upper(w)), "-"
        ).alias("head3_upper"),
    )


# ---------------------------------------------------------------------------
# Native MapType functions.
# ---------------------------------------------------------------------------

_MAP_ORACLE = """
WITH per_line AS (
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY 1, 2
)
SELECT COALESCE(l_orderkey, -1) AS l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COALESCE(MAX(CASE WHEN l_linenumber = 1 THEN qty END), -1)
            AS BIGINT) AS qty_line1,
       CAST(SUM(CASE WHEN l_linenumber <= 3 THEN qty ELSE 0 END) AS BIGINT)
         AS qty_first3
FROM per_line GROUP BY 1
"""


@query("map_function_pack", oracle=_MAP_ORACLE, tags=("maps", "A6"))
def map_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``MapType`` end-to-end: build a per-order linenumber→qty
    map with ``map_from_entries(collect_list(struct))``, then read it
    back through ``map_keys`` / ``element_at`` / ``map_filter`` /
    ``map_values`` + ``aggregate``.

    The reference never had native maps — BigQuery emulates them as
    ``ARRAY<STRUCT<key,value>>`` (SURVEY §1.2, `udf_js/cleanup_*.sql`)
    and this engine's kv helpers mirror that — so this pack is the
    migration target: the same data as a first-class map, with lookups
    that are hash probes instead of array scans.

    Determinism discipline: keys are made unique BEFORE the map build
    (qty pre-aggregated per (order, line) — `map_from_entries` raises
    on duplicate keys under the default dedup policy), and every
    output is key-addressed or an order-independent integer sum, so
    the map's internal entry order (which follows the nondeterministic
    collect_list order) never leaks into the hash.
    """
    # order key coalesced in BOTH engines: a NULL group key breaks
    # the driver compare's row sort (hostile relational sweep)
    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "l_orderkey", F.coalesce("l_orderkey", F.lit(-1))
    )
    per_line = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum(F.round("l_quantity", 0).cast("long")).alias("qty"))
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("l_linenumber"), F.col("qty")))
    )
    per_order = per_line.groupBy("l_orderkey").agg(m.alias("m"))
    first3 = F.map_filter(F.col("m"), lambda k, v: k <= 3)
    return per_order.select(
        "l_orderkey",
        F.size(F.map_keys("m")).cast("long").alias("n_lines"),
        F.coalesce(F.element_at(F.col("m"), F.lit(1)), F.lit(-1))
        .cast("long")
        .alias("qty_line1"),
        F.aggregate(
            F.map_values(first3), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("qty_first3"),
    )


# ---------------------------------------------------------------------------
# Calendar field functions.
# ---------------------------------------------------------------------------

_CAL_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(EXTRACT(QUARTER FROM o.o_orderdate) AS BIGINT) AS o_quarter,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(EXTRACT(WEEK FROM o.o_orderdate)) AS BIGINT) AS sum_isoweek,
       CAST(SUM(EXTRACT(ISODOW FROM o.o_orderdate)) AS BIGINT) AS sum_isodow,
       CAST(SUM(EXTRACT(DOY FROM o.o_orderdate)) AS BIGINT) AS sum_doy,
       CAST(MAX(EXTRACT(DAY FROM last_day(CAST(o.o_orderdate AS DATE))))
            AS BIGINT) AS max_month_len
FROM orders o
WHERE o.o_orderdate IS NOT NULL
GROUP BY 1, 2
"""


@query("calendar_function_pack", oracle=_CAL_ORACLE, tags=("datetime", "F1"))
def calendar_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar field extraction beyond F1–F8's date arithmetic:
    quarter, ISO week-of-year, ISO weekday, day-of-year, and month
    length via ``last_day`` — aggregated so every function's value
    over ~27 year-quarters rides the hash.

    Dialect parity pinned here: Spark ``weekofyear`` IS the ISO week
    (DuckDB ``EXTRACT(WEEK)``), and Spark's ISO weekday is ``weekday()
    + 1`` (0-Monday) against DuckDB's ``ISODOW`` (1-Monday) — the
    off-by-one a migration hits first.  ``dayofweek``'s 1-Sunday
    convention is deliberately NOT used cross-engine.
    """
    # NULL order dates carry no calendar meaning — excluded in BOTH
    # engines (hostile relational sweep: the NULL group's all-NULL
    # aggregates break the driver compare's row sort)
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    d = F.to_date("o_orderdate")
    return (
        o.groupBy(
            F.year(d).cast("long").alias("o_year"),
            F.quarter(d).cast("long").alias("o_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.weekofyear(d)).cast("long").alias("sum_isoweek"),
            F.sum(F.weekday(d) + 1).cast("long").alias("sum_isodow"),
            F.sum(F.dayofyear(d)).cast("long").alias("sum_doy"),
            F.max(F.dayofmonth(F.last_day(d))).cast("long").alias("max_month_len"),
        )
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM).
# ---------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH a AS (
    SELECT NULLIF(c_nationkey % 5, 4) AS grp, c_custkey FROM customer
), b AS (
    SELECT NULLIF(s_nationkey % 5, 4) AS grp, s_suppkey FROM supplier
)
SELECT CAST(COALESCE(a.grp, -1) AS BIGINT) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
GROUP BY 1
"""


@query("null_safe_join_rollup", oracle=_NULLSAFE_ORACLE, tags=("join", "P7"))
def null_safe_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on a NULLABLE key with null-safe equality (`<=>` — SQL's
    IS NOT DISTINCT FROM): the NULL group matches the NULL group,
    where ordinary `=` would silently drop every NULL row from an
    inner join — the null-handling delta (P7/P10 family,
    `sql/mango_user_channels.sql:117-132`) that the reference papered
    over with eight IFNULL() coats.

    Plan note: `<=>` is still an EQUI join key for Spark (hashable —
    null hashes like a value), so this stays a broadcast/hash join,
    not a nested loop; the output key is COALESCE'd to -1 because the
    multiset comparator needs a total order.  At scale, remember the
    null group is often the HOT group — `skew_report` it first.
    """
    c = read_table(spark, sf_dir, "customer").select(
        F.nullif((F.col("c_nationkey") % 5), F.lit(4)).alias("grp_a"),
        "c_custkey",
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.nullif((F.col("s_nationkey") % 5), F.lit(4)).alias("grp_b"),
        "s_suppkey",
    )
    return (
        c.join(s, F.col("grp_a").eqNullSafe(F.col("grp_b")))
        .groupBy(F.coalesce("grp_a", F.lit(-1)).cast("long").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL — modern authoring shorthand.
# ---------------------------------------------------------------------------

_GBA_ORACLE = """
SELECT COALESCE(o.o_orderstatus, '(null)') AS o_orderstatus,
       COALESCE(o.o_orderpriority, '(null)') AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o
GROUP BY ALL
"""


@query("group_by_all_rollup", oracle=_GBA_ORACLE, tags=("modern", "sql", "A1"))
def group_by_all_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — every non-aggregate select item becomes a
    grouping key, inferred by the analyzer.  Both engines support the
    same shorthand, so the oracle runs the IDENTICAL text; the plan is
    indistinguishable from the explicit GROUP BY 1, 2 (same partial+
    final HashAggregate), making this pure authoring surface like the
    pipe-syntax twin.
    """
    from taipei_bi_etl_spark.io import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_GBA_ORACLE)


# ---------------------------------------------------------------------------
# Distribution drift — exact-integer total-variation distance.
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), tot AS (
    SELECT day, CAST(SUM(c) AS BIGINT) AS n FROM daily GROUP BY 1
), pairs AS (
    SELECT a.day AS day, a.event_type,
           a.c AS c1, ta.n AS n1, COALESCE(b.c, 0) AS c2, tb.n AS n2
    FROM daily a
    JOIN tot ta ON ta.day = a.day
    JOIN tot tb ON tb.day = a.day + INTERVAL 1 DAY
    LEFT JOIN daily b
      ON b.day = a.day + INTERVAL 1 DAY AND b.event_type = a.event_type
)
SELECT day,
       CAST(SUM(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS tv_scaled,
       CAST(MAX(n1) AS BIGINT) AS n_today,
       CAST(MAX(n2) AS BIGINT) AS n_next
FROM pairs GROUP BY day
"""


@query("distribution_drift_tv", oracle=_DRIFT_ORACLE, tags=("checks", "stats"))
def distribution_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day drift of the event-type distribution as a
    total-variation distance — the data-quality monitor that catches a
    producer silently changing mix (the failure V1–V6's row-count and
    null checks can't see: same volume, different shape).

    Exactness trick: TV = ½ Σ|p_i − q_i| needs probability divisions,
    but cross-multiplying by both days' totals gives
    ``Σ|c1_i·N2 − c2_i·N1|`` — an exact BIGINT (TV = that / (2·N1·N2),
    the consumer's division).  One caveat pinned by the oracle: event
    types PRESENT tomorrow but absent today contribute via the
    |0·N2 − c2·N1| terms only if enumerated — this implementation (and
    oracle) measures drift over today's support, the usual monitoring
    choice since vanishing categories already trip it.

    Scale: one (day, type) aggregation — the drift frame is
    |days|·|types| rows; the day-over-day join runs on that aggregate,
    never on raw events.
    """
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = daily.groupBy("day").agg(F.sum("c").alias("n"))
    a = daily.alias("a")
    b = daily.alias("b")
    ta = tot.alias("ta")
    tb = tot.alias("tb")
    pairs = (
        a.join(ta, F.col("a.day") == F.col("ta.day"))
        .join(tb, F.date_add(F.col("a.day"), 1) == F.col("tb.day"))
        .join(
            b,
            (F.date_add(F.col("a.day"), 1) == F.col("b.day"))
            & (F.col("a.event_type") == F.col("b.event_type")),
            "left",
        )
        .select(
            F.col("a.day").alias("day"),
            F.col("a.c").alias("c1"),
            F.col("ta.n").alias("n1"),
            F.coalesce(F.col("b.c"), F.lit(0)).alias("c2"),
            F.col("tb.n").alias("n2"),
        )
    )
    return pairs.groupBy("day").agg(
        F.sum(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
        .cast("long")
        .alias("tv_scaled"),
        F.max("n1").cast("long").alias("n_today"),
        F.max("n2").cast("long").alias("n_next"),
    )


# ---------------------------------------------------------------------------
# Conditional / selective aggregate pack.
# ---------------------------------------------------------------------------

_CONDAGG_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count_if(o.o_totalprice > 50000) AS BIGINT) AS n_large,
       CAST(CASE WHEN bool_and(o.o_totalprice > 0) THEN 1 ELSE 0 END
            AS BIGINT) AS all_positive,
       CAST(CASE WHEN bool_or(o.o_orderstatus = 'F') THEN 1 ELSE 0 END
            AS BIGINT) AS any_filled,
       CAST(max_by(o.o_orderkey, CAST(round(o.o_totalprice * 100) AS HUGEINT)
                   * 1000000000000000 + o.o_orderkey) AS BIGINT) AS top_orderkey,
       CAST(min_by(o.o_orderkey, CAST(round(o.o_totalprice * 100) AS HUGEINT)
                   * 1000000000000000 + o.o_orderkey) AS BIGINT) AS bottom_orderkey
FROM orders o
GROUP BY 1
"""


@query("conditional_agg_pack", oracle=_CONDAGG_ORACLE, tags=("relational", "A5"))
def conditional_agg_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selective-aggregate family in one pass: ``count_if``,
    ``bool_and`` / ``bool_or`` (every/any), and ``max_by`` / ``min_by``
    — generalizing the reference's CASE-inside-COUNT retention pivots
    (A5, `sql/mango_cohort_retained_users.sql:6-26`) to the dedicated
    aggregates Spark and DuckDB now share.

    Determinism discipline for arg-extrema: ``max_by`` ties are
    engine-arbitrary, so the ordering key is (cents, orderkey) packed
    into one DECIMAL(38,0) / HUGEINT — a TOTAL order, making the
    selected row unique (same convention as every top-k in this repo).
    The 10^15 multiplier leaves headroom for scaled fact builds
    (stress.py shifts orderkeys by replica * 10^11; ADVICE r01 flagged
    the previous 10^7 packing as collision-prone there); cents up to
    ~6e7 × 10^15 ≈ 6e22 sits comfortably inside decimal(38,0).
    booleans are cast to 0/1 BIGINT for the hash.
    """
    o = read_table(spark, sf_dir, "orders")
    cents = (
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .cast("decimal(38,0)")
    )
    ordkey = cents * F.lit(1_000_000_000_000_000).cast(
        "decimal(38,0)"
    ) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 50000).alias("n_large"),
        F.when(F.bool_and(F.col("o_totalprice") > 0), 1)
        .otherwise(0)
        .cast("long")
        .alias("all_positive"),
        F.when(F.bool_or(F.col("o_orderstatus") == "F"), 1)
        .otherwise(0)
        .cast("long")
        .alias("any_filled"),
        F.max_by("o_orderkey", ordkey).cast("long").alias("top_orderkey"),
        F.min_by("o_orderkey", ordkey).cast("long").alias("bottom_orderkey"),
    )


# ---------------------------------------------------------------------------
# String function pack.
# ---------------------------------------------------------------------------

_STRFN_ORACLE = """
SELECT c.c_custkey,
       lpad(CAST(c.c_custkey AS VARCHAR), 12, '0') AS padded_id,
       reverse(c.c_name) AS rev_name,
       translate(c.c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       repeat('*', CAST(c.c_custkey % 4 AS INT)) AS stars,
       concat_ws('|', c.c_mktsegment, CAST(c.c_nationkey AS VARCHAR))
         AS seg_nation
FROM customer c
"""


@query("string_function_pack", oracle=_STRFN_ORACLE, tags=("text", "F11"))
def string_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The portable string-function family beyond F11–F13's
    lower/concat/null-default: lpad (fixed-width key formatting — the
    reference's `Customer#%09d` style names), reverse, translate
    (character-map recode), repeat, and concat_ws — all codegen'd,
    scan-only, and spelled identically in both engines (the pack
    deliberately EXCLUDES the non-portable ones: Spark
    ``substring_index`` vs DuckDB ``split_part`` disagree on
    semantics, ``soundex`` implementations differ — migrations route
    those through `hof_array_pack`'s split+element_at instead).
    """
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_id"),
        F.reverse("c_name").alias("rev_name"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias(
            "seg_lower_vowels"
        ),
        F.repeat(F.lit("*"), (F.col("c_custkey") % 4).cast("int")).alias(
            "stars"
        ),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
    )


# ---------------------------------------------------------------------------
# Bitwise aggregate pack.
# ---------------------------------------------------------------------------

_BITAGG_ORACLE = """
SELECT l.l_returnflag,
       CAST(bit_and(l.l_suppkey) AS BIGINT) AS and_supp,
       CAST(bit_or(l.l_suppkey) AS BIGINT) AS or_supp,
       CAST(bit_xor(l.l_suppkey) AS BIGINT) AS xor_supp,
       CAST(SUM(bit_count(l.l_suppkey)) AS BIGINT) AS popcount_sum
FROM lineitem l
GROUP BY 1
"""


@query("bitwise_agg_pack", oracle=_BITAGG_ORACLE, tags=("relational", "A1"))
def bitwise_agg_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and / bit_or / bit_xor) plus per-row
    popcount — the primitives under this repo's sketch family (SimHash
    packs signs with shifts, the bitmap-WAU path is bit_or at its
    core) surfaced as user-facing aggregates.  All are associative and
    order-independent, so they map-side combine and hash-check
    cross-engine with no float policy needed at all.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_suppkey").alias("and_supp"),
        F.bit_or("l_suppkey").alias("or_supp"),
        F.bit_xor("l_suppkey").alias("xor_supp"),
        F.sum(F.bit_count("l_suppkey")).cast("long").alias("popcount_sum"),
    )


# ---------------------------------------------------------------------------
# Partition checksum audit — order-independent content fingerprints.
# ---------------------------------------------------------------------------

_CHECKSUM_ORACLE = """
WITH rows_ AS (
    SELECT CAST(ts AS DATE) AS day,
           ('0x' || substr(md5(concat_ws('|',
               coalesce(md5(CAST(event_id AS VARCHAR)), 'NULL'),
               coalesce(md5(CAST(user_id AS VARCHAR)), 'NULL'),
               coalesce(md5(event_type), 'NULL'),
               coalesce(md5(CAST(CAST(floor(value * 1000000) AS BIGINT)
                                 AS VARCHAR)), 'NULL'))),
               1, 15))::BIGINT AS fp
    FROM events
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(fp) AS BIGINT) AS content_xor,
       CAST(CAST(SUM(fp) AS HUGEINT) % 4611686018427387904 AS BIGINT)
         AS content_sum
FROM rows_ GROUP BY 1
"""


@query(
    "partition_checksum_audit",
    oracle=_CHECKSUM_ORACLE,
    tags=("checks", "ops"),
)
def partition_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day content fingerprints: row count + XOR of per-row md5
    fingerprints — the reconciliation primitive for verifying two
    copies of a 100 TB table (warehouse vs lake, pre- vs post-
    migration) WITHOUT moving or sorting data: XOR is commutative/
    associative, so the fingerprint is identical under any
    partitioning, any engine, any row order; a single flipped row
    flips the checksum.

    The oracle match is itself the cross-system use case: the SAME
    fingerprint computed by two engines over the same rows.  Canonical
    row serialization pins the cross-engine traps: floats and
    timestamps render differently per engine, so the fingerprint
    covers integerized value micros and keys, never raw float/ts
    strings; each column is md5-hashed INDIVIDUALLY with a NULL
    sentinel before the row hash, so NULL vs '' vs a '|'-bearing value
    stay distinct (ADVICE r01).  Alongside the XOR fold an additive
    SUM-mod-2^62 fingerprint closes XOR's even-multiplicity blind spot
    (swapping {r,r} for {s,s} cancels in XOR but not in the sum).
    Scale: scan + map-side-combined aggregates per day — the audit of
    a petabyte is one aggregation.
    """
    e = read_table(spark, sf_dir, "events")
    canon = F.concat_ws(
        "|",
        F.coalesce(F.md5(F.col("event_id").cast("string")), F.lit("NULL")),
        F.coalesce(F.md5(F.col("user_id").cast("string")), F.lit("NULL")),
        F.coalesce(F.md5(F.col("event_type")), F.lit("NULL")),
        F.coalesce(
            F.md5(
                F.floor(F.col("value") * 1_000_000).cast("long").cast("string")
            ),
            F.lit("NULL"),
        ),
    )
    fp = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return e.select(F.to_date("ts").alias("day"), fp.alias("fp")).groupBy(
        "day"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("fp").alias("content_xor"),
        F.pmod(
            F.sum(F.col("fp").cast("decimal(38,0)")),
            F.lit(4611686018427387904).cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("content_sum"),
    )
