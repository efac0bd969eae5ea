"""Scale-strategy gates: salted joins preserve join semantics, bucketed
tables actually join without an exchange, and partition planning sizes
sanely."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.scale import (
    explain_has,
    plan_partitions,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    ev = read_table(spark, SF_DIR, "events").select("user_id", "event_type")
    dim = spark.createDataFrame(
        [("view", 1), ("click", 2), ("purchase", 3)], "event_type string, w int"
    )
    plain = (
        ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
    )
    salted = (
        salted_join(ev, dim, "event_type", n_salts=8)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    ev = read_table(spark, SF_DIR, "events").select("user_id", "event_type")
    dim = spark.createDataFrame([("view", 1)], "event_type string, w int")
    out = salted_join(ev, dim, "event_type", n_salts=8)
    # the salt column is internal and must not leak
    assert "_salt" not in out.columns
    assert out.count() == ev.filter(F.col("event_type") == "view").count()


def test_bucketed_join_has_no_shuffle(spark):
    # saveAsTable writes to the session warehouse (./spark-warehouse,
    # gitignored); tables are dropped at the end.  Auto-broadcast is
    # disabled for the assertion: on this tiny fixture the planner would
    # otherwise broadcast and skip the bucketed scan entirely (which is
    # the right call at that size — bucketing pays off for large-large).
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")
    ev = read_table(spark, SF_DIR, "events").select("user_id", "value")
    write_bucketed(ev, "ev_bucketed_a", "user_id", n_buckets=8)
    write_bucketed(ev, "ev_bucketed_b", "user_id", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("ev_bucketed_a")
        b = spark.table("ev_bucketed_b").withColumnRenamed("value", "value_b")
        joined = a.join(b, "user_id")
        marks = explain_has(joined, "Exchange", "SortMergeJoin")
        # bucketed-on-join-key tables must not re-shuffle
        assert marks["SortMergeJoin"] and not marks["Exchange"], marks
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")


def test_plan_partitions_bounds():
    gb = 1024**3
    assert plan_partitions(1 * gb) == 32  # floor
    assert plan_partitions(100 * 1024**4) == 200_000  # 100 TB capped
    assert plan_partitions(1 * 1024**4) == 8192  # 1 TB → 8k tasks


def test_runtime_bloom_filter_prunes_probe_scan(spark):
    """Large-large shuffled join with a selective build-side filter:
    runtime row-level filtering must inject a bloom-filter
    ``might_contain`` predicate on the probe side, so pruned fact rows
    die at the scan instead of crossing the exchange.  (Broadcast is
    disabled to model the neither-side-fits case.)"""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.scale import runtime_bloom_filters
    from tests.conftest import SF_DIR

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe_bc = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        with runtime_bloom_filters(spark, application_side_threshold="0"):
            o = (
                read_table(spark, SF_DIR, "orders")
                .filter(F.col("o_orderpriority") == "1-URGENT")
                .select("o_orderkey")
            )
            l = read_table(spark, SF_DIR, "lineitem").select(
                "l_orderkey", "l_quantity"
            )
            j = l.join(o, l.l_orderkey == o.o_orderkey).agg(
                F.sum("l_quantity")
            )
            plan = j._jdf.queryExecution().optimizedPlan().toString()
            assert "might_contain" in plan, plan[:3000]
        # conf restored on exit
        assert (
            spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
            )
            != "0"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        if old_aqe_bc is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe_bc)


def test_zorder_key_matches_morton_reference(spark):
    """zorder_key == bit-interleave reference on a seeded random batch
    (property-style: one DataFrame pass instead of per-example Spark
    jobs), plus clamping at the domain boundary."""
    import random

    from taipei_bi_etl_spark.scale import zorder_key

    rng = random.Random(42)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    pts += [(-5, 3), (1 << 20, 1)]  # clamped
    df = spark.createDataFrame(pts, "x long, y long")
    got = [
        r.z
        for r in df.select(zorder_key(["x", "y"]).alias("z")).collect()
    ]

    def morton(x, y, bits=16):
        x = min(max(x, 0), (1 << bits) - 1)
        y = min(max(y, 0), (1 << bits) - 1)
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == [morton(x, y) for x, y in pts]


def test_zorder_layout_concentrates_both_dimensions(spark, tmp_path):
    """The point of Z-ordering: after range-partitioning a write by the
    Z key, a selective filter on the SECOND dimension touches fewer
    files than under a first-dimension-only sort — i.e. parquet min/max
    file skipping now works for both dimensions."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.scale import zorder_key
    from tests.conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events").select(
        F.pmod(F.xxhash64("user_id"), F.lit(256)).alias("ub"),
        F.pmod(F.xxhash64("event_id"), F.lit(256)).alias("eb"),
        "value",
    )
    n_files = 16
    linear = str(tmp_path / "linear")
    zorder = str(tmp_path / "zorder")
    ev.repartitionByRange(n_files, "ub", "eb").write.parquet(linear)
    ev.repartitionByRange(
        n_files, zorder_key(["ub", "eb"]).alias("zk")
    ).write.parquet(zorder)

    def files_hit(path: str) -> int:
        return (
            spark.read.parquet(path)
            .filter(F.col("eb") < 16)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    lin, zo = files_hit(linear), files_hit(zorder)
    # linear layout spreads eb across every ub-sorted file; Z-order
    # clusters it.  (16/256 selectivity, 16 files: lin is ~all files.)
    assert zo < lin, (zo, lin)
    assert zo <= n_files // 2, (zo, lin)


def test_bench_and_stress_query_names_resolve():
    """bench.py / stress.py run whatever these lists name — a typo or a
    renamed query would silently shrink the driver's benchmark."""
    import bench
    import stress

    from taipei_bi_etl_spark.queries import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench HEADLINE names not in REGISTRY: {missing}"
    missing = [n for n in stress.STRESS_QUERIES if n not in REGISTRY]
    assert not missing, f"stress names not in REGISTRY: {missing}"


def test_join_strategy_hints_select_physical_operators(spark):
    """The strategy helpers must actually flip the physical operator:
    shuffle_hash → ShuffledHashJoin, merge → SortMergeJoin — silent
    fallback to the default would make the 100 TB tuning knobs no-ops."""
    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.scale import merge_join, shuffle_hash_join

    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    shj = shuffle_hash_join(li, o, "l_orderkey")
    assert explain_has(shj, "ShuffledHashJoin")["ShuffledHashJoin"]
    smj = merge_join(li, o, "l_orderkey")
    assert explain_has(smj, "SortMergeJoin")["SortMergeJoin"]


def test_skew_report_flags_hot_key(spark):
    """skew_report must surface a planted hot key with a ratio well
    above 1 and exact top-k counts."""
    from taipei_bi_etl_spark.scale import skew_report

    base = spark.range(1000).selectExpr("id % 100 AS k", "id AS v")
    hot = spark.range(900).selectExpr("CAST(7 AS BIGINT) AS k", "id AS v")
    rep = skew_report(base.unionByName(hot), "k")
    assert rep["rows"] == 1900
    assert rep["distinct_keys"] == 100
    assert rep["top"][0] == {"k": 7, "n": 910}
    assert rep["skew_ratio"] > 10


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE must be live, not just configured: a small aggregate under
    the default 200-partition shuffle setting should execute with
    coalesced partitions (AQEShuffleRead) — the runtime re-plan that
    keeps tiny stages from scheduling 200 near-empty tasks at scale."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        df = (
            read_table(spark, SF_DIR, "orders")
            .groupBy("o_orderstatus")
            .count()
        )
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead coalesced" in final, final[:1500]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_assert_broadcastable_guards_large_frames(spark):
    import pytest as _pytest

    from taipei_bi_etl_spark.scale import (
        assert_broadcastable,
        estimated_size_bytes,
    )

    small = read_table(spark, SF_DIR, "nation")
    assert estimated_size_bytes(small) > 0
    assert assert_broadcastable(small, limit_mb=64) is small
    big = read_table(spark, SF_DIR, "lineitem")
    with _pytest.raises(ValueError, match="refusing to broadcast"):
        assert_broadcastable(big, limit_mb=0)


def test_widen_scan_parallelizes_single_file_scan(spark):
    """r10: a single-file/single-row-group parquet scan plans ONE task;
    widen_scan must lift it to the session's default parallelism while
    keeping the rows identical, and must be a NO-OP (same plan, no
    added exchange) when the input already has enough partitions."""
    from taipei_bi_etl_spark.scale import widen_scan

    d = read_table(spark, SF_DIR, "documents")
    n0 = d.rdd.getNumPartitions()
    assert n0 == 1, f"fixture assumption: single-file scan, got {n0}"

    wide = widen_scan(d)
    target = spark.sparkContext.defaultParallelism
    assert wide.rdd.getNumPartitions() == target
    # content identical (order-insensitive)
    base_rows = sorted(map(tuple, d.collect()))
    wide_rows = sorted(map(tuple, wide.collect()))
    assert base_rows == wide_rows

    # no-op case: already at/above target → the SAME DataFrame comes
    # back (no exchange inserted)
    already = d.repartition(target + 1)
    assert widen_scan(already) is already

    # explicit target overrides the session default
    assert widen_scan(d, target=7).rdd.getNumPartitions() == 7
