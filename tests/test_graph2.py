"""Structural gates for the round-3 graph operators (their exact
values are already hash-checked against the recursive-CTE oracles in
test_queries_vs_oracle; these pin the graph-theoretic invariants that
survive any parametrization change)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.graph2 import (
    KSP_K,
    copurchase_k_shortest_paths,
    copurchase_label_propagation,
    _undirected_edges,
)
from tests.conftest import SF_DIR


def test_lpa_labels_are_node_ids_and_total(spark):
    out = copurchase_label_propagation(spark, SF_DIR).persist()
    nodes = _undirected_edges(spark, SF_DIR).select(
        F.col("src").alias("p_partkey")
    ).distinct()
    # one label per node, labels drawn from the node-id space
    assert out.count() == nodes.count()
    assert out.select("p_partkey").distinct().count() == out.count()
    stray = out.join(
        nodes.select(F.col("p_partkey").alias("community")),
        "community",
        "left_anti",
    )
    assert stray.count() == 0
    # fewer communities than nodes: propagation actually merged labels
    assert out.select("community").distinct().count() < out.count()


def test_ksp_invariants(spark):
    out = copurchase_k_shortest_paths(spark, SF_DIR).persist()
    seed = _undirected_edges(spark, SF_DIR).agg(F.min("src")).collect()[0][0]
    rows = out.filter(F.col("p_partkey") == seed).collect()
    # the seed's shortest path is the empty path
    assert min(r["dist_micros"] for r in rows) == 0
    assert [r for r in rows if r["path_rank"] == 1][0]["dist_micros"] == 0
    # per node: <= K ranks, ranks contiguous from 1, dists strictly
    # increasing with rank (distinct-length semantics)
    bad = (
        out.groupBy("p_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("path_rank").alias("lo"),
            F.max("path_rank").alias("hi"),
            F.count_distinct("dist_micros").alias("nd"),
        )
        .filter(
            (F.col("n") > KSP_K)
            | (F.col("lo") != 1)
            | (F.col("hi") != F.col("n"))
            | (F.col("nd") != F.col("n"))
        )
    )
    assert bad.count() == 0
    # monotone: rank order == dist order
    w_bad = (
        out.alias("a")
        .join(
            out.alias("b"),
            (F.col("a.p_partkey") == F.col("b.p_partkey"))
            & (F.col("a.path_rank") < F.col("b.path_rank"))
            & (F.col("a.dist_micros") >= F.col("b.dist_micros")),
        )
        .count()
    )
    assert w_bad == 0


def test_sa_equals_windowed_spans(spark):
    """The prefix-doubling form and the window-string form are two
    physical layouts of one operator — frame-identical output."""
    from taipei_bi_etl_spark.queries.suffix import (
        dedup_exact_substring_sa,
        dedup_exact_substring_spans,
    )

    a = dedup_exact_substring_sa(spark, SF_DIR)
    b = dedup_exact_substring_spans(spark, SF_DIR)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_profiling_zkey_matches_scale_zorder_key(spark):
    """The profiling query's shared-SQL Morton expression and the
    engine helper `scale.zorder_key` are independent implementations —
    they must agree wherever both are defined (in-domain values; the
    query uses modulo wraparound for SF-independence, the helper
    clamps, so probe only in-range points)."""
    import random

    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.profiling import _ZKEY_SQL
    from taipei_bi_etl_spark.scale import zorder_key

    rng = random.Random(7)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(300)]
    df = spark.createDataFrame(pts, "l_partkey long, l_suppkey long")
    rows = df.select(
        F.expr(_ZKEY_SQL).alias("a"),
        zorder_key(["l_partkey", "l_suppkey"]).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in rows)
