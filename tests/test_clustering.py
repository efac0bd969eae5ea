"""Clustering gates: component labels are valid CC labels, k-means
covers the corpus, IVF recall against the exact top-k."""

from __future__ import annotations

from taipei_bi_etl_spark.queries.clustering import (
    ann_ivf_topk,
    dedup_components,
    embedding_kmeans,
)
from taipei_bi_etl_spark.queries.dedup import dedup_minhash_lsh
from taipei_bi_etl_spark.queries.similarity import ann_cosine_topk
from tests.conftest import SF_DIR


def test_components_are_consistent_with_pairs(spark):
    comp = {
        r.doc_id: r.component_id
        for r in dedup_components(spark, SF_DIR).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    ]
    # every edge endpoint is labeled, edges join equal components,
    # and each component is labeled by its own minimum member
    assert all(a in comp and b in comp for a, b in pairs)
    assert all(comp[a] == comp[b] for a, b in pairs)
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    assert all(min(ms) == c for c, ms in members.items())


def test_kmeans_partitions_corpus(spark):
    rows = embedding_kmeans(spark, SF_DIR).collect()
    assert sum(r.n_vectors for r in rows) == 500
    assert len(rows) > 1  # corpus actually splits across cells


def test_ivf_recall_vs_exact(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, SF_DIR).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(spark, SF_DIR).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_semantic_dedup_within_cell_complete_and_keeps_canonical(spark):
    """semantic_dedup must find every exact cosine-0.99 pair that shares
    a k-means cell (within-cell search is exact), only ever miss
    cross-cell pairs, and keep exactly the min-id member per cluster."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.clustering import (
        _fit_centroids,
        _nearest_cells,
        semantic_dedup,
    )
    from taipei_bi_etl_spark.queries.similarity import (
        _corpus_with_norm,
        dedup_embedding_cosine,
    )

    out = {r.vec_id: r for r in semantic_dedup(spark, SF_DIR).collect()}
    exact = [
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine(spark, SF_DIR).collect()
    ]
    centroids = _fit_centroids(spark, SF_DIR)
    cells = {
        r.vec_id: r.cell
        for r in _corpus_with_norm(spark, SF_DIR)
        .withColumn("cell", _nearest_cells(F.col("emb"), centroids, 1)[0])
        .collect()
    }
    # every vector labeled exactly once
    assert set(out) == set(cells)
    missed_same_cell = [
        (a, b)
        for a, b in exact
        if cells[a] == cells[b]
        and out[a].component_id != out[b].component_id
    ]
    assert not missed_same_cell
    # on this corpus near-identical vectors co-locate: nothing missed
    cross_cell = [(a, b) for a, b in exact if cells[a] != cells[b]]
    assert not cross_cell, f"quantizer split near-dup pairs: {cross_cell}"
    # keep = min-id member of each component, exactly one per component
    members: dict[int, list[int]] = {}
    for v, r in out.items():
        members.setdefault(r.component_id, []).append(v)
    for c, ms in members.items():
        keeps = [v for v in ms if out[v].keep]
        assert keeps == [min(ms)] and c == min(ms)


def test_leakage_safe_split_never_separates_near_dups(spark):
    """The property the query exists for: every verified near-dup pair
    lands in the SAME split (and shares a representative)."""
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.queries.dedup import dedup_minhash_lsh

    splits = {
        r.doc_id: (r.rep_id, r.split)
        for r in REGISTRY["split_leakage_safe"].fn(spark, SF_DIR).collect()
    }
    pairs = dedup_minhash_lsh(spark, SF_DIR).select("doc_a", "doc_b").collect()
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert splits[p.doc_a][0] == splits[p.doc_b][0]
        assert splits[p.doc_a][1] == splits[p.doc_b][1]


def test_kcore_property_and_maximality(spark):
    """k-core invariants: every member keeps >= k neighbors inside the
    core (property), and no non-member could join it (maximality wrt
    one more peel round)."""
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.queries.graph import KCORE_K
    from tests.conftest import SF_DIR

    core = REGISTRY["copurchase_kcore"].fn(spark, SF_DIR)
    rows = core.collect()
    if not rows:  # tiny SF may peel everything — that's a valid core
        return
    assert all(r.core_degree >= KCORE_K for r in rows), sorted(
        r.core_degree for r in rows
    )[:5]
    # maximality: recompute degrees of peeled nodes against the core;
    # none may reach k
    from taipei_bi_etl_spark.io import read_table
    from pyspark.sql import functions as F

    li = read_table(spark, SF_DIR, "lineitem")
    parts = li.select("l_orderkey", "l_partkey").distinct()
    a, b = parts.alias("a"), parts.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    members = core.select(F.col("p_partkey").alias("v"))
    into_core = edges.join(members, "v", "left_semi")
    outside = into_core.join(
        core.select(F.col("p_partkey").alias("u")), "u", "left_anti"
    )
    worst = (
        outside.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("m"))
        .collect()[0]
        .m
    )
    assert worst is None or worst < KCORE_K, worst


def test_star_components_equal_min_label(spark):
    """large-star/small-star and min-label propagation are two layouts
    of one operator — identical components on a graph with a long
    chain (diameter stress), a 40-degree hub (skew stress), and an
    isolated pair."""
    from taipei_bi_etl_spark.queries.clustering import (
        min_label_components,
        star_components,
    )

    edges = (
        [(i, i + 1) for i in range(0, 30)]
        + [(100, j) for j in range(101, 140)]
        + [(200, 201)]
    )
    df = spark.createDataFrame(edges, "a long, b long")
    got_min = {
        (r.node, r.component_id)
        for r in min_label_components(df, "a", "b").collect()
    }
    got_star = {
        (r.node, r.component_id)
        for r in star_components(df, "a", "b").collect()
    }
    assert got_min == got_star
    # chain collapses to root 0, hub to 100, pair to 200
    roots = {c for _, c in got_star}
    assert roots == {0, 100, 200}


def test_knn_label_consistency_ivf_agrees_with_exact(spark):
    """VERDICT r03 #7 gate: the IVF-bucketed consistency screen must
    cover ≥99% of the vectors the exact kernel scores and agree on the
    `flagged` verdict for ≥90% of them."""
    from taipei_bi_etl_spark.queries.label_quality import (
        knn_label_consistency,
        knn_label_consistency_ivf,
    )
    from tests.conftest import SF_DIR

    exact = {
        r.vec_id: r.flagged
        for r in knn_label_consistency(spark, SF_DIR).collect()
    }
    ivf = {
        r.vec_id: r.flagged
        for r in knn_label_consistency_ivf(spark, SF_DIR).collect()
    }
    common = set(exact) & set(ivf)
    assert len(common) >= 0.99 * len(exact)
    agree = sum(1 for v in common if exact[v] == ivf[v])
    assert agree >= 0.9 * len(common)


def test_min_label_long_loop_sever_path(spark):
    """r08 long-loop guard regression: a ~16-round chain loop crosses
    _SEVER_ROUND, so rounds past 10 cut lineage through the temp
    parquet table (the measured-flat path — SCALE.md "min-label
    doubling: mechanism localized").  Pins (a) correctness through the
    sever transition, (b) temp-table cleanup, (c) the returned frame
    surviving cleanup."""
    import glob

    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.clustering import min_label_components

    n = 60_000
    e = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    labels = min_label_components(e, "a", "b")
    # correctness: one chain component labeled by its minimum
    assert labels.count() == n
    assert labels.filter(F.col("component_id") != 0).count() == 0
    # the temp sever tables are gone, and the frame still answers
    # (tempfile.mkdtemp honors TMPDIR — glob the real tempdir, not a
    # hard-coded /tmp, or the assertion is vacuous under custom TMPDIR)
    import os
    import tempfile

    assert (
        glob.glob(os.path.join(tempfile.gettempdir(), "minlabel_sever_*"))
        == []
    )
    assert labels.filter(F.col("node") == n - 1).count() == 1


def test_nearest_cells_python_norm_bit_identical_and_memoized(spark):
    """r11 (VERDICT r10 #6): _nearest_cells moved the CONSTANT centroid
    norms out of the per-row plan into the driver.  The replacement
    must be bit-identical to the in-plan l2_norm it replaced
    (left-to-right double fold + IEEE sqrt), and the battery must be
    memoized per (emb expression, n, centroid values)."""
    import math

    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries import clustering as cl
    from taipei_bi_etl_spark.queries.similarity import l2_norm

    centroids = cl._fit_centroids(spark, SF_DIR)
    # bit-equality of the python fold vs the in-plan fold, per centroid
    in_plan = spark.range(1).select(
        *[
            l2_norm(F.lit([float(v) for v in c])).alias(f"n{i}")
            for i, c in enumerate(centroids)
        ]
    ).collect()[0]
    for i, c in enumerate(centroids):
        acc = 0.0
        for v in c:
            acc += v * v
        assert math.sqrt(acc).hex() == in_plan[f"n{i}"].hex()
    # memo: same binding returns the identical compiled tree
    a = cl._nearest_cells(F.col("emb"), centroids, 1)
    b = cl._nearest_cells(F.col("emb"), centroids, 1)
    assert a is b
    # different n or different centroid values get their own entries
    c2 = cl._nearest_cells(F.col("emb"), centroids, 2)
    assert c2 is not a
    perturbed = [list(c) for c in centroids]
    perturbed[0][0] += 1.0
    assert cl._nearest_cells(F.col("emb"), perturbed, 1) is not a
