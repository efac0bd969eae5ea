"""Physical-plan audits of the headline queries (SURVEY §4): the scale
claims in SCALE.md as assertions — broadcasts chosen for small dims,
filters and column projection reaching the parquet scan, partial (map-
side) aggregation, whole-stage codegen on the hot paths.  These pin the
PLAN, not just the answer: a regression that keeps results correct but
turns a broadcast join into a 100 TB shuffle fails here."""

from __future__ import annotations

import re

from taipei_bi_etl_spark.queries import REGISTRY
from taipei_bi_etl_spark.scale import explain_has
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_dim_join_chain_broadcasts_small_dims(spark):
    """J4/J5/J9: the dim tables (nation/region/...) must broadcast — a
    sort-merge shuffle of a 25-row dim against a 100 TB fact is the
    canonical scale bug."""
    df = REGISTRY["dim_join_chain"].fn(spark, SF_DIR)
    marks = explain_has(df, "BroadcastHashJoin")
    assert marks["BroadcastHashJoin"], _plan(df)[:2000]


def test_case_projection_pushes_filters_to_scan(spark):
    """P3/P4/P6: the date-window and NOT IN predicates must reach the
    parquet reader as PushedFilters, not run post-scan only."""
    df = REGISTRY["case_projection_filter"].fn(spark, SF_DIR)
    plan = _plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderdate" in m.group(1), plan[:2000]


def test_narrow_projection_prunes_scan_columns(spark):
    """P1/P2: a narrow projection must prune the parquet ReadSchema to
    the selected columns — reading 16 lineitem columns for a 4-column
    query is wrong at any scale."""
    df = REGISTRY["narrow_projection"].fn(spark, SF_DIR)
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:2000]
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert len(read_cols) <= 6, f"scan reads too many columns: {read_cols}"


def test_pricing_summary_has_partial_aggregation(spark):
    """A1/A9: group-by must run as partial (map-side) + final
    HashAggregate — the map-side combine is what keeps the shuffle
    proportional to groups, not rows."""
    df = REGISTRY["pricing_summary"].fn(spark, SF_DIR)
    plan = _plan(df)
    # formatted mode prints one "(N) HashAggregate" detail block per node
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 2, (
        plan[:2000]
    )
    assert re.search(r"partial_(sum|count|avg)", plan), plan[:2000]
    # codegen spans show as "*(N)" stage markers only on the executed
    # (AQE-final) plan
    df.collect()  # count() would execute a different (wrapped) plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final, final[:2000]


def test_corpus_hash_split_is_map_side_until_rollup(spark):
    """The split assignment must not shuffle document content: exactly
    one exchange (the tiny per-(source,split) rollup), no join."""
    plan = _plan(REGISTRY["corpus_hash_split"].fn(spark, SF_DIR))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 1, plan[:2000]
    assert "Join" not in plan


def test_rank_dedup_partitions_window(spark):
    """W1: the dedup window must be partitioned (no 'move all data to a
    single partition' global window)."""
    plan = _plan(REGISTRY["rank_dedup_first_touch"].fn(spark, SF_DIR))
    assert "Window" in plan
    m = re.search(r"partitionBy=\[\]", plan)
    assert m is None, "window has empty partitionBy (global window)"


def test_decontaminate_broadcasts_probe_set(spark):
    """text_decontaminate: the probe-gram side must broadcast — the
    corpus side is the 100 TB scan and may only shuffle for its own
    per-doc re-aggregation, never for the membership join."""
    df = REGISTRY["text_decontaminate"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_repetition_dup3_is_map_side(spark):
    """text_repetition_gopher: dup3_frac must come from array
    expressions on the scan side — the only exchanges are the 2-gram
    count (doc_id, g), its doc_id rollup, and the final join alignment;
    no exchange may carry the raw gram explosion of the dup3 branch."""
    df = REGISTRY["text_repetition_gopher"].fn(spark, SF_DIR)
    plan = _plan(df)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 3, plan[:3000]


def test_asof_join_is_single_exchange(spark):
    """The as-of join must be the one-shuffle union+window form: exactly
    one Exchange (hashpartitioning on user_id), no join operator at all
    — a BroadcastNestedLoopJoin or per-key cartesian here is the 100 TB
    failure mode this formulation exists to avoid."""
    df = REGISTRY["asof_join_attribution"].fn(spark, SF_DIR)
    plan = _plan(df)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan[:3000]
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert re.search(r"hashpartitioning\(user_id", plan), plan[:3000]


def test_range_join_is_equi_hash_join(spark):
    """The bucketed range join must plan as an equi join on
    (user, bucket) — SortMergeJoin or ShuffledHashJoin with the range
    predicate demoted to a post-join condition — never a
    BroadcastNestedLoopJoin over the raw inequality."""
    df = REGISTRY["range_join_error_window"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan[:3000]
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), (
        plan[:3000]
    )


def test_gapfill_axis_broadcasts(spark):
    """The dense-axis joins (hours × types, then back onto the rollup)
    must broadcast the tiny axis sides; the rollup itself keeps map-side
    partial aggregation."""
    df = REGISTRY["time_bucket_gapfill"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        plan[:3000]
    )
    assert re.search(r"partial_(count|sum)", plan), plan[:2000]


def test_scd2_is_single_exchange(spark):
    """SCD2 build: both window passes (lag change-detect, lead upper
    bound) must share ONE hashpartitioning(user_id) exchange and plan
    no join at all — the self-join/MERGE formulations this replaces
    re-shuffle the dimension per pass.

    r10: the scan-widen (scale.widen_scan, a no-op on splittable
    inputs) may add ONE RoundRobin exchange below the parse — the
    guarded property is unchanged: exactly one user_id shuffle, and no
    other hash exchange of the dimension."""
    df = REGISTRY["scd2_dimension_build"].fn(spark, SF_DIR)
    plan = _plan(df)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    n_user = len(re.findall(r"hashpartitioning\(user_id", plan))
    n_rr = len(re.findall(r"RoundRobinPartitioning", plan))
    assert n_user == 1, plan[:3000]
    assert n_rr <= 1 and n_exchanges == n_user + n_rr, plan[:3000]
    assert "Join" not in plan, plan[:3000]
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2, plan[:3000]


def test_funnel_stage_joins_are_hash_joins(spark):
    """Funnel: stage joins must be hash joins on user_id (broadcast at
    this scale) with map-side partial min; nested-loop is tolerable
    only for the 1-row count cross joins."""
    df = REGISTRY["funnel_conversion"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan[:3000]
    assert re.search(r"partial_min", plan), plan[:2000]


def test_salted_join_salts_and_replicates(spark):
    """The salted rollup must show the salt machinery: a Generate
    (explode of the salt array) on the replicated dim side, and the
    final rollup as partial+final HashAggregate.  Results are pinned by
    the oracle; this pins that the salt path is actually exercised."""
    df = REGISTRY["salted_skew_join_rollup"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert re.search(r"^\(\d+\) Generate", plan, re.M), plan[:2000]
    assert "xxhash64" in plan, plan[:2000]
    assert re.search(r"partial_(sum|count)", plan), plan[:2000]


def test_line_dedup_frequency_shuffles_hashes_not_text(spark):
    """The line-frequency aggregation must key its exchange on the
    64-bit chunk hash with map-side partial counts — shuffling raw line
    text into the frequency agg is the 100 TB regression."""
    df = REGISTRY["line_dedup_corpus"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert re.search(r"hashpartitioning\(chunk_h", plan), plan[:3000]
    assert re.search(r"partial_count", plan), plan[:2000]


def test_bm25_search_is_shuffle_free_scoring(spark):
    """BM25: scoring must stay map-side — no Generate (explode) of the
    token array into a (doc, term) shuffle; corpus stats come back as a
    broadcast; top-k runs as TakeOrderedAndProject (local heaps), never
    a global Sort+Exchange of the scored corpus."""
    df = REGISTRY["text_bm25_search"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert not re.search(r"^\(\d+\) Generate", plan, re.M), plan[:3000]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        plan[:3000]
    )
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_histogram_broadcasts_bounds_and_partial_aggregates(spark):
    """Histogram: the 1-row min/max frame must broadcast back onto the
    scan, and the bucket rollup must partial-aggregate map-side — the
    exchange carries ≤ N_BUCKETS rows per task."""
    df = REGISTRY["numeric_histogram_profile"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        plan[:3000]
    )
    assert re.search(r"partial_count", plan), plan[:2000]


def test_region_nation_revenue_broadcasts_dims_and_pushes_date(spark):
    """Q5 shape: supplier/nation/region must broadcast (no dim shuffle
    against the lineitem leg) and the 1996 date window must reach the
    orders scan as PushedFilters."""
    df = REGISTRY["region_nation_revenue"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("o_orderdate" in g for g in m), plan[:2000]


def test_quality_classifier_is_shuffle_free(spark):
    """The hashed-feature scorer is a pure per-document map — any
    Exchange in its plan is a regression."""
    plan = _plan(REGISTRY["quality_classifier_linear"].fn(spark, SF_DIR))
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan[:2000]
    assert "Join" not in plan


def test_token_budget_sample_single_window_exchange(spark):
    """Budget sampling = one hash-partitioned window on source; no
    joins, no extra shuffles."""
    plan = _plan(REGISTRY["token_budget_sample"].fn(spark, SF_DIR))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan[:2000]
    assert "Join" not in plan


def test_avg_quantity_subquery_reuses_partitioning(spark):
    """Q17 decorrelation: the per-part aggregate and the join probe
    share the l_partkey hash partitioning — at most two exchanges
    total (fact + agg leg), never a third for re-partitioning."""
    plan = _plan(REGISTRY["avg_quantity_subquery_filter"].fn(spark, SF_DIR))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 3, plan[:2000]


def test_anomaly_zscore_two_exchanges(spark):
    """Hourly rollup + series window: exactly the two keyed shuffles,
    O(1) running-sum state per row (ROWS frame, no self-join)."""
    plan = _plan(REGISTRY["anomaly_zscore_trailing"].fn(spark, SF_DIR))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 2, plan[:2000]
    assert "Join" not in plan


def test_pit_lookup_is_single_window_no_join(spark):
    """PIT lookup must stay the union+window form: two user_id-keyed
    exchanges (change-detection window, then the union window), no
    Join node — an interval-join plan here would fan long-lived
    dimension versions across their whole validity span."""
    plan = _plan(REGISTRY["pit_dimension_lookup"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan[:2000]
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 2, plan[:2000]


def test_ewma_state_is_series_bounded(spark):
    """EWMA folds one array per series built from the ROLLUP, not raw
    rows: the plan must aggregate before collecting (two HashAggregate
    levels, no window over raw events)."""
    plan = _plan(REGISTRY["ewma_smoothing"].fn(spark, SF_DIR))
    assert "Window" not in plan, plan[:2000]


def test_ohlc_is_single_aggregation_no_window(spark):
    """OHLC folds open/close into the same aggregation pass as
    high/low via min_by/max_by on the (ts,event_id) struct — the plan
    must show ONE keyed exchange and NO Window node (the oracle's
    two-ROW_NUMBER form would sort the bucket twice)."""
    plan = _plan(REGISTRY["ohlc_downsample"].fn(spark, SF_DIR))
    assert "Window" not in plan, plan[:2000]
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan[:2000]


def test_heartbeat_gap_single_user_shuffle(spark):
    """The LEAD window and the per-user aggregation must share the ONE
    user_id hash partitioning — a second exchange here would double-
    shuffle every event at 100 TB."""
    plan = _plan(REGISTRY["heartbeat_gap_downtime"].fn(spark, SF_DIR))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan[:2000]
    assert "Join" not in plan


def test_max_revenue_supplier_scans_fact_once(spark):
    """Q15's max-of-aggregate must NOT re-derive the revenue subplan
    for the scalar max: one lineitem scan, with the max taken as a
    window over the |suppliers|-row aggregate."""
    df = REGISTRY["max_revenue_supplier"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1, plan[:3000]


def test_order_count_distribution_keeps_outer_join(spark):
    """Q13's ON-clause filter must not collapse the LEFT join to inner
    (zero-order customers carry count 0); the priority predicate stays
    in the join, not a pre-filter that would drop null rows."""
    plan = _plan(REGISTRY["order_count_distribution"].fn(spark, SF_DIR))
    assert re.search(r"LeftOuter|BuildRight.*LeftOuter|LeftOuter.*Build", plan), plan[:3000]


def test_value_share_threshold_broadcasts_scalar(spark):
    """Q11's grand total must ride a broadcast (1-row nested-loop or
    exchange), never a shuffled join of the scalar against every
    partition."""
    plan = _plan(REGISTRY["value_share_threshold"].fn(spark, SF_DIR))
    assert "Broadcast" in plan, plan[:2000]


def test_disjunctive_bracket_join_derives_pushable_predicates(spark):
    """Q19's OR-of-ANDs spans both join sides; the hand-derived implied
    predicates (brand IN, quantity range) must reach BOTH parquet scans
    as PushedFilters, and the join must stay an equi hash join."""
    plan = _plan(REGISTRY["disjunctive_bracket_join"].fn(spark, SF_DIR))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("l_quantity" in s for s in pushed), plan[:3000]
    assert any("p_brand" in s for s in pushed), plan[:3000]
    assert "NestedLoop" not in plan, plan[:3000]


def test_sole_late_supplier_scans_fact_once(spark):
    """Q21's EXISTS pair must not duplicate the fact subtree: one
    lineitem scan, per-order counts via window over the aggregated
    flags, at most 3 exchanges (fact repartition, orders leg, final
    rollup)."""
    df = REGISTRY["sole_late_supplier"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1, plan[:3000]
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 3, plan[:3000]


def test_forecast_revenue_delta_zero_shuffle_pushed_scan(spark):
    """Q6 shape: a scan-only aggregate — no Exchange other than the
    1-row final gather, no join, and all three predicates pushed to
    the parquet reader."""
    df = REGISTRY["forecast_revenue_delta"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan, plan[:2000]
    # only the SinglePartition gather for the global aggregate
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 1, plan[:2000]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("l_shipdate" in s and "l_quantity" in s for s in pushed), (
        plan[:2000]
    )


def test_market_share_star_is_single_wide_shuffle(spark):
    """Q8 shape: an 8-table star must broadcast every dimension leg —
    the only sort-merge-eligible exchange pair is the fact⋈orders
    orderkey join."""
    df = REGISTRY["market_share_by_year"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 3, plan[:3000]
    # hashpartitioning exchanges: the orderkey join pair + the tiny
    # ≤7-row year rollup
    wide = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    fact_keys = {k.strip() for k in wide if "year" not in k.lower()}
    assert all("orderkey" in k for k in fact_keys), (fact_keys, plan[:3000])


def test_topk_queries_use_heap_not_global_sort(spark):
    """Q3/Q10 shapes: orderBy(...).limit(k) must plan as
    TakeOrderedAndProject (per-partition heaps), never a global Sort."""
    for name in ("unshipped_order_priority", "returned_revenue_topk"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan, (name, plan[:2000])
        assert not re.search(r"^\(\d+\) Sort\b", plan, re.M), (
            name,
            plan[:2000],
        )


def test_supplier_census_anti_join_broadcasts_blacklist(spark):
    """Q16 shape: the NOT-IN blacklist (6 rows) must run as a
    BroadcastHashJoin LeftAnti, not a shuffled anti join."""
    plan = _plan(REGISTRY["supplier_census_notin"].fn(spark, SF_DIR))
    assert re.search(r"BroadcastHashJoin.*LeftAnti", plan) or (
        "LeftAnti, BuildRight" in plan and "Broadcast" in plan
    ), plan[:3000]


def test_lateral_topk_decorrelates_to_window(spark):
    """The correlated LATERAL LIMIT subquery must decorrelate — the
    physical plan has a window/rank or join, never a per-outer-row
    re-execution (which would show as a nested-loop over a subquery)."""
    plan = _plan(REGISTRY["lateral_topk_per_order"].fn(spark, SF_DIR))
    assert "Window" in plan, plan[:3000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_min_cost_supplier_scans_lineitem_once(spark):
    """Q2 shape: the supply catalog is built ONCE and the correlated
    MIN is a window over it — the aggregate-self-join form would scan
    lineitem twice."""
    plan = _plan(REGISTRY["min_cost_supplier"].fn(spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, plan[:3000]
    assert "Window" in plan, plan[:2000]


def test_nation_pair_volume_broadcasts_both_legs(spark):
    """Q7 shape: supplier and customer legs (pre-filtered to the two
    nations) must broadcast; the only sort-merge-eligible join is the
    orderkey fact join."""
    plan = _plan(REGISTRY["nation_pair_volume"].fn(spark, SF_DIR))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2, plan[:3000]


def test_arrow_batch_norms_is_scan_plus_arrow_eval(spark):
    """The mapInArrow kernel must sit directly on the pruned scan — no
    shuffle, and ReadSchema limited to (vec_id, embedding)."""
    plan = _plan(REGISTRY["arrow_batch_norms"].fn(spark, SF_DIR))
    assert "Exchange" not in plan, plan[:2000]
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "label" not in m.group(1), plan[:2000]


def test_pagerank_iteration_count_bounds_plan(spark):
    """The unrolled PageRank plan must contain exactly N_ITER
    aggregation rounds over the persisted edge frame — runaway lazy
    unrolling (re-deriving edges per iteration) would show as repeated
    lineitem scans."""
    from taipei_bi_etl_spark.queries.graph import N_ITER  # noqa: F401

    df = REGISTRY["part_copurchase_pagerank"].fn(spark, SF_DIR)
    plan = _plan(df)
    # every iteration must read the persisted edge frame (InMemoryTable-
    # Scan), not re-derive it; the cached relation prints its ORIGINAL
    # build plan once, so lineitem appears in the cache definition but
    # each iteration node is a cache scan
    assert plan.count("InMemoryTableScan") >= N_ITER, plan[:3000]


def test_no_row_python_udf_in_headline_plans(spark):
    """Policy gate: no BatchEvalPython (row-at-a-time Python UDF) in
    any headline query plan — Python may appear only as Arrow-batched
    evaluation (ArrowEvalPython / MapInPandas / MapInArrow), which is
    10-100x faster and the repo-wide rule (SURVEY §4 vectorization)."""
    import bench

    for name in bench.HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        plan = _plan(spec.fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, (name, plan[:1500])


def test_chunk_sliding_windows_is_shuffle_free(spark):
    """The RAG chunker is scan -> project -> generate: per-doc fan-out
    with zero Exchange; any shuffle appearing here is a regression."""
    plan = _plan(REGISTRY["chunk_sliding_windows"].fn(spark, SF_DIR))
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan[:2000]


def test_hamming_topk_broadcasts_queries_not_corpus(spark):
    """Binary-quantization ANN must broadcast ONLY the bounded query
    side: exactly one BroadcastExchange, and the query filter
    (vec_id < NQ_HAM) must be pushed into its parquet scan — a second
    broadcast (or none) means the corpus is on the wrong side."""
    plan = _plan(REGISTRY["ann_hamming_topk"].fn(spark, SF_DIR))
    # formatted explain may repeat the tree in an AQE "Initial Plan"
    # section — audit the final tree only (everything before node (1))
    tree = plan.split("(1) Scan", 1)[0]
    assert tree.count("BroadcastExchange") == 1, plan[:3000]
    assert re.search(r"PushedFilters:.*LessThan\(vec_id,8\)", plan), plan[:3000]


def test_int8_quantize_broadcasts_dim_stats(spark):
    """Scalar quantization joins the per-dimension (min,max) stats
    frame back to the exploded corpus: the stats side is bounded by
    dimensionality (64 rows), so it must be the broadcast build side,
    and the final per-vector rollup must have a partial (map-side)
    aggregate before its Exchange."""
    plan = _plan(REGISTRY["embedding_int8_quantize"].fn(spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan[:3000]
    assert re.search(r"partial_(sum|count|min|max)", plan) or (
        "Partial" in plan
    ), plan[:3000]


def test_pack_context_windows_has_no_global_window(spark):
    """The two-pass bucketed prefix sum must never fall back to a
    single-partition global window: no `Exchange SinglePartition`
    (the 100 TB collapse) anywhere in the plan."""
    plan = _plan(REGISTRY["pack_context_windows"].fn(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan[:3000]


def test_text_dedup_tokens_is_shuffle_free(spark):
    """The order-preserving first-occurrence rewrite is ONE array
    expression in the scan projection — any Exchange or Generate
    (explode) in its plan is a regression to the shuffle form only
    genuinely long documents need."""
    plan = _plan(REGISTRY["text_dedup_tokens"].fn(spark, SF_DIR))
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan[:2000]
    assert "Generate" not in plan, plan[:2000]


def test_vocab_coverage_broadcasts_vocab_and_heaps_topk(spark):
    """The top-K vocabulary is K rows by construction: the cut must be
    a TakeOrderedAndProject (never a global sort) and the probe join
    must broadcast the vocab side (a 100 TB corpus never shuffles
    against a 16-row vocabulary)."""
    plan = _plan(REGISTRY["vocab_coverage_report"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_embedding_oracle_validity_predicates_match_emb_common():
    """Drift guard: every embeddings oracle that filters on vector
    validity must carry the EXACT emb_common predicate text — a change
    to read_embeddings that doesn't land in the oracles (or vice
    versa) recreates the asymmetric-divergence class the gate fixed."""
    from taipei_bi_etl_spark.queries.emb_common import VALID_SQL

    checked = 0
    for name, spec in REGISTRY.items():
        sql = spec.oracle or ""
        if "FROM embeddings" in sql and "len(embedding)" in sql:
            assert VALID_SQL in sql, name
            checked += 1
    assert checked >= 10, checked  # the gated family, not an empty pass


def test_every_forced_broadcast_is_guarded_or_tagged_bounded():
    """House broadcast policy (VERDICT r04 #3): a forced ``F.broadcast``
    hint overrides the planner's size check, so every site in the
    package must either route through ``scale.bcast_dim`` (planning-time
    size guard) or carry a ``# bounded:`` tag naming why its payload
    cannot scale with the data (nation/region, 1-row aggregate, top-K
    vocab, codebook, LIMIT'd query set, ...).  Source lint: the tag must
    sit on the hint's line or within the two lines above it."""
    import pathlib

    import taipei_bi_etl_spark

    pkg = pathlib.Path(taipei_bi_etl_spark.__file__).parent
    offenders = []
    for p in sorted(pkg.rglob("*.py")):
        if p.name == "scale.py":  # the guard itself + its docstring
            continue
        lines = p.read_text().splitlines()
        for i, ln in enumerate(lines):
            if "F.broadcast(" not in ln:
                continue
            window = lines[max(0, i - 2) : i + 1]
            if not any("# bounded:" in w for w in window):
                offenders.append(f"{p}:{i + 1}: {ln.strip()}")
    assert not offenders, "untagged forced broadcasts:\n" + "\n".join(offenders)


def test_bcast_dim_refuses_oversized_frames(spark):
    """bcast_dim is the wired form of assert_broadcastable: same hint as
    F.broadcast at bench scale, hard planning-time error once Catalyst's
    estimate crosses the limit."""
    import pytest

    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.scale import bcast_dim

    li = read_table(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError, match="refusing to broadcast"):
        bcast_dim(li, limit_mb=0)
    # under the limit it is exactly a broadcast hint
    small = read_table(spark, SF_DIR, "nation")
    fact = read_table(spark, SF_DIR, "customer")
    plan = _plan(
        fact.join(bcast_dim(small), fact.c_nationkey == small.n_nationkey)
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_ngram_size_frame_joins_carry_no_hint(spark):
    """VERDICT r04 #1 regression pin: the per-document size frames in
    the n-gram dedup family (ngram_pair_overlap and the inline
    curation_end_to_end form) are corpus-cardinality — they must reach
    the planner UNHINTED so AQE decides (broadcast when genuinely
    small, shuffle join at 10^9+ docs instead of an executor-wide OOM)."""
    for name in (
        "dedup_ngram_jaccard",
        "dedup_ngram_containment",
        "dedup_drop_contained",
        "curation_end_to_end",
    ):
        df = REGISTRY[name].fn(spark, SF_DIR)
        # r05 ADVICE #2: ResolvedHint is ELIMINATED before the
        # optimized plan (the check was vacuous) — a surviving forced
        # broadcast shows up as `strategy=broadcast` in the Join node's
        # hint field of the optimized plan, and as a ResolvedHint node
        # in the ANALYZED plan.  Assert on both representations.
        qe = df._jdf.queryExecution()
        assert "ResolvedHint" not in qe.analyzed().toString(), name
        assert "strategy=broadcast" not in qe.optimizedPlan().toString(), name


def test_hint_detectors_are_not_vacuous(spark):
    """Positive control for the assertions above: a deliberately hinted
    join MUST trip both detectors (r05 ADVICE #2 found the previous
    optimized-plan ResolvedHint check passed even with F.broadcast
    re-added, because ResolvedHint is eliminated before optimization)."""
    from pyspark.sql import functions as F

    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(10).withColumnRenamed("id", "k")
    qe = a.join(F.broadcast(b), "k")._jdf.queryExecution()
    assert "ResolvedHint" in qe.analyzed().toString()
    assert "strategy=broadcast" in qe.optimizedPlan().toString()
