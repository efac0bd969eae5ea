#!/usr/bin/env python
"""Scale-up stress harness: replicate the sf0.1 events/documents tables
K× (default 10×) with NEW keys — user count and document count grow K×,
per-key density stays constant, duplicate-cluster structure is preserved
— then time the heavy queries at 1× and K× and print the scaling ratio
per query as ONE JSON line.

A query whose plan holds should scale ≤ linearly (ratio ≲ K, usually
well under because fixed JVM/codegen overhead amortizes).  A
superlinear ratio flags a plan that would not survive a real scale-up
(e.g. a quadratic bucket, a global sort, driver collection).

Usage: python stress.py [K]            (writes /tmp/spark_stress_<K>x)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from taipei_bi_etl_spark.io import read_table  # noqa: E402
from taipei_bi_etl_spark.queries import REGISTRY  # noqa: E402
from taipei_bi_etl_spark.session import get_spark  # noqa: E402

#: events-shaped and documents-shaped heavy queries.
STRESS_QUERIES = [
    # r07: incremental dedup forms (delta probe vs band/block index —
    # should scale with batch + bucket collisions like the full joins),
    # paragraph dedup (digest-keyed groupBys), retrieval eval +
    # journey analytics (bounded-key rollups over one user/query pass)
    "multimodal_phash_dedup_incremental",
    "dedup_simhash_incremental",
    # r08: seventh incremental form (scaffold-built) — probe volume
    # bounded by batch postings + collided shingle buckets
    "dedup_ngram_jaccard_incremental",
    # r08: eighth form (agg-merge path) — digest-keyed state merge
    "dedup_exact_incremental",
    # r08: ninth form — vocab df/tf state merge (token-keyed sums)
    "vocab_df_incremental",
    # r09: routed exact Jaccard (df probe + chosen arm) and the tenth
    # incremental form (MinHash on the scaffold — band-index probe)
    "dedup_jaccard_routed",
    "dedup_minhash_incremental",
    # r09: eleventh form — embedding LSH on the scaffold (ids-only
    # bucket index, corpus-side verify)
    "dedup_embedding_incremental",
    # r09: asymmetric prefix filter for containment (prefix probe vs
    # full index — candidate volume ~(1-t)·Σdf·df_pref)
    "dedup_containment_prefix",
    # r10: df-ascending containment variant + the routed production
    # entry (max-df probe + chosen arm — the route_jaccard pattern)
    "dedup_containment_prefix_df",
    "dedup_containment_routed",
    # r10: positional (PPJoin-flavor) containment — directed bound
    # prunes verify candidates; growth class must match the family
    "dedup_containment_ppjoin",
    # r10: SemDeDup — cell-bounded quadratic (deterministic integer
    # Lloyd cells; pair stage quadratic only within a cell)
    "dedup_semantic_centroid",
    "paragraph_dedup_report",
    "paragraph_dedup_incremental",
    "search_rank_eval",
    "event_transition_matrix",
    "funnel_conversion_fold",
    "session_path_topk",
    "multimodal_video_scene_cuts",
    "multimodal_audio_segments",
    # r10: ExactSubstr removal rewrite — one window-string shuffle +
    # map-side lambda rewrite; growth must stay window-count linear
    "dedup_substring_remove",
    # r07: prefix-filtered Jaccard join — candidate volume must stay
    # bounded by the prefix postings (Σp ≈ 0.4·Σn), not Σdf²
    "dedup_jaccard_prefix_filter",
    # r08: df-ascending canonical variant (the measured heavy-tail
    # routing — SCALE.md crossover table)
    "dedup_jaccard_prefix_df",
    # r10: PPJoin positional filter — same prefix-index family shape;
    # the positional prune must not change the growth class
    "dedup_jaccard_ppjoin",
    # r07: fuzzy linkage — customer is a DIMENSION (copied unchanged by
    # this harness), so the row pins fixed-cost behavior; posting
    # growth is (L+1)/record (linear) by construction
    "fuzzy_name_linkage",
    "fuzzy_linkage_clusters",
    "fuzzy_linkage_incremental",
    # r06 additions: perceptual fingerprints (documents-driven media
    # synthesis, band/landmark inverted-index joins), deterministic
    # trained-state ANN (embeddings K×), and the cascade over the
    # materialized pre-cascade surface (fixture rebuilt per K)
    "multimodal_phash_dedup",
    "multimodal_audio_fingerprint",
    "multimodal_video_phash_dedup",
    "ann_ivf_recall_report",
    "ann_ivf_deterministic_topk",
    "pq_adc_deterministic_topk",
    "mango_feature_surface_materialized",
    # r05 additions: VARIANT parse-once ingest consumers (events K×,
    # ingest rebuilt per K by the content-keyed fixture) and the
    # sparse tf-idf pair similarity (posting-list join)
    "variant_ingest_scd2",
    "variant_ingest_kv_rollup",
    "tfidf_doc_similarity_topk",
    # r04c additions: the new curation/eval families (bucket-LM DSIR,
    # tie-bucket AUC, count-of-counts spectrum — all bounded-key
    # aggregate shapes that should scale ~linearly on fixed cores)
    "dsir_importance_sample",
    "classifier_auc_eval",
    "corpus_frequency_spectrum",
    "text_dedup_tokens",
    # r03 additions: iterative graph + SA dedup + tf-idf (the new
    # shuffle-heavy shapes; the exact-kernel label/ANN ops scale as n²
    # by design and route to shortlist forms instead of stress here)
    "copurchase_label_propagation",
    "copurchase_k_shortest_paths",
    "dedup_exact_substring_sa",
    "tfidf_top_terms",
    "asof_join_attribution",
    "range_join_error_window",
    "scd2_dimension_build",
    "cohort_retention",
    "lead_sessionize",
    "vocab_top_terms",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "token_count_bpe",
    "text_bm25_search",
    "numeric_histogram_profile",
    "text_ngram_lm_score",
    "dedup_substring_profile",
    "anomaly_zscore_trailing",
    "time_weighted_avg",
    "ohlc_downsample",
    "max_concurrent_intervals",
    "heartbeat_gap_downtime",
    "array_day_overlap",
    # relational fact-growth family (facts K×, dims fixed)
    "pricing_summary",
    "market_share_by_year",
    "sole_late_supplier",
    "min_cost_supplier",
    "returned_revenue_topk",
    "part_copurchase_pagerank",
    # r02: budgeted graph family + new dedup/sampling entries
    "copurchase_triangle_count",
    "copurchase_kcore",
    "dedup_exact_substring_spans",
    "weighted_sample_aexpj",
    "cohort_retention_full",
    # r04 curation extensions (embeddings now replicate K× under
    # sign-flip decorrelation — see build_scaled): linear-path ops
    # only; dedup_embedding_lsh stays out because on the weakly
    # clustered synthetic corpus its candidate volume is inherently
    # ~quadratic in bucket occupancy (a data property, documented in
    # BACKLOG — stressing it here would flag the corpus, not the plan)
    "embedding_int8_quantize",
    "ann_hamming_topk",
    "pack_context_windows",
    "chunk_sliding_windows",
    "dedup_survivor_quality",
]


def build_scaled(spark, src_dir: str, out_dir: str, k: int) -> None:
    """Replicate events/documents K× under new keys (horizontal growth:
    K× users / K× docs at constant per-key density)."""
    rep = spark.range(k).withColumnRenamed("id", "replica")
    ev = read_table(spark, src_dir, "events").crossJoin(F.broadcast(rep))
    ev = ev.select(
        (F.col("event_id") + F.col("replica") * F.lit(10_000_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("replica") * F.lit(1_000_000)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    ev.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    docs = read_table(spark, src_dir, "documents").crossJoin(F.broadcast(rep))
    # Salt EVERY token with the replica id so shingle/term universes are
    # DISJOINT across replicas: each replica reproduces the original
    # duplicate-cluster structure under new content, instead of replicas
    # of one doc near-duplicating each other (which would grow cluster
    # sizes K× and candidate-pair work K² — a harness artifact, not a
    # property of the plans under test).
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(F.lit("r"), F.col("replica"), F.lit("_"), t),
        ),
        " ",
    )
    docs = docs.select(
        (F.col("doc_id") + F.col("replica") * F.lit(10_000_000)).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
        F.length(salted).alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    # Facts replicate K× under NEW orderkeys (horizontal growth of the
    # fact tables); dimensions are copied unchanged — the realistic
    # shape of a warehouse scale-up (facts grow, dims don't), which
    # means per-dim-key fact density grows K× and broadcast/AQE
    # decisions are tested at K× probe volume.
    okey_shift = F.col("replica") * F.lit(100_000_000_000)
    orders = read_table(spark, src_dir, "orders").crossJoin(F.broadcast(rep))
    orders.select(
        (F.col("o_orderkey") + okey_shift).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    li = read_table(spark, src_dir, "lineitem").crossJoin(F.broadcast(rep))
    li.select(
        (F.col("l_orderkey") + okey_shift).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    for dim in ("customer", "supplier", "part", "nation", "region"):
        read_table(spark, src_dir, dim).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{dim}.parquet")
        )

    # Embeddings replicate K× under NEW vec_ids with a per-(replica,dim)
    # deterministic Rademacher sign flip: s ∘ a preserves every norm and
    # every WITHIN-replica inner product exactly (s_i² = 1), so each
    # replica reproduces the original cluster/near-dup structure, while
    # CROSS-replica inner products become random-sign sums — replicas do
    # not near-duplicate each other (the embedding analogue of the token
    # salting above; unflipped copies would make every vector a 1.0-sim
    # duplicate of its K-1 clones and blow candidate work up K²).
    emb = read_table(spark, src_dir, "embeddings").crossJoin(F.broadcast(rep))
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: x
        * F.when(
            F.pmod(F.hash(F.col("replica"), i), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0)).cast("float"),
    )
    emb.select(
        (F.col("vec_id") + F.col("replica") * F.lit(10_000_000)).alias("vec_id"),
        flipped.alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def time_queries(
    spark, sf_dir: str, names: list[str] | None = None
) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in names if names is not None else STRESS_QUERIES:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        best = None
        for _ in range(2):
            # drop persisted frames between passes so a long stress
            # session doesn't accumulate caches (r03 ADVICE #3)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    """``python stress.py [K] [--only a,b,c] [--keep]`` — --only limits
    the sweep to named queries (outlier re-measurement), --keep leaves
    the scaled directory on disk for follow-up profiling."""
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    keep = "--keep" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = a.split("=", 1)[1] if "=" in a else None
    if only is None and "--only" in sys.argv:
        i = sys.argv.index("--only")
        if i + 1 >= len(sys.argv):
            sys.exit("usage: stress.py [K] [--only a,b,c] [--keep]")
        only = sys.argv[i + 1]
        args = [a for a in args if a != only]
    if only:
        names = only.split(",")
        unknown = [n for n in names if n not in STRESS_QUERIES]
        if unknown:
            sys.exit(f"--only: not in STRESS_QUERIES: {unknown}")
        STRESS_QUERIES[:] = [q for q in STRESS_QUERIES if q in names]
    k = int(args[0]) if args else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/spark_stress_{k}x"
    # local-mode all tasks share one JVM: size the heap for K× the data
    # (a cluster gives each executor its own heap; the default 1g driver
    # JVM is the only thing that doesn't survive the scale-up locally)
    spark = get_spark(
        app_name="stress", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.range(1).count()

    if not os.path.isdir(out_dir):
        build_scaled(spark, src, out_dir, k)

    # Interleave base/scaled PER QUERY (not two whole-registry passes):
    # a long session ages — JIT state, GC pressure, OS cache — and the
    # r04b full sweep showed end-of-session scaled passes inflated 5-20×
    # vs the same queries isolated (BM25 23.6× → 4.3×, LPA 5.1× → 1.4×
    # re-measured clean).  Adjacent timing keeps both sides of each
    # ratio in the same session regime.
    base: dict[str, float] = {}
    scaled: dict[str, float] = {}
    for name in STRESS_QUERIES:
        base.update(time_queries(spark, src, [name]))
        scaled.update(time_queries(spark, out_dir, [name]))
    ratios = {
        n: round(scaled[n] / base[n], 2) for n in scaled if base.get(n)
    }
    print(
        json.dumps(
            {
                "metric": "stress_scaling_ratio",
                "k": k,
                "base_sec": base,
                "scaled_sec": scaled,
                "ratio": ratios,
                "unit": "sec",
            }
        )
    )
    spark.stop()
    if not keep:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
