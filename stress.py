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
    for dim in ("customer", "supplier", "part", "nation", "region", "embeddings"):
        read_table(spark, src_dir, dim).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{dim}.parquet")
        )


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in STRESS_QUERIES:
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
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
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

    base = time_queries(spark, src)
    scaled = time_queries(spark, out_dir)
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
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
