#!/usr/bin/env python
"""r11 A/B: the first-collision filter as a higher-order function
(exists/zip_with/slice — CodegenFallback, which pushes the candidate
BroadcastHashJoin out of whole-stage codegen and evaluates the filter
INTERPRETED over the quadratic candidate stream) vs an unrolled
15-term OR (pure codegen-able comparisons).

Semantics identical: hit iff ∃ j ∈ [1..table_id]: sa[j] == sb[j].

Usage: python tools/r11_fc_unroll_ab.py [--dir D] [--reps N]
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build(spark, sf_dir, fc_mode: str):
    from pyspark.sql import functions as F

    import taipei_bi_etl_spark.queries.similarity as sim

    corpus = sim._corpus_with_norm(spark, sf_dir).persist()
    sigs = corpus.select(
        "vec_id", sim.lsh_signature_battery("emb").alias("sigs")
    )
    bucketed = sigs.select(
        "vec_id", "sigs", F.posexplode("sigs").alias("table_id", "bucket")
    ).persist()
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("sigs").alias("sa"),
        "table_id", "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("sigs").alias("sb"),
        "table_id", "bucket",
    )
    if fc_mode == "hof":
        fc = ~F.exists(
            F.zip_with(
                F.slice(F.col("sa"), 1, F.col("table_id")),
                F.slice(F.col("sb"), 1, F.col("table_id")),
                lambda x, y: x == y,
            ),
            lambda hit: hit,
        )
    else:
        prior = F.lit(False)
        for j in range(1, sim.LSH_TABLES):
            prior = prior | (
                (F.col("table_id") >= F.lit(j))
                & (F.element_at("sa", j) == F.element_at("sb", j))
            )
        fc = ~prior
    splits = sim._bucket_splits(bucketed)
    sa, sb, keys = sim._salt_sides(a, b, splits, "vec_a", "vec_b")
    cand = (
        sa.join(sb, keys)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(fc)
        .select("vec_a", "vec_b")
    )
    ca = corpus.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"),
        F.col("norm").alias("na"),
    )
    cb = corpus.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"),
        F.col("norm").alias("nb"),
    )
    s = sim.cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    return (
        cand.join(ca, "vec_a")
        .join(cb, "vec_b")
        .withColumn("sim", s)
        .filter(F.col("sim") >= sim.NEARDUP_SIM)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("cosine_sim"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(app_name="r11_fc_unroll_ab")
    spark.range(1).count()

    pa = sorted(map(tuple, build(spark, args.dir, "hof").collect()))
    spark.catalog.clearCache()
    pb = sorted(map(tuple, build(spark, args.dir, "unrolled").collect()))
    spark.catalog.clearCache()
    assert pa == pb, f"arms differ: {len(pa)} vs {len(pb)}"
    print(f"identity OK: {len(pa)} pairs both arms")

    times = {"hof": [], "unrolled": []}
    for rep in range(args.reps):
        for mode in ("hof", "unrolled"):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"fc:{mode}:{rep}")
            t0 = time.perf_counter()
            build(spark, args.dir, mode).count()
            dt = time.perf_counter() - t0
            times[mode].append(dt)
            print(f"  rep{rep} {mode}: {dt:.3f}s", flush=True)
    for mode, ts in times.items():
        print(f"{mode}: median {statistics.median(ts):.3f}s  {sorted(ts)}")
    spark.stop()


if __name__ == "__main__":
    main()
