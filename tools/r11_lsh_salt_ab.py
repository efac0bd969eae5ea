#!/usr/bin/env python
"""r11 interleaved A/B for the LSH hot-bucket salt (VERDICT r10 #4).

Arms, timed interleaved in ONE session (SCALE.md methodology):
  A = the r10 candidate join (unsalted (table_id, bucket) self-join)
  B = the r11 salted join (bucket counts -> nsplit -> (ga, gb) keys)

Both arms run the FULL dedup_embedding_lsh pipeline (signatures,
first-collision emit, exact verify) and assert identical pair sets
before timing.

Usage:
    python tools/r11_lsh_salt_ab.py                # sf0.1, bench scale
    python tools/r11_lsh_salt_ab.py --skew         # synthetic hot-bucket corpus
    [--reps N] [--hot 2000] [--cold 1000] [--cap 500]
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

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_query(spark, sf_dir, salted: bool):
    """dedup_embedding_lsh with the candidate join in either form."""
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
    first_collision = ~F.exists(
        F.zip_with(
            F.slice(F.col("sa"), 1, F.col("table_id")),
            F.slice(F.col("sb"), 1, F.col("table_id")),
            lambda x, y: x == y,
        ),
        lambda hit: hit,
    )
    if salted:
        splits = sim._bucket_splits(bucketed)
        sa, sb, keys = sim._salt_sides(a, b, splits, "vec_a", "vec_b")
        j = sa.join(sb, keys)
    else:
        j = a.join(b, ["table_id", "bucket"])
    cand = (
        j.filter(F.col("vec_a") < F.col("vec_b"))
        .filter(first_collision)
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
    sim_col = sim.cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    return (
        cand.join(ca, "vec_a")
        .join(cb, "vec_b")
        .withColumn("sim", sim_col)
        .filter(F.col("sim") >= sim.NEARDUP_SIM)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("cosine_sim"))
    )


def make_skew_corpus(spark, n_hot: int, n_cold: int) -> str:
    """Synthetic hot-bucket corpus: n_hot near-identical vectors (one
    direction => one bucket in EVERY table) + n_cold random ones."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal(64)
    base /= np.linalg.norm(base)
    hot = base[None, :] + 0.001 * rng.standard_normal((n_hot, 64))
    cold = rng.standard_normal((n_cold, 64))
    vecs = np.vstack([hot, cold]).astype("float32")
    rows = [
        (i, [float(x) for x in vecs[i]], int(i % 3))
        for i in range(len(vecs))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = "/tmp/r11_skew_sf"
    df.coalesce(8).write.mode("overwrite").parquet(
        out + "/embeddings.parquet"
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--hot", type=int, default=2000)
    ap.add_argument("--cold", type=int, default=1000)
    ap.add_argument("--cap", type=int, default=500)
    ap.add_argument(
        "--force-shuffle-join",
        action="store_true",
        help="disable broadcast joins to simulate the at-scale plan "
        "(the LSH index outgrows the broadcast threshold at real corpus "
        "sizes, so the candidate join is a SHUFFLE join there — one hot "
        "bucket = one unsplittable reduce task; at bench scale AQE "
        "broadcast-converts the join and the stream side's round-robin "
        "partitioning already spreads the hot bucket, hiding the skew)",
    )
    args = ap.parse_args()

    import taipei_bi_etl_spark.queries.similarity as sim
    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(app_name="r11_lsh_salt_ab")
    spark.range(1).count()
    if args.force_shuffle_join:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        print("broadcast joins disabled (at-scale shuffle-join simulation)")

    sf_dir = SF
    if args.skew:
        sim.LSH_BUCKET_CAP = args.cap
        sf_dir = make_skew_corpus(spark, args.hot, args.cold)
        print(f"skew corpus: {args.hot} hot + {args.cold} cold, cap={args.cap}")

    # identity gate before timing
    pa = sorted(
        map(tuple, build_query(spark, sf_dir, salted=False).collect())
    )
    spark.catalog.clearCache()
    pb = sorted(
        map(tuple, build_query(spark, sf_dir, salted=True).collect())
    )
    spark.catalog.clearCache()
    assert pa == pb, f"arms differ: {len(pa)} vs {len(pb)} rows"
    print(f"identity OK: {len(pa)} pairs both arms")

    times: dict[str, list[float]] = {"unsalted": [], "salted": []}
    for rep in range(args.reps):
        for name, salted in (("unsalted", False), ("salted", True)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{name}:{rep}")
            t0 = time.perf_counter()
            build_query(spark, sf_dir, salted=salted).count()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"  rep{rep} {name}: {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s  {sorted(ts)}")
    spark.stop()


if __name__ == "__main__":
    main()
