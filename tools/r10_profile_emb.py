#!/usr/bin/env python
"""r10 optimization probe: stage-isolated timing of dedup_embedding_lsh.

Times each subtree of the LSH dedup pipeline to a noop write (guide
§1.4) so the 9 s bench number decomposes into: corpus+sigs / bucketed
index / candidate self-join / dropDuplicates / verify joins / dot+filter.
Run on a quiet machine; prints one line per stage.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from taipei_bi_etl_spark.session import get_spark
from taipei_bi_etl_spark.queries.similarity import (
    LSH_TABLES,
    NEARDUP_SIM,
    _corpus_with_norm,
    _hyperplanes,
    cosine,
    signature,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=3):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    med = sorted(runs)[reps // 2]
    print(f"{label:42s} {med:7.3f} s   (runs: {['%.2f' % r for r in runs]})")
    return med


def main():
    spark = get_spark(app_name="r10_profile_emb")
    spark.range(1).count()
    planes = _hyperplanes()

    def build(upto):
        corpus = _corpus_with_norm(spark, SF).persist()
        sigs = corpus.select(
            "vec_id",
            F.array(
                *[signature(F.col("emb"), planes[t]) for t in range(LSH_TABLES)]
            ).alias("sigs"),
        )
        bucketed = sigs.select(
            "vec_id", F.posexplode("sigs").alias("table_id", "bucket")
        ).persist()
        if upto == "bucketed":
            return bucketed, [corpus, bucketed]
        a = bucketed.select(F.col("vec_id").alias("vec_a"), "table_id", "bucket")
        b = bucketed.select(F.col("vec_id").alias("vec_b"), "table_id", "bucket")
        joined = a.join(b, ["table_id", "bucket"]).filter(
            F.col("vec_a") < F.col("vec_b")
        )
        if upto == "selfjoin":
            return joined, [corpus, bucketed]
        cand = joined.dropDuplicates(["vec_a", "vec_b"])
        if upto == "cand":
            return cand, [corpus, bucketed]
        ca = corpus.select(
            F.col("vec_id").alias("vec_a"),
            F.col("emb").alias("ea"),
            F.col("norm").alias("na"),
        )
        cb = corpus.select(
            F.col("vec_id").alias("vec_b"),
            F.col("emb").alias("eb"),
            F.col("norm").alias("nb"),
        )
        attached = cand.join(ca, "vec_a").join(cb, "vec_b")
        if upto == "attach":
            return attached, [corpus, bucketed]
        sim = cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
        out = (
            attached.withColumn("sim", sim)
            .filter(F.col("sim") >= NEARDUP_SIM)
            .select("vec_a", "vec_b", F.round("sim", 6).alias("cosine_sim"))
        )
        return out, [corpus, bucketed]

    for stage in ("bucketed", "selfjoin", "cand", "attach", "full"):
        def run(stage=stage):
            spark.catalog.clearCache()
            df, persisted = build(stage)
            spark.sparkContext.setJobDescription(f"emb-lsh:{stage}")
            noop(df)
            for p in persisted:
                p.unpersist()

        timed(stage, run)

    # row counts for the volume story (single pass, cached subtrees)
    spark.catalog.clearCache()
    df, persisted = build("selfjoin")
    n_selfjoin = df.count()
    df2, _ = build("cand")
    n_cand = df2.count()
    print(f"selfjoin rows={n_selfjoin:,}  distinct cand rows={n_cand:,}")
    spark.stop()


if __name__ == "__main__":
    main()
