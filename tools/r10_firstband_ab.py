#!/usr/bin/env python
"""r10 experiment: candidate-pair dedup via FIRST-COLLISION emit vs
dropDuplicates/distinct in the two LSH families (guide §2.4 "remove
shuffles outright").

A band/bucket self-join emits one row per (pair, colliding band); the
engine dedups with an exchange + hash aggregate.  The alternative emits
each pair exactly once — from the FIRST band where the two docs collide
— by carrying both signature arrays through the join and keeping a row
iff no earlier band collides (map-side filter, no exchange).  Same
distinct pair set by construction; this script measures which is
faster and checks row-set identity.

Usage: python tools/r10_firstband_ab.py [--reps N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def emb_variant(spark, sf_dir):
    """dedup_embedding_lsh with first-collision candidate emit."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.similarity import (
        NEARDUP_SIM,
        _corpus_with_norm,
        cosine,
        lsh_signature_battery,
    )

    corpus = _corpus_with_norm(spark, sf_dir).persist()
    sigs = corpus.select(
        "vec_id", lsh_signature_battery("emb").alias("sigs")
    )
    bucketed = sigs.select(
        "vec_id",
        "sigs",
        F.posexplode("sigs").alias("table_id", "bucket"),
    ).persist()
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("sigs").alias("sa"),
        "table_id",
        "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("sigs").alias("sb"),
        "table_id",
        "bucket",
    )
    first_collision = ~F.exists(
        F.zip_with(
            F.slice(F.col("sa"), 1, F.col("table_id")),
            F.slice(F.col("sb"), 1, F.col("table_id")),
            lambda x, y: x == y,
        ),
        lambda hit: hit,
    )
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(first_collision)
        .select("vec_a", "vec_b")
    )
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
    sim = cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    return (
        cand.join(ca, "vec_a")
        .join(cb, "vec_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= NEARDUP_SIM)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("cosine_sim"))
    )


def minhash_variant(spark, sf_dir):
    """dedup_minhash_lsh with first-collision candidate emit."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.dedup import (
        _band_structs,
        _doc_shingle_hashes,
        _exact_jaccard_on_pairs,
        _signatures,
    )

    docs_sh = _doc_shingle_hashes(spark, sf_dir).persist()
    sig = _signatures(docs_sh)
    # band_hash array per doc (ordered by band_id), carried through the
    # self-join so the first-collision test is map-side
    banded = sig.select(
        "doc_id",
        F.transform(
            _band_structs(), lambda s: s.getField("band_hash")
        ).alias("bhs"),
    ).select(
        "doc_id",
        "bhs",
        F.posexplode("bhs").alias("band_id", "band_hash"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("bhs").alias("ba"),
        "band_id",
        "band_hash",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("bhs").alias("bb"),
        "band_id",
        "band_hash",
    )
    first_collision = ~F.exists(
        F.zip_with(
            F.slice(F.col("ba"), 1, F.col("band_id")),
            F.slice(F.col("bb"), 1, F.col("band_id")),
            lambda x, y: x == y,
        ),
        lambda hit: hit,
    )
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(first_collision)
        .select("doc_a", "doc_b")
    )
    return _exact_jaccard_on_pairs(cand, docs_sh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from taipei_bi_etl_spark.io import TEST_TABLES, read_table
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(app_name="r10_firstband_ab")
    spark.range(1).count()
    for t in TEST_TABLES:
        try:
            read_table(spark, SF, t).count()
        except Exception:
            pass

    arms = {
        "emb_base": REGISTRY["dedup_embedding_lsh"].fn,
        "emb_firstband": emb_variant,
        "mh_base": REGISTRY["dedup_minhash_lsh"].fn,
        "mh_firstband": minhash_variant,
    }

    # identity check first (sorted row sets must match exactly)
    for fam, base, var in (
        ("emb", "emb_base", "emb_firstband"),
        ("mh", "mh_base", "mh_firstband"),
    ):
        spark.catalog.clearCache()
        rb = sorted(map(tuple, arms[base](spark, SF).collect()))
        spark.catalog.clearCache()
        rv = sorted(map(tuple, arms[var](spark, SF).collect()))
        print(f"{fam}: rows base={len(rb)} variant={len(rv)} "
              f"identical={rb == rv}")
        if rb != rv:
            print(f"{fam}: MISMATCH — variant rejected")

    results: dict[str, list[float]] = {k: [] for k in arms}
    for rep in range(args.reps):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"fb:{name}:{rep}")
            t0 = time.perf_counter()
            fn(spark, SF).count()
            results[name].append(time.perf_counter() - t0)
    for name, runs in results.items():
        med = sorted(runs)[len(runs) // 2]
        print(f"{name:16s} median {med:7.3f} s  "
              f"runs {['%.2f' % r for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
