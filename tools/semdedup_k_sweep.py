#!/usr/bin/env python
"""SemDeDup cluster-count sweep (r10 — the K knob demonstrated, per
the r11 lead): the registered `dedup_semantic_centroid` pins DKM_K=8
because the DuckDB oracle replays the Lloyd training (k CTE rows per
iteration); production scales K with the corpus — the paper runs tens
of thousands of clusters — because the pair stage is quadratic ONLY
within a cell: pair work ~ Σ_cells |cell|² ≈ n²/K for balanced cells.

This sweep trains at K ∈ {8, 32, 64} on the sf0.1 embeddings with the
SAME deterministic integer-Lloyd trainer (`_train_centroids(quant,
k)` — the k parameter exists, the oracle is why the registered form
pins it small) and times assignment + within-cell pair stage + drop
rule end-to-end, reporting in-cell pair volume per K.  Expected
shape: pair volume falls ~1/K (modulo imbalance), wall time follows
once pair work dominates training.

Usage: python tools/semdedup_k_sweep.py [k csv]   (~3 min; JSON line)
Record the summary in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def main() -> None:
    from taipei_bi_etl_spark.queries.ann_deterministic import (
        PICO,
        _argmin_cells,
        _train_centroids,
    )
    from taipei_bi_etl_spark.queries.emb_common import read_embeddings
    from taipei_bi_etl_spark.queries.semdedup import (
        SEMDEDUP_T,
        _cos,
        _idot,
    )
    from taipei_bi_etl_spark.session import get_spark

    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [8, 32, 64]
    )
    spark = get_spark(app_name="semdedup_k_sweep", shuffle_partitions=32)
    emb = read_embeddings(spark, SF_DIR)
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * PICO).cast("long"),
        ).alias("qv"),
    ).persist()
    n = quant.count()
    cells_out = []
    for k in ks:
        times = []
        stats = {}
        for _ in range(RUNS):
            spark.catalog.clearCache()
            quant.persist().count()
            t0 = time.time()
            cents = _train_centroids(quant, k)
            v = (
                quant.withColumn(
                    "cell", _argmin_cells(F.col("qv"), cents, 1)[0]
                )
                .withColumn("sd", _idot(F.col("qv"), F.col("qv")))
                .filter(F.col("sd") > 0)
                .persist()
            )
            a = v.select(
                "cell",
                F.col("vec_id").alias("va"),
                F.col("qv").alias("qa"),
                F.col("sd").alias("sa"),
            )
            b = v.select(
                "cell",
                F.col("vec_id").alias("vb"),
                F.col("qv").alias("qb"),
                F.col("sd").alias("sb"),
            )
            psim = _cos(
                _idot(F.col("qa"), F.col("qb")), F.col("sa"), F.col("sb")
            )
            pairs = (
                a.join(b, "cell")
                .filter(F.col("va") < F.col("vb"))
            )
            in_cell = pairs.count()
            dups = pairs.filter(psim >= F.lit(SEMDEDUP_T)).count()
            times.append(time.time() - t0)
            stats = {"in_cell_pairs": in_cell, "dup_pairs": dups}
            v.unpersist()
        cells_out.append(
            {
                "k": k,
                "sec": round(statistics.median(times), 2),
                **stats,
                "pair_share_of_n2": round(
                    stats["in_cell_pairs"] / (n * (n - 1) / 2), 4
                ),
            }
        )
        print(json.dumps(cells_out[-1]), file=sys.stderr)
    print(
        json.dumps(
            {"semdedup_k_sweep": True, "sf_dir": SF_DIR, "n": n,
             "runs": RUNS, "cells": cells_out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
