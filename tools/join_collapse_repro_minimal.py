#!/usr/bin/env python
"""Minimal standalone repro: localCheckpoint cost doubles per round in
a pointer-jumping self-join loop (vanilla PySpark, no other deps).

Shape: labels(node, label) starts as a chain (label[node] = node-1);
each round performs the standard pointer jump ``label := label[label]``
as one self-join, then localCheckpoints the result to cut lineage.
The COMPUTE step (count of the derived frame) stays flat every round;
the STORE step (localCheckpoint of the same frame) roughly doubles
per round once the label distribution starts collapsing — by round 20
at n=1M it is ~5x its round-1 cost and still climbing (measured
0.48 s -> 2.53 s on Spark 4.1.2, local[32]).

Two ingredients are BOTH required (dropping either keeps the store
step flat, see the control):

  1. a shuffle pipeline (the self-join) feeding the checkpoint, and
  2. a collapsing key distribution (the pointer jump halves the
     number of distinct labels per round).

CONTROL=1 replaces the join with a bare projection that collapses the
label distribution identically (label = node - node % 2^(round+1)) —
no shuffle, same value collapse — and the store step stays flat,
isolating the join lineage as the necessary ingredient.

Version matrix (this repo's measurements, local[32], n=1M, 20 rounds):

  Spark 4.1.2 / Java 17 : JOIN 0.48 -> 2.53 s (doubling tail);
                          CONTROL flat 0.23-0.56 s

Usage:
  python join_collapse_repro_minimal.py [n] [rounds]
  CONTROL=1 python join_collapse_repro_minimal.py [n] [rounds]
"""

import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
control = os.environ.get("CONTROL") == "1"

spark = (
    SparkSession.builder.master("local[32]")
    .appName("join_collapse_repro")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
print(f"spark {spark.version} n={n} rounds={rounds} control={control}")

df = spark.range(n).select(
    F.col("id").alias("node"),
    F.greatest(F.col("id") - 1, F.lit(0)).alias("label"),
).localCheckpoint()

for r in range(rounds):
    if control:
        derived = df.select(
            "node",
            F.least(
                F.col("label"),
                F.col("node") - F.col("node") % F.lit(2 ** (r + 1)),
            ).alias("label"),
        )
    else:
        parent = df.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        derived = df.join(
            parent, df["label"] == parent["p_node"], "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce("p_label", "label")
            ).alias("label"),
        )
    t0 = time.monotonic()
    derived.count()
    t_compute = time.monotonic() - t0
    t0 = time.monotonic()
    df = derived.localCheckpoint()
    t_store = time.monotonic() - t0
    print(
        f"round {r:2d}  compute {t_compute:6.3f}s  store {t_store:6.3f}s",
        flush=True,
    )
