#!/usr/bin/env python
"""Checkpoint-store doubling — MINIMAL VANILLA-SPARK REPRO (r09,
VERDICT r08 #5).

r08 localized the min-label loop's per-round x2 to the CHECKPOINT
MATERIALIZATION step (SCALE.md "min-label doubling: mechanism
LOCALIZED"): the round's pipeline run to a count() stays flat while
the localCheckpoint of the SAME frame doubles, tracking the label-value
collapse.  The residual question: does the store step's doubling need
the engine's join/agg pipeline at all, or does it reproduce with the
simplest possible loop — a frame derived from the previous checkpoint
by a bare projection, re-checkpointed?

This script uses NOTHING from the engine — pyspark only, zero joins,
zero aggregations.  Two variants, identical loop shape:

* CONST    — label = node every round (no value collapse).  Each round
  derives (node, label) from the previous checkpoint via a trivial
  projection and re-checkpoints.
* COLLAPSE — label = node - (node % 2^(r+1)): the label distribution
  collapses exactly like pointer jumping (the minimum's mass DOUBLES
  per round: 2, 4, 8, ... block sizes), still computed by a bare
  projection from the previous checkpoint — no shuffle anywhere.
* JOIN_COLLAPSE — the actual pointer jump ``label := label[label]`` as
  ONE vanilla self-join per round over a pointer chain (label[node] =
  node-1): the same label-mass doubling, now with a SHUFFLE PIPELINE
  feeding the checkpoint — isolates whether the join lineage is the
  necessary ingredient the bare projections lack.

Per round both the compute step (count of the derived frame) and the
store step (localCheckpoint of the same frame) are timed.  Readings:

* COLLAPSE store doubles while CONST stays flat → the pathology is a
  pure store-step property of value-collapsed frames — reproduced
  OUTSIDE the engine; record version-pinned in SCALE.md and stop.
* NEITHER doubles → the engine loop's shuffle pipeline (join/agg
  lineage feeding the checkpoint) is a necessary ingredient; the
  parquet-sever guard remains the cure and the note closes the other
  way.

Usage: python tools/checkpoint_store_repro.py [n] [rounds]
Prints one JSON line per round and a JSON summary.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_variant(spark, name: str, n: int, rounds: int) -> list[dict]:
    if name == "JOIN_COLLAPSE":
        # pointer-pointer chain: label[node] = node-1; each round the
        # vanilla pointer jump label := label[label] doubles the
        # minimum's label mass — the exact collapse of the engine's
        # min-label loop, expressed as ONE self-join per round with no
        # engine code
        df = spark.range(n).select(
            F.col("id").alias("node"),
            F.greatest(F.col("id") - 1, F.lit(0)).alias("label"),
        )
    else:
        df = spark.range(n).select(
            F.col("id").alias("node"), F.col("id").alias("label")
        )
    df = df.localCheckpoint()
    out = []
    for r in range(rounds):
        if name == "JOIN_COLLAPSE":
            parent = df.select(
                F.col("node").alias("p_node"),
                F.col("label").alias("p_label"),
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
            row = {
                "variant": name,
                "round": r,
                "compute_sec": round(t_compute, 3),
                "store_sec": round(t_store, 3),
            }
            print(json.dumps(row), flush=True)
            out.append(row)
            continue
        if name == "COLLAPSE":
            new_label = F.col("node") - (
                F.col("node") % F.lit(2 ** (r + 1))
            )
        else:
            new_label = F.col("node")
        derived = df.select(
            "node", F.least(F.col("label"), new_label).alias("label")
        )
        t0 = time.monotonic()
        derived.count()
        t_compute = time.monotonic() - t0
        t0 = time.monotonic()
        df = derived.localCheckpoint()
        t_store = time.monotonic() - t0
        row = {
            "variant": name,
            "round": r,
            "compute_sec": round(t_compute, 3),
            "store_sec": round(t_store, 3),
        }
        print(json.dumps(row), flush=True)
        out.append(row)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("checkpoint_store_repro")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for variant in ("CONST", "COLLAPSE", "JOIN_COLLAPSE"):
        results[variant] = run_variant(spark, variant, n, rounds)
    tail = {
        v: [r["store_sec"] for r in rows[-5:]]
        for v, rows in results.items()
    }
    head = {
        v: [r["store_sec"] for r in rows[:5]]
        for v, rows in results.items()
    }
    summary = {
        "spark_version": spark.version,
        "n": n,
        "rounds": rounds,
        "store_head": head,
        "store_tail": tail,
        # reproduced = SOME vanilla variant's store step ends ≥4x its
        # own early rounds while CONST stays flat (no session aging)
        "reproduced_outside_engine": {
            v: tail[v][-1] > 4 * max(min(head[v][1:]), 0.05)
            for v in ("COLLAPSE", "JOIN_COLLAPSE")
        },
        "const_flat": tail["CONST"][-1]
        < 3 * max(min(head["CONST"][1:]), 0.05),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
