#!/usr/bin/env python
"""Min-label round-cost doubling — mechanism probe (r08, VERDICT r07 #5).

r07 measured the per-round cost of the iterative min-label loop
DOUBLING past ~15 rounds on constant data, and ruled out RDD lineage
(toDebugString pinned), AQE (identical with it off), and
localCheckpoint specificity (reliable disk checkpoint doubles too).
Remaining hypotheses differ in WHAT accumulates:

* A — baseline loop (expected: doubling tail);
* B — rounds severed through PARQUET (write + read back each round:
  no in-session RDD chain at all).  If B still doubles, the mechanism
  is session aging (listener/UI/block-manager state per job); if B is
  flat, the checkpoint RDD chain itself is the carrier;
* C — baseline plus EXPLICIT unpersist of the previous round's
  checkpoint.  If C is flat, retained checkpoint blocks are the
  mechanism and min_label_components gets a one-line fix.
* D — baseline plus a BROADCAST hint on the pointer-jump parent side.
  First sweep found the tail tracks CONVERGENCE (present in A and C,
  absent in B): hypothesis — the pointer-jump join shuffles on
  component_id, whose distribution collapses onto the component
  minimum as rounds progress (pointer jumping DOUBLES the minimum's
  label mass per round → one reduce task's input doubles per round =
  the observed ×2 tail).  B escapes because parquet-scan size stats
  let Catalyst broadcast the parent side — no component_id shuffle at
  all.  If D is flat, the mechanism is confirmed.
* E — baseline with the pointer jump REMOVED (one-hop propagation
  only; won't converge on the chain — capped rounds, cost curve only).
  The complement check: without the label-mass doubling step the tail
  should not appear.

Graph: a 200k-node chain (the r07 repro; pointer jumping converges in
~log2(n) ≈ 18 rounds, reaching the doubling zone naturally).

Usage: python tools/minlabel_probe.py [variant A|B|C|ALL] [n]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from taipei_bi_etl_spark.session import get_spark  # noqa: E402

MAX_ROUNDS = 24
ROUND_TIMEOUT = 90.0  # stop a variant once one round exceeds this


def chain_edges(spark, n: int):
    e = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()


def run_variant(spark, variant: str, n: int) -> list[float]:
    edges = chain_edges(spark, n)
    edges.count()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component_id", F.col("node"))
        .localCheckpoint()
    )
    tmp = f"/tmp/minlabel_probe_{variant}"
    secs: list[float] = []
    prev = None
    for rnd in range(MAX_ROUNDS):
        t0 = time.perf_counter()
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "dst_node"),
                F.col("dst") == F.col("dst_node"),
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("component_id").alias("nbr_min"))
        )
        propagated = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component_id"), F.coalesce("nbr_min", "component_id")
            ).alias("component_id"),
        )
        if variant == "E":
            new_labels = propagated
        else:
            parent = propagated.select(
                F.col("node").alias("p_node"),
                F.col("component_id").alias("p_label"),
            )
            if variant == "D":
                parent = F.broadcast(parent)
            new_labels = propagated.join(
                parent, propagated["component_id"] == parent["p_node"], "left"
            ).select(
                "node",
                F.least(
                    F.col("component_id"),
                    F.coalesce("p_label", "component_id"),
                ).alias("component_id"),
            )
        if variant == "G":
            # checkpoint a node-repartitioned frame: if flat, the
            # carrier is the hot stored partition of the SMJ output
            new_labels = new_labels.repartition("node")
        t_cnt = 0.0
        if "--count-split" in sys.argv:
            # pure-compute probe: run the round's pipeline to a count
            # BEFORE checkpointing — if this doubles, the mechanism is
            # in the computation; if only the checkpoint does, it's in
            # localCheckpoint mechanics (store/partitioning)
            t_c0 = time.perf_counter()
            new_labels.count()
            t_cnt = time.perf_counter() - t_c0
        t_ck0 = time.perf_counter()
        if variant == "B":
            # sever through parquet: nothing in-session survives the round
            new_labels.write.mode("overwrite").parquet(f"{tmp}/{rnd}")
            new_labels = spark.read.parquet(f"{tmp}/{rnd}")
        else:
            new_labels = new_labels.localCheckpoint()
        t_ck = time.perf_counter() - t_ck0
        t_ch0 = time.perf_counter()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component_id") != F.col("o.component_id"))
            .count()
        )
        if variant == "C" and prev is not None:
            prev.unpersist()
        prev = labels
        labels = new_labels
        dt = time.perf_counter() - t0
        secs.append(round(dt, 2))
        skew = ""
        if "--skew" in sys.argv:
            # physical layout of the stored labels: max partition share
            parts = (
                labels.groupBy(F.spark_partition_id().alias("p"))
                .count()
                .collect()
            )
            top = max(r["count"] for r in parts)
            total = sum(r["count"] for r in parts)
            skew = (
                f" parts={len(parts)} max_share="
                f"{top / total:.3f}"
            )
        t_ch = time.perf_counter() - t_ch0
        cnt = f" count_job={t_cnt:.2f}" if t_cnt else ""
        print(
            f"variant {variant} round {rnd}: {dt:.2f}s "
            f"(ckpt={t_ck:.2f} changed_job={t_ch:.2f}{cnt}) "
            f"changed={changed}{skew}",
            file=sys.stderr,
        )
        if changed == 0 or dt > ROUND_TIMEOUT:
            break
    edges.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)
    return secs


def main() -> None:
    want = (sys.argv[1] if len(sys.argv) > 1 else "ALL").upper()
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(app_name="minlabel_probe")
    out = {"n": n}
    for v in ("A", "B", "C", "D", "E", "G"):
        if want not in ("ALL", v):
            continue
        out[v] = run_variant(spark, v, n)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
