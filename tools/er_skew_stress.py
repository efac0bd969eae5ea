#!/usr/bin/env python
"""Skewed-nation ER stress (r08, VERDICT r07 #2).

The stress.py harness copies `customer` unchanged (dimensions don't
grow), so the ER closure's skew behavior needs its own corpus: a
synthetic customer table where NATION 0 HOLDS ~50% OF ALL FUZZY EDGES.
Names come in 8-member "typo families" (same prefix, last char varies:
pairwise lev = 1, 28 edges/family); even families land in nation 0,
odd families spread over nations 1..24 — so half the edge mass sits in
one block while components stay bounded (8 nodes), the realistic ER
shape.

Measures `fuzzy_linkage_clusters` end-to-end at 1x and Kx, with the
edge-cap guard forced LOW so the hot block routes to the iterative
closure at both scales (the guarded path under test), and once at 1x
with the cap disabled (the single-task union-find baseline the guard
exists to avoid).  Prints one JSON line; the ratio belongs in SCALE.md.

Usage: python tools/er_skew_stress.py [K] [N_1X]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from taipei_bi_etl_spark.queries import linkage, release_tracked  # noqa: E402
from taipei_bi_etl_spark.session import get_spark  # noqa: E402


def build_skewed_customer(spark, out_dir: str, n: int) -> None:
    fam = F.col("id") / 8
    fam = F.floor(fam).cast("long")
    member = (F.col("id") % 8).cast("int")
    name = F.concat(
        F.lit("Cust#"),
        F.format_string("%09d", fam),
        member.cast("string"),
    )
    nation = (
        F.when(fam % 2 == 0, F.lit(0))
        .otherwise(1 + (fam % 24))
        .cast("long")
    )
    spark.range(n).select(
        F.col("id").alias("c_custkey"),
        name.alias("c_name"),
        nation.alias("c_nationkey"),
    ).write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")


def run_once(spark, d: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    release_tracked()
    t0 = time.perf_counter()
    n = linkage.fuzzy_linkage_clusters(spark, d).count()
    return time.perf_counter() - t0, n


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(app_name="er_skew_stress")
    d1, dk = "/tmp/er_skew_1x", f"/tmp/er_skew_{k}x"
    build_skewed_customer(spark, d1, n1)
    build_skewed_customer(spark, dk, n1 * k)
    # hot-block edge mass: n/16 families x 28 edges
    hot_edges_1x = (n1 // 16) * 28

    out = {"k": k, "n_1x": n1, "hot_block_edges_1x": hot_edges_1x}
    # guard FORCED ON: hot block routes to the iterative closure
    linkage._ER_EDGE_CAP = hot_edges_1x // 2
    for label, d in [("warm", d1), ("routed_1x", d1), ("routed_kx", dk)]:
        sec, rows = run_once(spark, d)
        out[label] = {"sec": round(sec, 2), "rows": rows}
    out["routed_ratio"] = round(
        out["routed_kx"]["sec"] / out["routed_1x"]["sec"], 2
    )
    # guard OFF: the whole hot block in ONE pandas task (baseline)
    linkage._ER_EDGE_CAP = 10**12
    sec, rows = run_once(spark, d1)
    out["single_task_1x"] = {"sec": round(sec, 2), "rows": rows}
    assert rows == out["routed_1x"]["rows"], "guard changed the answer"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
