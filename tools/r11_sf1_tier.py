#!/usr/bin/env python
"""Opt-in sf1 bench tier for the heavy families (r11, VERDICT r10 #2).

At sf0.1 the suite is driver-bound (8c/32c ratios ≤1.73 on a 4× core
ratio — PERF_r10), so further executor-side wins are invisible there.
This runs the heavy-family queries against the self-generated sf1
fixture (tools/r11_gen_sf1.py) with the EXACT bench methodology
(3 timed passes, clearCache per pass, median; warmup query first) at
$SPARK_GRAFT_CPUS cores, printing one JSON line.  The sf0.1 driver
contract in bench.py is untouched — this is the additive tier whose
results live in SCALE.md.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/r11_sf1_tier.py [--dir D] [q ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

#: The heavy families named by VERDICT r10 #2.
HEAVY = [
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "mango_feature_surface_rollup",
    "mango_feature_surface_materialized",
    "dedup_substring_profile",
    "text_bm25_search",
    "dedup_ngram_containment",
    "dedup_containment_prefix",
    "dedup_ngram_jaccard",
    "text_ngram_lm_score",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--dir", default="/root/sf1_selfgen")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    names = args.queries or HEAVY

    from taipei_bi_etl_spark.io import TEST_TABLES, read_table
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(app_name="sf1_tier")
    spark.range(1).count()
    for t in TEST_TABLES:
        try:
            read_table(spark, args.dir, t).count()
        except Exception:
            pass
    for warm in ("pricing_summary", "lead_sessionize"):
        spec = REGISTRY.get(warm)
        if spec is not None:
            spec.fn(spark, args.dir).count()

    timings: dict[str, float] = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        runs = []
        for i in range(args.passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"sf1:{name}:{i}")
            t0 = time.perf_counter()
            spec.fn(spark, args.dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        print(f"# {name}: {timings[name]}s {sorted(runs)}", file=sys.stderr)
    out = {
        "metric": "sf1_heavy_families_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "dir": args.dir,
        "cpus": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
