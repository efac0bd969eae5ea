#!/usr/bin/env python
"""r10 optimization A/B harness: interleaved cold-cache timing of named
registry queries in ONE session (the SCALE.md interleaved-medians
methodology), so a code change can be measured against HEAD's numbers
without cross-session weather.

Usage:
    python tools/r10_ab.py q1 [q2 ...] [--reps N] [--action count|noop]

Each rep clears the cache first (persist cost is paid per pass — same
as bench.py).  Prints per-query medians.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import os

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--action", choices=("count", "noop"), default="count")
    args = ap.parse_args()

    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(app_name="r10_ab")
    spark.range(1).count()
    # same warmup as bench.py so medians are comparable
    from taipei_bi_etl_spark.io import TEST_TABLES, read_table

    for t in TEST_TABLES:
        try:
            read_table(spark, SF, t).count()
        except Exception:
            pass
    for warm in ("pricing_summary", "lead_sessionize"):
        spec = REGISTRY.get(warm)
        if spec is not None:
            spec.fn(spark, SF).count()

    results: dict[str, list[float]] = {q: [] for q in args.queries}
    for rep in range(args.reps):
        for q in args.queries:
            spec = REGISTRY[q]
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{q}:{rep}")
            t0 = time.perf_counter()
            df = spec.fn(spark, SF)
            if args.action == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            results[q].append(time.perf_counter() - t0)
    for q, runs in results.items():
        med = sorted(runs)[len(runs) // 2]
        print(
            f"{q:45s} median {med:7.3f} s   runs "
            f"{['%.2f' % r for r in runs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
