#!/usr/bin/env python
"""r11 construct-vs-execute probe (VERDICT r10 #3/#6): for each named
registry query, time DataFrame CONSTRUCTION (fn call — py4j expression
building + analysis) separately from EXECUTION (count action), warm and
cold, optionally with a cProfile of the construction.

Usage:
    python tools/r11_probe_build.py q1 [q2 ...] [--reps N] [--profile]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--no-exec", action="store_true")
    args = ap.parse_args()

    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(app_name="r11_probe_build")
    spark.range(1).count()

    for q in args.queries:
        spec = REGISTRY[q]
        for rep in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, SF)
            t_build = time.perf_counter() - t0
            t_exec = float("nan")
            if not args.no_exec:
                t0 = time.perf_counter()
                df.count()
                t_exec = time.perf_counter() - t0
            print(
                f"{q} rep{rep}: build {t_build:.3f}s exec {t_exec:.3f}s",
                flush=True,
            )
        if args.profile:
            import cProfile
            import pstats

            spark.catalog.clearCache()
            prof = cProfile.Profile()
            prof.enable()
            spec.fn(spark, SF)
            prof.disable()
            st = pstats.Stats(prof)
            st.sort_stats("cumulative")
            st.print_stats(25)
    spark.stop()


if __name__ == "__main__":
    main()
