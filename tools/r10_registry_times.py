#!/usr/bin/env python
"""r10 optimization: time EVERY registry query once (count action, cold
cache per query) at $SPARK_GRAFT_SF_DIR and print a sorted cost table.

The bench times the 32 headline queries; this tool ranks the OTHER ~250
registry entries so optimization effort (and the widen_scan audit) is
spent by measured cost, not guesswork.  One pass per query — the point
is ranking, not precision; re-measure candidates interleaved before
changing anything.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from taipei_bi_etl_spark.io import TEST_TABLES, read_table
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    only_slow = "--top" in sys.argv
    spark = get_spark(app_name="r10_registry_times")
    spark.range(1).count()
    for t in TEST_TABLES:
        try:
            read_table(spark, SF, t).count()
        except Exception:
            pass
    times: dict[str, float] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"rt:{name}")
        t0 = time.perf_counter()
        try:
            spec.fn(spark, SF).count()
            times[name] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - ranking sweep robustness
            print(f"FAIL {name}: {str(e)[:120]}", flush=True)
        print(f". {name} {times.get(name, -1):.2f}", flush=True)
    print("\n--- slowest first ---")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        if only_slow and dt < 1.0:
            break
        print(f"{dt:8.3f}  {name}")
    print(f"total {sum(times.values()):.1f} s over {len(times)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
