#!/usr/bin/env python
"""Bisect the plan-identical overhead step behind the r09 budget
recalibration (r10, VERDICT r09 #2).

The r09 quiet probe measured `asof_join_attribution` 0.304 s and
`text_quality_scores` 0.274 s vs their r06-era 0.21/0.22 budgets at
control inflation 0.98 — not weather, not a plan change.  The judge
named three candidate mechanisms; this tool times each in isolation
on a quiet machine (interleaved, median of N):

  bare      — the RAW query function (the @query decorator returns
              the undecorated fn, so importing it from its module
              skips the registry wrapper entirely): no
              release_tracked, no persist instrumentation.
  wrapped   — `REGISTRY[name].fn` exactly as bench/drift_probe call
              it (wrapper + empty release_tracked).
  tracked   — `REGISTRY[name].fn` immediately after a persist-heavy
              registry query, so release_tracked has real caches to
              drop inside the timed window (the bench suite shape,
              where a persist-user precedes most entries).
  build     — construction-only time (plan build, no action) for
              bare vs wrapped: isolates wrapper cost from execution.

Reading: if wrapped ≈ bare ≈ tracked, the wrapper and the cache
bookkeeping are exonerated (bounded by the printed deltas) and the
residual is environment level (JVM/OS aging between rounds) — the
budgets stand with the mechanism BOUNDED rather than named.  If
tracked > wrapped ≈ bare, the overhead is release_tracked riding
inside the NEXT query's timed window and the bench suite's query
ORDER sets its size.

Usage: python tools/overhead_bisect.py [passes]   (~4 min; JSON line)
Record the verdict in BACKLOG + bench.py's budget note.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"

#: suspect -> (module, attr) of the RAW undecorated function
SUSPECTS = {
    "asof_join_attribution": (
        "taipei_bi_etl_spark.queries.temporal",
        "asof_join_attribution",
    ),
    "text_quality_scores": (
        "taipei_bi_etl_spark.queries.pipeline",
        "text_quality_scores",
    ),
}
#: a persist-heavy registry query to populate _TRACKED before the
#: "tracked" variant (its caches are released inside the timed call)
PERSIST_HEAVY = "dedup_minhash_lsh"


def main() -> None:
    import importlib

    from taipei_bi_etl_spark.queries import REGISTRY, release_tracked
    from taipei_bi_etl_spark.session import get_spark

    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(app_name="overhead_bisect", shuffle_partitions=32)
    spark.range(1).count()
    from taipei_bi_etl_spark.io import TEST_TABLES, read_table

    for t in TEST_TABLES:
        read_table(spark, SF_DIR, t).count()

    out: dict = {"overhead_bisect": True, "pyspark": spark.version,
                 "passes": passes, "suspects": {}}
    for name, (mod, attr) in SUSPECTS.items():
        raw = getattr(importlib.import_module(mod), attr)
        wrapped = REGISTRY[name].fn
        runs: dict[str, list[float]] = {
            "bare": [], "wrapped": [], "tracked": [],
            "build_bare": [], "build_wrapped": [],
        }
        for _ in range(passes):
            # bare
            release_tracked()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            raw(spark, SF_DIR).count()
            runs["bare"].append(time.perf_counter() - t0)
            # wrapped (release_tracked empty: bare ran no persists —
            # clear anyway so both start cold)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            wrapped(spark, SF_DIR).count()
            runs["wrapped"].append(time.perf_counter() - t0)
            # tracked: persist-heavy predecessor leaves caches for
            # release_tracked to drop inside the timed window
            REGISTRY[PERSIST_HEAVY].fn(spark, SF_DIR).count()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            wrapped(spark, SF_DIR).count()
            runs["tracked"].append(time.perf_counter() - t0)
            # construction only
            release_tracked()
            t0 = time.perf_counter()
            raw(spark, SF_DIR)
            runs["build_bare"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            wrapped(spark, SF_DIR)
            runs["build_wrapped"].append(time.perf_counter() - t0)
        med = {k: round(statistics.median(v), 4) for k, v in runs.items()}
        med["wrapper_delta_ms"] = round(
            (med["wrapped"] - med["bare"]) * 1000, 1
        )
        med["tracked_delta_ms"] = round(
            (med["tracked"] - med["wrapped"]) * 1000, 1
        )
        out["suspects"][name] = med
        print(json.dumps({name: med}), file=sys.stderr)
    release_tracked()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
