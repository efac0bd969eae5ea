#!/usr/bin/env python
"""Quiet-machine drift probe (r08, VERDICT r07 #1).

`cohort_retention` (0.42 -> 0.91 s raw) and `dedup_embedding_lsh`
(6.68 -> 9.61 s raw) drifted across the r06 -> r07 driver sessions with
UNCHANGED plans, SHUFFLES rows, and source.  This probe measures the
suspects on a quiet machine with the bench's own methodology (clearCache
per pass, median) but 5 passes and INTERLEAVED suspect/control order, so
suite-position and session-aging effects cancel.  Controls are
stable headline entries whose budgets have never drifted; their ratios
estimate the session's common mode independently of the suspects.

r09 (VERDICT r08 #4): suspects are now a CLI argument so each round's
drifters get probe rows with the same methodology — the r08 pair was
`asof_join_attribution` and `text_quality_scores` (1.34x normalized
each, sub-second).

Usage: python tools/drift_probe.py [passes] [suspect1,suspect2,...]
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

import bench  # noqa: E402
from taipei_bi_etl_spark.queries import REGISTRY  # noqa: E402
from taipei_bi_etl_spark.session import get_spark  # noqa: E402

SUSPECTS = ["cohort_retention", "dedup_embedding_lsh"]
CONTROLS = ["pricing_summary", "dedup_minhash_lsh", "text_bm25_search"]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    suspects = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else list(SUSPECTS)
    )
    for s in suspects:
        assert s in REGISTRY and s in bench.BUDGETS, s
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="drift_probe")
    spark.range(1).count()
    from taipei_bi_etl_spark.io import TEST_TABLES, read_table

    for t in TEST_TABLES:
        read_table(spark, sf_dir, t).count()
    for warm in ("pricing_summary", "lead_sessionize"):
        REGISTRY[warm].fn(spark, sf_dir).count()

    order = suspects + CONTROLS
    runs: dict[str, list[float]] = {n: [] for n in order}
    for p in range(passes):
        for name in order:  # interleaved: every pass touches every query
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            runs[name].append(round(time.perf_counter() - t0, 3))

    med = {n: statistics.median(r) for n, r in runs.items()}
    ctl_ratios = [med[n] / bench.BUDGETS[n] for n in CONTROLS]
    out = {
        "passes": passes,
        "runs": runs,
        "medians": {n: round(v, 3) for n, v in med.items()},
        "control_inflation": round(statistics.median(ctl_ratios), 3),
        "suspect_vs_budget": {
            n: round(med[n] / bench.BUDGETS[n], 3) for n in suspects
        },
    }
    if set(suspects) == set(SUSPECTS):
        out["r06_raw"] = {"cohort_retention": 0.42, "dedup_embedding_lsh": 6.68}
        out["r07_raw"] = {"cohort_retention": 0.907, "dedup_embedding_lsh": 9.606}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
