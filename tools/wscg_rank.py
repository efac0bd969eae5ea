#!/usr/bin/env python
"""Rank interpreted-node queries by measured cost (r10, VERDICT r09
next-round #6): WSCG.md lists every query whose executed plan carries
interpreted Project/Filter nodes or lambda functions; most are
deliberate (ObjectHashAggregate on collect_set, pandas/Arrow
boundaries, the measured LSH zip_with exclusions).  This pass joins
those rows to an sf0.1 timing so the exclusions are CHOSEN BY COST —
any hot query still carrying an accidental interpreted node shows up
at the top of the table instead of hiding among 100 cold ones.

Method: parse WSCG.md (the committed ledger — same plans the audit
saw), time one count() per interpreted-node query at
$SPARK_GRAFT_SF_DIR (default sf0.1), rank by time.  One run per query
— this is a RANKING, not a budget: the question is which queries are
worth a codegen look, and rank stability only needs ~2x separation.

Usage: python tools/wscg_rank.py [--top N]     (~10 min; JSON lines)
Record the ranked table + the chosen/accidental call in SCALE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def interpreted_rows() -> list[dict]:
    rows = []
    for line in Path(_REPO, "WSCG.md").read_text().splitlines():
        m = re.match(
            r"\| (\w+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \|", line
        )
        if not m:
            continue
        q = m.group(1)
        pt, pi, fi, lam = (int(x) for x in m.groups()[1:])
        if pi + fi > 0 or lam > 0:
            rows.append(
                {
                    "query": q,
                    "proj_interp": pi,
                    "filt_interp": fi,
                    "lambdas": lam,
                }
            )
    return rows


def main() -> None:
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    top = 0
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])

    rows = interpreted_rows()
    spark = get_spark(app_name="wscg_rank", shuffle_partitions=32)
    spark.range(1).count()
    for r in rows:
        name = r["query"]
        if name not in REGISTRY:
            r["sec"] = None
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            REGISTRY[name].fn(spark, SF_DIR).count()
            r["sec"] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # pragma: no cover - diagnostic path
            r["sec"] = None
            r["err"] = str(e)[:120]
        print(json.dumps(r), file=sys.stderr)
    ranked = sorted(
        (r for r in rows if r.get("sec") is not None),
        key=lambda r: -r["sec"],
    )
    if top:
        ranked = ranked[:top]
    print(
        json.dumps(
            {
                "wscg_rank": True,
                "sf_dir": SF_DIR,
                "n_interpreted": len(rows),
                "ranked": ranked,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
