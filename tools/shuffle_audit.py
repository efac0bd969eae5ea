#!/usr/bin/env python
"""Generate SHUFFLES.md: a per-query physical-plan audit (Exchange /
Broadcast / scan counts, TakeOrderedAndProject usage) over the ENTIRE
query registry at sf0.01 — the machine-checked companion to SCALE.md's
hand-written shuffle ledger.

Counts come from the formatted explain of each query's plan:
  - exchanges: `Exchange hashpartitioning/rangepartitioning/...`
    nodes (ReusedExchange excluded — a reuse is the optimization)
  - broadcasts: BroadcastHashJoin / BroadcastNestedLoopJoin nodes
  - scans: parquet file scans (same table twice = a missed reuse)
  - heap_topk: TakeOrderedAndProject (global sort avoided)

Queries that execute work during construction (streaming runs,
sketch collects, iterative loops) still produce a final DataFrame
whose plan is audited the same way.

Usage: python tools/shuffle_audit.py            (~10 min)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def audit(plan: str) -> dict:
    body = re.sub(r"^\(\d+\) ReusedExchange.*$", "", plan, flags=re.M)
    return {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", body, re.M)),
        "broadcasts": len(
            re.findall(r"^\(\d+\) Broadcast(?:Hash|NestedLoop)Join", body, re.M)
        ),
        "scans": len(re.findall(r"^\(\d+\) Scan parquet", body, re.M)),
        "heap_topk": "TakeOrderedAndProject" in plan,
    }


def main() -> None:
    """``python tools/shuffle_audit.py [--only a,b,c]`` — with --only,
    audits just the named queries and SPLICES their rows into the
    existing SHUFFLES.md (alphabetical position preserved) instead of
    regenerating all ~220 plans (~20 min)."""
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    only = None
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        arg = sys.argv[i + 1] if i + 1 < len(sys.argv) else ""
        only = set(arg.split("=", 1)[-1].split(","))

    spark = get_spark(app_name="shuffle_audit", shuffle_partitions=8)

    if only:
        md = Path(_REPO, "SHUFFLES.md")
        lines = md.read_text().splitlines()
        for name in sorted(only):
            spark.catalog.clearCache()
            a = audit(_plan(REGISTRY[name].fn(spark, SF_DIR)))
            row = (
                f"| {name} | {a['exchanges']} | {a['broadcasts']} "
                f"| {a['scans']} | {'✓' if a['heap_topk'] else ''} |"
            )
            lines = [
                ln for ln in lines if not ln.startswith(f"| {name} ")
            ]
            at = next(
                (
                    j
                    for j, ln in enumerate(lines)
                    if ln.startswith("| ")
                    and not ln.startswith("|---")
                    and ln.split("|")[1].strip() > name
                    and ln.split("|")[1].strip() != "query"
                ),
                len(lines),
            )
            lines.insert(at, row)
        md.write_text("\n".join(lines) + "\n")
        print(f"SHUFFLES.md updated ({len(only)} rows spliced)")
        spark.stop()
        return

    rows = []
    for name in sorted(REGISTRY):
        try:
            spark.catalog.clearCache()  # r03 ADVICE #3: no cache pile-up
            df = REGISTRY[name].fn(spark, SF_DIR)
            a = audit(_plan(df))
            rows.append((name, a))
        except Exception as e:  # pragma: no cover - audit robustness
            rows.append((name, {"error": str(e)[:80]}))

    out = [
        "# SHUFFLES — auto-generated physical-plan audit",
        "",
        "Per-query Exchange / broadcast / scan counts at sf0.01 "
        "(`python tools/shuffle_audit.py`).  ReusedExchange excluded from "
        "the count — reuse is the win.  Read together with SCALE.md's "
        "narrative ledger; a query whose exchange count regresses shows "
        "up as a diff here.",
        "",
        "Note on the deep mango parity snapshots "
        "(`mango_feature_roi_snapshot`, `mango_channel_roi_snapshot`, "
        "`mango_active_user_snapshot`, …): their exchange counts are "
        "large because each snapshot replicates the WHOLE 18-table DAG "
        "as one query for cross-engine hashing; the production path "
        "(`plans/mango_dag.py`) materializes the DAG table-by-table, so "
        "no single production job carries that many exchanges.",
        "",
        "| query | exchanges | broadcast joins | parquet scans | heap top-k |",
        "|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "error" in a:
            out.append(f"| {name} | — | — | — | {a['error']} |")
        else:
            out.append(
                f"| {name} | {a['exchanges']} | {a['broadcasts']} "
                f"| {a['scans']} | {'✓' if a['heap_topk'] else ''} |"
            )
    Path(_REPO, "SHUFFLES.md").write_text("\n".join(out) + "\n")
    n_err = sum(1 for _, a in rows if "error" in a)
    print(f"SHUFFLES.md written ({len(rows)} queries, {n_err} errors)")
    spark.stop()


if __name__ == "__main__":
    main()
