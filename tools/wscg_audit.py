#!/usr/bin/env python
"""Generate WSCG.md: a per-query whole-stage-codegen audit over the
EXECUTED plan at sf0.01 — the machine-checked generalization of the r07
nolambda lesson (SCALE.md "the blocker was a LAMBDA, not code size").

One CodegenFallback expression (any higher-order function: transform /
filter / aggregate / zip_with / exists / forall, or array_compact which
rewrites to a filter lambda) flips its whole Project/Filter out of
whole-stage codegen regardless of size.  This audit makes those
exclusions visible per query so a regression (a new lambda sneaking
into a hot projection) shows up as a diff, and so deliberate lambdas
(the LSH zip_with+aggregate dot, measured 2.15x FASTER than the
unrolled form — SCALE.md negative) are recorded as accepted, not
invisible.

Method: run each registered query to completion (noop-equivalent
foreachPartition drain) at sf0.01, then read
`queryExecution().executedPlan().toString()` — the simple-mode tree in
which codegen'd operators carry a `*(id)` star.  Counted per query:

  - proj_total / proj_interp: Project nodes, and those WITHOUT a star
    (interpreted: evaluated expression-tree-at-a-time)
  - filt_interp: unstarred Filter nodes
  - lambdas: `lambdafunction(` occurrences in the executed plan —
    the usual exclusion cause (CodegenFallback HOFs)

Interpretation guide (NOT a gate): proj_interp > 0 with lambdas > 0 is
the nolambda-lesson shape — worth an interleaved A/B if the query is
hot; proj_interp > 0 with lambdas == 0 is usually generated-code-size
fallback or a CodegenFallback scalar (check the plan); media/mapInPandas
queries are expected to show interpreted stages (Python boundary).

Usage: python tools/wscg_audit.py [--only a,b,c]   (~15 min full)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.01"

_HEADER = [
    "# WSCG — auto-generated whole-stage-codegen audit",
    "",
    "Per-query interpreted-operator counts over the EXECUTED plan at "
    "sf0.01 (`python tools/wscg_audit.py`).  Companion to the r07 "
    "nolambda lesson in SCALE.md: one higher-order function "
    "(CodegenFallback) excludes its whole Project from codegen.  "
    "`proj_interp`/`filt_interp` = Project/Filter nodes without a "
    "`*(id)` star in the executed plan; `lambdas` = lambdafunction "
    "occurrences (the usual cause).  Non-zero rows are EXPECTED where "
    "a lambda is the measured-right tool (LSH zip_with dot), where "
    "Python/Arrow boundaries exist (media decode), or where the "
    "interpreted projection is a documented negative (mango rule-set "
    "size).  The audit exists so CHANGES show up as diffs, and so the "
    "hot-query exclusions are chosen, not accidental.",
    "",
    "| query | proj_total | proj_interp | filt_interp | lambdas |",
    "|---|---|---|---|---|",
]


def executed_plan(df) -> str:
    # Drain the query so AQE finalizes and codegen ids are assigned.
    df.foreachPartition(lambda it: None)
    return df._jdf.queryExecution().executedPlan().toString()


def audit(plan: str) -> dict:
    # An executed AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections; the initial one never carries
    # codegen stars and would double-count every node as interpreted.
    plan = re.sub(
        r"^\s*\+?-?\s*== Initial Plan ==.*?(?=^\S|\Z)",
        "",
        plan,
        flags=re.M | re.S,
    )
    # Node lines look like "+- *(3) Project [...]" (codegen'd) or
    # "+- Project [...]" (interpreted).  Subqueries print their own
    # trees inline; counting them too is intended.
    def count(node: str, starred: bool) -> int:
        star = r"\*\(\d+\) " if starred else ""
        return len(
            re.findall(rf"^[\s+:-]*{star}{node} ", plan, re.M)
        )

    proj_star = count("Project", True)
    proj_plain = count("Project", False)
    filt_plain = count("Filter", False)
    return {
        "proj_total": proj_star + proj_plain,
        "proj_interp": proj_plain,
        "filt_interp": filt_plain,
        "lambdas": plan.count("lambdafunction("),
    }


def _row(name: str, a: dict) -> str:
    if "error" in a:
        return f"| {name} | err | err | err | {a['error']} |"
    return (
        f"| {name} | {a['proj_total']} | {a['proj_interp']} "
        f"| {a['filt_interp']} | {a['lambdas']} |"
    )


def main() -> None:
    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark

    only = None
    for i, tok in enumerate(sys.argv):
        if tok == "--only":
            if i + 1 >= len(sys.argv):
                sys.exit("usage: wscg_audit.py [--only a,b,c]")
            only = set(sys.argv[i + 1].split(","))
        elif tok.startswith("--only="):
            only = set(tok.split("=", 1)[1].split(","))
    if only is not None:
        from taipei_bi_etl_spark.queries import REGISTRY as _r

        unknown = sorted(only - set(_r))
        if unknown or not only:
            sys.exit(f"--only: not registered: {unknown or '(empty)'}")

    spark = get_spark(app_name="wscg_audit", shuffle_partitions=8)
    # AQE off for the audit: codegen exclusion is AQE-independent, and a
    # non-adaptive executed plan prints as ONE starred tree (an executed
    # AdaptiveSparkPlan would print unstarred Initial Plan sections that
    # the regex would have to strip, including nested subquery copies).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    md = Path(_REPO, "WSCG.md")

    if only:
        lines = (
            md.read_text().splitlines() if md.exists() else list(_HEADER)
        )
        for name in sorted(only):
            spark.catalog.clearCache()
            a = audit(executed_plan(REGISTRY[name].fn(spark, SF_DIR)))
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
            lines.insert(at, _row(name, a))
        md.write_text("\n".join(lines) + "\n")
        print(f"WSCG.md updated ({len(only)} rows spliced)")
        spark.stop()
        return

    rows = []
    for name in sorted(REGISTRY):
        try:
            spark.catalog.clearCache()
            df = REGISTRY[name].fn(spark, SF_DIR)
            rows.append((name, audit(executed_plan(df))))
        except Exception as e:  # pragma: no cover - audit robustness
            rows.append((name, {"error": str(e)[:80]}))

    out = list(_HEADER)
    for name, a in rows:
        out.append(_row(name, a))
    md.write_text("\n".join(out) + "\n")
    n_flag = sum(
        1 for _, a in rows if a.get("proj_interp", 0) or a.get("filt_interp", 0)
    )
    print(f"WSCG.md written: {len(rows)} queries, {n_flag} with interpreted nodes")
    spark.stop()


if __name__ == "__main__":
    main()
