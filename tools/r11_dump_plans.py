#!/usr/bin/env python
"""Dump `.explain("formatted")` for queries into
plans/r11/<query>_<tag>.txt (tag = before|after), the r11
optimization-round evidence files.

Usage: python tools/r11_dump_plans.py before|after [query ...]
(default: the whole bench.HEADLINE set; sf0.01 so construction probes
stay cheap — plan SHAPE is scale-free).
"""
from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from taipei_bi_etl_spark.queries import REGISTRY, release_tracked
    from taipei_bi_etl_spark.session import get_spark

    names = sys.argv[2:] or HEADLINE
    out_dir = Path(_REPO) / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="r11_plans")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        df = spec.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    release_tracked()
    spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
