#!/usr/bin/env python
"""sf0.1 scale sweep: re-run the WHOLE oracle registry at 10× the
driver's gate scale (verify-skill optional step).  Catches the latent
classes the sf0.01 gate can't: int64 overflow in volume-growing sums,
float-ROUND last-digit flips, empty-aggregation NULL paths.

Hardening (learned r02, recorded in the verify skill): ONE DuckDB
connection PER QUERY with an explicit memory limit + temp directory —
the deep mango snapshot oracles exhaust a shared in-process connection
and cascade false-reds; stderr captured, caches cleared between
queries.

Usage: python tools/scale_sweep.py [--only a,b,c]
       (full registry ~25-40 min; prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    import duckdb

    from taipei_bi_etl_spark.queries import REGISTRY
    from taipei_bi_etl_spark.session import get_spark
    from tests.oracle_utils import compare

    only = None
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        arg = sys.argv[i + 1] if i + 1 < len(sys.argv) else ""
        only = set(arg.split("=", 1)[-1].split(","))
    names = sorted(n for n in REGISTRY if only is None or n in only)

    spark = get_spark(
        app_name="scale_sweep", shuffle_partitions=32,
    )
    tmp = tempfile.mkdtemp(prefix="sweep_duck_")
    fails: list[tuple[str, str]] = []
    rows_only = 0
    t0 = time.time()
    for name in names:
        spark.catalog.clearCache()
        spec = REGISTRY[name]
        try:
            if spec.oracle is None:
                assert spec.fn(spark, SF_DIR).count() >= 0
                rows_only += 1
                continue
            con = duckdb.connect()
            con.execute(f"SET memory_limit='40GB'")
            con.execute(f"SET threads=8")
            con.execute(f"SET temp_directory='{tmp}'")
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')"
                )
            try:
                compare(spec.fn(spark, SF_DIR), con, spec.oracle)
            finally:
                con.close()
        except Exception as e:  # noqa: BLE001 - sweep robustness
            fails.append((name, str(e)[:200]))
        print(f". {name}", file=sys.stderr, flush=True)
    out = {
        "sweep_sf": 0.1,
        "queries": len(names),
        "rows_only": rows_only,
        "fails": fails,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
