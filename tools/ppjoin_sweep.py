#!/usr/bin/env python
"""PPJoin vs full-index vs prefix-filter routing measurement (r10).

`dedup_jaccard_ppjoin` measured 2.2x over the plain prefix filter at
sf0.1 (SCALE.md r10) and appeared to undercut even the FULL inverted
index's benign-corpus time — which, if it holds interleaved in one
session, changes `route_jaccard`'s decision: the benign arm would
become PPJoin(hash) and the heavy arm PPJoin(df).  This tool makes
that call a NUMBER: the same skewed-df battery corpus as
`prefix_crossover.py` (benign K=400 / heavy K=20 cells), five arms
interleaved in one session, outputs asserted pair-identical per cell,
plus an optional real-corpus cell (`--real <sf_dir>`).

Usage: python tools/ppjoin_sweep.py [n_docs] [K grid csv] [--real DIR]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from taipei_bi_etl_spark.queries.pipeline import (  # noqa: E402
    _tokens,
    jaccard_ppjoin_pairs,
    jaccard_prefix_filter_pairs,
    ngram_jaccard_pairs,
)
from taipei_bi_etl_spark.session import get_spark  # noqa: E402
from tools.prefix_crossover import skewed_df_docs  # noqa: E402

_ARMS = (
    ("full", lambda toks, sh: ngram_jaccard_pairs(toks)),
    ("prefix", lambda toks, sh: jaccard_prefix_filter_pairs(sh)),
    (
        "prefix_df",
        lambda toks, sh: jaccard_prefix_filter_pairs(sh, canonical="df"),
    ),
    ("ppjoin", lambda toks, sh: jaccard_ppjoin_pairs(sh)),
    (
        "ppjoin_df",
        lambda toks, sh: jaccard_ppjoin_pairs(sh, canonical="df"),
    ),
)


def _measure_cell(spark, toks, docs_sh, row: dict, passes: int = 3) -> dict:
    for _ in range(passes):
        for name, fn in _ARMS:
            spark.catalog.clearCache()
            toks.persist().count()
            t0 = time.perf_counter()
            cnt = fn(toks, docs_sh).count()
            row.setdefault(name, []).append(
                round(time.perf_counter() - t0, 2)
            )
            row[f"{name}_pairs"] = cnt
    pair_counts = {row[f"{n}_pairs"] for n, _ in _ARMS}
    assert len(pair_counts) == 1, f"arm outputs diverge: {row}"
    # true PAIR identity, not just count identity (r10 review): every
    # arm must emit exactly the full index's rows — an arm returning
    # the right number of wrong pairs would otherwise poison the
    # routing decision this tool exists to justify
    fullf = _ARMS[0][1](toks, docs_sh)
    for name, fn in _ARMS[1:]:
        armf = fn(toks, docs_sh)
        assert fullf.exceptAll(armf).count() == 0, f"{name}: missing pairs"
        assert armf.exceptAll(fullf).count() == 0, f"{name}: extra pairs"
    for name, _ in _ARMS:
        row[name] = sorted(row[name])[len(row[name]) // 2]
    for name, _ in _ARMS[1:]:
        row[f"{name}_speedup"] = round(row["full"] / row[name], 2)
    return row


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--real"]
    real_dir = None
    if "--real" in sys.argv:
        i = sys.argv.index("--real")
        real_dir = sys.argv[i + 1]
        args = [a for a in sys.argv[1:] if a not in ("--real", real_dir)]
    n = int(args[0]) if args else 20_000
    grid = [int(x) for x in args[1].split(",")] if len(args) > 1 else [400, 20]

    spark = get_spark(app_name="ppjoin_sweep")
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array

    cells = []
    for k in grid:
        toks = skewed_df_docs(spark, n, k).persist()
        toks.count()
        docs_sh = toks.select(
            "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
        ).filter(F.size("sh") > 0)
        row = _measure_cell(
            spark, toks, docs_sh, {"cell": f"K={k}", "max_df": n // k}
        )
        cells.append(row)
        print(json.dumps(row), file=sys.stderr)
        toks.unpersist()

    if real_dir:
        from taipei_bi_etl_spark.io import read_table

        d = read_table(spark, real_dir, "documents")
        toks = d.select("doc_id", _tokens().alias("tok")).persist()
        toks.count()
        docs_sh = toks.select(
            "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
        ).filter(F.size("sh") > 0)
        row = _measure_cell(spark, toks, docs_sh, {"cell": f"real:{real_dir}"})
        cells.append(row)
        print(json.dumps(row), file=sys.stderr)
        toks.unpersist()

    print(json.dumps({"n_docs": n, "cells": cells}))
    spark.stop()


if __name__ == "__main__":
    main()
