#!/usr/bin/env python
"""Containment prefix-filter crossover: hash order vs df-ascending vs
full index (r10 — the `prefix_crossover.py` sweep re-run for the
asymmetric containment scheme, so `route_containment`'s dispatch is a
NUMBER, not an analogy to the Jaccard result).

Same synthetic corpus (`prefix_crossover.skewed_df_docs`): 8-token
boilerplate blocks (6 interior shingles of df = n/K each) appended to
otherwise-unique 25-token docs, swept over K so max df runs from
bounded to catastrophic while docs/postings stay constant.  Three
strategies timed interleaved on the same frame, outputs asserted
identical each cell:

  full      — inverted-index self-join + containment scoring
              (`dedup_ngram_containment` machinery)
  hash      — asymmetric prefix probe vs full index, hash order
  df        — same, df-ascending canonical order

At t = 0.9 the prefix is ~0.1·n of each doc, so the hash form starts
~10x ahead of its Jaccard cousin (whose prefix is 0.4·n at t = 0.6) —
the question this sweep answers is where boilerplate-in-prefix
(correlated across the df docs sharing the shingle, each prefix slot
joining the FULL index at full df) erodes that lead and df-order takes
over.

Usage: python tools/containment_crossover.py [n_docs] [K grid csv]
Record the summary in SCALE.md.
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

from taipei_bi_etl_spark.queries.curation2 import (  # noqa: E402
    CONTAIN_T,
    containment_prefix_pairs,
)
from taipei_bi_etl_spark.queries.pipeline import (  # noqa: E402
    ngram_pair_overlap,
)
from taipei_bi_etl_spark.session import get_spark  # noqa: E402
from tools.prefix_crossover import skewed_df_docs  # noqa: E402


def full_containment(toks):
    """Full-index containment pairs (the `dedup_ngram_containment`
    scoring over the shared overlap machinery)."""
    containment = F.col("inter").cast("double") / F.least("na", "nb")
    contained = (
        F.when(F.col("na") < F.col("nb"), F.col("doc_a"))
        .when(F.col("nb") < F.col("na"), F.col("doc_b"))
        .otherwise(F.least("doc_a", "doc_b"))
    )
    return (
        ngram_pair_overlap(toks)
        .filter(containment >= CONTAIN_T)
        .select(
            "doc_a",
            "doc_b",
            F.round(containment, 6).alias("containment"),
            contained.alias("contained_doc"),
        )
    )


def main() -> None:
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    grid = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [2000, 200, 50, 20, 10]
    )
    spark = get_spark(app_name="containment_crossover")
    cells = []
    for k in grid:
        toks = skewed_df_docs(spark, n, k).persist()
        toks.count()
        docs_sh = toks.select(
            "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
        ).filter(F.size("sh") > 0)
        row = {"k": k, "max_df": n // k}
        for _ in range(2):
            for name, fn in (
                ("full", lambda: full_containment(toks)),
                ("hash", lambda: containment_prefix_pairs(docs_sh)),
                ("df", lambda: containment_prefix_pairs(
                    docs_sh, canonical="df")),
            ):
                spark.catalog.clearCache()
                toks.persist().count()
                t0 = time.perf_counter()
                cnt = fn().count()
                row.setdefault(name, []).append(
                    round(time.perf_counter() - t0, 2)
                )
                row[f"{name}_pairs"] = cnt
        assert row["full_pairs"] == row["hash_pairs"] == row["df_pairs"]
        for k2 in ("full", "hash", "df"):
            row[k2] = sorted(row[k2])[0]
        row["hash_vs_full"] = round(row["full"] / row["hash"], 2)
        row["df_vs_hash"] = round(row["hash"] / row["df"], 2)
        cells.append(row)
        print(json.dumps(row), file=sys.stderr)
        toks.unpersist()
    print(json.dumps({"n_docs": n, "cells": cells}))
    spark.stop()


if __name__ == "__main__":
    main()
