#!/usr/bin/env python
"""Prefix-filter vs full-inverted-index crossover (r08, VERDICT r07 #6).

`dedup_jaccard_prefix_filter` measured SLOWER than the full index on
the benign bounded-df corpus (max df 25) and was routed to
"heavy-tailed df" by prose.  This tool makes the routing a NUMBER: a
synthetic corpus of 8-token boilerplate blocks (6 interior shingles of
df = n/K each) appended to otherwise-unique 25-token docs, swept over
K — so max df runs from bounded to catastrophic while docs/postings
stay constant — timing BOTH strategies on the same frame (interleaved,
same session).  Planted exact near-dup pairs keep the answer
non-vacuous, and both outputs are asserted identical each cell.

Full-index join volume ∝ Σ df²; hash-ordered prefixes admit each
posting with p ≈ (1-t), so candidate volume falls ≈ (1-t)² = 0.16x —
the crossover is where 0.16·Σdf² wins over the prefix's fixed
overhead (sort + full-array verify join).

Usage: python tools/prefix_crossover.py [n_docs] [K grid csv]
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
    jaccard_prefix_filter_pairs,
    ngram_jaccard_pairs,
)
from taipei_bi_etl_spark.session import get_spark  # noqa: E402


def skewed_df_docs(spark, n: int, k: int):
    """(doc_id, tok) frame: 25 unique tokens per doc + one of K
    8-token boilerplate blocks (df of its 6 interior shingles = n/K).
    Docs i and i+n (i < n/100) are planted exact duplicates."""
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(24)),
        lambda j: F.concat_ws("_", F.lit("u"), F.col("base"), j),
    )
    bp = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.concat_ws("_", F.lit("bp"), F.col("base") % k, j),
    )
    return (
        spark.range(n + n // 100)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") >= n, F.col("id") - n)
            .otherwise(F.col("id"))
            .alias("base"),
        )
        .select("doc_id", F.concat(uniq, bp).alias("tok"))
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    grid = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [2000, 200, 50, 20, 10]
    )
    spark = get_spark(app_name="prefix_crossover")
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array

    cells = []
    for k in grid:
        toks = skewed_df_docs(spark, n, k).persist()
        toks.count()
        docs_sh = toks.select(
            "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
        ).filter(F.size("sh") > 0)
        row = {"k": k, "max_df": n // k}
        # interleaved passes: full, prefix, full, prefix — median of 2
        for _ in range(2):
            for name, fn in (
                ("full", lambda: ngram_jaccard_pairs(toks)),
                ("prefix", lambda: jaccard_prefix_filter_pairs(docs_sh)),
                ("prefix_df", lambda: jaccard_prefix_filter_pairs(
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
        assert row["full_pairs"] == row["prefix_pairs"] == row["prefix_df_pairs"]
        for k2 in ("full", "prefix", "prefix_df"):
            row[k2] = sorted(row[k2])[0]
        row["prefix_speedup"] = round(row["full"] / row["prefix"], 2)
        row["prefix_df_speedup"] = round(row["full"] / row["prefix_df"], 2)
        cells.append(row)
        print(json.dumps(row), file=sys.stderr)
        toks.unpersist()
    print(json.dumps({"n_docs": n, "cells": cells}))
    spark.stop()


if __name__ == "__main__":
    main()
