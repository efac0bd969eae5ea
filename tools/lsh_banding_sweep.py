#!/usr/bin/env python
"""MinHash-LSH banding S-curve: measured recall vs the analytic
prediction, per (b, r) operating point (r10).

`dedup_minhash_lsh` pins 64 permutations banded 16×4.  This tool makes
that choice a MEASURED operating point: for each r ∈ {2, 4, 8, 16}
(b = 64/r) it builds the banded candidate set over the real corpus,
counts how many EXACT Jaccard-≥-t pairs (ground truth =
`ngram_jaccard_pairs`, the all-pairs inverted index) the buckets
recover, and compares against the textbook detection probability
1 − (1 − J^r)^b evaluated at each true pair's ACTUAL Jaccard (not a
single nominal s).  Matching measured-vs-predicted validates both the
signature implementation (universal-hash permutations actually behave
like permutations) and the 16×4 choice (predicted recall ≈ 1 at the
corpus's J ≥ 0.6 pair mass, with the candidate volume column showing
what a wider band (r=2) would pay for its extra recall margin).

Usage: python tools/lsh_banding_sweep.py [sf_dir]   (one JSON line)
Record the table in SCALE.md.
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

from taipei_bi_etl_spark.io import read_table  # noqa: E402
from taipei_bi_etl_spark.queries.dedup import (  # noqa: E402
    N_PERM,
    _signatures,
    shingle_hash_array,
)
from taipei_bi_etl_spark.queries.pipeline import (  # noqa: E402
    _tokens,
    ngram_jaccard_pairs,
)
from taipei_bi_etl_spark.session import get_spark  # noqa: E402


def _banded(sig, r: int):
    """Band the 64-column signature into 64/r bands of r rows — the
    same xxhash64 band-key scheme as `dedup._band_structs`, with r as
    a parameter."""
    b = N_PERM // r
    structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"m{i * r + j}") for j in range(r)]
                ).alias("band_hash"),
            )
            for i in range(b)
        ]
    )
    return sig.select("doc_id", F.explode(structs).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="lsh_banding_sweep", shuffle_partitions=32)

    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens().alias("tok"))
    docs_sh = toks.select(
        "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
    ).filter(F.size("sh") > 0)

    truth = ngram_jaccard_pairs(toks).persist()
    n_truth = truth.count()
    sig = _signatures(docs_sh).persist()
    sig.count()

    cells = []
    for r in (2, 4, 8, 16):
        b = N_PERM // r
        t0 = time.time()
        banded = _banded(sig, r)
        a, bb = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(bb, ["band_id", "band_hash"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .persist()
        )
        n_cand = cand.count()
        found = truth.join(cand, ["doc_a", "doc_b"]).count()
        elapsed = time.time() - t0
        pred = truth.agg(
            F.avg(
                1
                - F.pow(
                    1 - F.pow(F.col("jaccard"), F.lit(r)), F.lit(b)
                )
            ).alias("p")
        ).first()["p"]
        cand.unpersist()
        cells.append(
            {
                "bands": b,
                "rows": r,
                "candidates": n_cand,
                "truth_found": found,
                "recall": round(found / n_truth, 4) if n_truth else None,
                "predicted_recall": (
                    round(float(pred), 4) if pred is not None else None
                ),
                "sec": round(elapsed, 2),
            }
        )
        print(json.dumps(cells[-1]), file=sys.stderr)

    print(
        json.dumps(
            {
                "lsh_banding_sweep": sf_dir,
                # truth = ngram_jaccard_pairs default (0.6) — HARDER than
                # the registered verify threshold (dedup.JACCARD_T = 0.8):
                # the sweep must also recover the weak 0.6-0.8 pairs
                "truth_jaccard_t": 0.6,
                "n_truth_pairs": n_truth,
                "cells": cells,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
