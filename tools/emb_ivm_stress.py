#!/usr/bin/env python
"""Measure the stored-index claim for embedding LSH dedup (r10,
VERDICT r09 #1): the registered `dedup_embedding_incremental` is the
PROOF shape — its in-plan identity re-derives yesterday's hist×hist
term every run (the most expensive registry entry at sf0.1).  The
deployment shape (`ivm_store.emb_index_advance`) reads yesterday's
band index + vectors from a versioned parquet store, so the daily cost
should be ∝ |batch| signatures + collided buckets.

Times, at $SPARK_GRAFT_SF_DIR (default sf0.1), median of R runs:

  (a) full recompute        — `dedup_embedding_lsh` (the base term)
  (b) in-plan IVM identity  — `dedup_embedding_incremental`
  (c) stored-index advance  — `emb_index_advance` on the same batch
      the in-plan form simulates (quantile cut), state pre-committed

plus the one-off init cost.  (c) ≪ (b) is the claim; (b) ≳ (a) is
expected (the identity computes BOTH terms).

Usage: python tools/emb_ivm_stress.py   (~2 min; one JSON line)
Record the summary in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def main() -> None:
    from taipei_bi_etl_spark.ivm_store import (
        emb_index_advance,
        emb_index_init,
    )
    from taipei_bi_etl_spark.queries.incremental import quantile_cut_split
    from taipei_bi_etl_spark.queries.similarity import (
        _corpus_with_norm,
        dedup_embedding_incremental,
        dedup_embedding_lsh,
    )
    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(app_name="emb_ivm_stress", shuffle_partitions=32)

    def timed(fn) -> tuple[float, int]:
        times, rows = [], 0
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn().count()
            times.append(time.time() - t0)
        return statistics.median(times), rows

    full_sec, full_rows = timed(lambda: dedup_embedding_lsh(spark, SF_DIR))
    inplan_sec, inplan_rows = timed(
        lambda: dedup_embedding_incremental(spark, SF_DIR)
    )

    corpus = _corpus_with_norm(spark, SF_DIR).select(
        "vec_id", "emb", "norm"
    )
    hist, new = quantile_cut_split(corpus, "vec_id")
    # materialize the SAME batch the in-plan form simulates, so the
    # advance cannot cheat by re-reading a cached split
    batch_dir = tempfile.mkdtemp(prefix="emb_batch_")
    new.write.mode("overwrite").parquet(f"{batch_dir}/batch")

    state_root = tempfile.mkdtemp(prefix="emb_ivm_state_")
    t0 = time.time()
    emb_index_init(spark, hist, f"{state_root}/r0")
    init_sec = time.time() - t0

    adv_times, adv_rows = [], 0
    for r in range(RUNS):
        spark.catalog.clearCache()
        sd = f"{state_root}/r{r + 1}"
        shutil.copytree(f"{state_root}/r0", sd)
        batch = spark.read.parquet(f"{batch_dir}/batch")
        t0 = time.time()
        pairs, _v = emb_index_advance(spark, batch, sd)
        adv_rows = pairs.count()
        adv_times.append(time.time() - t0)
    adv_sec = statistics.median(adv_times)

    shutil.rmtree(state_root, ignore_errors=True)
    shutil.rmtree(batch_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "emb_ivm_stress": True,
                "sf_dir": SF_DIR,
                "runs": RUNS,
                "full_recompute_sec": round(full_sec, 2),
                "inplan_identity_sec": round(inplan_sec, 2),
                "store_init_sec": round(init_sec, 2),
                "store_advance_sec": round(adv_sec, 2),
                "full_rows": full_rows,
                "inplan_rows": inplan_rows,
                "advance_rows": adv_rows,
                "advance_vs_inplan": round(adv_sec / inplan_sec, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
