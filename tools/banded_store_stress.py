#!/usr/bin/env python
"""Measure the stored-index claim for the MinHash band store (r10 —
the `emb_ivm_stress.py` methodology applied to the second banded
family, closing the measurement asymmetry noted in the r11 leads:
emb got a stress row when its store landed; minhash's store landed
post-battery with pytest-only gates).

Times, at $SPARK_GRAFT_SF_DIR (default sf0.1), median of R runs:

  (a) full recompute       — `dedup_minhash_lsh` (the base term)
  (b) in-plan IVM identity — `dedup_minhash_incremental`
  (c) stored advance       — `minhash_index_advance` on the same
      quantile-cut batch, state pre-committed (includes the commit's
      cumulative index rewrite)
  (d) probe-only           — the daily QUERY cost if the store were
      partition-appended (batch sketch + band probe + verify)

Usage: python tools/banded_store_stress.py   (~3 min; one JSON line)
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
        minhash_index_advance,
        minhash_index_init,
        read_minhash_state,
    )
    from taipei_bi_etl_spark.queries.dedup import (
        _doc_shingle_hashes,
        dedup_minhash_incremental,
        dedup_minhash_lsh,
        minhash_band_index,
        minhash_pairs_from_index,
    )
    from taipei_bi_etl_spark.queries.incremental import quantile_cut_split
    from taipei_bi_etl_spark.session import get_spark

    spark = get_spark(
        app_name="banded_store_stress", shuffle_partitions=32
    )

    def timed(fn) -> tuple[float, int]:
        times, rows = [], 0
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn().count()
            times.append(time.time() - t0)
        return statistics.median(times), rows

    full_sec, full_rows = timed(lambda: dedup_minhash_lsh(spark, SF_DIR))
    inplan_sec, inplan_rows = timed(
        lambda: dedup_minhash_incremental(spark, SF_DIR)
    )

    docs_sh = _doc_shingle_hashes(spark, SF_DIR)
    hist, new = quantile_cut_split(docs_sh, "doc_id")
    batch_dir = tempfile.mkdtemp(prefix="mh_batch_")
    new.write.mode("overwrite").parquet(f"{batch_dir}/batch")
    state_root = tempfile.mkdtemp(prefix="mh_ivm_state_")
    t0 = time.time()
    minhash_index_init(spark, hist, f"{state_root}/r0")
    init_sec = time.time() - t0

    adv_times, adv_rows = [], 0
    for r in range(RUNS):
        spark.catalog.clearCache()
        sd = f"{state_root}/r{r + 1}"
        shutil.copytree(f"{state_root}/r0", sd)
        batch = spark.read.parquet(f"{batch_dir}/batch")
        t0 = time.time()
        pairs, _v = minhash_index_advance(spark, batch, sd)
        adv_rows = pairs.count()
        adv_times.append(time.time() - t0)
    adv_sec = statistics.median(adv_times)

    probe_times = []
    for _ in range(RUNS):
        spark.catalog.clearCache()
        batch = spark.read.parquet(f"{batch_dir}/batch")
        t0 = time.time()
        index, _wm, _n, _v = read_minhash_state(spark, f"{state_root}/r0")
        nb = minhash_band_index(batch)
        minhash_pairs_from_index(
            nb, index.unionByName(nb), normalized=True
        ).count()
        probe_times.append(time.time() - t0)
    probe_sec = statistics.median(probe_times)

    shutil.rmtree(state_root, ignore_errors=True)
    shutil.rmtree(batch_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "banded_store_stress": "minhash",
                "sf_dir": SF_DIR,
                "runs": RUNS,
                "full_recompute_sec": round(full_sec, 2),
                "inplan_identity_sec": round(inplan_sec, 2),
                "store_init_sec": round(init_sec, 2),
                "store_advance_sec": round(adv_sec, 2),
                "probe_only_sec": round(probe_sec, 2),
                "full_rows": full_rows,
                "inplan_rows": inplan_rows,
                "advance_rows": adv_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
