#!/usr/bin/env python
"""Measure the stored-index claim for the banded-family stores (r10 —
the `emb_ivm_stress.py` methodology applied to the OTHER two banded
families, closing the measurement asymmetry noted in the r11 leads:
emb got a stress row when its store landed; minhash's and phash's
stores landed with pytest-only gates).

Times, at $SPARK_GRAFT_SF_DIR (default sf0.1), median of R runs:

  (a) full recompute       — the family's full LSH/band query
  (b) in-plan IVM identity — the registered incremental query
  (c) stored advance       — `*_index_advance` on an append-only
      batch, state pre-committed (includes the commit's cumulative
      index rewrite)
  (d) probe-only           — the daily QUERY cost if the store were
      partition-appended (batch sketch/bands + probe + verify)

Usage: python tools/banded_store_stress.py [minhash|phash|all]
       (~3 min per family; one JSON line each)
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


def _timed(spark, fn) -> tuple[float, int]:
    times, rows = [], 0
    for _ in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = fn().count()
        times.append(time.time() - t0)
    return statistics.median(times), rows


def _report(family: str, full, inplan, init_sec, adv, probe) -> None:
    print(
        json.dumps(
            {
                "banded_store_stress": family,
                "sf_dir": SF_DIR,
                "runs": RUNS,
                "full_recompute_sec": round(full[0], 2),
                "inplan_identity_sec": round(inplan[0], 2),
                "store_init_sec": round(init_sec, 2),
                "store_advance_sec": round(adv[0], 2),
                "probe_only_sec": round(probe[0], 2),
                "full_rows": full[1],
                "inplan_rows": inplan[1],
                "advance_rows": adv[1],
            }
        )
    )


def stress_minhash(spark) -> None:
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

    full = _timed(spark, lambda: dedup_minhash_lsh(spark, SF_DIR))
    inplan = _timed(spark, lambda: dedup_minhash_incremental(spark, SF_DIR))

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

    shutil.rmtree(state_root, ignore_errors=True)
    shutil.rmtree(batch_dir, ignore_errors=True)
    _report(
        "minhash",
        full,
        inplan,
        init_sec,
        (statistics.median(adv_times), adv_rows),
        (statistics.median(probe_times), 0),
    )


def stress_phash(spark) -> None:
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.ivm_store import (
        phash_index_advance,
        phash_index_init,
        read_phash_state,
    )
    from taipei_bi_etl_spark.queries.fingerprint import (
        PHASH_COPY_OFFSET,
        multimodal_phash_dedup,
        multimodal_phash_dedup_incremental,
        phash_band_index,
        phash_hashes,
        phash_media,
        phash_pairs_from_bands,
    )

    full = _timed(spark, lambda: multimodal_phash_dedup(spark, SF_DIR))
    inplan = _timed(
        spark, lambda: multimodal_phash_dedup_incremental(spark, SF_DIR)
    )

    # append-only batch = top quartile of BASE ids (the store's
    # watermark contract — same contiguous-range cut as the pytest)
    hashes = phash_hashes(phash_media(spark, SF_DIR)).persist()
    base = F.col("media_id") % PHASH_COPY_OFFSET
    cuts = sorted(
        r.b for r in hashes.select(base.alias("b")).distinct().collect()
    )
    cut = cuts[3 * len(cuts) // 4]
    hist = hashes.filter(base <= cut)
    new = hashes.filter(base > cut)
    batch_dir = tempfile.mkdtemp(prefix="ph_batch_")
    new.write.mode("overwrite").parquet(f"{batch_dir}/batch")
    state_root = tempfile.mkdtemp(prefix="ph_ivm_state_")
    t0 = time.time()
    phash_index_init(spark, hist, f"{state_root}/r0")
    init_sec = time.time() - t0

    adv_times, adv_rows = [], 0
    for r in range(RUNS):
        spark.catalog.clearCache()
        sd = f"{state_root}/r{r + 1}"
        shutil.copytree(f"{state_root}/r0", sd)
        batch = spark.read.parquet(f"{batch_dir}/batch")
        t0 = time.time()
        pairs, _v = phash_index_advance(spark, batch, sd)
        adv_rows = pairs.count()
        adv_times.append(time.time() - t0)

    probe_times = []
    for _ in range(RUNS):
        spark.catalog.clearCache()
        batch = spark.read.parquet(f"{batch_dir}/batch")
        t0 = time.time()
        index, _wm, _n, _v = read_phash_state(spark, f"{state_root}/r0")
        nb = phash_band_index(batch)
        phash_pairs_from_bands(nb, index.unionByName(nb)).count()
        probe_times.append(time.time() - t0)

    hashes.unpersist()
    shutil.rmtree(state_root, ignore_errors=True)
    shutil.rmtree(batch_dir, ignore_errors=True)
    _report(
        "phash",
        full,
        inplan,
        init_sec,
        (statistics.median(adv_times), adv_rows),
        (statistics.median(probe_times), 0),
    )


def main() -> None:
    from taipei_bi_etl_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    if which not in ("minhash", "phash", "all"):
        sys.exit("usage: banded_store_stress.py [minhash|phash|all]")
    spark = get_spark(app_name="banded_store_stress", shuffle_partitions=32)
    if which in ("minhash", "all"):
        stress_minhash(spark)
    if which in ("phash", "all"):
        stress_phash(spark)
    spark.stop()


if __name__ == "__main__":
    main()
