"""Third-opinion test for SemDeDup (r10): the full recipe —
integer quantization, 2 unrolled integer Lloyd iterations, argmin
assignment with ties to the smaller cell, within-cluster pairwise
cosine, drop-the-higher-centroid-sim rule — recomputed from first
principles in pure numpy over the real sf0.001 parquet and compared
EXACTLY to the registered query (the test_curation2 "independent
author" pattern).  The DuckDB oracle is the second opinion; this is
the third, with no SQL and no Spark in the reference path."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR

DKM_K = 8
DKM_ITERS = 2
PICO = 1_000_000
SEMDEDUP_T = 0.3


def _numpy_semdedup(pdf: pd.DataFrame):
    valid = pdf[
        pdf["embedding"].map(
            lambda e: e is not None and len(e) == 64
        )
    ].sort_values("vec_id")
    ids = valid["vec_id"].to_numpy()
    q = np.stack(
        [
            np.floor(np.asarray(e, dtype=np.float64) * PICO).astype(
                np.int64
            )
            for e in valid["embedding"]
        ]
    )
    cents = q[: min(DKM_K, len(q))].copy()
    for _ in range(DKM_ITERS):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)  # argmin takes the first (smallest id)
        new = cents.copy()
        for j in range(len(cents)):
            m = cell == j
            if m.any():
                new[j] = np.floor(
                    q[m].sum(axis=0, dtype=np.int64) / m.sum()
                ).astype(np.int64)
        cents = new
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cell = d.argmin(axis=1)
    sd = (q * q).sum(axis=1, dtype=np.int64)
    keepmask = sd > 0
    ids, q, cell, sd = ids[keepmask], q[keepmask], cell[keepmask], sd[keepmask]
    cc = (cents * cents).sum(axis=1, dtype=np.int64)
    csim = np.array(
        [
            float(np.dot(q[i], cents[cell[i]]))
            / (math.sqrt(float(sd[i])) * math.sqrt(float(cc[cell[i]])))
            for i in range(len(ids))
        ]
    )
    dropped = set()
    order = np.argsort(ids)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            i, j = order[x], order[y]
            if cell[i] != cell[j]:
                continue
            psim = float(np.dot(q[i], q[j])) / (
                math.sqrt(float(sd[i])) * math.sqrt(float(sd[j]))
            )
            if psim >= SEMDEDUP_T:
                if csim[i] > csim[j] or (
                    csim[i] == csim[j] and ids[i] > ids[j]
                ):
                    dropped.add(int(ids[i]))
                else:
                    dropped.add(int(ids[j]))
    return {
        int(ids[i]): (
            int(cell[i]),
            round(csim[i], 6),
            int(ids[i]) in dropped,
        )
        for i in range(len(ids))
    }


def test_semdedup_matches_numpy_replay(spark):
    from taipei_bi_etl_spark.queries import REGISTRY

    want = _numpy_semdedup(
        pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    )
    got = {
        int(r.vec_id): (int(r.cell), r.centroid_sim, bool(r.dropped))
        for r in REGISTRY["dedup_semantic_centroid"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert len(got) == len(want) > 0
    n_drop = sum(1 for v in got.values() if v[2])
    assert 0 < n_drop < len(got)  # non-vacuous both ways
    assert got == want
