"""Third-opinion tests for the round-4 curation extensions: semantics
recomputed from first principles in pure Python / numpy (no Spark, no
SQL) over the real sf0.001 parquet, compared exactly — the same
"independent author" pattern as tests/test_r03_properties.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

QBINS = 256
CTX = 512
WIN = 128
STRIDE = 64


@pytest.fixture(scope="module")
def emb_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_int8_quantize_matches_numpy(spark, emb_pdf):
    from taipei_bi_etl_spark.queries.curation2 import embedding_int8_quantize

    mat = np.array(emb_pdf["embedding"].tolist(), dtype=np.float64)
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    span = mx - mn
    codes = np.zeros_like(mat, dtype=np.int64)
    nz = span > 0
    codes[:, nz] = np.minimum(
        np.floor((mat[:, nz] - mn[nz]) * QBINS / span[nz]), QBINS - 1
    ).astype(np.int64) - QBINS // 2
    want = {
        int(v): (int(c.sum()), int(c.min()), int(c.max()), len(c))
        for v, c in zip(emb_pdf["vec_id"], codes)
    }
    got = {
        r["vec_id"]: (r["code_sum"], r["code_min"], r["code_max"], r["n_dims"])
        for r in embedding_int8_quantize(spark, SF_DIR).collect()
    }
    assert got == want


def test_hamming_topk_matches_numpy(spark, emb_pdf):
    from taipei_bi_etl_spark.queries.curation2 import (
        K_HAM,
        NQ_HAM,
        ann_hamming_topk,
    )

    mat = np.array(emb_pdf["embedding"].tolist(), dtype=np.float64)
    bits = (mat > 0).astype(np.uint64)
    ids = emb_pdf["vec_id"].to_numpy()
    fp = {
        int(v): int(sum(int(b) << i for i, b in enumerate(row)))
        for v, row in zip(ids, bits)
    }
    want = set()
    for q in sorted(fp):
        if q >= NQ_HAM:
            continue
        dists = sorted(
            (bin(fp[q] ^ fp[c]).count("1"), c) for c in sorted(fp) if c != q
        )
        for rank, (d, c) in enumerate(dists[:K_HAM], start=1):
            want.add((q, c, d, rank))
    got = {
        (r["query_id"], r["nbr_id"], r["hamming"], r["rank"])
        for r in ann_hamming_topk(spark, SF_DIR).collect()
    }
    assert got == want


def test_pack_context_windows_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation2 import pack_context_windows

    want: dict[int, list] = {}
    off = 0
    for _, row in docs_pdf.sort_values("doc_id").iterrows():
        n = len(row["text"].split())
        if n == 0:
            continue
        did = int(row["doc_id"])
        for k in range(off // CTX, (off + n - 1) // CTX + 1):
            tok = min(off + n, (k + 1) * CTX) - max(off, k * CTX)
            agg = want.setdefault(k, [0, 0, did, did])
            agg[0] += 1
            agg[1] += tok
            agg[2] = min(agg[2], did)
            agg[3] = max(agg[3], did)
        off += n
    got = {
        r["chunk_id"]: [r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"]]
        for r in pack_context_windows(spark, SF_DIR).collect()
    }
    assert got == want
    # every window except the final one is exactly full
    last = max(want)
    assert all(v[1] == CTX for k, v in want.items() if k != last)


def test_chunk_sliding_windows_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation2 import chunk_sliding_windows

    want = set()
    for _, row in docs_pdf.iterrows():
        toks = row["text"].split()
        n = len(toks)
        if n == 0:
            continue
        n_chunks = (n - WIN + STRIDE - 1) // STRIDE + 1 if n > WIN else 1
        for ci in range(n_chunks):
            seg = toks[ci * STRIDE : ci * STRIDE + min(WIN, n - ci * STRIDE)]
            md5 = hashlib.md5(" ".join(seg).encode()).hexdigest()
            want.add((int(row["doc_id"]), ci, len(seg), md5))
    got = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_md5"])
        for r in chunk_sliding_windows(spark, SF_DIR).collect()
    }
    assert got == want


def test_survivor_quality_matches_union_find(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation2 import dedup_survivor_quality
    from taipei_bi_etl_spark.queries.dedup import dedup_minhash_lsh

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, SF_DIR).select("doc_a", "doc_b").collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    chars = dict(
        zip(docs_pdf["doc_id"].astype(int), docs_pdf["text"].str.len())
    )
    want = {}
    for root, members in comps.items():
        # min-label root is the component id in the Spark form too
        best = min(((-chars[m], m) for m in members))
        want[min(members)] = (
            len(members),
            sum(chars[m] for m in members),
            best[1],
            -best[0],
        )
    got = {
        r["component_id"]: (
            r["n_docs"],
            r["total_chars"],
            r["survivor_id"],
            r["survivor_chars"],
        )
        for r in dedup_survivor_quality(spark, SF_DIR).collect()
    }
    assert got == want
