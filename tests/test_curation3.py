"""Third-opinion tests for the round-4b batch: DSIR importance
resampling, PII redaction, diversity profile, and training-order
shuffle recomputed from first principles in pure Python (Python `re`
engine for the regex semantics — a third regex implementation next to
Spark's Java regex and DuckDB's RE2) over the real sf0.001 parquet."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd
import pytest

from tests.conftest import SF_DIR

MOD = 1000000007
KNUTH = 2654435761


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _poly(w: str, base: int = 31) -> int:
    h = 0
    for ch in w:
        h = (h * base + ord(ch)) % MOD
    return h


def test_dsir_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.dsir import (
        B_BUCKETS,
        TARGET_SOURCE,
        TOP_K,
        _BIGRAM_MIX,
        dsir_importance_sample,
    )

    ct: Counter = Counter()
    cr: Counter = Counter()
    doc_feats: dict[int, list[int]] = {}
    for _, r in docs_pdf.iterrows():
        hs = [_poly(w) for w in re.split(r"\s+", r["text"]) if w]
        feats = [h % B_BUCKETS for h in hs] + [
            ((a * _BIGRAM_MIX + b) % MOD) % B_BUCKETS
            for a, b in zip(hs, hs[1:])
        ]
        tgt = r["source"] == TARGET_SOURCE
        for b in feats:
            (ct if tgt else cr)[b] += 1
        if not tgt:
            doc_feats[int(r["doc_id"])] = feats
    tt, tr = sum(ct.values()), sum(cr.values())
    wt = {
        b: math.floor(
            (ct[b] + 1.0) * (tr + float(B_BUCKETS))
            / ((cr[b] + 1.0) * (tt + float(B_BUCKETS)))
            * 1000000.0
        )
        - 1000000
        for b in set(ct) | set(cr)
    }
    scored = sorted(
        (
            (-sum(wt[b] for b in feats), doc_id, len(feats))
            for doc_id, feats in doc_feats.items()
        )
    )[:TOP_K]
    want = {
        doc_id: (-neg, n, i + 1)
        for i, (neg, doc_id, n) in enumerate(scored)
    }
    got = {
        r["doc_id"]: (r["score_micros"], r["n_features"], r["rank"])
        for r in dsir_importance_sample(spark, SF_DIR).collect()
    }
    assert got == want


def test_pii_redact_matches_python_re(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation3 import text_pii_redact
    from taipei_bi_etl_spark.queries.text import PII_EMAIL, PII_IP, PII_PHONE

    want = {}
    for _, r in docs_pdf.iterrows():
        did = int(r["doc_id"])
        raw = (
            f"{r['text']} contact u{did}@mail{did % 7}.com"
            f" from 10.{did % 256}.0.99 call +1 (555) 010-{1000 + did % 9000}"
        )
        mid = re.sub(PII_IP, "<IP>", re.sub(PII_EMAIL, "<EMAIL>", raw))
        clean = re.sub(PII_PHONE, "<PHONE>", mid)
        hits = (
            len(re.findall(PII_EMAIL, raw))
            + len(re.findall(PII_IP, raw))
            + len(re.findall(PII_PHONE, mid))
        )
        stripped = (
            clean.replace("<EMAIL>", "")
            .replace("<IP>", "")
            .replace("<PHONE>", "")
        )
        want[did] = (
            hashlib.md5(clean.encode()).hexdigest(),
            hits,
            len(clean) - len(stripped),
        )
    got = {
        r["doc_id"]: (r["redacted_md5"], r["n_hits"], r["placeholder_chars"])
        for r in text_pii_redact(spark, SF_DIR).collect()
    }
    assert got == want


def test_diversity_profile_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation3 import corpus_diversity_profile
    from taipei_bi_etl_spark.queries.dsir import _BIGRAM_MIX

    uni: dict = {}
    bi: dict = {}
    for _, r in docs_pdf.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"]) if t]
        u = uni.setdefault(r["source"], [])
        u.extend(toks)
        hs = [_poly(w) for w in toks]
        b = bi.setdefault(r["source"], [])
        b.extend(
            (a * _BIGRAM_MIX + c) % MOD for a, c in zip(hs, hs[1:])
        )
    want = {}
    for src in uni:
        n, d = len(uni[src]), len(set(uni[src]))
        nb, db = len(bi[src]), len(set(bi[src]))
        want[src] = (
            n, d, d * 1_000_000 // n, nb, db, db * 1_000_000 // nb,
        )
    got = {
        r["source"]: (
            r["n_tokens"], r["distinct_terms"], r["ttr_micros"],
            r["n_bigrams"], r["distinct_bigrams"], r["bigram_ttr_micros"],
        )
        for r in corpus_diversity_profile(spark, SF_DIR).collect()
    }
    assert got == want


def test_training_shuffle_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation3 import (
        N_SHARDS,
        training_shuffle_order,
    )

    rows = []
    for did in docs_pdf["doc_id"]:
        hv = ((int(did) % 4294967296) * 1327217885) % 4294967296
        rows.append((hv % N_SHARDS, hv, int(did)))
    want = {}
    for shard in set(s for s, _, _ in rows):
        members = sorted((hv, did) for s, hv, did in rows if s == shard)
        for pos, (_, did) in enumerate(members, 1):
            want[did] = (shard, pos)
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in training_shuffle_order(spark, SF_DIR).collect()
    }
    assert got == want


def test_degenerate_docs_never_crash_slices(spark):
    """The three size-derived slice sites (dedup.shingle_array, text2
    bigrams, dsir._buckets) must clamp to [] on 0/1/2-token documents
    — Spark's slice REJECTS negative lengths at runtime, and filtered
    tokenizers make zero-token docs reachable."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.dedup import shingle_array
    from taipei_bi_etl_spark.queries.dsir import _buckets

    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one"), (3, "one two"),
         (4, "one two three")],
        "doc_id long, text string",
    )
    tok = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    out = {
        r["doc_id"]: (r["ns"], r["nb"])
        for r in df.select(
            "doc_id",
            F.size(shingle_array(tok)).alias("ns"),
            F.size(_buckets(tok)).alias("nb"),
        ).collect()
    }
    # shingles: empty below 3 tokens, 1 at exactly 3;
    # dsir buckets: unigrams + bigrams = n + max(n-1, 0)
    assert out == {0: (0, 0), 1: (0, 0), 2: (0, 1), 3: (0, 3), 4: (1, 5)}
