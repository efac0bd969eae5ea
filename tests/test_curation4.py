"""Third-opinion tests for the round-4c corpus-audit extensions:
semantics recomputed from first principles in pure Python (no Spark, no
SQL) over the real sf0.001 parquet, compared exactly — the same
"independent author" pattern as tests/test_curation2.py."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd
import pytest

from tests.conftest import SF_DIR

PAD = 32
K = 16


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t]


def test_frequency_spectrum_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation4 import (
        corpus_frequency_spectrum,
    )

    freq: Counter = Counter()
    for _, r in docs_pdf.iterrows():
        for t in _tok(r["text"]):
            freq[(r["source"], t)] += 1
    want: dict = {}
    for (src, _), c in freq.items():
        key = (src, c.bit_length() - 1)
        n, mass = want.get(key, (0, 0))
        want[key] = (n + 1, mass + c)
    got = {
        (r["source"], r["log2_freq"]): (r["n_terms"], r["token_mass"])
        for r in corpus_frequency_spectrum(spark, SF_DIR).collect()
    }
    assert got == want


def test_vocab_coverage_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation4 import vocab_coverage_report

    allc: Counter = Counter()
    per_src: dict = {}
    for _, r in docs_pdf.iterrows():
        toks = _tok(r["text"])
        allc.update(toks)
        per_src.setdefault(r["source"], []).extend(toks)
    vocab = {
        t for t, _ in sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    }
    want = {}
    for src, toks in per_src.items():
        n = len(toks)
        inv = sum(1 for t in toks if t in vocab)
        want[src] = (n, inv, (n - inv) * 1_000_000 // n)
    got = {
        r["source"]: (r["n_tokens"], r["in_vocab"], r["oov_micros"])
        for r in vocab_coverage_report(spark, SF_DIR).collect()
    }
    assert got == want


def test_dedup_tokens_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation4 import text_dedup_tokens

    want = {}
    for _, r in docs_pdf.iterrows():
        seen: list = []
        for t in _tok(r["text"]):
            if t not in seen:
                seen.append(t)
        want[r["doc_id"]] = (
            len(seen),
            hashlib.md5(" ".join(seen).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["kept"], r["dedup_md5"])
        for r in text_dedup_tokens(spark, SF_DIR).collect()
    }
    assert got == want


def test_dedup_tokens_empty_and_stutter(spark):
    """Synthetic corner shapes the word-soup corpus can't exercise:
    a fully-repeated document collapses to one token; a document of
    distinct tokens is untouched (order preserved)."""
    from taipei_bi_etl_spark.queries import curation4

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "c b a"), (3, "b a b a b")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_t")
    from pyspark.sql import functions as F

    tok = curation4._tok()
    kept = F.filter(
        tok, lambda t, i: F.array_position(tok, t) == i + F.lit(1)
    )
    out = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", F.concat_ws(" ", kept).alias("k")
        ).collect()
    }
    assert out == {1: "a", 2: "c b a", 3: "b a"}


def test_padding_histogram_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation4 import (
        sequence_length_histogram,
    )

    want: dict = {}
    for _, r in docs_pdf.iterrows():
        n = len(_tok(r["text"]))
        b = (n - 1) // PAD
        padded = (b + 1) * PAD
        k = (r["source"], b)
        docs, toks, waste, tot = want.get(k, (0, 0, 0, 0))
        want[k] = (docs + 1, toks + n, waste + padded - n, tot + padded)
    want = {
        k: (d, t, w, w * 1_000_000 // p) for k, (d, t, w, p) in want.items()
    }
    got = {
        (r["source"], r["bucket"]): (
            r["n_docs"],
            r["n_tokens"],
            r["pad_waste"],
            r["waste_micros"],
        )
        for r in sequence_length_histogram(spark, SF_DIR).collect()
    }
    assert got == want


def test_mix_temperature_matches_python(spark, docs_pdf):
    import math

    from taipei_bi_etl_spark.queries.curation4 import corpus_mix_temperature

    tokens: dict = {}
    for _, r in docs_pdf.iterrows():
        if r["text"] is None:
            continue
        tokens[r["source"]] = tokens.get(r["source"], 0) + len(
            _tok(r["text"])
        )
    sq = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in tokens.items()}
    tt, ts = sum(tokens.values()), sum(sq.values())
    want = {
        s: (
            n,
            n * 1_000_000 // tt,
            sq[s] * 1_000_000 // ts,
            sq[s] * 1_000_000 // ts - n * 1_000_000 // tt,
        )
        for s, n in tokens.items()
    }
    got = {
        r["source"]: (
            r["n_tokens"], r["natural_ppm"], r["sampled_ppm"], r["boost_ppm"],
        )
        for r in corpus_mix_temperature(spark, SF_DIR).collect()
    }
    assert got == want
    # the point of temperature sampling: smallest source boosted,
    # largest source suppressed
    small = min(tokens, key=tokens.get)
    large = max(tokens, key=tokens.get)
    assert got[small][3] > 0 and got[large][3] < 0
