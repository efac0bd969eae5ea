"""Third-opinion tests for the corpus-forensics pair: boilerplate
position profile and the shingle-novelty curve recomputed in pure
Python over the real sf0.001 parquet."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t]


def test_boilerplate_profile_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation5 import (
        boilerplate_position_profile,
    )

    first: dict = {}
    last: dict = {}
    n_docs: Counter = Counter()
    for _, r in docs_pdf.iterrows():
        toks = _tok(r["text"])
        if not toks:
            continue
        n_docs[r["source"]] += 1
        first.setdefault(r["source"], Counter())[toks[0]] += 1
        last.setdefault(r["source"], Counter())[toks[-1]] += 1
    want = {}
    for src in n_docs:
        for position, cnt in (("first", first[src]), ("last", last[src])):
            tok, c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            want[(src, position)] = (
                tok, c, n_docs[src], c * 1_000_000 // n_docs[src],
            )
    got = {
        (r["source"], r["position"]): (
            r["top_token"], r["n_docs_with_token"], r["n_docs"],
            r["share_micros"],
        )
        for r in boilerplate_position_profile(spark, SF_DIR).collect()
    }
    assert got == want


def test_novelty_curve_matches_python(spark, docs_pdf):
    from taipei_bi_etl_spark.queries.curation5 import (
        NOVELTY_BUCKETS,
        shingle_novelty_curve,
    )

    doc_shingles: dict[int, set] = {}
    for _, r in docs_pdf.sort_values("doc_id").iterrows():
        toks = _tok(r["text"])
        doc_shingles[int(r["doc_id"])] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    doc_shingles = {d: s for d, s in doc_shingles.items() if s}
    first_seen: dict[str, int] = {}
    for d in sorted(doc_shingles):
        for sh in doc_shingles[d]:
            first_seen.setdefault(sh, d)
    mx = max(doc_shingles)
    want: dict = {}
    for d, shs in doc_shingles.items():
        dec = min(d * NOVELTY_BUCKETS // (mx + 1), NOVELTY_BUCKETS - 1)
        docs, tot, nov = want.get(dec, (0, 0, 0))
        want[dec] = (
            docs + 1,
            tot + len(shs),
            nov + sum(1 for sh in shs if first_seen[sh] == d),
        )
    want = {
        dec: (docs, tot, nov, nov * 1_000_000 // tot)
        for dec, (docs, tot, nov) in want.items()
    }
    got = {
        r["ingest_decile"]: (
            r["n_docs"], r["n_shingles"], r["n_novel"], r["novelty_micros"],
        )
        for r in shingle_novelty_curve(spark, SF_DIR).collect()
    }
    assert got == want
    # the curve's reason to exist: early deciles are more novel than
    # the last one (the corpus repeats itself as it grows)
    assert got[0][3] > got[max(got)][3]
