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


# ---------------------------------------------------------------------------
# Synthetic long-doc corpora: the testdata's longest document is 99
# tokens, so the multi-chunk branch of the sliding chunker (n > WIN)
# and multi-window document spans in the packer are NEVER exercised by
# the oracle gate on real data.  These tests build corpora that hit
# every branch: empty/whitespace docs, 1-token docs, exact boundary
# lengths (WIN-1 / WIN / WIN+1), and docs spanning several windows.
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, lengths) -> str:
    import random

    rng = random.Random(7)
    rows = []
    for i, n in enumerate(lengths):
        text = " ".join(f"t{rng.randrange(50)}" for _ in range(n))
        rows.append((i, text, "en", "synth", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


BOUNDARY_LENGTHS = [0, 1, 63, 64, 65, 99, 127, 128, 129, 200, 400, 513, 600]


def test_chunk_sliding_long_docs_all_branches(spark, tmp_path):
    from taipei_bi_etl_spark.queries.curation2 import chunk_sliding_windows

    sf = _write_docs(spark, tmp_path, BOUNDARY_LENGTHS)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    want = set()
    for _, row in docs.iterrows():
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
        for r in chunk_sliding_windows(spark, sf).collect()
    }
    assert got == want
    # the corpus genuinely exercised the multi-chunk branch
    assert max(ci for _, ci, _, _ in want) >= 8


def test_pack_context_windows_long_docs(spark, tmp_path):
    from taipei_bi_etl_spark.queries.curation2 import pack_context_windows

    sf = _write_docs(spark, tmp_path, BOUNDARY_LENGTHS)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    want: dict[int, list] = {}
    off = 0
    for _, row in docs.sort_values("doc_id").iterrows():
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
        for r in pack_context_windows(spark, sf).collect()
    }
    assert got == want
    # a single doc (600 tokens) spans at least two windows somewhere
    assert any(v[0] == 1 for v in want.values()) or len(want) > 1


def test_pack_context_windows_empty_corpus(spark, tmp_path):
    from taipei_bi_etl_spark.queries.curation2 import pack_context_windows

    sf = _write_docs(spark, tmp_path, [0, 0])
    assert pack_context_windows(spark, sf).count() == 0


def test_containment_dominates_jaccard(spark, tmp_path):
    """Structural invariant: C = inter/min >= J = inter/union for every
    pair, and a pair passing the Jaccard gate at C's threshold must
    also pass containment — checked on a corpus with genuine subsumed
    docs (a short doc whose text is a prefix of a long one)."""
    import random

    from taipei_bi_etl_spark.queries.curation2 import (
        CONTAIN_T,
        dedup_ngram_containment,
    )
    from taipei_bi_etl_spark.queries.pipeline import ngram_jaccard_pairs
    from pyspark.sql import functions as F

    rng = random.Random(11)
    long_toks = [f"w{rng.randrange(30)}" for _ in range(120)]
    rows = [
        (0, " ".join(long_toks), "en", "synth", 0),
        (1, " ".join(long_toks[:30]), "en", "synth", 0),  # prefix excerpt
        (2, " ".join(long_toks), "en", "synth", 0),  # exact dup of 0
        (3, " ".join(f"u{i}" for i in range(40)), "en", "synth", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    cont = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["contained_doc"])
        for r in dedup_ngram_containment(spark, str(tmp_path)).collect()
    }
    # excerpt (1 ⊂ 0) found with containment 1.0, invisible to Jaccard
    assert cont[(0, 1)][0] == 1.0 and cont[(0, 1)][1] == 1
    # exact dup pair: containment 1.0, contained side = min doc_id
    assert cont[(0, 2)][0] == 1.0 and cont[(0, 2)][1] == 0
    d = spark.read.parquet(f"{tmp_path}/documents.parquet")
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(
            d.select("doc_id", F.split("text", r"\s+").alias("tok")),
            threshold=CONTAIN_T,
        ).collect()
    }
    # J >= t implies C >= t: the Jaccard pair set is a subset
    assert jac <= set(cont)
    assert (0, 1) not in jac  # and the excerpt is the strict gain


def test_pack_window_boundaries_matches_python(spark, tmp_path):
    from taipei_bi_etl_spark.queries.curation2 import pack_window_boundaries

    sf = _write_docs(spark, tmp_path, BOUNDARY_LENGTHS)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    segs: dict[int, list] = {}
    off = 0
    for _, row in docs.sort_values("doc_id").iterrows():
        n = len(row["text"].split())
        if n == 0:
            continue
        did = int(row["doc_id"])
        for k in range(off // CTX, (off + n - 1) // CTX + 1):
            s = max(off, k * CTX) - k * CTX
            ln = min(off + n, (k + 1) * CTX) - max(off, k * CTX)
            segs.setdefault(k, []).append((s, did, ln))
        off += n
    want = {
        k: (len(v), ",".join(f"{s}:{d}:{l}" for s, d, l in sorted(v)))
        for k, v in segs.items()
    }
    got = {
        r["chunk_id"]: (r["n_segments"], r["boundaries"])
        for r in pack_window_boundaries(spark, sf).collect()
    }
    assert got == want
    # segment lengths tile each full window exactly
    full = [k for k in want if k != max(want)]
    assert full and all(
        sum(l for _, _, l in segs[k]) == CTX for k in full
    )


def test_containment_prefix_identity(spark, tmp_path):
    """r09: the asymmetric prefix filter (probe-with-prefix vs full
    index — smaller side's prefix must contain the smallest common
    shingle, larger side admits no bound) is frame-exact against the
    full-index containment form, on the real corpus AND on a corpus
    with genuinely SUBSUMED docs (sizes differ, so the smaller-side
    prefix path is exercised non-vacuously)."""
    import random

    from taipei_bi_etl_spark.queries.curation2 import (
        dedup_containment_prefix,
        dedup_ngram_containment,
    )

    full = dedup_ngram_containment(spark, SF_DIR)
    pref = dedup_containment_prefix(spark, SF_DIR)
    assert full.exceptAll(pref).count() == 0
    assert pref.exceptAll(full).count() == 0
    assert full.count() > 0

    rng = random.Random(11)
    long_toks = [f"w{rng.randrange(30)}" for _ in range(120)]
    rows = [
        (0, " ".join(long_toks), "en", "synth", 0),
        (1, " ".join(long_toks[:30]), "en", "synth", 0),  # excerpt
        (2, " ".join(long_toks), "en", "synth", 0),  # exact dup of 0
        (3, " ".join(f"u{i}" for i in range(40)), "en", "synth", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    f2 = {
        (r["doc_a"], r["doc_b"], r["containment"], r["contained_doc"])
        for r in dedup_ngram_containment(spark, str(tmp_path)).collect()
    }
    p2 = {
        (r["doc_a"], r["doc_b"], r["containment"], r["contained_doc"])
        for r in dedup_containment_prefix(spark, str(tmp_path)).collect()
    }
    assert f2 == p2
    assert (0, 1, 1.0, 1) in p2  # the subsumed excerpt is found


def test_route_containment_crossover_routing(spark, tmp_path):
    """r10 (VERDICT r09 #5): the containment family gets the same
    measured-crossover dispatcher as Jaccard.  Pins (a) the CHOICE on
    benign and boilerplate-heavy corpora (the rule is the shared
    `pick_jaccard_route` decision table, already pinned in
    test_dedup), (b) pair-identity with the full-index containment
    form either way, (c) that the df arm exercises the SUBSUMED-doc
    path non-vacuously."""
    import random

    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.curation2 import (
        _contain_docs_sh,
        containment_prefix_pairs,
        dedup_ngram_containment,
        route_containment,
    )
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from tools.prefix_crossover import skewed_df_docs

    # benign and heavy-tailed battery corpora (K=400 → max df ~0.25%
    # of docs, K=20 → ~5%), planted exact duplicates in both
    for k, expect in ((20, "df"), (400, "hash")):
        toks = skewed_df_docs(spark, 2000, k).persist()
        docs_sh = toks.select(
            "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
        ).filter(F.size("sh") > 0)
        choice: list = []
        routed = route_containment(docs_sh, choice_out=choice)
        assert choice == [expect], (k, choice)
        hash_form = containment_prefix_pairs(docs_sh, canonical="hash")
        assert hash_form.exceptAll(routed).count() == 0, k
        assert routed.exceptAll(hash_form).count() == 0, k
        # non-vacuous: planted exact duplicates found by both routes
        assert routed.filter(F.col("containment") == 1.0).count() >= 20
        toks.unpersist()

    # df arm on a corpus with genuinely SUBSUMED docs + boilerplate:
    # every doc shares an 18-token boilerplate block (max df = all
    # docs -> routes "df"), doc 1 is an excerpt of doc 0
    rng = random.Random(13)
    bp = " ".join(f"bp{i}" for i in range(18))
    long_toks = [f"w{rng.randrange(30)}" for _ in range(120)]
    rows = [
        (0, " ".join(long_toks) + " " + bp, "en", "synth", 0),
        (1, " ".join(long_toks[:30]), "en", "synth", 0),  # excerpt
        (2, " ".join(long_toks) + " " + bp, "en", "synth", 0),  # dup
    ] + [
        (
            3 + i,
            " ".join(f"u{i}_{j}" for j in range(40)) + " " + bp,
            "en",
            "synth",
            0,
        )
        for i in range(60)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    docs_sh = _contain_docs_sh(spark, str(tmp_path))
    choice = []
    routed = {
        (r["doc_a"], r["doc_b"], r["containment"], r["contained_doc"])
        for r in route_containment(docs_sh, choice_out=choice).collect()
    }
    assert choice == ["df"], choice
    full = {
        (r["doc_a"], r["doc_b"], r["containment"], r["contained_doc"])
        for r in dedup_ngram_containment(spark, str(tmp_path)).collect()
    }
    assert routed == full
    assert (0, 1, 1.0, 1) in routed  # subsumed excerpt found by df arm


def test_containment_ppjoin_identity_and_cut(spark, tmp_path):
    """r10: the POSITIONAL upgrade of the asymmetric containment
    prefix filter — frame-exact vs the full-index form on the real
    corpus and the subsumed-doc corpus (the smaller-side prefix path
    exercised non-vacuously), and the directed positional bound prunes
    a candidate the plain prefix filter keeps: A = [1..10],
    B = [5, 20..28] collide on token 5 only (pos 4 in A's prefix of 2
    at t=0.9 excludes it probe-side, but B's prefix slot 0 probes into
    A's FULL index at pos 4) — the bound c + min(na-ai-1, nb-bj-1)
    = 1 + 5 = 6 < alpha = ceil(0.9*10) = 9 kills the direction."""
    import random

    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.curation2 import (
        CONTAIN_DEN,
        CONTAIN_NUM,
        containment_positional_candidates,
        containment_prefix_pairs,
        dedup_containment_ppjoin,
        dedup_ngram_containment,
    )

    full = dedup_ngram_containment(spark, SF_DIR)
    pp = dedup_containment_ppjoin(spark, SF_DIR)
    assert full.exceptAll(pp).count() == 0
    assert pp.exceptAll(full).count() == 0
    assert full.count() > 0

    rng = random.Random(11)
    long_toks = [f"w{rng.randrange(30)}" for _ in range(120)]
    rows = [
        (0, " ".join(long_toks), "en", "synth", 0),
        (1, " ".join(long_toks[:30]), "en", "synth", 0),  # excerpt
        (2, " ".join(long_toks), "en", "synth", 0),  # exact dup of 0
        (3, " ".join(f"u{i}" for i in range(40)), "en", "synth", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    f2 = {
        (r["doc_a"], r["doc_b"], r["containment"], r["contained_doc"])
        for r in dedup_ngram_containment(spark, str(tmp_path)).collect()
    }
    p2 = {
        (r["doc_a"], r["doc_b"], r["containment"], r["contained_doc"])
        for r in dedup_containment_ppjoin(spark, str(tmp_path)).collect()
    }
    assert f2 == p2
    assert (0, 1, 1.0, 1) in p2  # the subsumed excerpt is found

    # the directed positional prune: crafted arrays fed straight in
    crafted = spark.createDataFrame(
        [
            (1, list(range(1, 11))),
            (2, [5] + list(range(20, 29))),
        ],
        "doc_id long, sh array<bigint>",
    )
    # positional=True: the CANDIDATE set itself is empty (r10 review:
    # asserting only the final output would be vacuous — the plain
    # branch's exact verify also rejects the pair), and so is the
    # output
    p_col = (
        F.size("sh")
        - F.floor((F.size("sh") * CONTAIN_NUM + (CONTAIN_DEN - 1))
                  / F.lit(CONTAIN_DEN))
        + 1
    ).cast("int")
    crafted_sorted = crafted.select(
        "doc_id", F.array_sort("sh").alias("sh")
    ).select("doc_id", "sh", p_col.alias("p"))
    assert containment_positional_candidates(crafted_sorted).count() == 0
    assert containment_prefix_pairs(crafted, positional=True).count() == 0
    # plain prefix: the candidate survives to the verify (which then
    # rejects it on exact containment 1/10 < 0.9) — prove the CANDIDATE
    # difference by counting verify-join inputs via the bound math:
    # B's prefix slot (token 5) collides with A's full index, so the
    # un-filtered directed join is non-empty.
    p = (
        F.size("sh")
        - F.floor(
            (F.size("sh") * CONTAIN_NUM + (CONTAIN_DEN - 1))
            / F.lit(CONTAIN_DEN)
        )
        + 1
    ).cast("int")
    sorted_sh = crafted.select(
        "doc_id", F.array_sort("sh").alias("sh")
    ).select("doc_id", "sh", p.alias("p"))
    pref = sorted_sh.select(
        "doc_id", F.explode(F.slice("sh", 1, F.col("p"))).alias("shingle")
    )
    fullidx = sorted_sh.select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    n_cand = (
        pref.alias("a")
        .join(fullidx.alias("b"), "shingle")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")),
        )
        .distinct()
        .count()
    )
    assert n_cand == 1
