"""Gates for ExactSubstr duplicated-span detection beyond the oracle
hash check: planted duplicates are found exactly, spans are maximal,
and the spans are consistent with the 13-gram screening profile."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.suffix import (
    WINDOW,
    dedup_exact_substring_spans,
)
from tests.conftest import SF_DIR


def _spans_of(spark, docs):
    docs.createOrReplaceTempView("_suffix_docs")
    # run the same logic on a planted frame by monkey-free reuse: inline
    from pyspark.sql import Window as W

    tok = F.split("text", r"\s+")
    base = docs.select("doc_id", tok.alias("tok")).filter(
        F.size("tok") >= WINDOW
    )
    posn = base.select(
        "doc_id", "tok",
        F.explode(F.sequence(F.lit(1), F.size("tok") - WINDOW + 1)).alias("p"),
    )
    win = posn.select(
        "doc_id", "p",
        F.array_join(F.slice("tok", F.col("p"), WINDOW), " ").alias("w"),
    )
    cnt = win.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("w")))
    dup = cnt.filter(F.col("c") >= 2).withColumn(
        "grp",
        F.col("p") - F.row_number().over(W.partitionBy("doc_id").orderBy("p")),
    )
    return {
        (r.doc_id, r.span_start, r.span_len)
        for r in dup.groupBy("doc_id", "grp")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") - F.min("p") + WINDOW).alias("span_len"),
        )
        .collect()
    }


def test_planted_duplicate_span_found_exactly(spark):
    """Two docs share a 20-token passage embedded in unique noise: the
    span must be reported in both docs, maximal, and nothing else."""
    shared = " ".join(f"dup{i}" for i in range(20))
    a_noise = " ".join(f"a{i}" for i in range(15))
    b_noise = " ".join(f"b{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, f"{a_noise} {shared} {a_noise.upper()}"),
            (2, f"{b_noise} {shared} {b_noise.upper()}"),
            (3, " ".join(f"c{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    spans = _spans_of(spark, docs)
    # span covers positions 16..35 in both docs (1-based), len 20
    assert (1, 16, 20) in spans
    assert (2, 16, 20) in spans
    assert all(d != 3 for d, _, _ in spans)
    assert len(spans) == 2


def test_intra_document_repeat_detected(spark):
    """Lee et al. semantics: a passage repeated WITHIN one document is
    a duplicated span too."""
    rep = " ".join(f"r{i}" for i in range(WINDOW))
    mid = " ".join(f"m{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, f"{rep} {mid} {rep}"), (2, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    spans = _spans_of(spark, docs)
    assert (1, 1, WINDOW) in spans
    assert (1, WINDOW + 6, WINDOW) in spans


def test_consistent_with_13gram_profile(spark):
    """Every document the hashed 13-gram profile marks as having
    cross-document duplicated grams must carry at least one span here
    (this form detects a superset: exact strings, intra-doc repeats
    included)."""
    from taipei_bi_etl_spark.queries.text2 import dedup_substring_profile

    profile = {
        r.doc_id: r.n_dup
        for r in dedup_substring_profile(spark, SF_DIR).collect()
    }
    spans = dedup_exact_substring_spans(spark, SF_DIR).collect()
    docs_with_spans = {r.doc_id for r in spans}
    flagged = {d for d, n in profile.items() if n > 0}
    missing = flagged - docs_with_spans
    assert not missing, f"profile-flagged docs without spans: {missing}"
    # span sanity: every span is at least WINDOW long and inside the doc
    for r in spans:
        assert r.span_len >= WINDOW
        assert r.span_start >= 1


def _remove_replay(docs: dict[int, str], window: int) -> dict[int, tuple]:
    """Pure-Python third opinion of the keep-first removal policy:
    (doc_id -> (n_tokens, n_removed, kept_text))."""
    toks = {d: t.split() for d, t in docs.items()}
    # NOTE: str.split() collapses whitespace like the \s+ regex split
    # on these single-space corpora; the synthetic docs below use
    # single spaces only, so the tokenizations agree.
    occurrences: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        t = toks[d]
        for p in range(1, len(t) - window + 2):
            w = " ".join(t[p - 1 : p - 1 + window])
            occurrences.setdefault(w, []).append((d, p))
    covered: dict[int, set[int]] = {d: set() for d in toks}
    for w, occ in occurrences.items():
        if len(occ) < 2:
            continue
        for d, p in sorted(occ)[1:]:  # rank >= 2 by (doc_id, p)
            covered[d].update(range(p, p + window))
    out = {}
    for d, t in toks.items():
        kept = [x for i, x in enumerate(t, start=1) if i not in covered[d]]
        out[d] = (len(t), len(covered[d]), " ".join(kept))
    return out


def test_substring_remove_policy_and_replay(spark, tmp_path):
    """r10: the removal rewrite keeps the FIRST corpus occurrence and
    excises every later one — pinned on a synthetic corpus against a
    pure-Python replay of the policy (md5 of the kept text must agree
    token-for-token), covering: cross-doc shared passage (first doc
    keeps, second loses), intra-doc self-repeat (second copy removed),
    a doc shorter than WINDOW (untouched), a unique doc (untouched),
    and a doc that is ENTIRELY a copy (everything removed — the
    md5('') path that caught the DuckDB array_to_string([]) = NULL
    divergence live)."""
    import hashlib

    from taipei_bi_etl_spark.queries.suffix import dedup_substring_remove

    shared = " ".join(f"s{i}" for i in range(15))
    selfrep = " ".join(f"q{i}" for i in range(WINDOW))
    docs = {
        0: shared + " " + " ".join(f"a{i}" for i in range(20)),
        1: " ".join(f"b{i}" for i in range(20)) + " " + shared,
        2: selfrep
        + " "
        + " ".join(f"m{i}" for i in range(WINDOW + 2))
        + " "
        + selfrep,
        3: "tiny doc below window",
        4: " ".join(f"u{i}" for i in range(40)),
        5: shared,  # entirely a (partial) copy of the shared passage
    }
    rows = [(d, t, "en", "synth", 0) for d, t in docs.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.kept_md5)
        for r in dedup_substring_remove(spark, str(tmp_path)).collect()
    }
    want = {
        d: (n, rm, hashlib.md5(kept.encode()).hexdigest())
        for d, (n, rm, kept) in _remove_replay(docs, WINDOW).items()
    }
    assert got == want
    # the policy facts the replay encodes, asserted explicitly:
    assert got[0][1] == 0  # first occurrence keeps the passage
    assert got[1][1] == 15  # second loses exactly the shared 15 tokens
    assert got[2][1] == WINDOW  # self-repeat: second copy removed
    assert got[3][1] == 0 and got[4][1] == 0  # short + unique untouched
    assert got[5][1] == 15  # the all-copy doc loses everything
    assert got[5][2] == hashlib.md5(b"").hexdigest()


def test_substring_remove_consistent_with_spans(spark):
    """Removed tokens are a SUBSET of the span-marked tokens (spans
    mark every occurrence; removal spares the first), per doc and
    strictly in total on the real corpus."""
    from taipei_bi_etl_spark.queries.suffix import dedup_substring_remove

    span_mass = {}
    for r in dedup_exact_substring_spans(spark, SF_DIR).collect():
        span_mass[r.doc_id] = span_mass.get(r.doc_id, 0) + r.span_len
    removed = {
        r.doc_id: r.n_removed
        for r in dedup_substring_remove(spark, SF_DIR).collect()
        if r.n_removed > 0
    }
    assert removed, "vacuous: no removal on the real corpus"
    for d, n in removed.items():
        assert n <= span_mass.get(d, 0), (d, n, span_mass.get(d))
    assert sum(removed.values()) < sum(span_mass.values())
