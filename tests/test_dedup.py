"""Sketch-dedup quality gates: MinHash-LSH and SimHash must agree with
the exact near-duplicate pair sets (the oracle only hash-checks
MinHash; SimHash has no SQL twin, so its gate lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.dedup import (
    JACCARD_T,
    _doc_shingles,
    dedup_minhash_lsh,
    dedup_simhash,
)
from tests.conftest import SF_DIR


def _exact_pairs(spark, threshold):
    """All-pairs exact Jaccard ≥ threshold via the inverted index."""
    sh = _doc_shingles(spark, SF_DIR).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    rows = (
        inter.join(sa, "doc_a").join(sb, "doc_b").filter(jac >= threshold).collect()
    )
    return {(r.doc_a, r.doc_b) for r in rows}


def test_minhash_lsh_finds_all_exact_pairs(spark):
    exact = _exact_pairs(spark, JACCARD_T)
    lsh = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()}
    assert lsh == exact


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_cap_drops_stop_shingles_keeps_rare_pairs(spark):
    """The df_cap guard suppresses boilerplate-driven candidates while
    pairs whose overlap rests on sub-cap shingles keep their (exact)
    Jaccard."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.pipeline import ngram_jaccard_pairs

    boiler = "all rights reserved by the site"  # 4 shingles, df = n_docs
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta {boiler}"),
        (2, f"alpha beta gamma delta epsilon zeta {boiler}"),
    ] + [(i, f"unique{i} words{i} here{i} now{i} {boiler}") for i in range(3, 13)]
    toks = _mk_docs(spark, rows).select(
        "doc_id", F.split("text", r"\s+").alias("tok")
    )
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(toks, 0.6).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(toks, 0.6, df_cap=3).collect()
    }
    # the cap removes boilerplate shingles from BOTH intersection and
    # union, so the identical pair keeps Jaccard 1.0 over the capped
    # universe; boilerplate-only pairs gain no similarity at all
    assert (1, 2) in uncapped and uncapped[(1, 2)] == 1.0
    assert (1, 2) in capped and capped[(1, 2)] == 1.0
    assert set(uncapped) == set(capped) == {(1, 2)}


def test_bucket_cap_drops_degenerate_cluster_keeps_rare_pair(spark):
    """bucket_cap: a cluster of identical docs collapses into one bucket
    per band and is dropped; the rare near-dup pair survives."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.dedup import (
        minhash_lsh_pairs,
        shingle_hash_array,
    )

    big = "spam spam wonderful spam lovely spam baked beans and spam"
    rare = (
        "the quick brown fox jumps over the lazy dog near the river bank today"
    )
    rows = [(i, big) for i in range(100, 120)] + [
        (1, rare),
        (2, rare + " extra"),
    ]
    docs_sh = (
        _mk_docs(spark, rows)
        .select(
            "doc_id",
            shingle_hash_array(F.split("text", r"\s+")).alias("sh"),
        )
        .filter(F.size("sh") > 0)
    )
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs_sh, bucket_cap=5).collect()
    }
    assert (1, 2) in capped
    assert all(a < 100 for a, _ in capped), "degenerate cluster not dropped"
    uncapped = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs_sh).collect()
    }
    # without the cap the 20-doc cluster contributes all 190 pairs
    assert uncapped == capped | {
        (a, b) for a in range(100, 120) for b in range(a + 1, 120)
    }


def test_simhash_matches_exact_pairs_on_long_docs(spark):
    # SimHash fingerprints of very short docs are high-variance (one
    # differing shingle among ~5 flips dozens of bits), so the
    # exact-recall gate applies to pairs where both docs have >= 20
    # shingles.  False positives are checked unconditionally.
    sizes = {
        r.doc_id: r.n
        for r in _doc_shingles(spark, SF_DIR)
        .select("doc_id", F.size("sh").alias("n"))
        .collect()
    }
    exact = _exact_pairs(spark, JACCARD_T)
    weak = _exact_pairs(spark, 0.5)
    sim = {(r.doc_a, r.doc_b) for r in dedup_simhash(spark, SF_DIR).collect()}
    long_exact = {
        (a, b) for a, b in exact if sizes[a] >= 20 and sizes[b] >= 20
    }
    missed = long_exact - sim
    false_pos = sim - weak
    assert not missed, f"simhash missed long-doc true pairs: {sorted(missed)[:5]}"
    assert not false_pos, f"simhash false positives: {sorted(false_pos)[:5]}"


def test_incremental_dedup_equals_full_rerun(spark):
    """Daily-batch contract: pairs(full corpus) must equal pairs(old)
    ∪ incremental(new batch vs old index) — nothing missed, nothing
    invented, identical jaccard values."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.dedup import (
        _doc_shingle_hashes,
        dedup_incremental,
        minhash_band_index,
        minhash_lsh_pairs,
    )

    docs_sh = _doc_shingle_hashes(spark, SF_DIR).persist()
    # split by content hash: ~80% "history", ~20% "today's batch"
    old = docs_sh.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) != 0).persist()
    new = docs_sh.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0).persist()
    assert 0 < new.count() < docs_sh.count()

    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs_sh).collect()
    }
    old_pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(old).collect()
    }
    inc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_incremental(new, minhash_band_index(old)).collect()
    }
    assert set(old_pairs) & set(inc) == set()
    merged = {**old_pairs, **inc}
    assert merged == full


def test_dedup_impact_report_zero_token_source(spark, tmp_path):
    """r03 ADVICE #5 regression: a source whose documents are ALL empty
    (zero tokens) must report NULL removed_ppm in both engines instead
    of raising DIVIDE_BY_ZERO (Spark 4 ANSI / DuckDB integer //)."""
    import duckdb

    from taipei_bi_etl_spark.queries.profiling import (
        _DEDUP_IMPACT_ORACLE,
        dedup_impact_report,
    )
    from tests.oracle_utils import compare

    rows = [
        (1, "a b c", "en", "web", 5),
        (2, "a b c", "en", "web", 5),      # exact dup → removed
        (3, "   ", "en", "empty_src", 3),  # whitespace-only
        (4, "", "en", "empty_src", 0),     # empty
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = dedup_impact_report(spark, str(tmp_path))
    got = {r.source: r.removed_ppm for r in out.collect()}
    assert got["empty_src"] is None
    assert got["web"] == 500_000
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    compare(out, con, _DEDUP_IMPACT_ORACLE)
    con.close()


def test_prefix_filter_identity_and_volume(spark):
    """The prefix-filtered Jaccard join must (a) return EXACTLY the
    full-index form's pairs (the completeness lemma, checked on the
    real corpus), (b) index strictly fewer postings, and (c) compute
    ``⌈0.6·n⌉`` in exact integer arithmetic — ``ceil(0.6 * n)`` in
    doubles over-shrinks the prefix at n = 5k (0.6·5 rounds to
    3.0000000000000004), a silent completeness hole."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.queries.pipeline import (
        _tokens,
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )
    from taipei_bi_etl_spark.io import read_table

    d = read_table(spark, SF_DIR, "documents")
    docs_sh = d.select(
        "doc_id", shingle_hash_array(_tokens()).alias("sh")
    ).filter(F.size("sh") > 0)

    full = ngram_jaccard_pairs(d.select("doc_id", _tokens().alias("tok")))
    pref = jaccard_prefix_filter_pairs(docs_sh)
    assert full.exceptAll(pref).count() == 0
    assert pref.exceptAll(full).count() == 0

    # posting volume: Σ p(doc) < Σ n(doc)
    vol = docs_sh.select(
        F.sum(F.size("sh")).alias("full"),
        F.sum(
            F.size("sh")
            - F.floor((F.size("sh") * 3 + 4) / F.lit(5))
            + 1
        ).alias("pref"),
    ).collect()[0]
    assert vol.pref < vol.full
    # t = 3/5 exactly: prefix ≈ (1 - t) of the index
    assert vol.pref / vol.full < 0.45

    # the integer ceil identity on the formula's own domain
    for n in range(1, 200):
        assert (n * 3 + 4) // 5 == math.ceil(Fraction(3, 5) * n)


def test_prefix_filter_identity_on_heavy_tailed_df(spark):
    """r08 (VERDICT r07 #6): the prefix filter's ROUTING DOMAIN is
    heavy-tailed document frequency — assert the identity holds THERE
    too, on the skewed-df corpus the crossover measurement uses
    (boilerplate shingles with df = n/K across K=20 blocks), including
    the planted exact duplicates."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.queries.pipeline import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )
    from tools.prefix_crossover import skewed_df_docs

    toks = skewed_df_docs(spark, 2000, 20).persist()
    docs_sh = toks.select(
        "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
    ).filter(F.size("sh") > 0)
    full = ngram_jaccard_pairs(toks)
    for canonical in ("hash", "df"):
        pref = jaccard_prefix_filter_pairs(docs_sh, canonical=canonical)
        assert full.exceptAll(pref).count() == 0, canonical
        assert pref.exceptAll(full).count() == 0, canonical
        # non-vacuous: the 20 planted exact duplicates are all found
        assert pref.filter(F.col("jaccard") == 1.0).count() >= 20
    toks.unpersist()


def test_route_jaccard_crossover_routing(spark):
    """r09 (VERDICT r08 #1): the measured prefix-filter crossover is
    now EXECUTABLE — route_jaccard probes max-df share and dispatches.
    Pins (a) the pure decision table, (b) the CHOICE on the benign and
    heavy-tailed battery corpora, (c) pair-identity with the full
    index either way."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.queries.pipeline import (
        ngram_jaccard_pairs,
        pick_jaccard_route,
        route_jaccard,
    )
    from tools.prefix_crossover import skewed_df_docs

    # (a) decision table — cut is max_df > share * n_docs
    assert pick_jaccard_route(1000, 20, 0.02) == "full"  # at the cut
    assert pick_jaccard_route(1000, 21, 0.02) == "df"  # past the cut
    assert pick_jaccard_route(0, 0, 0.02) == "full"  # empty corpus
    assert pick_jaccard_route(20_000, 2000, 0.02) == "df"  # sweep cell

    # (b)+(c) on the battery corpora: K=20 → max df ~5% (heavy),
    # K=400 → max df ~0.25% (benign)
    for k, expect in ((20, "df"), (400, "full")):
        toks = skewed_df_docs(spark, 2000, k).persist()
        docs_sh = toks.select(
            "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
        ).filter(F.size("sh") > 0)
        choice: list = []
        routed = route_jaccard(docs_sh, choice_out=choice)
        assert choice == [expect], (k, choice)
        full = ngram_jaccard_pairs(toks)
        assert full.exceptAll(routed).count() == 0, k
        assert routed.exceptAll(full).count() == 0, k
        # non-vacuous: planted exact duplicates found by both routes
        assert routed.filter(F.col("jaccard") == 1.0).count() >= 20
        toks.unpersist()


def test_ppjoin_identity_and_positional_cut(spark):
    """r10: PPJoin (prefix + POSITIONAL filter) must (a) return exactly
    the full-index pairs on the real corpus AND the heavy-tailed-df
    corpus under both canonical orders, and (b) prune candidates the
    plain prefix filter keeps.  The pruning case is pinned on a
    crafted pair whose only common token sits LATE in one prefix:
    A = [1..10], B = [5, 20..28] collide on token 5 (position 4 in A,
    0 in B), so the bound c + min(na-ai-1, nb-bj-1) = 1 + 5 = 6 falls
    below the required overlap alpha = ceil(0.6*20/1.6) = 8 — pruned
    before the verify, while the prefix filter ships both arrays."""
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.queries.pipeline import (
        _tokens,
        canonical_sorted,
        jaccard_ppjoin_pairs,
        ngram_jaccard_pairs,
        ppjoin_candidates,
    )
    from taipei_bi_etl_spark.io import read_table
    from tools.prefix_crossover import skewed_df_docs

    # (a) identity on the real corpus
    d = read_table(spark, SF_DIR, "documents")
    docs_sh = d.select(
        "doc_id", shingle_hash_array(_tokens()).alias("sh")
    ).filter(F.size("sh") > 0)
    full = ngram_jaccard_pairs(d.select("doc_id", _tokens().alias("tok")))
    pp = jaccard_ppjoin_pairs(docs_sh)
    assert full.exceptAll(pp).count() == 0
    assert pp.exceptAll(full).count() == 0

    # (a') identity on the heavy-tailed battery corpus, both orders
    toks = skewed_df_docs(spark, 1000, 20).persist()
    sk_sh = toks.select(
        "doc_id", shingle_hash_array(F.col("tok")).alias("sh")
    ).filter(F.size("sh") > 0)
    sk_full = ngram_jaccard_pairs(toks)
    for canonical in ("hash", "df"):
        sk_pp = jaccard_ppjoin_pairs(sk_sh, canonical=canonical)
        assert sk_full.exceptAll(sk_pp).count() == 0, canonical
        assert sk_pp.exceptAll(sk_full).count() == 0, canonical
        # non-vacuous: the 1000-doc corpus plants 1000/100 = 10 exact dups
        assert sk_pp.filter(F.col("jaccard") == 1.0).count() >= 10, canonical
    toks.unpersist()

    # (b) the positional prune on the crafted pair: prefix keeps the
    # candidate (prefix collision on token 5), PPJoin drops it.
    crafted = spark.createDataFrame(
        [
            (1, list(range(1, 11))),
            (2, [5] + list(range(20, 29))),
        ],
        "doc_id long, sh array<bigint>",
    )
    sorted_sh = canonical_sorted(crafted).select(
        "doc_id",
        "sh",
        (
            F.size("sh")
            - F.floor((F.size("sh") * 3 + 4) / F.lit(5))
            + 1
        ).cast("int").alias("p"),
    )
    assert ppjoin_candidates(sorted_sh, 3, 5).count() == 0
    # prefix-only candidates (pair-distinct over the prefix join)
    pref_idx = sorted_sh.select(
        "doc_id", F.explode(F.slice("sh", 1, F.col("p"))).alias("shingle")
    )
    a, b = pref_idx.alias("a"), pref_idx.alias("b")
    n_pref = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert n_pref == 1

    # (b') on the real corpus the PPJoin candidate set is a subset
    docs_p = canonical_sorted(docs_sh).select(
        "doc_id",
        "sh",
        (
            F.size("sh")
            - F.floor((F.size("sh") * 3 + 4) / F.lit(5))
            + 1
        ).cast("int").alias("p"),
    ).persist()
    pp_cands = ppjoin_candidates(docs_p, 3, 5).count()
    real_idx = docs_p.select(
        "doc_id", F.explode(F.slice("sh", 1, F.col("p"))).alias("shingle")
    )
    a2, b2 = real_idx.alias("a"), real_idx.alias("b")
    pref_cands = (
        a2.join(b2, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    docs_p.unpersist()
    assert pp_cands <= pref_cands
