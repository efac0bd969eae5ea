"""Training-data pipeline queries over ``documents`` / ``embeddings`` —
the 100 TB-scale operators (dedup, similarity search, text analysis) that
extend the reference's repertoire (BASELINE north star; SURVEY §7.1 step 8).

Everything here is expressed as pure DataFrame ops (no Python UDFs) so the
same plan scales from sf0.001 to a 1000-executor cluster: shuffles are on
bounded keys (shingles, LSH bands, band buckets), and pairwise work only
ever happens within buckets, never all-pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query


def _tokens(col: str = "text"):
    """Whitespace tokenization, identical to DuckDB's string_split_regex."""
    return F.split(F.col(col), r"\s+")


# ---------------------------------------------------------------------------
# Exact dedup — hash-groupBy on content digest.
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS content_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
HAVING COUNT(*) > 1
"""


@query("dedup_exact", oracle=_EXACT_DEDUP_ORACLE, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by md5(text): keep lowest doc_id.

    Scale: the shuffle key is the 128-bit digest — uniformly distributed,
    no skew; map-side partial agg means each executor ships one row per
    local distinct hash.
    """
    # NULL text is not content — filtered in BOTH engines (md5(NULL)
    # would otherwise form a NULL dedup group).
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


@query(
    "dedup_exact_incremental",
    oracle=_EXACT_DEDUP_ORACLE,
    tags=("dedup", "ivm", "extension"),
)
def dedup_exact_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup against a persisted digest state table —
    the EIGHTH incremental form, and the first on the scaffold's
    AGG-MERGE path (`incremental.incremental_agg_merge`): the daily
    form of "update a keyed aggregate table", the reference's own
    per-day append model (SURVEY §2.9, tasks/bigquery.py:182-195).

    Per-side state = (content_hash, min doc_id, count) WITHOUT the
    HAVING — partials must keep singletons, because a singleton in
    history plus a singleton in the batch IS a duplicate pair.  Merge:
    keeper = least (skips the NULL side), copies = sum of partial
    counts; the >1 filter applies post-merge.  Daily cost ∝ |batch| +
    matched digest keys (full-outer join on the 128-bit digest —
    uniform, skew-free); history text is never re-hashed in the
    stored-state deployment.  IVM identity hash-proven by the driver
    gate: the ORACLE is the full recompute."""
    from taipei_bi_etl_spark.queries.incremental import (
        incremental_agg_merge,
        quantile_cut_split,
    )

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    hist, new = quantile_cut_split(d, "doc_id")

    def _digest_state(side: DataFrame) -> DataFrame:
        return side.groupBy(F.md5("text").alias("content_hash")).agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )

    merged = incremental_agg_merge(
        hist,
        new,
        _digest_state,
        ["content_hash"],
        {
            "keep_doc_id": F.least,  # least skips the absent (NULL) side
            "n_copies": lambda a, b: F.coalesce(a, F.lit(0))
            + F.coalesce(b, F.lit(0)),
        },
    )
    return merged.filter(F.col("n_copies") > 1)


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup — shingle → inverted index join → verify.
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tok) - 1, 1)),
                i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS shingle
  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM documents)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), pair_inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
FROM pair_inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.6
"""


def ngram_jaccard_pairs(
    toks: DataFrame, threshold: float = 0.6, df_cap: int | None = None
) -> DataFrame:
    """Exact n-gram Jaccard pairs over a (doc_id, tok) frame via an
    inverted index of hashed shingles (8-byte shuffle keys, never the
    3-word strings).  ``df_cap`` drops stop-shingles shared by more than
    K docs before the self-join — the quadratic-bucket guard at corpus
    scale (join volume ∝ Σ df(shingle)²)."""
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        ngram_pair_overlap(toks, df_cap)
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def ngram_pair_overlap(
    toks: DataFrame, df_cap: int | None = None
) -> DataFrame:
    """Shared inverted-index machinery for every set-overlap dedup
    measure: (doc_id, tok) → (doc_a, doc_b, inter, na, nb) for all
    pairs sharing ≥1 shingle.  Jaccard (`ngram_jaccard_pairs`) and
    containment (`curation2.dedup_ngram_containment`) differ only in
    the scoring expression they put on top — one definition of the
    index/cap/self-join, so a fix lands in both."""
    from taipei_bi_etl_spark.queries.dedup import (
        cap_document_frequency,
        shingle_hash_array,
    )

    # the inverted index feeds three subtrees (sizes + both join sides);
    # persist so the explode computes once per run.  No distinct needed:
    # shingle_hash_array is array_distinct per doc, so (doc_id, shingle)
    # is unique by construction — that's one whole index shuffle saved.
    sh = toks.select(
        "doc_id", F.explode(shingle_hash_array(F.col("tok"))).alias("shingle")
    ).persist()
    # cap BEFORE sizes: similarity is then exact over the capped shingle
    # universe (stop-shingles excluded from BOTH intersection and sizes
    # — identical docs stay at 1.0, like stopword removal).
    sh = cap_document_frequency(sh, df_cap)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pair_inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    # NO broadcast hints on sa/sb: they are per-document frames (one row
    # per doc), i.e. corpus-cardinality — a forced hint overrides the
    # planner's size check and OOMs every executor at 10^9+ docs.  AQE
    # broadcasts them when genuinely small (same plan at bench scale);
    # the no-ResolvedHint contract is pinned in tests/test_plan_audit.py.
    return pair_inter.join(sa, "doc_a").join(sb, "doc_b")


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-duplicate pairs (threshold 0.6) via an inverted
    index of HASHED shingles — candidate pairs only ever meet inside a
    shingle bucket, and the index shuffle carries longs, not strings.

    Core in :func:`ngram_jaccard_pairs`, which also carries the
    ``df_cap`` stop-shingle guard (off here — the sf data's max df is
    25; the guard is pinned in tests/test_dedup.py).  MinHash-LSH
    (dedup_minhash_lsh) is the candidate-pruning path at 100 TB.

    widen_scan: tokenize + shingle-hash explode are map-side above the
    scan; a single-file input runs them on one core (measured 1.19×
    whole-query at sf0.1, SCALE.md r10).
    """
    from taipei_bi_etl_spark.scale import widen_scan

    d = widen_scan(read_table(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(d.select("doc_id", _tokens().alias("tok")))


def _jaccard_from_index(
    probe: DataFrame, index: DataFrame, normalized: bool,
    threshold: float = 0.6,
) -> DataFrame:
    """Jaccard-≥-threshold pairs with at least one side in ``probe``
    (postings frames of (doc_id, shingle)); sizes come from ``index``,
    which must contain every doc either side of a pair (true in both
    scaffold terms: yesterday passes hist twice; the probe term's
    index is the full union).

    ``normalized=False`` is the self-join shape (strict ``a < b`` —
    each pair meets once per shared shingle, no dedup needed);
    ``normalized=True`` is the probe shape, where only ONE side is the
    batch, so cross pairs arrive (new, hist) = (larger, smaller) and
    need least/greatest + a per-(pair, shingle) distinct (new×new
    pairs meet in both orders)."""
    sizes = index.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = probe.alias("a"), index.alias("b")
    joined = a.join(b, "shingle")
    if normalized:
        hits = (
            joined.filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
                "shingle",
            )
            .distinct()
        )
    else:
        hits = joined.filter(F.col("a.doc_id") < F.col("b.doc_id")).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "shingle",
        )
    pair_inter = hits.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        pair_inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "dedup_ngram_jaccard_incremental",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "ivm", "extension"),
)
def dedup_ngram_jaccard_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental exact n-gram Jaccard dedup against a persisted
    shingle-postings index — the SEVENTH incremental form, and the
    first written ON the r08 scaffold (`incremental.quantile_cut_split`
    + `incremental_pairs`): the domain code is one index (the shingle
    postings the full `dedup_ngram_jaccard` already shuffles) and one
    pair scorer (`_jaccard_from_index`), ~30 lines.

    IVM identity, hash-proven by the driver gate: the ORACLE is the
    FULL all-pairs recompute; the plan computes ``pairs(hist) ∪
    probe(new, postings(hist) ∪ postings(new))``.  Exactness holds
    because the shingle split is per-doc (every posting of a doc lands
    on its side of the cut), so yesterday's sizes/intersections are
    final, and the probe term covers every pair touching the batch
    once (normalized least/greatest + per-(pair, shingle) distinct).
    Daily cost ∝ |batch| postings + collided buckets — history text is
    never re-shingled in the stored-state deployment
    (`scale.write_bucketed` on the shingle key)."""
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.queries.incremental import (
        incremental_pairs,
        quantile_cut_split,
    )

    d = read_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(shingle_hash_array(_tokens())).alias("shingle"),
    ).persist()
    hist, new = quantile_cut_split(sh, "doc_id")
    return incremental_pairs(
        hist,
        new,
        lambda postings: postings,  # postings ARE the index
        lambda p, i: _jaccard_from_index(p, i, normalized=False),
        lambda p, i: _jaccard_from_index(p, i, normalized=True),
    )


_VOCAB_DF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL
)
SELECT token,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM tok WHERE token <> '' GROUP BY token
"""


@query(
    "vocab_df_incremental",
    oracle=_VOCAB_DF_ORACLE,
    tags=("text", "ivm", "extension"),
)
def vocab_df_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental vocabulary statistics (document frequency + term
    frequency) — the NINTH incremental form, third on the scaffold's
    agg-merge path: the df table behind BM25 scoring and the
    `dedup_jaccard_prefix_df` routing is exactly the keyed aggregate a
    daily pipeline must maintain without re-tokenizing history.

    Both df and tf are MERGEABLE as sums because the batch split is
    per-doc (a doc's tokens land entirely on one side, so each side's
    COUNT(DISTINCT doc_id) counts disjoint docs).  Empty tokens are
    excluded in both engines (leading-whitespace artifacts of the
    split — the established tokenization twin).  IVM identity
    hash-proven by the driver gate: the ORACLE is the full recompute."""
    from taipei_bi_etl_spark.queries.incremental import (
        incremental_agg_merge,
        quantile_cut_split,
    )

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    hist, new = quantile_cut_split(d, "doc_id")

    def _vocab_state(side: DataFrame) -> DataFrame:
        toks = side.select(
            "doc_id", F.explode(_tokens()).alias("token")
        ).filter(F.col("token") != "")
        return toks.groupBy("token").agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )

    _sum = lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))  # noqa: E731
    return incremental_agg_merge(
        hist, new, _vocab_state, ["token"], {"df": _sum, "tf": _sum}
    )


def canonical_sorted(
    docs_sh: DataFrame,
    canonical: str = "hash",
    df_counts: DataFrame | None = None,
) -> DataFrame:
    """Sort each doc's ``sh`` array by the chosen GLOBAL total order —
    the shared front end of every prefix-filtered join
    (`jaccard_prefix_filter_pairs`, `jaccard_ppjoin_pairs`,
    `curation2.containment_prefix_pairs` keeps its own copy of the
    hash branch).  ``"hash"`` sorts by shingle hash (zero extra
    shuffle); ``"df"`` sorts by ASCENDING document frequency, ties by
    hash (Bayardo's prescription — boilerplate sorts last and drops
    out of prefixes).

    INPUT CONTRACT (ADVICE r08 #5): `sh` must be DISTINCT PER DOC
    (every caller builds it with array_distinct — Jaccard is set
    semantics).  count(*) over postings then equals document frequency
    exactly; arrays with intra-doc duplicates would inflate df (any
    resulting order is still a valid global order, so pair
    completeness survives — only the df-ascending routing rationale
    would silently degrade).  countDistinct(doc_id) would make df
    exact regardless, at the cost of a second partial-distinct pass
    the contract makes unnecessary."""
    if canonical != "df":
        return docs_sh.select("doc_id", F.array_sort("sh").alias("sh"))
    # df-ascending global order: explode once, count df per shingle,
    # re-assemble each doc's array sorted by (df, hash).  The df frame
    # is shingle-keyed (uniform); the re-sort is one groupBy on doc_id
    # — both linear, no pair-shaped work.
    postings = docs_sh.select("doc_id", F.explode("sh").alias("shingle"))
    if df_counts is None:
        # callers that already aggregated df (route_jaccard's routing
        # probe) pass it in — one aggregate, used twice
        df_counts = postings.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("df")
        )
    return (
        postings.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("sh")
        )
    )


def jaccard_prefix_filter_pairs(
    docs_sh: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    canonical: str = "hash",
    df_counts: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (Bayardo et al. WWW'07 /
    PPJoin, Xiao et al. WWW'08) over a (doc_id, sh: array<bigint>)
    frame of distinct shingle hashes.

    Instead of indexing EVERY shingle (``ngram_pair_overlap``, join
    volume ∝ Σ df(shingle)²), each document indexes only the first
    ``p = n − ⌈t·n⌉ + 1`` shingles of its canonically-ordered set
    (global order = hash value; the array is sorted ONCE per doc inside
    a projection — no window, no extra shuffle).  Completeness: for
    J(A,B) ≥ t the size filter gives |B| ≥ t·|A|, so the required
    overlap o = ⌈t/(1+t)·(|A|+|B|)⌉ ≥ ⌈t·|A|⌉; the globally-SMALLEST
    common shingle s* is preceded in A only by non-common shingles
    (≤ |A| − o of them), hence sits within A's first |A| − ⌈t·|A|⌉ + 1
    — and symmetrically within B's prefix.  Every qualifying pair
    therefore collides in the prefix index; the exact verify
    (array_intersect on the full sorted arrays) removes false
    candidates, so the output is IDENTICAL to the full-index form and
    shares its oracle.

    t is passed as an exact rational (3/5): ``⌈t·n⌉`` is computed in
    integer arithmetic (``(3n + 4) div 5``) — ``ceil(0.6 * n)`` in
    doubles rounds 0.6·5 to 3.0000000000000004 and over-shrinks the
    prefix, a silent completeness hole.

    100 TB: index volume drops to ~(1−t) of the full inverted index
    (measured 0.40× postings at sf0.01) and candidate volume falls
    quadratically in the bucket sizes; the known further upgrade (not
    needed here) is df-ascending canonical order, which costs one df
    aggregation + per-doc re-sort but makes prefixes maximally
    selective.  The verify join ships each doc's array once, keyed by
    doc_id (uniform).

    CANONICAL ORDER — the routing finding (r08 crossover measurement,
    SCALE.md): with ``canonical="hash"`` a boilerplate shingle's
    prefix-inclusion is CORRELATED across the docs sharing it (same
    hash everywhere), so candidate volume falls only ~linearly in the
    prefix fraction and the array-verify overhead dominates — measured
    MONOTONICALLY WORSE than the full index as max df grows (speedup
    0.99x at df 100 → 0.45x at df 2000 on the skewed-df corpus).
    ``canonical="df"`` sorts each doc's shingles by ASCENDING document
    frequency (Bayardo's actual prescription; ties by hash — any
    global total order preserves the completeness lemma): high-df
    boilerplate sorts LAST and drops out of every long doc's prefix
    entirely, collapsing Σ df_prefix².  Costs one df aggregate + one
    postings join at index time; measured crossover in SCALE.md r08.
    Routing: benign/bounded df → `dedup_ngram_jaccard` (full index);
    heavy-tailed df → THIS form with canonical="df"; canonical="hash"
    is the zero-extra-shuffle form for corpora without shared
    boilerplate.
    """
    p = (
        F.size("sh")
        - F.floor(
            (F.size("sh") * threshold_num + (threshold_den - 1))
            / F.lit(threshold_den)
        )
        + 1
    ).cast("int")
    docs_sh = canonical_sorted(docs_sh, canonical, df_counts)
    sorted_sh = docs_sh.select("doc_id", "sh", p.alias("p")).persist()
    pref_idx = sorted_sh.select(
        "doc_id", F.explode(F.slice("sh", 1, F.col("p"))).alias("shingle")
    )
    a, b = pref_idx.alias("a"), pref_idx.alias("b")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    arr_a = sorted_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    arr_b = sorted_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    )
    t = F.lit(threshold_num) / F.lit(threshold_den)
    return (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .filter(jac >= t)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "dedup_jaccard_prefix_filter",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "extension"),
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-duplicate pairs (threshold 0.6) via PREFIX
    FILTERING — same output (and oracle) as :func:`dedup_ngram_jaccard`,
    indexing only each doc's first ``n − ⌈0.6·n⌉ + 1`` hash-ordered
    shingles instead of all n.  Core + completeness proof in
    :func:`jaccard_prefix_filter_pairs`."""
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array

    d = read_table(spark, sf_dir, "documents")
    docs_sh = d.select(
        "doc_id", shingle_hash_array(_tokens()).alias("sh")
    ).filter(F.size("sh") > 0)
    return jaccard_prefix_filter_pairs(docs_sh)


@query(
    "dedup_jaccard_prefix_df",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "extension"),
)
def dedup_jaccard_prefix_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered Jaccard with DF-ASCENDING canonical order — the
    heavy-tailed-df scale path (r08 crossover measurement, SCALE.md):
    high-df boilerplate shingles sort last and drop out of every long
    doc's prefix, so candidate volume stays bounded where the full
    index's Σdf² join and the hash-ordered prefix both blow up
    (measured 1.91x the full index at max df = 10% of docs, and
    FALLING in absolute terms as df grows).  Same output and oracle as
    `dedup_ngram_jaccard`; order validity + completeness proof in
    :func:`jaccard_prefix_filter_pairs`."""
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: shingle build + df-ascending sort-prep are map-side
    # above this scan (measured 1.52× whole-query at sf0.1, SCALE.md
    # r10; the hash-ordered sibling measured FLAT 0.96× and stays
    # unwidened)
    d = widen_scan(read_table(spark, sf_dir, "documents"))
    docs_sh = d.select(
        "doc_id", shingle_hash_array(_tokens()).alias("sh")
    ).filter(F.size("sh") > 0)
    return jaccard_prefix_filter_pairs(docs_sh, canonical="df")


def ppjoin_candidates(
    sorted_sh: DataFrame, threshold_num: int, threshold_den: int
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs surviving PPJoin's POSITIONAL
    filter (Xiao et al. WWW'08 §3.2), given a persisted
    (doc_id, sh, p, n) frame in canonical order.

    The prefix index keeps each token's 0-based POSITION
    (``posexplode``).  For a candidate pair let c = number of tokens
    common to BOTH prefixes, and (ai, bj) = positions of the LAST such
    token w* (both arrays sort by the SAME global order, so
    ``max(a.pos)`` and ``max(b.pos)`` name the same token).  Every
    common token < w* that sits in one prefix provably sits in the
    other (positions are monotone in the global order), so overlap
    decomposes as c + |common tokens > w*| ≤ c + min(na−ai−1, nb−bj−1).
    Pairs whose bound falls below the required overlap
    α = ⌈t·(na+nb)/(1+t)⌉ cannot reach J ≥ t and are pruned BEFORE the
    array verify — the filter subsumes the classic length filter
    (nb < t·na forces the bound under α).  α is integer-exact:
    ``(num·(na+nb) + num+den−1) div (num+den)`` for t = num/den.

    Output is a SUPERSET of the true pairs (the bound is an upper
    bound on overlap) and a subset of the plain prefix candidates —
    the exact verify on top makes the final answer identical."""
    pref = sorted_sh.select(
        "doc_id",
        F.size("sh").alias("n"),
        F.posexplode(F.slice("sh", 1, F.col("p"))).alias("pos", "shingle"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    alpha = F.floor(
        (
            F.lit(threshold_num) * (F.col("na") + F.col("nb"))
            + F.lit(threshold_num + threshold_den - 1)
        )
        / F.lit(threshold_num + threshold_den)
    )
    bound = F.col("c") + F.least(
        F.col("na") - F.col("ai") - 1, F.col("nb") - F.col("bj") - 1
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max(F.col("a.pos")).alias("ai"),
            F.max(F.col("b.pos")).alias("bj"),
        )
        .filter(bound >= alpha)
        .select("doc_a", "doc_b")
    )


def jaccard_ppjoin_pairs(
    docs_sh: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    canonical: str = "hash",
    df_counts: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via PPJoin — prefix filtering PLUS the
    positional filter (:func:`ppjoin_candidates`), the published
    upgrade over :func:`jaccard_prefix_filter_pairs` (Xiao et al.
    WWW'08): candidates that collide only EARLY-in-one / LATE-in-other
    prefix positions are pruned before the array verify, so the
    verify join (each side ships its full sorted array) runs on a
    strict subset of the prefix candidates.  Output IDENTICAL to the
    full-index / prefix forms (the bound is conservative; the verify
    is exact) — shares `_JACCARD_ORACLE`.

    The candidate aggregation groups by pair — the SAME shuffle shape
    as the prefix form's pair-distinct, carrying three small ints
    more; the saving is entirely in the verify join volume (measured
    in SCALE.md r10).  100 TB: the pair-keyed aggregate is the
    existing candidate shuffle, the positional columns are O(1) per
    posting, and the pruned verify is the step whose per-pair array
    shipping dominates at scale."""
    p = (
        F.size("sh")
        - F.floor(
            (F.size("sh") * threshold_num + (threshold_den - 1))
            / F.lit(threshold_den)
        )
        + 1
    ).cast("int")
    docs_sh = canonical_sorted(docs_sh, canonical, df_counts)
    sorted_sh = docs_sh.select("doc_id", "sh", p.alias("p")).persist()
    cand = ppjoin_candidates(sorted_sh, threshold_num, threshold_den)
    arr_a = sorted_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    arr_b = sorted_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    t = F.lit(threshold_num) / F.lit(threshold_den)
    return (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .filter(jac >= t)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "dedup_jaccard_ppjoin",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "extension"),
)
def dedup_jaccard_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-duplicate pairs (threshold 0.6) via PPJOIN —
    prefix filtering + the positional filter, pruning verify
    candidates whose last common prefix token sits too late in either
    array to still reach the required overlap.  Same output (and
    oracle) as `dedup_ngram_jaccard`; bound derivation + safety proof
    in :func:`ppjoin_candidates`."""
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: shingle build + per-doc positional prefix prep are
    # map-side above this scan (measured 1.25× whole-query at sf0.1,
    # SCALE.md r10)
    d = widen_scan(read_table(spark, sf_dir, "documents"))
    docs_sh = d.select(
        "doc_id", shingle_hash_array(_tokens()).alias("sh")
    ).filter(F.size("sh") > 0)
    return jaccard_ppjoin_pairs(docs_sh)


#: Max-df share above which exact Jaccard routes to the df-ascending
#: prefix filter (r08 crossover, SCALE.md "Prefix-filter crossover
#: MEASURED"): df-order beats the full index once max df exceeds
#: ~2-5% of the corpus (between the 400 and 1000 cells of the 20k-doc
#: sweep); below it the full index's simpler verify wins.  2% is the
#: conservative low edge — at the crossover both forms are within
#: ~1.05x of each other, so an early switch costs little while a late
#: one rides the full index's Σdf² blow-up.
_DF_SHARE_CUT = float(os.environ.get("SPARK_GRAFT_JACCARD_DF_SHARE", "0.02"))


def pick_jaccard_route(
    n_docs: int, max_df: int, df_share_cut: float = _DF_SHARE_CUT
) -> str:
    """Pure routing rule: ``"df"`` (df-ascending prefix filter) when
    the most frequent shingle appears in more than ``df_share_cut`` of
    the corpus, else ``"full"`` (plain inverted index).  Split out so
    the routing pytest can pin the decision table without running
    corpora."""
    if n_docs > 0 and max_df > df_share_cut * n_docs:
        return "df"
    return "full"


def route_jaccard(
    docs_sh: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    df_share_cut: float = _DF_SHARE_CUT,
    choice_out: list | None = None,
) -> DataFrame:
    """Exact Jaccard pairs with MEASURED-CROSSOVER ROUTING (r09,
    VERDICT r08 #1 — the executable form of SCALE.md's prefix-filter
    crossover): probe the corpus's max document-frequency share with
    one shingle-keyed aggregate, then dispatch —

    * bounded df (max df ≤ ``df_share_cut`` · n_docs): FULL inverted
      index (`_jaccard_from_index` over the postings — the
      `dedup_ngram_jaccard` machinery), whose simple count-verify wins
      when no shingle bucket is quadratic;
    * heavy-tailed df: DF-ASCENDING prefix filter
      (`jaccard_prefix_filter_pairs(canonical="df")`), where
      boilerplate sorts out of every prefix and candidate volume stays
      bounded while the full index's join grows ∝ Σ df² — measured
      1.91x the full index at max df = 10% of docs and FALLING in
      absolute time as df grows.

    Both arms emit identical (doc_a, doc_b, jaccard) rows (the
    completeness lemma in :func:`jaccard_prefix_filter_pairs`), so
    routing never changes the answer — the routing pytest pins the
    CHOICE on the benign and heavy-tailed battery corpora and
    pair-identity either way.  The df aggregate the probe needs is
    exactly the index-time aggregate the df arm needs, so it is
    computed once and passed through (``df_counts``).

    EAGER-EXECUTION NOTE (same class as `linkage.blocked_components`):
    the probe runs at DataFrame-construction time — two scalar
    actions (doc count + max df) over persisted frames the chosen arm
    reuses.  Routing on a data statistic cannot be lazy without a
    custom planner rule.

    100 TB: the probe is linear and shingle-keyed (no pair-shaped
    work); the heavy tail it detects is exactly the boilerplate
    problem of event/telemetry text at corpus scale (the reference's
    `udf_js`-era feature strings share templated prefixes the same
    way, reference `udf_js/feature_mapping.sql`-class data)."""
    docs_sh = docs_sh.persist()
    n_docs = docs_sh.count()
    postings = docs_sh.select(
        "doc_id", F.explode("sh").alias("shingle")
    ).persist()
    df_counts = postings.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df")
    ).persist()
    row = df_counts.agg(F.max("df").alias("max_df")).first()
    max_df = int(row["max_df"] or 0)
    route = pick_jaccard_route(n_docs, max_df, df_share_cut)
    if choice_out is not None:
        choice_out.append(route)
    if route == "df":
        # The df arm rebuilds its postings from docs_sh (df-ascending
        # canonical order needs a fresh explode anyway), so the probe's
        # postings frame — the largest intermediate — is only needed by
        # the probe aggregate and the full arm.  Release it here rather
        # than letting it ride double-cached for the query's lifetime
        # (ADVICE r09 #3).
        postings.unpersist()
        return jaccard_prefix_filter_pairs(
            docs_sh,
            threshold_num=threshold_num,
            threshold_den=threshold_den,
            canonical="df",
            df_counts=df_counts,
        )
    df_counts.unpersist()
    return _jaccard_from_index(
        postings,
        postings,
        normalized=False,
        threshold=threshold_num / threshold_den,
    )


@query(
    "dedup_jaccard_routed",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "extension"),
)
def dedup_jaccard_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION exact-Jaccard entry: measured-crossover routing
    between the full inverted index and the df-ascending prefix filter
    (core + routing rule in :func:`route_jaccard`).  On the benign
    test corpus (max df 25) the probe picks the full index; a
    boilerplate-heavy corpus (max df > 2% of docs) flips to the
    df-ascending form.  Same output and oracle as
    `dedup_ngram_jaccard` either way."""
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: the shingle build feeding the probe + both arms is
    # map-side above this scan (measured 1.07× whole-query at sf0.1 —
    # modest because the probe aggregate lands early, but positive on
    # both arms; SCALE.md r10)
    d = widen_scan(read_table(spark, sf_dir, "documents"))
    docs_sh = d.select(
        "doc_id", shingle_hash_array(_tokens()).alias("sh")
    ).filter(F.size("sh") > 0)
    return route_jaccard(docs_sh)


# ---------------------------------------------------------------------------
# Text quality scoring.
# ---------------------------------------------------------------------------

_QUALITY_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, source,
         len(string_split_regex(text, '\\s+')) AS n_tokens,
         length(text) AS n_chars_actual,
         len(list_filter(string_split_regex(text, '\\s+'),
             t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS n_stop
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_tokens), 6) AS avg_tokens,
       ROUND(CAST(SUM(CAST(floor(CAST(n_chars_actual AS DOUBLE) / n_tokens * 1000000) AS BIGINT)) AS BIGINT)
             / 1000000.0 / COUNT(*), 6) AS avg_chars_per_token,
       ROUND(CAST(SUM(CAST(floor(CAST(n_stop AS DOUBLE) / n_tokens * 1000000) AS BIGINT)) AS BIGINT)
             / 1000000.0 / COUNT(*), 6) AS avg_stopword_ratio
FROM scored GROUP BY source
"""


@query("text_quality_scores", oracle=_QUALITY_ORACLE, tags=("text",))
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features per source: token count, chars/token,
    stopword ratio — all pure array expressions, fully codegen'd."""
    d = read_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in ("the", "a", "and", "of", "to", "in")])
    tok = _tokens()
    scored = d.select(
        "source",
        F.size(tok).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.size(F.filter(tok, lambda t: F.array_contains(stop, t))).alias("n_stop"),
    )
    def _avg_micros(ratio):
        # per-row ratio is one deterministic division; floor to exact
        # integer micros so the cross-row sum is order-independent
        return F.round(
            F.sum(F.floor(ratio * 1_000_000).cast("long"))
            / F.lit(1_000_000.0)
            / F.count(F.lit(1)),
            6,
        )

    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        _avg_micros(F.col("n_chars_actual").cast("double") / F.col("n_tokens")).alias(
            "avg_chars_per_token"
        ),
        _avg_micros(F.col("n_stop").cast("double") / F.col("n_tokens")).alias(
            "avg_stopword_ratio"
        ),
    )
