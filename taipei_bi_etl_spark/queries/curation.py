"""End-to-end corpus curation — the composed training-data pipeline the
individual operators exist for (BASELINE north star), as ONE
oracle-checked query:

  documents
    → quality gate   (length + stopword-ratio heuristics)
    → language gate  (declared-lang whitelist)
    → exact dedup    (md5 groups, keep min doc_id)
    → near-dup dedup (3-gram Jaccard pairs → connected components →
                      keep each cluster's canonical min-doc survivor)
    → per-source token budget of the surviving corpus

Every stage is the same logic as its standalone query (pipeline.py,
clustering.py, text.py); the composition is what a real curation run
executes, and Catalyst fuses the gates into the scans.

Scale: gates are map-side; dedup shuffles on digest/shingle as before;
the final rollup is tiny.  At 100 TB this plan is the blueprint: the
expensive stages (pair generation) run on the GATED corpus, so cheap
filters run first — filter-early ordering matters more than any knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.dedup import _poly_sql, shingle_hash_array

MIN_TOKENS = 20
MAX_STOPWORD_RATIO = 0.5
KEEP_LANGS = ("en", "es", "fr", "de")
JACCARD_T = 0.8
_STOP = ("the", "a", "and", "of", "to", "in")

_CURATION_ORACLE = f"""
WITH RECURSIVE gated AS (
  SELECT doc_id, source, text
  FROM documents
  WHERE lang IN {KEEP_LANGS!r}
    AND len(string_split_regex(text, '\\s+')) >= {MIN_TOKENS}
    AND len(list_filter(string_split_regex(text, '\\s+'),
            t -> t IN {_STOP!r})) * 1.0
        / len(string_split_regex(text, '\\s+')) <= {MAX_STOPWORD_RATIO}
), exact_kept AS (
  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
), surviving AS (
  SELECT g.* FROM gated g JOIN exact_kept k USING (doc_id)
), shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tok) - 1, 1)),
                i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS shingle
  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM surviving)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), pair_inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM pair_inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_T}
), reach(node, root) AS (
  SELECT d, d FROM (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs) t(d)
  UNION
  SELECT e.b, r.root FROM reach r
  JOIN (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs) e ON e.a = r.node
), components AS (
  SELECT node AS doc_id, MIN(root) AS component_id FROM reach GROUP BY node
), final AS (
  SELECT s.* FROM surviving s
  LEFT JOIN components c USING (doc_id)
  WHERE c.doc_id IS NULL OR c.component_id = s.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_tokens
FROM final GROUP BY source
"""


@query(
    "curation_end_to_end",
    oracle=_CURATION_ORACLE,
    tags=("dedup", "text", "extension", "composed"),
)
def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline (see module docstring)."""
    d = read_table(spark, sf_dir, "documents")
    tok = F.split(F.col("text"), r"\s+")
    n_tok = F.size(tok)
    stop = F.array(*[F.lit(s) for s in _STOP])
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(stop, t)))
    gated = d.filter(
        F.col("lang").isin(*KEEP_LANGS)
        & (n_tok >= MIN_TOKENS)
        & (n_stop * 1.0 / n_tok <= MAX_STOPWORD_RATIO)
    ).select("doc_id", "source", "text")

    # exact dedup: keep each digest group's min doc_id
    exact_kept = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surviving = gated.join(exact_kept.select("doc_id"), "doc_id")

    # near-dup pairs on the gated corpus (inverted shingle index, exact)
    toks = surviving.select("doc_id", F.split(F.col("text"), r"\s+").alias("tok"))
    # no distinct: shingle_hash_array is already array_distinct per doc
    sh = toks.select(
        "doc_id", F.explode(shingle_hash_array(F.col("tok"))).alias("shingle")
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
    # sa/sb are per-document frames — never force-broadcast corpus-
    # cardinality sides; AQE broadcasts them when genuinely small.
    pairs = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_T)
        .select("doc_a", "doc_b")
    )

    # connected components by iterative min-label propagation
    from taipei_bi_etl_spark.queries.clustering import min_label_components

    labels = min_label_components(pairs, "doc_a", "doc_b").withColumnRenamed(
        "node", "doc_id"
    )

    # keep docs not in any near-dup cluster, plus each cluster's canonical
    final = surviving.join(labels, "doc_id", "left").filter(
        F.col("component_id").isNull()
        | (F.col("component_id") == F.col("doc_id"))
    )
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Content-addressed corpus splitting.
# ---------------------------------------------------------------------------

_SPLIT_P1, _SPLIT_B1 = 1_000_000_007, 31
_SPLIT_P2, _SPLIT_B2 = 999_999_937, 37

_SPLIT_ORACLE = f"""
WITH hashed AS (
  SELECT source, n_chars,
         {_poly_sql("text", _SPLIT_B1, _SPLIT_P1)} % 100 AS b1,
         {_poly_sql("text", _SPLIT_B2, _SPLIT_P2)} % 10 AS b2
  FROM documents
)
SELECT source,
       CASE WHEN b1 < 80 THEN 'train'
            WHEN b1 < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN b2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM hashed GROUP BY source, 2
"""


@query(
    "corpus_hash_split",
    oracle=_SPLIT_ORACLE,
    tags=("text", "extension", "curation"),
)
def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed train/val/test split (80/10/10) plus a
    deterministic 10% stratified-sample flag from an independent second
    hash — per (source, split) accounting.

    This is the standard corpus-split mechanism at scale: bucketing on a
    content hash (not RNG, not row position) keeps the assignment stable
    under re-partitioning, re-ingestion and dedup, so a document can
    never migrate from test into train between pipeline runs.  Pure
    map-side expression + tiny rollup — no shuffle of document content,
    embarrassingly parallel at 100 TB.  The portable polynomial hash
    makes the whole assignment cross-engine checkable; swapping in
    xxhash64 for speed only loses the oracle, not the semantics.
    """
    from taipei_bi_etl_spark.queries.text import _char_array, poly_hash

    d = read_table(spark, sf_dir, "documents")
    chars = _char_array(F.col("text"))
    b1 = poly_hash(chars, _SPLIT_B1, _SPLIT_P1) % 100
    b2 = poly_hash(chars, _SPLIT_B2, _SPLIT_P2) % 10
    split = (
        F.when(b1 < 80, "train").when(b1 < 90, "val").otherwise("test")
    )
    return (
        d.select(
            "source",
            split.alias("split"),
            "n_chars",
            (b2 == 0).cast("long").alias("sampled"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("sampled").alias("n_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# Source-mixture rebalancing — deterministic downsampling of
# over-represented sources to the mean token share (the "data mixing"
# step of a training pipeline; DoReMi-style weight vectors plug in by
# replacing the equal-share target).
# ---------------------------------------------------------------------------

_MIX_MOD = 1_000_000_007
_MIX_BASE = 31
_MIX_BUCKETS = 10_000

_MIX_ORACLE = f"""
WITH per_doc AS (
  SELECT source,
         len(string_split_regex(text, '\\s+')) AS n_tokens,
         ({_poly_sql("text", _MIX_BASE, _MIX_MOD)} % {_MIX_BUCKETS})
           / {_MIX_BUCKETS}.0 AS u
  FROM documents
), totals AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total
  FROM per_doc GROUP BY source
), m AS (
  SELECT AVG(total) AS mean_total FROM totals
), rates AS (
  SELECT source, LEAST(1.0, mean_total / total) AS rate FROM totals, m
)
SELECT p.source, ROUND(r.rate, 6) AS rate,
       CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(p.n_tokens) AS BIGINT) AS tokens_kept
FROM per_doc p JOIN rates r USING (source)
WHERE p.u < r.rate
GROUP BY p.source, r.rate
"""


@query(
    "corpus_mix_rebalance",
    oracle=_MIX_ORACLE,
    tags=("text", "extension", "sampling"),
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each source to at most the mean per-source token count
    via a content-addressed keep decision (portable polynomial hash of
    the text into 10k buckets, keep iff bucket/10k < rate).

    Scale shape: pass 1 is a tiny per-source rollup; the rate table
    (|sources| rows) BROADCASTS back onto the scan, so membership is
    decided map-side with no shuffle of content — and, like
    corpus_hash_split, the sample is stable under repartitioning,
    re-ingestion, and dedup reordering.  Exact doubles end-to-end:
    u is a 1e4-denominator rational, rate = mean/total computed from
    exact long sums, so both engines compare identically.
    """
    from taipei_bi_etl_spark.queries.text import _char_array, poly_hash

    d = read_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
        (
            F.pmod(
                poly_hash(_char_array(F.col("text")), _MIX_BASE, _MIX_MOD),
                F.lit(_MIX_BUCKETS),
            )
            / F.lit(float(_MIX_BUCKETS))
        ).alias("u"),
    )
    totals = per_doc.groupBy("source").agg(F.sum("n_tokens").alias("total"))
    mean_total = totals.agg(F.avg("total").alias("mean_total"))
    # bounded: 1-row mean
    rates = totals.crossJoin(F.broadcast(mean_total)).select(
        "source",
        F.least(F.lit(1.0), F.col("mean_total") / F.col("total")).alias(
            "rate"
        ),
    )
    return (
        # bounded: per-source rates (bounded domain)
        per_doc.join(F.broadcast(rates), "source")
        .filter(F.col("u") < F.col("rate"))
        .groupBy("source", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
        )
        .select(
            "source",
            F.round("rate", 6).alias("rate"),
            "n_docs_kept",
            "tokens_kept",
        )
    )


# ---------------------------------------------------------------------------
# C4/CCNet-style line-level dedup — strip content that repeats across
# the corpus, keep the rest of each document.
# ---------------------------------------------------------------------------

LINE_TOKENS = 10  # chunk width standing in for a "line" (corpus has no \n)
LINE_FREQ_CAP = 2  # a chunk seen more often than this is boilerplate


_LINE_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM documents
), flat AS (
  SELECT doc_id,
         unnest(range(1, CAST(ceil(len(tok) / {LINE_TOKENS}.0) AS BIGINT) + 1)) AS pos,
         unnest(list_transform(range(1, CAST(ceil(len(tok) / {LINE_TOKENS}.0) AS BIGINT) + 1),
                i -> array_to_string(tok[(i - 1) * {LINE_TOKENS} + 1 : i * {LINE_TOKENS}], ' '))) AS chunk
  FROM toks
), freq AS (
  SELECT chunk, COUNT(*) AS f FROM flat GROUP BY chunk
), agg AS (
  SELECT fl.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN fr.f > {LINE_FREQ_CAP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
         COALESCE(array_to_string(
           COALESCE(list(fl.chunk ORDER BY fl.pos) FILTER (WHERE fr.f <= {LINE_FREQ_CAP}), []),
           ' '), '') AS kept_text
  FROM flat fl JOIN freq fr USING (chunk)
  GROUP BY fl.doc_id
)
SELECT doc_id, n_chunks, n_removed, kept_text
FROM agg WHERE n_removed > 0
"""


@query("line_dedup_corpus", oracle=_LINE_DEDUP_ORACLE, tags=("ext", "curation"))
def line_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency line dedup (C4 "discard any line seen more than
    N times"; CCNet paragraph dedup): chunk every document into
    LINE_TOKENS-token lines, count each line's corpus frequency, strip
    lines above LINE_FREQ_CAP, and reconstruct the surviving text in
    position order.  Returns only changed documents (doc_id, n_chunks,
    n_removed, kept_text; kept_text = '' when everything was
    boilerplate).  The synthetic corpus has no newline structure, so the
    boundary function is a fixed-width chunker — swap in split-by-\\n
    for real text; the plumbing (position-aware explode, global
    frequency, ordered reassembly) is the operator.

    Scale: two shuffles — line frequency (map-side partial agg; the
    exchange carries distinct lines per task, 8-byte-hashable) and the
    per-doc regroup.  Content-level dedup complements doc-level dedup
    (dedup_* queries drop whole near-dup docs; this strips repeated
    boilerplate from docs that otherwise survive).  No driver
    collection; reassembly is array_sort over collect_list per doc.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.split(F.col("text"), r"\s+")
    chunks = docs.select("doc_id", tok.alias("tok")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, cast(ceil(size(tok) / {LINE_TOKENS}.0) as int)),"
                f" i -> named_struct('pos', cast(i as bigint),"
                f" 'chunk', array_join(slice(tok, (i - 1) * {LINE_TOKENS} + 1, {LINE_TOKENS}), ' ')))"
            )
        ).alias("c"),
    ).select(
        "doc_id",
        F.col("c.pos").alias("pos"),
        F.col("c.chunk").alias("chunk"),
        F.xxhash64(F.col("c.chunk")).alias("chunk_h"),
    )
    # frequency over the 64-bit line hash: the distinct-line exchange
    # moves 8-byte keys, never line text (same convention as the
    # hashed shingle index in dedup.py)
    freq = chunks.groupBy("chunk_h").agg(F.count(F.lit(1)).alias("f"))
    joined = chunks.join(freq, "chunk_h")
    keep = F.col("f") <= LINE_FREQ_CAP
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(~keep, 1).otherwise(0)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("pos", "chunk")))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return agg.filter(F.col("n_removed") > 0)
