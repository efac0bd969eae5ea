"""Round-4 curation extensions — the operators a production
training-data pipeline runs between dedup and tokenized shards:

* quantization: int8 scalar codes; binary sign-bit fingerprints with
  Hamming-distance ANN (`ann_hamming_topk`)
* packing: fixed context windows (`pack_context_windows`), their
  attention-mask segment lists (`pack_window_boundaries`), both with
  IVM twins hash-proven equal to the full recompute, and leakage-safe
  per-split packing (`pack_split_isolated`)
* chunking: overlapping sliding windows with md5 content oracles
* dedup policy: quality-aware survivor selection, containment
  (subsumption) pairs, drop-contained curation, cross-source leakage
* the capstone `curation_end_to_end_packed`: gates → components →
  survivor → packed windows as ONE oracled query

Reference parity: extends the BASELINE north-star families (SURVEY
§7.1 step 8); the reference itself has no embedding/packing surface —
these are the large-scale additions the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Scalar int8 quantization of the embedding corpus.
# ---------------------------------------------------------------------------

QBINS = 256

_INT8_ORACLE = f"""
WITH dims AS (
  SELECT vec_id,
         unnest(embedding::DOUBLE[]) AS val,
         generate_subscripts(embedding::DOUBLE[], 1) AS dim
  FROM embeddings
), stats AS (
  SELECT dim, MIN(val) AS mn, MAX(val) AS mx FROM dims GROUP BY dim
), codes AS (
  SELECT vec_id,
         CASE WHEN mx > mn
              THEN LEAST(CAST(FLOOR((val - mn) * {QBINS}.0 / (mx - mn))
                         AS INT), {QBINS - 1}) - {QBINS // 2}
              ELSE 0 END AS code
  FROM dims JOIN stats USING (dim)
)
SELECT vec_id,
       CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(MIN(code) AS INT) AS code_min,
       CAST(MAX(code) AS INT) AS code_max,
       CAST(COUNT(*) AS INT) AS n_dims
FROM codes GROUP BY vec_id
"""


@query(
    "embedding_int8_quantize",
    oracle=_INT8_ORACLE,
    tags=("similarity", "curation", "extension"),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension scalar quantization to int8: global (min, max) per
    dimension define {QBINS} uniform bins; each float maps to
    ``least(floor((x-mn)·{QBINS}/(mx-mn)), {QBINS}-1) - {QBINS}//2`` —
    the 4× storage shrink applied to an embedding corpus before ANN
    serving.  Emits exact integer code accounting per vector (sum, min,
    max, n_dims), so the hash is integer-exact; both engines evaluate
    the IDENTICAL float expression on identical doubles, so the floor
    is deterministic cross-engine (the BM25/tfidf expression-identity
    pattern, SCALE.md).

    Scale: one posexplode pass (rows × dim), a 64-row per-dim stats
    aggregate broadcast back (bounded by dimensionality, never corpus
    size), one map-side code projection, one hash aggregate on vec_id.
    """
    from taipei_bi_etl_spark.queries.similarity import as_double

    e = read_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode(as_double("embedding")).alias("dim", "val")
    )
    stats = dims.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    code = (
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    (F.col("val") - F.col("mn"))
                    * float(QBINS)
                    / (F.col("mx") - F.col("mn"))
                ).cast("int"),
                F.lit(QBINS - 1),
            )
            - QBINS // 2,
        )
        .otherwise(F.lit(0))
        .alias("code")
    )
    # bounded: per-dim stats (64 rows)
    codes = dims.join(F.broadcast(stats), "dim").select("vec_id", code)
    return codes.groupBy("vec_id").agg(
        F.sum("code").cast("long").alias("code_sum"),
        F.min("code").cast("int").alias("code_min"),
        F.max("code").cast("int").alias("code_max"),
        F.count(F.lit(1)).cast("int").alias("n_dims"),
    )


# ---------------------------------------------------------------------------
# Fixed-context-window packing (GPT-style document concatenation).
# ---------------------------------------------------------------------------

CTX = 512

_CTX_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
           AS n
  FROM documents
), o AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS off
  FROM d
), x AS (
  SELECT doc_id, n, off,
         unnest(range(off // {CTX}, (off + n - 1) // {CTX} + 1)) AS k
  FROM o WHERE n > 0
)
SELECT CAST(k AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST(off + n, (k + 1) * {CTX})
                - GREATEST(off, k * {CTX})) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM x GROUP BY k
"""


def _context_offsets(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """(doc_id, n, off) for every non-empty document, where ``off`` is
    the exclusive running token total in doc_id order — computed with
    the two-pass bucketed prefix sum (the `assign_dense_ids` pattern,
    io.py:366, adapted to weighted offsets): doc_ids cut into P
    fixed-width buckets (deterministic arithmetic on the key — no
    range-partitioner sampling), pass 1 collects per-bucket token
    totals (P rows to the driver) and folds exclusive prefix offsets,
    pass 2 adds the broadcast bucket base to a PER-BUCKET window
    cumsum.  Returns None for an empty corpus."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n"),
    )
    return _offsets_from(spark, d)


def _offsets_from(spark: SparkSession, d: DataFrame) -> DataFrame | None:
    """Frame-parameterized core of `_context_offsets`: ``d`` is any
    (doc_id, n) frame; same two-pass bucketed prefix sum."""
    d = d.filter(F.col("n") > 0)
    n_buckets = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        return None
    width = int(max_id) // n_buckets + 1
    d = d.withColumn("bkt", (F.col("doc_id") / width).cast("int"))
    totals = d.groupBy("bkt").agg(F.sum("n").alias("tot")).collect()
    base, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["bkt"]):
        base[int(r["bkt"])] = acc
        acc += int(r["tot"])
    base_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(base.items()) for x in kv]
        ),
        F.col("bkt"),
    )
    w = Window.partitionBy("bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return d.select(
        "doc_id",
        "n",
        (base_col + F.coalesce(F.sum("n").over(w), F.lit(0))).alias("off"),
    )


def _windows_from(off_frame: DataFrame, *keys: str) -> DataFrame:
    """(doc_id, n, off[, *keys]) → per-window accounting ([*keys,]
    chunk_id, n_docs, n_tokens, first_doc, last_doc).  THE single
    definition of the window arithmetic — shared by the full packer,
    its in-plan IVM twin, the split-isolated packer (``keys=("split",)``
    — windows are per-split streams), the end-to-end capstone, and the
    stored-state IVM (`taipei_bi_etl_spark.ivm_store`), so an
    off-by-one fix lands everywhere at once."""
    x = off_frame.select(
        *keys, "doc_id", "n", "off",
        F.explode(
            F.sequence(
                F.floor(F.col("off") / CTX),
                F.floor((F.col("off") + F.col("n") - 1) / CTX),
            )
        ).alias("k"),
    )
    occupancy = F.least(
        F.col("off") + F.col("n"), (F.col("k") + 1) * CTX
    ) - F.greatest(F.col("off"), F.col("k") * CTX)
    return x.groupBy(
        *keys, F.col("k").cast("long").alias("chunk_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(occupancy).cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _segments_from(off_frame: DataFrame) -> DataFrame:
    """(doc_id, n, off) → one row per (window, document) segment:
    (chunk_id, seg struct(s=start-in-window, d=doc, l=len)).  The
    single definition of the attention-mask segment arithmetic, shared
    by `pack_window_boundaries` and its incremental twin."""
    x = off_frame.select(
        "doc_id", "n", "off",
        F.explode(
            F.sequence(
                F.floor(F.col("off") / CTX),
                F.floor((F.col("off") + F.col("n") - 1) / CTX),
            )
        ).alias("k"),
    )
    seg_start = F.greatest(F.col("off"), F.col("k") * CTX) - F.col("k") * CTX
    seg_len = F.least(
        F.col("off") + F.col("n"), (F.col("k") + 1) * CTX
    ) - F.greatest(F.col("off"), F.col("k") * CTX)
    return x.select(
        F.col("k").cast("long").alias("chunk_id"),
        F.struct(
            seg_start.cast("long").alias("s"),
            F.col("doc_id").alias("d"),
            seg_len.cast("long").alias("l"),
        ).alias("seg"),
    )


def _boundaries_rollup(segs: DataFrame) -> DataFrame:
    """(chunk_id, seg) → (chunk_id, n_segments, boundaries) with the
    deterministic sorted `s:d:l` serialization both engines emit."""
    return segs.groupBy("chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("seg")),
                lambda s: F.concat_ws(
                    ":", s["s"].cast("string"), s["d"].cast("string"),
                    s["l"].cast("string"),
                ),
            ),
            ",",
        ).alias("boundaries"),
    )


@query(
    "pack_context_windows",
    oracle=_CTX_ORACLE,
    tags=("curation", "packing", "extension"),
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style training-example packing: documents concatenate in
    doc_id order into one token stream that is cut into fixed {CTX}-
    token context windows (documents SPAN window boundaries — the
    concat-and-chunk recipe, unlike `pack_sequences_ffd`'s no-split
    bin packing).  Emits per-window accounting: docs touched, exact
    token occupancy, first/last doc — all integers.

    Scale: the running offset is the one global dependency, and it is
    computed WITHOUT a global window (which would collapse 100 TB onto
    one task).  Two-pass bucketed prefix sum, the `assign_dense_ids`
    pattern (`io.py:366`) adapted to weighted offsets: doc_ids are cut
    into P fixed-width buckets (deterministic arithmetic on the key —
    no range-partitioner sampling), pass 1 collects per-bucket token
    totals (P rows to the driver) and folds exclusive prefix offsets,
    pass 2 adds the broadcast bucket base to a PER-BUCKET window
    cumsum.  Each doc then expands to ≤ n/{CTX}+1 chunk rows (linear
    in its own length), and the aggregate is map-side combinable on
    chunk_id.
    """
    o = _context_offsets(spark, sf_dir)
    if o is None:
        return spark.createDataFrame(
            [],
            "chunk_id long, n_docs long, n_tokens long, "
            "first_doc long, last_doc long",
        )
    return _windows_from(o)


# ---------------------------------------------------------------------------
# Incremental (IVM) maintenance of the packed-window accounting.
# ---------------------------------------------------------------------------

HIST_FRACTION = 4  # history = doc_id < max_id*4//5; delta = the rest


@query(
    "pack_context_windows_incremental",
    oracle=_CTX_ORACLE,
    tags=("curation", "packing", "ivm", "extension"),
)
def pack_context_windows_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta maintenance of `pack_context_windows` for an append-only
    corpus (the `cohort_retention_incremental` pattern applied to
    packing).  Key invariant: the token stream concatenates in doc_id
    order, so appended documents NEVER move an existing document's
    offset — yesterday's window accounting is frozen except for the
    single partial window at the stream's tail.  The delta update is:
    (1) read yesterday's accounting + one scalar (total tokens T so
    far), (2) pack ONLY the new documents starting at offset T, (3)
    merge — the boundary chunk_id appears on both sides and merges by
    summing docs/tokens (min first / max last).

    This query materializes "yesterday" with the full path (the
    simulation of the stored artifacts — production reads them from
    the sink), applies the delta, and returns the merged accounting;
    its oracle is the FULL recompute (`_CTX_ORACLE`), so the driver
    gate hash-proves incremental == full.

    Scale: the delta side scans only the appended documents plus one
    scalar — cost ∝ |delta|, flat as the corpus grows; both sides use
    the bucketed prefix sum (no global window).
    """
    # persist the tokenized lengths: this function drives ~5 scalar
    # actions (global max, per-side bucket totals, per-side token
    # totals) that would otherwise EACH re-read parquet and re-run the
    # regex tokenization — on the query whose selling point is
    # delta-cost maintenance.  Unpersisted before returning (the
    # harness-visible final job recomputes once; no cache leak).
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n"),
    ).filter(F.col("n") > 0).persist()
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        d.unpersist(blocking=False)
        return spark.createDataFrame(
            [],
            "chunk_id long, n_docs long, n_tokens long, "
            "first_doc long, last_doc long",
        )
    cut = int(max_id) * HIST_FRACTION // (HIST_FRACTION + 1)

    # --- yesterday's artifacts (stand-in for the stored sink):
    hist = d.filter(F.col("doc_id") < cut)
    hist_off = _offsets_from(spark, hist)
    empty = spark.createDataFrame(
        [],
        "chunk_id long, n_docs long, n_tokens long, "
        "first_doc long, last_doc long",
    )
    hist_acc = empty if hist_off is None else _windows_from(hist_off)
    total = hist.agg(F.sum("n")).collect()[0][0] or 0

    # --- the delta path: ONLY new docs, offsets continuing at T
    delta = d.filter(F.col("doc_id") >= cut)
    delta_off = _offsets_from(spark, delta)
    d.unpersist(blocking=False)
    if delta_off is None:
        return hist_acc
    delta_acc = _windows_from(
        delta_off.withColumn("off", F.col("off") + F.lit(int(total)))
    )

    # --- merge: only the boundary chunk exists on both sides
    return (
        hist_acc.unionByName(delta_acc)
        .groupBy("chunk_id")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("first_doc").alias("first_doc"),
            F.max("last_doc").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe packing: windows never mix train/val/test splits.
# ---------------------------------------------------------------------------


def _split_pack_oracle() -> str:
    from taipei_bi_etl_spark.queries.curation import _SPLIT_B1, _SPLIT_P1
    from taipei_bi_etl_spark.queries.dedup import _poly_sql

    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN {_poly_sql("text", _SPLIT_B1, _SPLIT_P1)} % 100 < 80
              THEN 'train'
              WHEN {_poly_sql("text", _SPLIT_B1, _SPLIT_P1)} % 100 < 90
              THEN 'val' ELSE 'test' END AS split,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
           AS n
  FROM documents
), o AS (
  SELECT doc_id, split, n,
         CAST(COALESCE(SUM(n) OVER (PARTITION BY split ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS off
  FROM d WHERE n > 0
), x AS (
  SELECT doc_id, split, n, off,
         unnest(range(off // {CTX}, (off + n - 1) // {CTX} + 1)) AS k
  FROM o
)
SELECT split, CAST(k AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST(off + n, (k + 1) * {CTX})
                - GREATEST(off, k * {CTX})) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM x GROUP BY split, k
"""


@query(
    "pack_split_isolated",
    oracle=_split_pack_oracle(),
    tags=("curation", "packing", "extension"),
)
def pack_split_isolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe context packing: documents are assigned their
    content-addressed train/val/test split (the `corpus_hash_split`
    hash — stable under re-partitioning and re-ingestion), then each
    split packs into its OWN {CTX}-token window stream — no window
    ever mixes splits, so a packed eval batch can never see a training
    document fragment (the packing-time complement of the leakage-safe
    corpus split).

    Scale: same two-pass bucketed prefix sum as `pack_context_windows`
    but grouped — per-(split, bucket) token totals (≤ 3·P rows to the
    driver) fold into per-split exclusive offsets, and the window
    cumsum partitions on (split, bucket).  Still no global window
    anywhere; the split hash is a map-side expression.
    """
    from taipei_bi_etl_spark.queries.curation import _SPLIT_B1, _SPLIT_P1
    from taipei_bi_etl_spark.queries.text import _char_array, poly_hash

    b1 = poly_hash(_char_array(F.col("text")), _SPLIT_B1, _SPLIT_P1) % 100
    split = (
        F.when(b1 < 80, "train").when(b1 < 90, "val").otherwise("test")
    )
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        split.alias("split"),
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    n_buckets = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        return spark.createDataFrame(
            [],
            "split string, chunk_id long, n_docs long, n_tokens long, "
            "first_doc long, last_doc long",
        )
    width = int(max_id) // n_buckets + 1
    d = d.withColumn("bkt", (F.col("doc_id") / width).cast("int"))
    totals = d.groupBy("split", "bkt").agg(F.sum("n").alias("tot")).collect()
    base: dict[str, int] = {}
    acc: dict[str, int] = {}
    for r in sorted(totals, key=lambda r: (r["split"], r["bkt"])):
        key = f"{r['split']}:{r['bkt']}"
        base[key] = acc.get(r["split"], 0)
        acc[r["split"]] = base[key] + int(r["tot"])
    base_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(base.items()) for x in kv]
        ),
        F.concat_ws(":", F.col("split"), F.col("bkt").cast("string")),
    )
    w = Window.partitionBy("split", "bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    o = d.select(
        "doc_id", "split", "n",
        (base_col + F.coalesce(F.sum("n").over(w), F.lit(0))).alias("off"),
    )
    return _windows_from(o, "split")


# ---------------------------------------------------------------------------
# End-to-end: gates → near-dup components → quality survivor → packed
# context windows (the full pretraining-data pipeline as ONE query).
# ---------------------------------------------------------------------------


def _packed_oracle() -> str:
    from taipei_bi_etl_spark.queries.curation import (
        _STOP,
        KEEP_LANGS,
        MAX_STOPWORD_RATIO,
        MIN_TOKENS,
    )
    from taipei_bi_etl_spark.queries.dedup import JACCARD_T

    return f"""
WITH RECURSIVE gated AS (
  SELECT doc_id, text
  FROM documents
  WHERE lang IN {KEEP_LANGS!r}
    AND len(string_split_regex(text, '\\s+')) >= {MIN_TOKENS}
    AND len(list_filter(string_split_regex(text, '\\s+'),
            t -> t IN {_STOP!r})) * 1.0
        / len(string_split_regex(text, '\\s+')) <= {MAX_STOPWORD_RATIO}
), shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tok) - 1, 1)),
                i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS shingle
  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM gated)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), pair_inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM pair_inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_T}
), reach(node, root) AS (
  SELECT d, d FROM (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs) t(d)
  UNION
  SELECT e.b, r.root
  FROM reach r
  JOIN (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs) e ON e.a = r.node
), comp AS (
  SELECT node AS doc_id, MIN(root) AS component_id FROM reach GROUP BY node
), surv AS (
  SELECT s.doc_id
  FROM (SELECT c.component_id, c.doc_id, length(g.text) AS n_chars
        FROM comp c JOIN gated g USING (doc_id)) s
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY component_id ORDER BY n_chars DESC, doc_id) = 1
), kept AS (
  SELECT g.doc_id,
         len(list_filter(string_split_regex(g.text, '\\s+'), t -> t <> ''))
           AS n
  FROM gated g LEFT JOIN comp c USING (doc_id)
  WHERE c.doc_id IS NULL OR g.doc_id IN (SELECT doc_id FROM surv)
), o AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS off
  FROM kept
), x AS (
  SELECT doc_id, n, off,
         unnest(range(off // {CTX}, (off + n - 1) // {CTX} + 1)) AS k
  FROM o WHERE n > 0
)
SELECT CAST(k AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST(off + n, (k + 1) * {CTX})
                - GREATEST(off, k * {CTX})) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM x GROUP BY k
"""


@query(
    "curation_end_to_end_packed",
    oracle=_packed_oracle(),
    tags=("curation", "dedup", "packing", "composed", "extension"),
)
def curation_end_to_end_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data pipeline as ONE oracled query:

      documents → quality gate (length + stopword ratio + lang)
                → near-dup pairs (exact 3-gram Jaccard, inverted index)
                → connected components (min-label propagation)
                → QUALITY survivor per cluster (longest doc, tie → min)
                → concat-and-chunk into {CTX}-token context windows

    Compared to `curation_end_to_end` (min-id survivor → per-source
    token budget), this composes the r04 operators into the shape a
    pretraining run actually materializes: the packed-window
    accounting of the curated corpus.  There is deliberately NO exact-
    dedup stage: exact duplicates have Jaccard 1.0, land in the same
    component, and the survivor policy resolves them (tie → min id) —
    one fewer corpus shuffle than v1's digest pass.

    Scale: gates are map-side and run FIRST so pair generation sees
    only the gated corpus; components run over the pair list (tiny);
    the survivor window is per-component; the packing offset is the
    two-pass bucketed prefix sum (`_offsets_from` — no global window);
    ``kept`` is persisted so the offset passes don't re-run the
    component iteration.
    """
    from taipei_bi_etl_spark.queries.clustering import min_label_components
    from taipei_bi_etl_spark.queries.curation import (
        _STOP,
        KEEP_LANGS,
        MAX_STOPWORD_RATIO,
        MIN_TOKENS,
    )
    from taipei_bi_etl_spark.queries.pipeline import ngram_jaccard_pairs

    d = read_table(spark, sf_dir, "documents")
    tok = F.split(F.col("text"), r"\s+")
    n_tok = F.size(tok)
    stop = F.array(*[F.lit(s) for s in _STOP])
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(stop, t)))
    gated = d.filter(
        F.col("lang").isin(*KEEP_LANGS)
        & (n_tok >= MIN_TOKENS)
        & (n_stop * 1.0 / n_tok <= MAX_STOPWORD_RATIO)
    ).select("doc_id", "text")

    from taipei_bi_etl_spark.queries.dedup import JACCARD_T

    pairs = ngram_jaccard_pairs(
        gated.select("doc_id", F.split(F.col("text"), r"\s+").alias("tok")),
        threshold=JACCARD_T,
    ).select("doc_a", "doc_b")
    comp = min_label_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), "component_id"
    )
    scored = comp.join(
        gated.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    )
    w = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    surv = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    kept = (
        gated.join(comp, "doc_id", "left")
        .join(surv.withColumn("is_surv", F.lit(True)), "doc_id", "left")
        .filter(F.col("component_id").isNull() | F.col("is_surv"))
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", r"\s+"), lambda t: t != "")
            ).cast("long").alias("n"),
        )
        .persist()
    )
    o = _offsets_from(spark, kept)
    kept.unpersist(blocking=False)  # scalars collected; final job recomputes
    if o is None:
        return spark.createDataFrame(
            [],
            "chunk_id long, n_docs long, n_tokens long, "
            "first_doc long, last_doc long",
        )
    return _windows_from(o)


# ---------------------------------------------------------------------------
# Per-window document-boundary segments (attention-mask metadata).
# ---------------------------------------------------------------------------

_MASK_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
           AS n
  FROM documents
), o AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS off
  FROM d
), x AS (
  SELECT doc_id, n, off,
         unnest(range(off // {CTX}, (off + n - 1) // {CTX} + 1)) AS k
  FROM o WHERE n > 0
), seg AS (
  SELECT CAST(k AS BIGINT) AS chunk_id, doc_id,
         GREATEST(off, k * {CTX}) - k * {CTX} AS seg_start,
         LEAST(off + n, (k + 1) * {CTX}) - GREATEST(off, k * {CTX})
           AS seg_len
  FROM x
)
SELECT chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       string_agg(seg_start || ':' || doc_id || ':' || seg_len, ','
                  ORDER BY seg_start) AS boundaries
FROM seg GROUP BY chunk_id
"""


@query(
    "pack_window_boundaries",
    oracle=_MASK_ORACLE,
    tags=("curation", "packing", "extension"),
)
def pack_window_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-boundary segments per packed context window — the
    attention-mask metadata packed pretraining needs so cross-document
    attention can be blocked inside a window: for each {CTX}-token
    window, the ordered (start:doc:len) segment list.  Completes the
    packing family: `pack_context_windows` gives the occupancy
    accounting, this gives the masks.

    Oracle checks the EXACT serialized segment list (start, doc, len,
    order) per window — integers and strings only.  The Spark side
    sorts (seg_start, doc_id, seg_len) structs before joining, so the
    output is deterministic under any partitioning; the oracle's
    string_agg orders by the same key.

    Scale: same two-pass bucketed prefix sum as the packer (no global
    window — `_context_offsets`); the per-window rollup groups ≤
    {CTX}+1 segments per key, map-side combinable; segment lists are
    bounded by the window size, never by corpus size.
    """
    o = _context_offsets(spark, sf_dir)
    if o is None:
        return spark.createDataFrame(
            [], "chunk_id long, n_segments long, boundaries string"
        )
    return _boundaries_rollup(_segments_from(o))


@query(
    "pack_window_boundaries_incremental",
    oracle=_MASK_ORACLE,
    tags=("curation", "packing", "ivm", "extension"),
)
def pack_window_boundaries_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta maintenance of `pack_window_boundaries` — the
    attention-mask twin of `pack_context_windows_incremental`, same
    invariant: appended documents never move an existing offset, so
    every stored window's segment list is frozen except the single
    partial window at the tail.  The delta path computes segments for
    ONLY the new documents (offsets continuing at the stored total-
    token scalar), unions them with yesterday's segment table, and
    re-aggregates — only the boundary chunk_id actually merges (its
    history segments all start before the delta's, so the sorted
    serialization is identical to the full recompute's).

    Yesterday's artifacts are materialized in-query (the stand-in
    pattern — production reads the segment table from the sink); the
    oracle is the FULL recompute (`_MASK_ORACLE`), hash-proving
    incremental == full.  Scale: delta side ∝ |new docs|; the
    re-aggregate touches per-window segment lists bounded by the
    window size.
    """
    # persist: same ~5-action fan-out as pack_context_windows_incremental
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n"),
    ).filter(F.col("n") > 0).persist()
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        d.unpersist(blocking=False)
        return spark.createDataFrame(
            [], "chunk_id long, n_segments long, boundaries string"
        )
    cut = int(max_id) * HIST_FRACTION // (HIST_FRACTION + 1)

    hist = d.filter(F.col("doc_id") < cut)
    hist_off = _offsets_from(spark, hist)
    total = hist.agg(F.sum("n")).collect()[0][0] or 0
    delta_off = _offsets_from(spark, d.filter(F.col("doc_id") >= cut))
    d.unpersist(blocking=False)

    parts = []
    if hist_off is not None:
        parts.append(_segments_from(hist_off))
    if delta_off is not None:
        parts.append(
            _segments_from(
                delta_off.withColumn("off", F.col("off") + F.lit(int(total)))
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "chunk_id long, n_segments long, boundaries string"
        )
    segs = parts[0]
    for p in parts[1:]:
        segs = segs.unionByName(p)
    return _boundaries_rollup(segs)


# ---------------------------------------------------------------------------
# N-gram containment dedup (doc-subsumption: excerpts / quote supersets).
# ---------------------------------------------------------------------------

# Single rational source of truth for the containment threshold: the
# prefix-length formula in `dedup_containment_prefix` needs EXACT
# integer ceil arithmetic, so the threshold lives as a fraction and
# CONTAIN_T is derived — changing CONTAIN_NUM/CONTAIN_DEN re-derives
# the prefix bound, the Spark filters, and the oracle together
# (ADVICE r09 #2: the 9/10 literals previously hardcoded in the
# prefix query could silently desync from CONTAIN_T).
CONTAIN_NUM, CONTAIN_DEN = 9, 10
CONTAIN_T = CONTAIN_NUM / CONTAIN_DEN

_CONTAIN_ORACLE = f"""
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
       ROUND(CAST(inter AS DOUBLE) / LEAST(sa.n, sb.n), 6) AS containment,
       CASE WHEN sa.n < sb.n THEN doc_a
            WHEN sb.n < sa.n THEN doc_b
            ELSE LEAST(doc_a, doc_b) END AS contained_doc
FROM pair_inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / LEAST(sa.n, sb.n) >= {CONTAIN_T}
"""


@query(
    "dedup_ngram_containment",
    oracle=_CONTAIN_ORACLE,
    tags=("dedup", "curation", "extension"),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-coefficient near-dup pairs: C = |A∩B| / min(|A|,|B|)
    ≥ {CONTAIN_T} over 3-gram shingle sets — the asymmetric measure
    that catches a short document SUBSUMED by a longer one (excerpts,
    quote supersets, boilerplate wrappers), which Jaccard structurally
    misses when lengths differ (J = inter/union shrinks as the longer
    doc grows; C does not).  Emits the contained side explicitly — the
    doc a curation pipeline drops.

    Scale: identical machinery to `dedup_ngram_jaccard` — hashed-
    shingle inverted index (8-byte shuffle keys), candidates meet only
    inside shingle buckets, `cap_document_frequency` guards the
    quadratic bucket; only the final scoring expression differs.  Both
    engines evaluate the identical division + ROUND, the proven
    jaccard pattern.
    """
    from taipei_bi_etl_spark.queries.pipeline import ngram_pair_overlap
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: tokenization + shingle explode are map-side above
    # this scan (measured 1.48× whole-query at sf0.1, SCALE.md r10)
    d = widen_scan(read_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split(F.col("text"), r"\s+").alias("tok"))
    containment = F.col("inter").cast("double") / F.least("na", "nb")
    contained = (
        F.when(F.col("na") < F.col("nb"), F.col("doc_a"))
        .when(F.col("nb") < F.col("na"), F.col("doc_b"))
        .otherwise(F.least("doc_a", "doc_b"))
    )
    return (
        ngram_pair_overlap(toks)
        .filter(containment >= CONTAIN_T)
        .select(
            "doc_a",
            "doc_b",
            F.round(containment, 6).alias("containment"),
            contained.alias("contained_doc"),
        )
    )


def containment_positional_candidates(sorted_sh: DataFrame) -> DataFrame:
    """Normalized candidate pairs surviving the POSITIONAL filter
    adapted to the asymmetric containment scheme (r10 — the PPJoin
    upgrade's containment flavor; safety proof mirrors
    `pipeline.ppjoin_candidates`).

    Both the prefix probe and the full index carry 0-based positions.
    For a DIRECTED candidate (probe a, indexed b) the matched set is
    "common tokens inside a's prefix"; every common token below the
    last matched token w* is provably matched (positions are monotone
    in the shared global order), so overlap ≤ c + min(na−ai−1,
    nb−bj−1).  The required overlap is α = ⌈t·min(na,nb)⌉
    (containment divides by the smaller size) — integer-exact via the
    CONTAIN rational.  Completeness: a qualifying pair's
    smaller-side-probe direction exists (the prefix lemma) and its
    bound ≥ overlap ≥ α, so it survives; the exact verify on top
    keeps output identical.  Factored out so the directed-prune pytest
    can assert on the CANDIDATE set, not just the (already-identical)
    final output."""
    pref = sorted_sh.select(
        "doc_id",
        F.size("sh").alias("n"),
        F.posexplode(F.slice("sh", 1, F.col("p"))).alias("pos", "shingle"),
    )
    full = sorted_sh.select(
        "doc_id",
        F.size("sh").alias("n"),
        F.posexplode("sh").alias("pos", "shingle"),
    )
    a, b = pref.alias("a"), full.alias("b")
    alpha = F.floor(
        (
            F.least(F.col("na"), F.col("nb")) * CONTAIN_NUM
            + (CONTAIN_DEN - 1)
        )
        / F.lit(CONTAIN_DEN)
    )
    bound = F.col("c") + F.least(
        F.col("na") - F.col("ai") - 1, F.col("nb") - F.col("bj") - 1
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("pa"),
            F.col("b.doc_id").alias("pb"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max(F.col("a.pos")).alias("ai"),
            F.max(F.col("b.pos")).alias("bj"),
        )
        .filter(bound >= alpha)
        .select(
            F.least(F.col("pa"), F.col("pb")).alias("doc_a"),
            F.greatest(F.col("pa"), F.col("pb")).alias("doc_b"),
        )
        .distinct()
    )


def containment_prefix_pairs(
    docs_sh: DataFrame,
    canonical: str = "hash",
    df_counts: DataFrame | None = None,
    positional: bool = False,
) -> DataFrame:
    """Containment pairs via ASYMMETRIC prefix filtering — the r09
    derivation of the Bayardo/PPJoin prefix bound for the containment
    coefficient C = |A∩B| / min(|A|,|B|) ≥ CONTAIN_T, factored out in
    r10 so the hash-ordered baseline, the df-ascending variant and
    the routed dispatcher share one copy (the
    `jaccard_prefix_filter_pairs` precedent).

    Let S be the smaller set of a qualifying pair.  C ≥ t gives
    overlap o ≥ ⌈t·|S|⌉, so under ANY global total order the smallest
    common shingle s* is preceded in S only by non-common shingles
    (≤ |S| − o of them) and sits within S's first |S| − ⌈t·|S|⌉ + 1 —
    S's PREFIX.  The LARGER side admits no such bound (its common
    elements can be preceded by arbitrarily many non-common ones), so
    it must stay fully indexed.  Hence: probe with each doc's prefix
    against the FULL postings index — every qualifying pair collides
    when the probe is its smaller side (either side when sizes tie),
    and the exact verify (array_intersect over the full arrays, order-
    insensitive) makes the output IDENTICAL to
    `dedup_ngram_containment`, whose oracle every form shares.

    ⌈t·n⌉ is computed in integer arithmetic
    ((CONTAIN_NUM·n + CONTAIN_DEN − 1) div CONTAIN_DEN) — the
    float-ceil completeness hole pinned in the Jaccard twin; the
    threshold enters only via the CONTAIN_NUM/CONTAIN_DEN rational,
    so prefix bound, filter and oracle move together.

    CANONICAL ORDER (``canonical="df"``): the completeness lemma holds
    for ANY global total order, so each doc's array may be re-sorted
    by ASCENDING document frequency (ties by hash — still a total
    order).  High-df boilerplate then sorts LAST and drops out of
    every doc's prefix, collapsing the Σ df_pref·df candidate term
    exactly as in the Jaccard crossover — and the asymmetric scheme
    rides a FULL index on the other side, so boilerplate in prefixes
    hurts ~df-linearly per prefix slot, making df-order the
    heavy-tail path here too.  INPUT CONTRACT (shared with the
    Jaccard form): ``sh`` must be distinct per doc (shingle_hash_array
    output), so count(*) over postings is exact df.

    100 TB: candidate volume drops from Σ df² (full self-join) to
    ~(1−t)·Σ df_pref·df — at t = CONTAIN_T a ~10x cut — while index
    volume stays one full postings pass plus a (1−t) prefix pass; the
    verify join ships each doc's array once, keyed by doc_id."""
    from taipei_bi_etl_spark.queries.pipeline import canonical_sorted

    p = (
        F.size("sh")
        - F.floor(
            (F.size("sh") * CONTAIN_NUM + (CONTAIN_DEN - 1))
            / F.lit(CONTAIN_DEN)
        )
        + 1
    ).cast("int")
    # one copy of the canonical-order machinery (r10 review: this
    # block was a verbatim twin of the Jaccard family's)
    docs_sh = canonical_sorted(docs_sh, canonical, df_counts)
    sorted_sh = docs_sh.select("doc_id", "sh", p.alias("p")).persist()
    if positional:
        cand = containment_positional_candidates(sorted_sh)
    else:
        pref = sorted_sh.select(
            "doc_id", F.explode(F.slice("sh", 1, F.col("p"))).alias("shingle")
        )
        full = sorted_sh.select(
            "doc_id", F.explode("sh").alias("shingle")
        )
        a, b = pref.alias("a"), full.alias("b")
        cand = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias(
                    "doc_b"
                ),
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
    containment = inter.cast("double") / F.least(
        F.size("sh_a"), F.size("sh_b")
    )
    contained = (
        F.when(F.size("sh_a") < F.size("sh_b"), F.col("doc_a"))
        .when(F.size("sh_b") < F.size("sh_a"), F.col("doc_b"))
        .otherwise(F.least("doc_a", "doc_b"))
    )
    return (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .filter(containment >= F.lit(CONTAIN_NUM) / F.lit(CONTAIN_DEN))
        .select(
            "doc_a",
            "doc_b",
            F.round(containment, 6).alias("containment"),
            contained.alias("contained_doc"),
        )
    )


def _contain_docs_sh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) input frame shared by every containment form."""
    from taipei_bi_etl_spark.queries.dedup import shingle_hash_array
    from taipei_bi_etl_spark.scale import widen_scan

    # widen_scan: the shingle build is map-side above this scan; shared
    # by prefix/df/routed/ppjoin containment (measured 1.23–1.50×
    # whole-query each at sf0.1, SCALE.md r10)
    d = widen_scan(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        shingle_hash_array(F.split(F.col("text"), r"\s+")).alias("sh"),
    ).filter(F.size("sh") > 0)


@query(
    "dedup_containment_prefix",
    oracle=_CONTAIN_ORACLE,
    tags=("dedup", "curation", "extension"),
)
def dedup_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs via ASYMMETRIC prefix filtering, hash
    canonical order — the zero-extra-shuffle baseline (derivation +
    completeness proof in :func:`containment_prefix_pairs`); same
    output and oracle as `dedup_ngram_containment`."""
    return containment_prefix_pairs(_contain_docs_sh(spark, sf_dir))


@query(
    "dedup_containment_prefix_df",
    oracle=_CONTAIN_ORACLE,
    tags=("dedup", "curation", "extension"),
)
def dedup_containment_prefix_df(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Asymmetric containment prefix filter with DF-ASCENDING
    canonical order — the heavy-tailed-df scale path: boilerplate
    shingles sort last and drop out of every doc's prefix, so the
    Σ df_pref·df candidate term stays bounded where hash-ordered
    prefixes keep boilerplate in ~(1−t) of the docs that carry it
    (each such prefix slot joins the FULL index at full df).  Same
    output and oracle as `dedup_ngram_containment`; order validity +
    completeness proof in :func:`containment_prefix_pairs`."""
    return containment_prefix_pairs(
        _contain_docs_sh(spark, sf_dir), canonical="df"
    )


@query(
    "dedup_containment_ppjoin",
    oracle=_CONTAIN_ORACLE,
    tags=("dedup", "curation", "extension"),
)
def dedup_containment_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment prefix filter WITH the positional filter
    (r10 — the PPJoin upgrade's containment flavor): directed
    candidates whose last prefix-matched token leaves too few
    remaining slots to reach α = ⌈t·min(na,nb)⌉ never enter the
    array-verify join.  Same output and oracle as
    `dedup_ngram_containment`; bound derivation in
    :func:`containment_prefix_pairs` (``positional=True`` branch).

    MEASURED HONESTLY (SCALE.md r10): at t = 0.9 the cut is only ~16%
    of verify candidates and end-to-end a wash (2.37 → 2.33 s at
    sf0.1) — the high threshold already shrinks prefixes to ~n/10+1
    slots, so the plain prefix filter's candidates are selective
    enough that the positional bound rarely binds (unlike the Jaccard
    family's 73% cut at t = 0.6).  Routing therefore KEEPS the plain
    prefix arms; this form exists for lower-threshold deployments,
    where (1−t) prefixes widen and the positional bound regains its
    Jaccard-scale leverage."""
    return containment_prefix_pairs(
        _contain_docs_sh(spark, sf_dir), positional=True
    )


def pick_containment_route(
    n_docs: int, max_df: int, df_share_cut: float
) -> str:
    """Containment routing rule: the SAME decision table as
    `pipeline.pick_jaccard_route` (the mechanism — correlated
    prefix-inclusion of high-df shingles — is identical), relabeled
    because the containment family's benign arm is the hash-ordered
    prefix filter, not a full index."""
    from taipei_bi_etl_spark.queries.pipeline import pick_jaccard_route

    return (
        "df"
        if pick_jaccard_route(n_docs, max_df, df_share_cut) == "df"
        else "hash"
    )


def route_containment(
    docs_sh: DataFrame,
    df_share_cut: float | None = None,
    choice_out: list | None = None,
) -> DataFrame:
    """Containment pairs with MEASURED-CROSSOVER ROUTING (r10, the
    `route_jaccard` pattern applied to the containment family —
    VERDICT r09 next-round #5): probe the corpus's max
    document-frequency share with one shingle-keyed aggregate, then
    dispatch —

    * bounded df: HASH-ordered asymmetric prefix filter
      (`containment_prefix_pairs(canonical="hash")`) — no df
      aggregate, no per-doc re-sort, prefixes already ~(1−t) of each
      doc;
    * heavy-tailed df: DF-ASCENDING prefix filter, where boilerplate
      sorts out of every prefix and the Σ df_pref·df candidate join
      stays bounded (measured crossover in SCALE.md r10 — the
      containment sweep mirrors the Jaccard one: both forms within
      ~1.1x at benign df, hash-order degrading monotonically as max
      df grows).

    Both arms emit identical (doc_a, doc_b, containment,
    contained_doc) rows (the asymmetric completeness lemma holds for
    any global total order), so routing never changes the answer —
    the routing pytest pins the CHOICE on benign and boilerplate
    corpora and pair-identity either way.  The routing RULE is shared
    with the Jaccard dispatcher (`pipeline.pick_jaccard_route` — same
    decision table, same default cut): the mechanism being routed
    around (correlated prefix-inclusion of high-df shingles) is
    identical, and the containment sweep measured the crossover in
    the same 2-5%-of-corpus band.

    EAGER-EXECUTION NOTE (same class as `route_jaccard` /
    `blocked_components`, contract-tested in
    `test_construction_probes`): the probe runs two scalar actions at
    DataFrame-construction time over persisted frames the df arm
    reuses.

    100 TB: the probe is linear and shingle-keyed (no pair-shaped
    work); heavy-tailed df is exactly the boilerplate-wrapper corpus
    the containment measure exists for (quote supersets share the
    quoted shingles), so the df arm is the expected production route
    at scale."""
    from taipei_bi_etl_spark.queries.pipeline import _DF_SHARE_CUT

    if df_share_cut is None:
        df_share_cut = _DF_SHARE_CUT
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
    route = pick_containment_route(n_docs, max_df, df_share_cut)
    if choice_out is not None:
        choice_out.append(route)
    if route == "df":
        # the df arm rebuilds postings from docs_sh for the re-sort;
        # the probe's postings are only the probe's (ADVICE r09 #3
        # applied from day one here)
        postings.unpersist()
        return containment_prefix_pairs(
            docs_sh, canonical="df", df_counts=df_counts
        )
    postings.unpersist()
    df_counts.unpersist()
    return containment_prefix_pairs(docs_sh, canonical="hash")


@query(
    "dedup_containment_routed",
    oracle=_CONTAIN_ORACLE,
    tags=("dedup", "curation", "extension"),
)
def dedup_containment_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION containment entry: measured-crossover routing
    between the hash-ordered and df-ascending asymmetric prefix
    filters (core + routing rule in :func:`route_containment`).  On
    the benign test corpus the probe picks hash order; a
    boilerplate-heavy corpus (max df > 2% of docs) flips to
    df-ascending.  Same output and oracle as
    `dedup_ngram_containment` either way."""
    return route_containment(_contain_docs_sh(spark, sf_dir))


_DROP_CONTAINED_ORACLE = f"""
WITH cpairs AS ({_CONTAIN_ORACLE}
), dropped AS (
  SELECT DISTINCT contained_doc AS doc_id FROM cpairs
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN x.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN x.doc_id IS NULL
                THEN len(list_filter(string_split_regex(d.text, '\\s+'),
                         t -> t <> '')) ELSE 0 END) AS BIGINT)
         AS tokens_kept
FROM documents d LEFT JOIN dropped x ON x.doc_id = d.doc_id
GROUP BY d.source
"""


@query(
    "dedup_drop_contained",
    oracle=_DROP_CONTAINED_ORACLE,
    tags=("dedup", "curation", "extension"),
)
def dedup_drop_contained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-based curation pass: any document ≥{CONTAIN_T}
    contained in another is dropped (excerpts, quote supersets,
    boilerplate wrappers vanish; their containers stay).  Unlike the
    component-based survivor policies, containment names its victim
    directly — no connected components, no cluster window: one
    distinct over `dedup_ngram_containment`'s ``contained_doc`` column
    and an anti-flag join.  Emits per-source kept/dropped accounting
    with the surviving token budget.

    Scale: the pair machinery is the bucketed inverted index; the
    dropped set is |pairs|-bounded (tiny vs corpus) and joins the
    corpus on doc_id — AQE broadcasts it when genuinely small.
    """
    dropped = (
        dedup_ngram_containment(spark, sf_dir)
        .select(F.col("contained_doc").alias("doc_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n_tok"),
    )
    return (
        d.join(dropped, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("is_dropped"), 1).otherwise(0)
            ).cast("long").alias("n_dropped"),
            F.sum(
                F.when(F.col("is_dropped").isNull(), F.col("n_tok")).otherwise(0)
            ).cast("long").alias("tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source leakage report (near-dup pairs spanning corpus sources).
# ---------------------------------------------------------------------------

_LEAK_ORACLE = f"""
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
), pairs AS (
  SELECT doc_a, doc_b
  FROM pair_inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
), tagged AS (
  SELECT LEAST(da.source, db.source) AS source_x,
         GREATEST(da.source, db.source) AS source_y,
         doc_a, doc_b
  FROM pairs
  JOIN documents da ON da.doc_id = doc_a
  JOIN documents db ON db.doc_id = doc_b
)
SELECT source_x, source_y,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN source_x <> source_y THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cross,
       MIN(doc_a) AS example_doc_a,
       MIN(doc_b) AS example_doc_b
FROM tagged GROUP BY source_x, source_y
"""


@query(
    "dedup_cross_source_leakage",
    oracle=_LEAK_ORACLE,
    tags=("dedup", "curation", "profiling", "extension"),
)
def dedup_cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source leakage report: near-dup pairs (3-gram Jaccard ≥
    0.8, the `dedup_ngram_jaccard` machinery) tagged with BOTH
    documents' sources and rolled up per unordered source pair — the
    diagnostic a curation pipeline runs to find one source
    re-publishing another's content (and the train-side complement of
    benchmark decontamination: leakage ACROSS corpus slices rather
    than into eval sets).

    Scale: pair volume is the bucketed near-dup set (tiny vs corpus);
    the source tags join on doc_id against a two-column projection of
    the corpus; the rollup is map-side combinable on a key bounded by
    |sources|².
    """
    from taipei_bi_etl_spark.queries.pipeline import ngram_jaccard_pairs

    d = read_table(spark, sf_dir, "documents")
    tok = F.split(F.col("text"), r"\s+")
    pairs = ngram_jaccard_pairs(
        d.select("doc_id", tok.alias("tok")), threshold=0.8
    ).select("doc_a", "doc_b")
    src = d.select("doc_id", "source")
    tagged = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_x"),
            F.greatest("sa", "sb").alias("source_y"),
            "doc_a",
            "doc_b",
        )
    )
    return tagged.groupBy("source_x", "source_y").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(F.col("source_x") != F.col("source_y"), 1).otherwise(0)
        ).cast("long").alias("n_cross"),
        F.min("doc_a").alias("example_doc_a"),
        F.min("doc_b").alias("example_doc_b"),
    )


# ---------------------------------------------------------------------------
# Binary (sign-bit) quantization + Hamming-distance ANN.
# ---------------------------------------------------------------------------

NQ_HAM = 8
K_HAM = 10

_HAMMING_ORACLE = f"""
WITH dims AS (
  SELECT vec_id,
         unnest(embedding::DOUBLE[]) AS val,
         generate_subscripts(embedding::DOUBLE[], 1) AS dim
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
), fp AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dim <= 32 AND val > 0
                       THEN (1::BIGINT << (dim - 1)) ELSE 0 END)
              AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN dim > 32 AND val > 0
                       THEN (1::BIGINT << (dim - 33)) ELSE 0 END)
              AS BIGINT) AS hi
  FROM dims GROUP BY vec_id
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi)) AS hamming
  FROM fp q JOIN fp c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {NQ_HAM}
)
SELECT query_id, nbr_id, CAST(hamming AS INT) AS hamming,
       CAST(rnk AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY hamming, nbr_id) AS rnk
  FROM pairs
) WHERE rnk <= {K_HAM}
"""


@query(
    "ann_hamming_topk",
    oracle=_HAMMING_ORACLE,
    tags=("similarity", "curation", "extension"),
)
def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization ANN: each 64-dim embedding collapses to a
    64-bit sign fingerprint (bit i set iff dim i > 0), packed as two
    32-bit halves in BIGINTs so neither engine's ``<<`` ever touches
    the sign bit; similarity is Hamming distance via ``xor`` +
    ``bit_count`` — the 32× storage shrink (256 B float → 8 B) vector
    stores use for first-stage retrieval.  Top-{K_HAM} per query
    (first {NQ_HAM} vectors), deterministic tie-break (distance,
    nbr_id) — all integers, hash-exact.

    Scale: fingerprints are 16 B/vector; the query side is bounded
    ({NQ_HAM} rows) and broadcast — the corpus is NEVER broadcast; one
    codegen scan computes all distances map-side and the only shuffle
    is the per-query top-k window (|Q| bounded partitions — no global
    sort; at large |Q| swap for the min_by/heap partial-aggregate form
    `ann_cosine_topk` documents).  For
    radius search over a 100 TB corpus, reuse `dedup_simhash`'s
    pigeonhole block join (any pair within Hamming r shares one of
    r+1 exact 16-bit blocks) to bucket candidates instead of scanning.
    """
    from taipei_bi_etl_spark.queries.emb_common import read_embeddings

    e = read_embeddings(spark, sf_dir)  # element_at needs all 64 dims
    ind = (
        "IF(element_at(embedding, CAST({i} + 1 AS INT)) > 0D, "
        "shiftleft(CAST(1 AS BIGINT), {i} - {base}), CAST(0 AS BIGINT))"
    )
    fp = e.select(
        "vec_id",
        F.expr(
            "aggregate(sequence(0, 31), CAST(0 AS BIGINT), "
            "(acc, i) -> acc + "
            + ind.format(i="i", base="0")
            + ")"
        ).alias("lo"),
        F.expr(
            "aggregate(sequence(32, 63), CAST(0 AS BIGINT), "
            "(acc, i) -> acc + "
            + ind.format(i="i", base="32")
            + ")"
        ).alias("hi"),
    )
    q = fp.filter(F.col("vec_id") < NQ_HAM).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    pairs = fp.join(
        # bounded: fixed query set (vec_id < NQ_HAM)
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("nbr_id"),
        (
            F.bit_count(F.expr("qlo ^ lo"))
            + F.bit_count(F.expr("qhi ^ hi"))
        ).alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "nbr_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K_HAM)
        .select(
            "query_id", "nbr_id",
            F.col("hamming").cast("int").alias("hamming"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Overlapping sliding-window chunking (RAG / retrieval chunker).
# ---------------------------------------------------------------------------

WIN = 128
STRIDE = 64

_SLIDE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), dd AS (
  SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0
), c AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CASE WHEN n > {WIN}
                              THEN (n - {WIN} + {STRIDE} - 1) // {STRIDE} + 1
                              ELSE 1 END)) AS ci
  FROM dd
)
SELECT doc_id,
       CAST(ci AS INT) AS chunk_idx,
       CAST(LEAST({WIN}, n - ci * {STRIDE}) AS INT) AS n_tokens,
       md5(array_to_string(
         toks[(ci * {STRIDE} + 1):(ci * {STRIDE}
              + LEAST({WIN}, n - ci * {STRIDE}))], ' ')) AS chunk_md5
FROM c
"""


@query(
    "chunk_sliding_windows",
    oracle=_SLIDE_ORACLE,
    tags=("text", "curation", "extension"),
)
def chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunker ({WIN}-token windows, stride
    {STRIDE}) — the RAG/retrieval chunking recipe where consecutive
    chunks share {WIN}-{STRIDE} tokens so no semantic boundary is lost.
    Complements `udtf_token_chunks` (non-overlapping, UDTF slow path —
    its docstring names overlap windows as the growth case) with the
    pure-Column fast path: split → bounded sequence explode → `slice`,
    all whole-stage-codegen JVM expressions.  Each chunk row carries
    md5 of its reconstructed text, so the oracle checks CONTENT
    equality, not just counts.

    Scale: scan → project → generate with zero shuffle and no Python;
    fan-out per doc is ≤ n/{STRIDE}+1 rows, linear in the doc's own
    length.  Chunk count arithmetic is pure integer (`DIV`), immune to
    float rounding cross-engine.
    """
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    n_chunks = F.when(
        F.col("n") > WIN,
        F.expr(f"CAST((n - {WIN} + {STRIDE} - 1) DIV {STRIDE} AS INT) + 1"),
    ).otherwise(F.lit(1))
    c = d.select(
        "doc_id", "toks", "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci"),
    )
    n_tok = F.least(F.lit(WIN), F.col("n") - F.col("ci") * STRIDE)
    return c.select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_idx"),
        n_tok.cast("int").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.slice("toks", F.col("ci") * STRIDE + 1, n_tok)
            )
        ).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Quality-aware duplicate survivor selection.
# ---------------------------------------------------------------------------


def _survivor_oracle() -> str:
    from taipei_bi_etl_spark.queries.clustering import _CC_ORACLE

    cte = _CC_ORACLE.rsplit("SELECT node AS doc_id", 1)[0]
    return f"""{cte}
, comp AS (
  SELECT node AS doc_id, CAST(MIN(root) AS BIGINT) AS component_id
  FROM reach GROUP BY node
), scored AS (
  SELECT c.component_id, c.doc_id, length(d.text) AS n_chars
  FROM comp c JOIN documents d USING (doc_id)
), survivors AS (
  SELECT component_id, doc_id AS survivor_id, n_chars AS survivor_chars
  FROM scored
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY component_id ORDER BY n_chars DESC, doc_id
  ) = 1
)
SELECT s.component_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sc.n_chars) AS BIGINT) AS total_chars,
       ANY_VALUE(s.survivor_id) AS survivor_id,
       CAST(ANY_VALUE(s.survivor_chars) AS BIGINT) AS survivor_chars
FROM scored sc JOIN survivors s USING (component_id)
GROUP BY s.component_id
"""


@query(
    "dedup_survivor_quality",
    oracle=_survivor_oracle(),
    tags=("dedup", "curation", "extension"),
)
def dedup_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection per duplicate cluster: the
    near-dup components (MinHash-LSH pairs → min-label CC, same as
    `dedup_components`) each keep their LONGEST document (chars desc,
    tie → min doc_id) instead of the min-id — the policy real curation
    pipelines use so dedup keeps the best variant, not an arbitrary
    one.  Emits per-cluster accounting with the chosen survivor.

    Scale: components over the pair list only (output of sketch dedup,
    tiny vs the corpus); the quality join touches cluster members only;
    survivor pick is one bounded per-component window.
    """
    from taipei_bi_etl_spark.queries.clustering import min_label_components
    from taipei_bi_etl_spark.queries.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = min_label_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"),
        F.col("component_id").cast("long").alias("component_id"),
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    scored = comp.join(docs, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    survivors = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("survivor_id"),
            F.col("n_chars").alias("survivor_chars"),
        )
    )
    return (
        scored.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .join(survivors, "component_id")
        .select(
            "component_id", "n_docs", "total_chars",
            "survivor_id", "survivor_chars",
        )
    )
