"""Text-analysis operators over ``documents`` — language-ID, winnowed
document fingerprinting, and BPE-ish token counting (SURVEY §7.1 step 8;
BASELINE north star: the text half of a training-data pipeline).

Everything is pure Column expressions (no Python UDFs) and every query
has a DuckDB oracle: the rolling hash is a *portable* polynomial
(acc·31 + charcode mod 1e9+7) folded strictly left-to-right, which both
engines evaluate identically — unlike xxhash64/md5-based sketches, the
fingerprints themselves are cross-engine checkable.

Scale: all three operators are embarrassingly parallel per document
(no shuffle until the final small rollup); the fingerprint inverted
index shuffles on the fingerprint value — uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim

HASH_MOD = 1_000_000_007
KGRAM = 8  # fingerprint k-gram length (chars)
WINNOW = 4  # winnowing window (k-grams per window)

# Function-word marker lists per language, scored in this fixed order
# (first max wins ties) — keep Spark and oracle in lockstep.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "fr": ("le", "la", "de", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}


def _tokens() -> Column:
    return F.split(F.col("text"), r"\s+")


def poly_hash(
    chars: Column, base: int = 31, mod: int = HASH_MOD
) -> Column:
    """Portable rolling hash: fold (acc*base + code) % mod over chars.
    Operands stay < mod*base + 127 < 2^35 — no long overflow."""
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % mod,
    )


def _char_array(s: Column) -> Column:
    # split('') emits a trailing '' in Spark but not DuckDB — filter it.
    return F.filter(F.split(s, ""), lambda c: c != "")


# ---------------------------------------------------------------------------
# Language identification (n-gram / function-word heuristic).
# ---------------------------------------------------------------------------


def _score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split_regex(text, '\\s+'),"
        f" t -> t IN ({words})))"
    )


_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT lang,
         {_score_sql('en')} AS s_en, {_score_sql('es')} AS s_es,
         {_score_sql('fr')} AS s_fr, {_score_sql('de')} AS s_de,
         {_score_sql('zh')} AS s_zh
  FROM documents WHERE text IS NOT NULL
), pred AS (
  SELECT lang,
         CASE
           WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
           WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
           WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
           WHEN s_de >= s_zh THEN 'de'
           ELSE 'zh'
         END AS predicted_lang
  FROM scored
)
SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY lang, predicted_lang
"""


@query("text_language_id", oracle=_LANGID_ORACLE, tags=("text", "extension"))
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: function-word hit counts per language,
    fixed-order argmax (en > es > fr > de > zh on ties); output is the
    (declared lang × predicted lang) confusion matrix.

    On real corpora swap the marker lists for char-n-gram profiles —
    the plan shape (map-side scoring, tiny rollup) is unchanged.
    """
    # NULL text scores NULL in Spark but falls to the CASE ELSE arm in
    # DuckDB — undefined input, filtered in BOTH engines.
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = _tokens()
    langs = list(LANG_MARKERS)
    def marker_count(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(tok, lambda t: t.isin(*words)))

    scores = {lang: marker_count(words) for lang, words in LANG_MARKERS.items()}
    # fixed-order argmax: lang_i wins if its score >= every later lang's
    pred = None
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        if pred is None:
            pred = F.lit(lang)
        else:
            cond = None
            for later in langs[i + 1 :]:
                c = scores[lang] >= scores[later]
                cond = c if cond is None else (cond & c)
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return (
        d.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Winnowed document fingerprinting (MOSS-style).
# ---------------------------------------------------------------------------

_POLY_SQL = (
    "list_reduce(list_transform(string_split({src}, ''), c -> ascii(c)::BIGINT),"
    " (acc, x) -> (acc * 31 + x) % 1000000007)"
)

_FP_ORACLE = f"""
WITH grams AS (
  SELECT doc_id, length(text) AS n,
         list_transform(range(1, length(text) - {KGRAM} + 2),
                        i -> {_POLY_SQL.format(src=f"substr(text, i, {KGRAM})")}) AS h
  FROM documents
  WHERE length(text) >= {KGRAM + WINNOW - 1}
), winnowed AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(h) - {WINNOW} + 2),
                       j -> list_min(h[j:j+{WINNOW - 1}]))) AS fps
  FROM grams
)
SELECT doc_id,
       CAST(len(fps) AS INT) AS n_fingerprints,
       CAST(list_min(fps) AS BIGINT) AS min_fp,
       CAST(list_max(fps) AS BIGINT) AS max_fp
FROM winnowed
"""


@query("doc_fingerprint_winnow", oracle=_FP_ORACLE, tags=("text", "extension"))
def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing: rolling 8-char-gram hashes → min of each
    4-gram window → distinct fingerprints per doc.  Cross-engine exact
    (portable polynomial hash), summarized as (count, min, max).

    Scale: fingerprints are the classic content-defined signature for
    shard-local near-dup candidate generation — the inverted
    (fingerprint → doc) index shuffles on the hash value, uniform.
    """
    d = read_table(spark, sf_dir, "documents").filter(
        F.length("text") >= KGRAM + WINNOW - 1
    )
    text = F.col("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text) - KGRAM + 1),
        lambda i: poly_hash(_char_array(text.substr(i, F.lit(KGRAM)))),
    )
    with_h = d.select("doc_id", grams.alias("h"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("h") - WINNOW + 1),
            lambda j: F.array_min(F.slice("h", j, WINNOW)),
        )
    )
    return with_h.select(
        "doc_id",
        F.size(fps).alias("n_fingerprints"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish subword budget.
# ---------------------------------------------------------------------------

_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
_SUB_LEN = 4

_BPE_ORACLE = f"""
WITH per_doc AS (
  SELECT source,
         len(string_split_regex(text, '\\s+')) AS ws_tokens,
         len(regexp_extract_all(text, '{_TOKEN_RE}')) AS re_tokens,
         list_sum(list_transform(regexp_extract_all(text, '{_TOKEN_RE}'),
                  t -> CAST(ceil(length(t) / {_SUB_LEN}.0) AS BIGINT))) AS sub_tokens
  FROM documents
)
SELECT source,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(re_tokens) AS BIGINT) AS total_re_tokens,
       CAST(SUM(sub_tokens) AS BIGINT) AS total_sub_tokens,
       ROUND(CAST(SUM(sub_tokens) AS DOUBLE) / SUM(re_tokens), 6) AS subtokens_per_token
FROM per_doc GROUP BY source
"""


@query("token_count_bpe", oracle=_BPE_ORACLE, tags=("text", "extension"))
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgets per source: whitespace tokens, regex word/punct
    tokens, and a BPE-ish subword estimate (ceil(len/4) pieces per
    token — a deterministic stand-in for a trained BPE vocab; plug a
    real tokenizer in via mapInPandas when available).
    """
    d = read_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), r"\s+"))
    re_toks = F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0)
    subs = F.aggregate(
        F.transform(
            re_toks,
            lambda t: F.ceil(F.length(t) / _SUB_LEN).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    per_doc = d.select(
        "source",
        ws.alias("ws_tokens"),
        F.size(re_toks).alias("re_tokens"),
        subs.alias("sub_tokens"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("re_tokens").alias("total_re_tokens"),
        F.sum("sub_tokens").alias("total_sub_tokens"),
        F.round(
            F.sum("sub_tokens").cast("double") / F.sum("re_tokens"), 6
        ).alias("subtokens_per_token"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — 13-gram overlap against a held-out probe
# set.  The training-data op that keeps eval benchmarks out of the
# corpus (the reference has no analog; BASELINE north-star extension).
# ---------------------------------------------------------------------------

N_DECON = 13  # industry-standard decontamination n-gram length

_DECON_TERMS = " || ' ' || ".join(f"tok[i+{j}]" for j in range(N_DECON))
_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM documents
), ngr AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tok) - {N_DECON - 2}, 1)),
                i -> {_DECON_TERMS})) AS g
  FROM toks
), bench AS (
  SELECT DISTINCT g FROM ngr WHERE doc_id % 20 = 0
), rest AS (
  SELECT doc_id, g FROM ngr WHERE doc_id % 20 <> 0
), hits AS (
  SELECT r.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hit
  FROM rest r LEFT JOIN bench b USING (g) GROUP BY r.doc_id
)
SELECT doc_id, n_grams, n_hit,
       ROUND(CAST(n_hit AS DOUBLE) / n_grams, 6) AS contamination
FROM hits WHERE n_hit > 0
"""


@query(
    "text_decontaminate",
    oracle=_DECON_ORACLE,
    tags=("text", "extension"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing 13-grams with a benchmark probe set
    (here: every 20th doc by id stands in for the eval suite).

    Scale shape: the probe side of a real decontamination run (MMLU,
    GSM8K, …) is tiny next to the corpus, so its distinct 13-gram
    hashes BROADCAST and the corpus is scanned once, map-side — the
    only shuffle is the per-doc re-aggregation on doc_id.  Grams move
    as 8-byte xxhash64 combinations (ngram_hash_array), never strings;
    the oracle runs the string form (equal modulo 2^-64 collisions).
    """
    from taipei_bi_etl_spark.queries.dedup import ngram_hash_array

    d = read_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(ngram_hash_array(_tokens(), N_DECON)).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 20 == 0)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    rest = grams.filter(F.col("doc_id") % 20 != 0)
    return (
        rest.join(bcast_dim(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        )
        .filter(F.col("n_hit") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_grams"), 6
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filtering — within-doc duplicate-n-gram
# signals (Rae et al. 2021 use duplicate-line/n-gram fractions as
# quality gates; simplified here to the two n-gram signals).
# ---------------------------------------------------------------------------

DUP3_MAX = 0.05  # max fraction of repeated 3-gram occurrences
TOP2_MAX = 0.08  # max share of the single most frequent 2-gram

_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM documents
), g3 AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(tok) - 1, 1)),
                        i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]) AS gs
  FROM toks
), dup3 AS (
  SELECT doc_id,
         1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs) AS dup3_frac
  FROM g3 WHERE len(gs) > 0
), g2 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tok), 1)),
                i -> tok[i] || ' ' || tok[i+1])) AS g
  FROM toks
), cnt AS (
  SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2
), top2 AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top2_frac
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id,
       ROUND(dup3_frac, 6) AS dup3_frac,
       ROUND(top2_frac, 6) AS top2_frac,
       (dup3_frac <= {DUP3_MAX} AND top2_frac <= {TOP2_MAX}) AS keep
FROM dup3 d JOIN top2 t ON d.doc_id = t.doc_id
"""


@query(
    "text_repetition_gopher",
    oracle=_REPETITION_ORACLE,
    tags=("text", "extension"),
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition quality signals: repeated-3-gram occurrence
    fraction and the most-frequent-2-gram share, with a keep flag.

    Scale shape: dup3_frac is a pure array expression (zero shuffle —
    1 - distinct/total over the hashed gram array).  top2_frac needs a
    per-(doc, gram) count, which CANNOT be map-side for unbounded docs
    without O(len²) per-row work, so it explodes and aggregates twice —
    groupBy(doc_id, g) then groupBy(doc_id), the second reusing the
    first's hash-partitioning prefix.  Grams travel as 8-byte hashes.
    """
    from taipei_bi_etl_spark.queries.dedup import ngram_hash_array

    d = read_table(spark, sf_dir, "documents")
    g3 = ngram_hash_array(_tokens(), 3)
    dup3 = d.select(
        "doc_id",
        (
            F.lit(1.0)
            - F.size(F.array_distinct(g3)).cast("double") / F.size(g3)
        ).alias("dup3_frac"),
    ).filter(F.size(g3) > 0)
    g2 = d.select(
        "doc_id", F.explode(ngram_hash_array(_tokens(), 2)).alias("g")
    )
    top2 = (
        g2.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c")).alias("top2_frac")
        )
    )
    return dup3.join(top2, "doc_id").select(
        "doc_id",
        F.round("dup3_frac", 6).alias("dup3_frac"),
        F.round("top2_frac", 6).alias("top2_frac"),
        (
            (F.col("dup3_frac") <= DUP3_MAX)
            & (F.col("top2_frac") <= TOP2_MAX)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII detection / scrubbing — the privacy gate of a training-data
# pipeline.  Patterns chosen to evaluate identically under Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[+(]?[0-9][0-9()\-\s]{7,}[0-9]"
PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_scrub(text: Column) -> Column:
    """Replace emails/phones/IPs with typed placeholder tokens."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IP, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


_PII_ORACLE = f"""
WITH per_doc AS (
  SELECT source,
         len(regexp_extract_all(text, '{PII_EMAIL}')) AS emails,
         len(regexp_extract_all(text, '{PII_PHONE}')) AS phones,
         len(regexp_extract_all(text, '{PII_IP}')) AS ips
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(emails) AS BIGINT) AS n_emails,
       CAST(SUM(phones) AS BIGINT) AS n_phones,
       CAST(SUM(ips) AS BIGINT) AS n_ips,
       CAST(SUM(CASE WHEN emails + phones + ips > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii
FROM per_doc GROUP BY source
"""


@query("text_pii_scan", oracle=_PII_ORACLE, tags=("text", "extension"))
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII inventory (emails / phone numbers / IPv4s).

    Scale shape: pure map-side regexp counting + one rollup shuffle on
    source.  The companion :func:`pii_scrub` expression rewrites the
    text column in the same scan for redacted exports — semantics pinned
    on synthetic PII rows in tests/test_udfs.py (the sf corpus is
    word-soup, so this rollup's zeros are themselves hash-verified).
    """
    d = read_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.regexp_count("text", F.lit(PII_EMAIL)).alias("emails"),
        F.regexp_count("text", F.lit(PII_PHONE)).alias("phones"),
        F.regexp_count("text", F.lit(PII_IP)).alias("ips"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("emails").alias("n_emails"),
        F.sum("phones").alias("n_phones"),
        F.sum("ips").alias("n_ips"),
        F.sum(
            ((F.col("emails") + F.col("phones") + F.col("ips")) > 0).cast(
                "long"
            )
        ).alias("docs_with_pii"),
    )


# ---------------------------------------------------------------------------
# Vocabulary build / heavy hitters: global top-k terms by frequency.
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH tok AS (
    SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS term FROM documents
), counts AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY term
)
SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 100
"""


@query("vocab_top_terms", oracle=_VOCAB_ORACLE, tags=("ext", "text", "topk"))
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 alphabetic terms by frequency.

    Map-side explode → one partial-aggregated shuffle on term → global
    top-k via orderBy+limit, which Spark executes as
    TakeOrderedAndProject: each task keeps its local top-100 and the
    driver merges k·tasks rows — never a global sort.  The (n DESC,
    term ASC) ordering is total, so the cut line is deterministic.
    At 100 TB the only scale risk is term-key skew in the count shuffle,
    and partial aggregation already collapses each task's duplicates.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("term")).limit(100)
