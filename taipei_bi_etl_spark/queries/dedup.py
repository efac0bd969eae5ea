"""Sketch-based near-duplicate detection over ``documents`` — the
100 TB-scale dedup family (MinHash+LSH, SimHash) extending the exact
methods in :mod:`taipei_bi_etl_spark.queries.pipeline` (SURVEY §7.1
step 8; BASELINE north star).

Scale shape shared by both operators:

* Sketches (64-perm MinHash signature / 64-bit SimHash fingerprint) are
  computed **map-side with zero shuffle** — pure array expressions over
  the shingle array, fully inside whole-stage codegen.
* Candidate generation shuffles only on **bounded sketch keys** (band
  hash / 8-bit fingerprint block), never on raw content; pairwise work
  happens strictly inside a bucket.
* Exact verification (Jaccard / Hamming) runs only on candidate pairs.

At 100 TB add a document-frequency cap on shingles and a bucket-size cap
(drop or split buckets > K docs) — degenerate buckets are the only
quadratic risk.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

N_PERM = 64  # minhash permutations
N_BANDS = 16  # 16 bands x 4 rows: P(detect | J=0.9) ~ 1 - 2.6e-8
ROWS_PER_BAND = N_PERM // N_BANDS
JACCARD_T = 0.8

SIMHASH_BITS = 64
SIMHASH_BLOCKS = 16  # 16 blocks x 4 bits: pigeonhole-complete for hamming <= 15
HAMMING_T = 12


def shingle_array(tok: Column) -> Column:
    """Distinct word-3-gram shingles of a token array (empty if < 3).

    Implemented as zip_with over shifted slices — ~10x faster than
    transform(sequence, element_at) which pays ANSI bounds checks and
    index materialization per element."""
    n = F.size(tok)
    a = F.slice(tok, 1, n - 2)
    b = F.slice(tok, 2, n - 2)
    c = F.slice(tok, 3, n - 2)
    zipped = F.zip_with(
        a,
        F.zip_with(b, c, lambda x, y: F.concat(x, F.lit(" "), y)),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    arr = F.when(n >= 3, zipped).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(arr)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = F.split(F.col("text"), r"\s+")
    return d.select("doc_id", shingle_array(tok).alias("sh")).filter(
        F.size("sh") > 0
    )


def _exact_jaccard_on_pairs(pairs: DataFrame, docs_sh: DataFrame) -> DataFrame:
    """Verify candidate (doc_a, doc_b) pairs with exact set Jaccard."""
    sa = docs_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sb = docs_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    jac = inter.cast("double") / union
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding.
# ---------------------------------------------------------------------------

# Oracle = ALL-pairs exact Jaccard at the same threshold: valid because
# 16x4 banding detects J >= 0.8 with probability 1 - (1 - 0.8^4)^16
# ~ 0.9998 per pair, the testdata's true pairs all have J >= 0.889
# (P(miss) < 2e-7), and xxhash64 is deterministic — the sf0.01 result is
# frozen, so a one-time pass here is a forever pass.
_MINHASH_ORACLE = f"""
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
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_T}
"""


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE, tags=("dedup", "extension"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) → LSH banding (16x4) → in-bucket candidates → exact
    Jaccard verify at 0.8.

    Unlike :func:`dedup_ngram_jaccard`'s inverted shingle index (join
    volume ∝ Σ df(shingle)²), candidate volume here is bounded by band
    buckets — the 100 TB path.
    """
    # the shingle set feeds two independent subtrees (signatures and the
    # exact-verify join); persist so it computes once per run
    docs_sh = _doc_shingles(spark, sf_dir).persist()
    # One real hash per shingle, then N_PERM cheap universal-family
    # permutations h*A_i + B_i (odd A_i, wrap-around long arithmetic is
    # deterministic) — 64x fewer hash evaluations than hashing each
    # shingle N_PERM times, and flat columnar exprs instead of nested
    # higher-order functions keep it inside whole-stage codegen.
    import numpy as np

    # Universal-hash permutations mod a Mersenne prime: (h*A_i + B_i)
    # mod P actually permutes (a plain h*A+B is order-preserving and
    # min() would always pick the same shingle).  Operands are bounded
    # (h,A,B < P = 2^31-1) so products stay < 2^62 — no ANSI overflow.
    P = (1 << 31) - 1
    rng = np.random.RandomState(7)
    A = rng.randint(1, P, size=N_PERM).tolist()
    B = rng.randint(0, P, size=N_PERM).tolist()
    hashed = docs_sh.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", F.pmod(F.xxhash64("s"), F.lit(P)).alias("h")
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(F.col("h") * F.lit(int(A[i])) + F.lit(int(B[i])), F.lit(P))
            ).alias(f"m{i}")
            for i in range(N_PERM)
        ]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[
                        F.col(f"m{b * ROWS_PER_BAND + r}")
                        for r in range(ROWS_PER_BAND)
                    ]
                ).alias("band_hash"),
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _exact_jaccard_on_pairs(cand, docs_sh)


# ---------------------------------------------------------------------------
# SimHash.  Rows-only (xxhash64 has no DuckDB twin); equivalence to the
# exact-Jaccard pair set is asserted in tests/test_dedup.py.
# ---------------------------------------------------------------------------


@query("dedup_simhash", oracle=None, tags=("dedup", "extension"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over shingle hashes; near-dup pairs = Hamming ≤ 12,
    found via 16-block decomposition (pigeonhole: hamming ≤ 15 pairs
    share at least one exact 4-bit block — no all-pairs scan).

    Known limitation (inherent to SimHash, not this implementation):
    docs with very few shingles have high fingerprint variance — one
    differing shingle among ~5 can flip dozens of bits — so short-doc
    near-dups can be missed.  Gate short docs to MinHash instead.

    Returns (doc_a, doc_b, hamming).
    """
    docs_sh = _doc_shingles(spark, sf_dir)
    hashed = docs_sh.select(
        "doc_id", F.explode("sh").alias("s")
    ).select("doc_id", F.xxhash64("s").alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright("h", i).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    fp = reduce(
        add,
        [
            F.when(
                F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
            for i in range(SIMHASH_BITS)
        ],
    )
    fps = votes.select("doc_id", fp.alias("fp"))
    block_w = SIMHASH_BITS // SIMHASH_BLOCKS
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright("fp", i * block_w)
                .bitwiseAND(F.lit((1 << block_w) - 1))
                .alias("block_val"),
            )
            for i in range(SIMHASH_BLOCKS)
        ]
    )
    blocked = fps.select("doc_id", "fp", F.explode(blocks).alias("b")).select(
        "doc_id", "fp", "b.block_id", "b.block_val"
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(b, ["block_id", "block_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= HAMMING_T)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
