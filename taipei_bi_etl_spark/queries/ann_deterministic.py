"""Deterministic trained-state ANN with a full cross-engine oracle
(r05 VERDICT next-round #8).

`ann_ivf_topk` / the PQ family are rows-only because pyspark.ml's
KMeans aggregates float sums whose ORDER depends on the partition
layout — centroids are not bit-stable, so no ANSI twin can exist.
This module removes the nondeterminism at the root instead of pinning
around it:

* embeddings are quantized ONCE to integer picounits
  (``floor(double(x) · 10⁶)`` — float32 → double is exact, the product
  and floor are identical IEEE ops in both engines);
* Lloyd iterations run on INTEGERS: assignment is argmin of the exact
  integer squared euclidean distance (ties → smallest cell id), the
  centroid update is ``floor(sum / count)`` where the sum is an
  ORDER-FREE int64 fold — every quantity is bit-identical no matter
  how Spark partitions the corpus or in what order DuckDB scans it;
* the float-division floor is exact at these magnitudes: |sum| < 2⁴¹,
  so the double quotient's relative error (~10⁻¹⁶) is orders below
  the 1/count ≥ 2⁻¹⁰ gap to the nearest integer boundary;
* the query is IVF-MIPS: probe the nearest cells, rank candidates by
  the exact integer inner product (pico² units) — no float leaves the
  plan, so the driver's value hash is stable by construction.

The DuckDB oracle replays the SAME two unrolled Lloyd iterations in
SQL (list_zip integer arithmetic, empty cells carry their previous
centroid via LEFT JOIN + COALESCE) — the first trained-state ANN
entry with a full value-hash oracle; the pyspark.ml IVF stays
registered as the library-backed form with its recall gate.

100 TB notes: quantization and assignment are map-side; each Lloyd
update shuffles one (cell, dim, partial-sum) row per map partition
(K·dim = 512 accumulators — the driver collect is a bounded codebook,
same class as the PQ LUT); the probe join broadcasts only the fixed
query set.  Iteration count is a constant (offline training runs a
handful of passes over a sample at this scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.emb_common import VALID_SQL, read_embeddings
from taipei_bi_etl_spark.queries.similarity import N_QUERIES, TOP_K

DKM_K = 8        # coarse cells
DKM_ITERS = 2    # unrolled Lloyd iterations (identical in the oracle)
DKM_PROBE = 4    # cells probed per query
PICO = 1_000_000

_QUANT_SQL = (
    "list_transform(embedding,"
    " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)
_DIST_SQL = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
)
_DOT_SQL = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}),"
    " p -> p[1] * p[2])) AS BIGINT)"
)


def _lloyd_iteration_sql(i: int, p: str = "", src: str = "q") -> str:
    """CTE block for one Lloyd iteration: assign ``{p}c{i-1}`` →
    rebuild ``{p}c{i}`` (empty cells carry the previous centroid).
    ``p`` prefixes every CTE name so the PQ oracle can instantiate the
    same machinery once per subspace."""
    dist = _DIST_SQL.format(a="q.qv", b="c.cv")
    return f"""{p}a{i} AS (
  SELECT q.vec_id, q.qv, c.cell, {dist} AS dist
  FROM {src} q CROSS JOIN {p}c{i - 1} c
), {p}m{i} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM {p}a{i}
  ) WHERE rn = 1
), {p}u{i} AS (
  SELECT cell, pos,
         CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cd
  FROM (
    SELECT cell, UNNEST(qv) AS v, generate_subscripts(qv, 1) AS pos
    FROM {p}m{i}
  ) GROUP BY cell, pos
), {p}n{i} AS (
  SELECT cell, list(cd ORDER BY pos) AS cv FROM {p}u{i} GROUP BY cell
), {p}c{i} AS (
  SELECT c.cell, COALESCE(n.cv, c.cv) AS cv
  FROM {p}c{i - 1} c LEFT JOIN {p}n{i} n USING (cell)
)"""


def _lloyd_init_sql(p: str, src: str, k: int) -> str:
    """``{p}c0``: the first ``k`` vec_ids' (sub)vectors as centroids."""
    return f"""{p}c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         qv AS cv
  FROM {src} ORDER BY vec_id LIMIT {k}
)"""


def _ivf_oracle() -> str:
    iters = ",\n".join(
        _lloyd_iteration_sql(i) for i in range(1, DKM_ITERS + 1)
    )
    last = f"c{DKM_ITERS}"
    dist = _DIST_SQL.format(a="q.qv", b="c.cv")
    dot = _DOT_SQL.format(a="p.qq", b="a.qv")
    return f"""
WITH q AS (
  SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings
  WHERE {VALID_SQL}
),
{_lloyd_init_sql("", "q", DKM_K)},
{iters},
fin AS (
  SELECT vec_id, qv, cell FROM (
    SELECT q.vec_id, q.qv, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id ORDER BY {dist}, c.cell) AS rn
    FROM q CROSS JOIN {last} c
  ) WHERE rn = 1
), pr AS (
  SELECT vec_id AS query_id, qv AS qq, cell FROM (
    SELECT q.vec_id, q.qv AS qv, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id ORDER BY {dist}, c.cell) AS rn
    FROM q CROSS JOIN {last} c
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {DKM_PROBE}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {dot} AS dot_pico
  FROM pr p JOIN fin a ON a.cell = p.cell AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY dot_pico DESC, neighbor_id) AS INT) AS rank,
       dot_pico
FROM cand
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY dot_pico DESC, neighbor_id) <= {TOP_K}
"""


def _sqdist(qcol: Column, centroid: list[int]) -> Column:
    lit = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(qcol, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _argmin_cells(qcol: Column, centroids: list[list[int]], n: int) -> Column:
    """Indices of the n nearest centroids (integer sq-euclid, ties →
    smaller cell id) — array_sort on (dist, cell) structs."""
    entries = F.array(
        *[
            F.struct(
                _sqdist(qcol, c).alias("dist"),
                F.lit(j).cast("long").alias("cell"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.array_sort(entries), 1, n)
    return F.transform(top, lambda s: s["cell"])


def _train_centroids(quant: DataFrame, k: int = DKM_K) -> list[list[int]]:
    """DKM_ITERS integer Lloyd iterations; returns bit-stable centroid
    lists.  Assignment is RELATIONAL (centroid frame broadcast join +
    grouped integer distance + struct-min tie-break) — the literal
    argmin expression form costs seconds of pure analyzer/codegen time
    (measured on the PQ twin); results are bit-identical.  Each
    round's driver collect is k·dim rows — a bounded codebook, not a
    data collect."""
    import math

    spark = quant.sparkSession
    init = [
        r.qv
        for r in quant.orderBy("vec_id").limit(k).select("qv").collect()
    ]
    # corpora smaller than k train fewer cells — the oracle's LIMIT k
    # init produces the same shorter codebook, so both engines agree
    # (found live by the r10 semdedup-store tiny-corpus test: the
    # Spark side previously indexed past the init list and crashed
    # where the SQL side degraded gracefully)
    k = min(k, len(init))
    cents = [[int(v) for v in c] for c in init]
    dims = quant.select(
        "vec_id", F.posexplode("qv").alias("pos", "v")
    ).persist()
    for _ in range(DKM_ITERS):
        book = spark.createDataFrame(
            [
                (j, d, cents[j][d])
                for j in range(k)
                for d in range(len(cents[j]))
            ],
            "cell long, pos int, cd long",
        )
        # bounded: k*dim centroid rows
        joined = dims.join(F.broadcast(book), "pos")
        diff = F.col("v") - F.col("cd")
        assigned = (
            joined.groupBy("vec_id", "cell")
            .agg(F.sum(diff * diff).alias("dist"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cell"))["cell"].alias("cell"))
        )
        sums = (
            dims.join(assigned, "vec_id")
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: k*dim centroid accumulator rows
        )
        new = {}
        for r in sums:
            new.setdefault(int(r.cell), {})[int(r.pos)] = int(
                math.floor(float(r.s) / float(r.n))
            )
        cents = [
            [new[j][d] for d in range(len(cents[j]))]
            if j in new
            else cents[j]  # empty cell carries its previous centroid
            for j in range(k)
        ]
    return cents


@query(
    "ann_ivf_deterministic_topk",
    oracle=_ivf_oracle(),
    tags=("similarity", "extension", "trained-state"),
)
def ann_ivf_deterministic_topk(
    spark: SparkSession, sf_dir: str, quant: DataFrame | None = None
) -> DataFrame:
    """IVF-MIPS top-{TOP_K} with a DETERMINISTIC integer-quantized
    coarse quantizer — the trained-state ANN entry with a full DuckDB
    value-hash oracle (module docstring has the determinism argument).

    Plan: quantize (map-side) → {DKM_ITERS} Lloyd rounds (one narrow
    shuffle each + a bounded codebook collect) → final assignment
    (map-side) → probe join on cell → integer-dot re-rank window.

    ``quant`` lets a composing query (ann_ivf_recall_report) hand in
    its own persisted quantized frame so the embeddings table is
    scanned and cached once, not twice (r06 review)."""
    if quant is None:
        emb = read_embeddings(spark, sf_dir)
        quant = emb.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * PICO).cast("long"),
            ).alias("qv"),
        ).persist()
    cents = _train_centroids(quant)
    assigned = quant.withColumn(
        "cell", _argmin_cells(F.col("qv"), cents, 1)[0]
    )
    queries = (
        quant.filter(F.col("vec_id") < N_QUERIES)
        .withColumn(
            "probes", _argmin_cells(F.col("qv"), cents, DKM_PROBE)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("qq"),
            F.explode("probes").alias("cell"),
        )
    )
    # bounded: fixed N_QUERIES * DKM_PROBE probe rows
    cand = assigned.join(F.broadcast(queries), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("qv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("dot_pico"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot.alias("dot_pico"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "dot_pico")
    )


# ---------------------------------------------------------------------------
# Deterministic PQ + ADC: per-subspace integer codebooks, byte codes,
# relational asymmetric-distance re-rank — the PQ twin of the IVF
# above, with the same full value-hash oracle.
# ---------------------------------------------------------------------------

PQ_M = 4      # subspaces
PQ_SUB = 16   # dims per subspace (4 × 16 = 64)
PQ_K = 16     # codewords per subspace (4-bit codes)


def _pq_oracle() -> str:
    blocks = []
    for m in range(PQ_M):
        a = m * PQ_SUB + 1
        b = (m + 1) * PQ_SUB
        p = f"s{m}_"
        blocks.append(
            f"q_{p}in AS (SELECT vec_id, qv[{a}:{b}] AS qv FROM q)"
        )
        blocks.append(_lloyd_init_sql(p, f"q_{p}in", PQ_K))
        for i in range(1, DKM_ITERS + 1):
            blocks.append(_lloyd_iteration_sql(i, p, f"q_{p}in"))
        dist = _DIST_SQL.format(a="q.qv", b="c.cv")
        blocks.append(f"""e{m} AS (
  SELECT vec_id, cell AS code{m} FROM (
    SELECT q.vec_id, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id ORDER BY {dist}, c.cell) AS rn
    FROM q_{p}in q CROSS JOIN {p}c{DKM_ITERS} c
  ) WHERE rn = 1
)""")
    codes_join = " JOIN ".join(
        ["e0"] + [f"e{m} USING (vec_id)" for m in range(1, PQ_M)]
    )
    adc_terms = " + ".join(
        _DOT_SQL.format(
            a=f"p.qq[{m * PQ_SUB + 1}:{(m + 1) * PQ_SUB}]", b=f"k{m}.cv"
        )
        for m in range(PQ_M)
    )
    code_joins = "\n  ".join(
        f"JOIN s{m}_c{DKM_ITERS} k{m} ON k{m}.cell = c.code{m}"
        for m in range(PQ_M)
    )
    blocks_sql = ",\n".join(blocks)
    return f"""
WITH q AS (
  SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings
  WHERE {VALID_SQL}
),
{blocks_sql},
codes AS (
  SELECT * FROM {codes_join}
), pr AS (
  SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         {adc_terms} AS adc_pico
  FROM pr p CROSS JOIN codes c
  {code_joins}
  WHERE c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY adc_pico DESC, neighbor_id) AS INT) AS rank,
       adc_pico
FROM scored
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_pico DESC, neighbor_id) <= {TOP_K}
"""


def _pq_book_df(spark: SparkSession, books) -> DataFrame:
    rows = [
        (m, j, d, books[m][j][d])
        for m in range(PQ_M)
        for j in range(PQ_K)
        for d in range(PQ_SUB)
    ]
    return spark.createDataFrame(rows, "m int, cell long, d int, cd long")


def _pq_dims(quant: DataFrame) -> DataFrame:
    """One row per (vec_id, subspace, sub-dim): the relational layout
    of the quantized corpus."""
    return quant.select(
        "vec_id", F.posexplode("qv").alias("pos", "v")
    ).select(
        "vec_id",
        F.floor(F.col("pos") / PQ_SUB).cast("int").alias("m"),
        (F.col("pos") % PQ_SUB).cast("int").alias("d"),
        "v",
    )


def _pq_assign(dims: DataFrame, books) -> DataFrame:
    """(vec_id, m, cell): nearest codeword per subspace — RELATIONAL
    argmin (codebook broadcast join + grouped integer distance +
    lexicographic struct-min tie-break).  The literal-array argmin
    expression form costs seconds of analyzer/codegen time at
    PQ_M × PQ_K scale (measured: 8.9 s training, all plan compile);
    the relational form is three codegen'd hash aggregates."""
    spark = dims.sparkSession
    # bounded: PQ_M*PQ_K*PQ_SUB codebook rows
    j = dims.join(F.broadcast(_pq_book_df(spark, books)), ["m", "d"])
    diff = F.col("v") - F.col("cd")
    dist = j.groupBy("vec_id", "m", "cell").agg(
        F.sum(diff * diff).alias("dist")
    )
    return dist.groupBy("vec_id", "m").agg(
        F.min(F.struct("dist", "cell"))["cell"].alias("cell")
    )


def _train_pq_books(
    quant: DataFrame, dims: DataFrame | None = None
) -> list[list[list[int]]]:
    """All PQ_M codebooks trained JOINTLY with relational Lloyd
    rounds: assignment is a codebook join + two hash aggregates, the
    update is one more grouped sum — every step whole-stage codegen,
    no giant literal expressions.  Produces bit-identical codebooks to
    per-subspace literal training (the oracle trains per-subspace in
    SQL and hash-matches)."""
    import math

    init_rows = (
        quant.orderBy("vec_id").limit(PQ_K).select("qv").collect()
    )
    books = [
        [
            [int(v) for v in r.qv[m * PQ_SUB : (m + 1) * PQ_SUB]]
            for r in init_rows
        ]
        for m in range(PQ_M)
    ]
    if dims is None:
        dims = _pq_dims(quant).persist()
    for _ in range(DKM_ITERS):
        assigned = _pq_assign(dims, books)
        sums = (
            dims.join(assigned, ["vec_id", "m"])
            .groupBy("m", "cell", "d")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: PQ_M*PQ_K*PQ_SUB accumulator rows
        )
        new = {}
        for r in sums:
            new.setdefault((int(r.m), int(r.cell)), {})[int(r.d)] = int(
                math.floor(float(r.s) / float(r.n))
            )
        books = [
            [
                [new[(m, j)][d] for d in range(PQ_SUB)]
                if (m, j) in new
                else books[m][j]  # empty cell carries previous centroid
                for j in range(PQ_K)
            ]
            for m in range(PQ_M)
        ]
    return books


@query(
    "pq_adc_deterministic_topk",
    oracle=_pq_oracle(),
    tags=("similarity", "extension", "trained-state"),
)
def pq_adc_deterministic_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PQ compression + exhaustive ADC search with DETERMINISTIC
    integer codebooks — the PQ twin of `ann_ivf_deterministic_topk`
    and the full-oracle upgrade of the library PQ recall gate
    (`queries/quantization.py`).

    Training: each of the {PQ_M} subspaces trains its own {PQ_K}-entry
    codebook with the same order-free integer Lloyd rounds.  Encoding
    maps every vector to {PQ_M} 4-bit codes (map-side argmin).  Search
    is asymmetric: the query keeps its full integer sub-vectors, each
    candidate contributes only its codes, and the score is the integer
    dot of query sub-vectors against the candidate's CODEWORDS —
    relational ADC as {PQ_M} broadcast codebook joins ({PQ_K} rows
    each) + zip_with dots, no per-row Python.

    100 TB: the corpus scan carries {PQ_M} bytes per vector instead of
    the raw floats (the PQ value proposition); codebooks broadcast;
    the only shuffle is the final per-query top-k window over an
    already-tiny candidate frame."""
    emb = read_embeddings(spark, sf_dir)
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * PICO).cast("long"),
        ).alias("qv"),
    ).persist()

    dims = _pq_dims(quant).persist()
    books = _train_pq_books(quant, dims)

    # encode: 4-bit code per subspace (relational argmin over the SAME
    # persisted dims frame the trainer used, then pivot the PQ_M rows
    # back to code0..code{PQ_M-1} columns).  Candidates carry ONLY
    # their codes into the search — never the raw qv array — which is
    # the PQ value proposition (r06 code review dropped a stray
    # join(quant) that dragged the 64-long array through the
    # cross-join).
    best = _pq_assign(dims, books)
    codes = best.groupBy("vec_id").agg(
        *[
            F.max(
                F.when(F.col("m") == m, F.col("cell"))
            ).alias(f"code{m}")
            for m in range(PQ_M)
        ]
    )
    queries = quant.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    # bounded: PQ_K-row codebook frames
    scored = codes.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    for m in range(PQ_M):
        book_df = scored.sparkSession.createDataFrame(
            [(j, c) for j, c in enumerate(books[m])],
            f"code{m} long, cv{m} array<long>",
        )
        # bounded: PQ_K-row codebook frame
        scored = scored.join(F.broadcast(book_df), f"code{m}")
    adc = sum(
        F.aggregate(
            F.zip_with(
                F.slice("qq", m * PQ_SUB + 1, PQ_SUB),
                F.col(f"cv{m}"),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for m in range(PQ_M)
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("adc_pico"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc.alias("adc_pico"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "adc_pico")
    )


# ---------------------------------------------------------------------------
# IVF recall report: quality-as-a-query (the ann_lsh_recall_report
# pattern) — exact integer-MIPS top-k vs the IVF probe result, both
# in-plan, recall hashed by the driver.
# ---------------------------------------------------------------------------

_EXACT_MIPS_SQL = f"""
WITH q AS (
  SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings
  WHERE {VALID_SQL}
), pr AS (
  SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         {_DOT_SQL.format(a="p.qq", b="c.qv")} AS dot_pico
  FROM pr p CROSS JOIN q c WHERE c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id FROM scored
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY dot_pico DESC, neighbor_id) <= {TOP_K}
"""


def _ivf_recall_oracle() -> str:
    return f"""
WITH exact_topk AS (
  SELECT query_id, neighbor_id FROM ({_EXACT_MIPS_SQL})
), ivf_topk AS (
  SELECT query_id, neighbor_id FROM ({_ivf_oracle()})
), hits AS (
  SELECT e.query_id, CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hit
  FROM exact_topk e
  LEFT JOIN ivf_topk i
    ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
  GROUP BY 1
)
SELECT query_id,
       CAST({TOP_K} AS BIGINT) AS k,
       n_hit,
       CAST(FLOOR(n_hit * 1000000.0 / {TOP_K}) AS BIGINT) AS recall_micros
FROM hits
"""


@query(
    "ann_ivf_recall_report",
    oracle=_ivf_recall_oracle(),
    tags=("similarity", "extension", "quality", "trained-state"),
)
def ann_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the deterministic IVF probe against the EXACT
    integer-MIPS top-k, as a driver-hashed in-plan query (the
    `ann_lsh_recall_report` pattern extended to trained-state ANN —
    possible only because the integer Lloyd training is bit-stable in
    both engines).  A probe that degrades (fewer cells, worse
    centroids) moves recall_micros and reddens the hash."""
    emb = read_embeddings(spark, sf_dir)
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * PICO).cast("long"),
        ).alias("qv"),
    ).persist()
    queries = quant.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("qv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("dot_pico"), F.asc("neighbor_id")
    )
    # bounded: fixed N_QUERIES query rows
    exact = (
        quant.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot.alias("dot_pico"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    # reuse the SAME persisted quant frame for the IVF side — one
    # embeddings scan, one cached copy (r06 review)
    ivf = ann_ivf_deterministic_topk(spark, sf_dir, quant=quant).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    hits = (
        exact.join(
            ivf,
            (ivf["query_id"] == exact["query_id"])
            & (ivf["ivf_neighbor"] == exact["neighbor_id"]),
            "left",
        )
        .select(exact["query_id"], "ivf_neighbor")
        .groupBy("query_id")
        .agg(F.count("ivf_neighbor").cast("long").alias("n_hit"))
    )
    return hits.select(
        "query_id",
        F.lit(TOP_K).cast("long").alias("k"),
        "n_hit",
        F.floor(F.col("n_hit") * 1_000_000.0 / TOP_K)
        .cast("long")
        .alias("recall_micros"),
    )
