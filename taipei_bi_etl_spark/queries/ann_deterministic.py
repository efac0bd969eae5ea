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


def _lloyd_iteration_sql(i: int) -> str:
    """CTE block for one Lloyd iteration: assign to c{i-1}, rebuild
    c{i} (empty cells carry the previous centroid)."""
    dist = _DIST_SQL.format(a="q.qv", b="c.cv")
    return f"""a{i} AS (
  SELECT q.vec_id, q.qv, c.cell, {dist} AS dist
  FROM q CROSS JOIN c{i - 1} c
), m{i} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM a{i}
  ) WHERE rn = 1
), u{i} AS (
  SELECT cell, pos,
         CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cd
  FROM (
    SELECT cell, UNNEST(qv) AS v, generate_subscripts(qv, 1) AS pos
    FROM m{i}
  ) GROUP BY cell, pos
), n{i} AS (
  SELECT cell, list(cd ORDER BY pos) AS cv FROM u{i} GROUP BY cell
), c{i} AS (
  SELECT c.cell, COALESCE(n.cv, c.cv) AS cv
  FROM c{i - 1} c LEFT JOIN n{i} n USING (cell)
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
), c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         qv AS cv
  FROM q ORDER BY vec_id LIMIT {DKM_K}
),
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


def _train_centroids(quant: DataFrame) -> list[list[int]]:
    """DKM_ITERS integer Lloyd iterations; returns bit-stable centroid
    lists.  Each round's driver collect is K·dim = {DKM_K}·64 rows — a
    bounded codebook, not a data collect."""
    init = [
        r.qv
        for r in quant.orderBy("vec_id").limit(DKM_K).select("qv").collect()
    ]
    cents = [[int(v) for v in c] for c in init]
    for _ in range(DKM_ITERS):
        assigned = quant.withColumn(
            "cell", _argmin_cells(F.col("qv"), cents, 1)[0]
        )
        sums = (
            assigned.select("cell", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(
                F.sum("v").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # bounded: K*64 centroid accumulator rows
        )
        new = {}
        for r in sums:
            import math

            new.setdefault(int(r.cell), {})[int(r.pos)] = int(
                math.floor(float(r.s) / float(r.n))
            )
        cents = [
            [new[j][d] for d in range(len(cents[j]))]
            if j in new
            else cents[j]  # empty cell carries its previous centroid
            for j in range(DKM_K)
        ]
    return cents


@query(
    "ann_ivf_deterministic_topk",
    oracle=_ivf_oracle(),
    tags=("similarity", "extension", "trained-state"),
)
def ann_ivf_deterministic_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF-MIPS top-{TOP_K} with a DETERMINISTIC integer-quantized
    coarse quantizer — the trained-state ANN entry with a full DuckDB
    value-hash oracle (module docstring has the determinism argument).

    Plan: quantize (map-side) → {DKM_ITERS} Lloyd rounds (one narrow
    shuffle each + a bounded codebook collect) → final assignment
    (map-side) → probe join on cell → integer-dot re-rank window."""
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
