"""Graph analytics over relational data: integerized PageRank on the
part co-purchase graph — the iterative join-aggregate loop family
(alongside `dedup_components`' label propagation and
`embedding_kmeans`' Lloyd iterations).

The reference has no graph operators (SURVEY §1.1: "no graphs"), but a
catalog/recommendation surface over the same star schema is a standard
extension, and PageRank is the canonical "would this survive 1000
executors" iterative workload: every iteration is ONE shuffle join of
the score frame against the edge frame plus one aggregation — state
between iterations is a (node, score) frame, never driver-side.

Float policy: scores are integer MICROS and every update uses floor
division (``DIV``) and the rational damping 17/20 = 0.85, so each
iteration is exact BIGINT arithmetic — bit-identical across engines
and across summation orders, which is what lets an ITERATIVE float
algorithm be oracle-hashed at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.scale import bcast_dim

N_ITER = 5
INIT_MICROS = 1_000_000
#: (1 - d) * 1e6 with d = 0.85
TELEPORT_MICROS = 150_000

_PAGERANK_ORACLE = f"""
WITH RECURSIVE
parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM parts a JOIN parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
pr(iter, node, score) AS (
    SELECT 0, src, CAST({INIT_MICROS} AS BIGINT) FROM outw
    UNION ALL
    SELECT p.iter + 1, e.dst,
           CAST({TELEPORT_MICROS}
                + (CAST(SUM((p.score * e.w) // o.tw) AS BIGINT) * 17) // 20
             AS BIGINT)
    FROM pr p
    JOIN edges e ON e.src = p.node
    JOIN outw o ON o.src = p.node
    WHERE p.iter < {N_ITER}
    GROUP BY 1, 2
)
SELECT node AS p_partkey, score AS pagerank_micros
FROM pr WHERE iter = {N_ITER}
"""


@query(
    "part_copurchase_pagerank",
    oracle=_PAGERANK_ORACLE,
    tags=("graph", "iterative"),
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts are linked when
    they appear in the same order; edge weight = co-occurrence count),
    {N_ITER} exact-integer iterations — score(v) ← 150000 +
    (Σ_u floor(score(u)·w(u,v) / outweight(u)) · 17) div 20.

    Oracle: the identical recursion as a DuckDB recursive CTE — an
    iterative algorithm hash-checked cross-engine, possible only
    because every step is floor-division BIGINT arithmetic (see module
    docstring).

    Scale: the edge build is the one quadratic-looking step, but the
    self-join runs per order and fan-out is bounded by lines-per-order
    (≤7 here; basket-bounded in general — the same bound as
    `event_cooccurrence_lift`).  Edges and out-weights are computed
    ONCE and persisted; each iteration then shuffles the (node, score)
    frame — rows = |V|, narrow — against the edge frame on src and
    re-aggregates on dst.  Nothing ever collects to the driver; the
    loop is unrolled lazily and materialized per iteration via the
    persisted edge frame, so plan depth stays O(iterations).
    """
    li = read_table(spark, sf_dir, "lineitem")
    parts = li.select("l_orderkey", "l_partkey").distinct()
    a = parts.alias("a")
    b = parts.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .persist()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    # weight share precomputed per edge: floor((score*w)/tw) needs score,
    # so carry (w, tw) on each edge instead
    ew = edges.join(outw, "src").select("src", "dst", "w", "tw").persist()
    ew.count()  # materialize once; iterations reuse
    scores = outw.select(
        F.col("src").alias("node"), F.lit(INIT_MICROS).cast("long").alias("score")
    )
    for _ in range(N_ITER):
        scores = (
            ew.join(scores, ew["src"] == scores["node"])
            .select(
                "dst",
                F.expr("score * w DIV tw").alias("contrib"),
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(TELEPORT_MICROS)
                    + F.expr("sum(contrib) * 17 DIV 20")
                ).alias("score")
            )
            .select(F.col("dst").alias("node"), F.col("score").cast("long"))
        )
    return scores.select(
        F.col("node").alias("p_partkey"), F.col("score").alias("pagerank_micros")
    )


# ---------------------------------------------------------------------------
# Recursive CTE — bounded BFS over the co-purchase graph.
# ---------------------------------------------------------------------------

_BFS_SEED = 0
_BFS_DEPTH = 2

_BFS_SQL = f"""
WITH RECURSIVE
parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM parts a JOIN parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
reach(node, depth) AS (
    SELECT CAST({_BFS_SEED} AS BIGINT), 0
    UNION ALL
    SELECT e.dst, r.depth + 1
    FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.depth < {_BFS_DEPTH}
)
SELECT CAST(d AS BIGINT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM (SELECT node, MIN(depth) AS d FROM reach GROUP BY node)
GROUP BY 1
"""


@query(
    "part_reachability_bfs",
    oracle=_BFS_SQL,
    tags=("graph", "recursive", "sql"),
)
def part_reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many parts are reachable from part {seed} within N co-
    purchase hops, per BFS depth — written as a RECURSIVE CTE, a
    Spark 4 surface, and run from the IDENTICAL SQL text the DuckDB
    oracle executes (dialect parity is the point: the reference's
    users author plain SQL, `tasks/bigquery.py:315-319`).

    Shape notes: the recursion is UNION ALL walks with a depth bound
    and a MIN(depth) collapse afterward — per-level walk fan-out is
    degree^depth, which the tiny depth bound caps.  For UNBOUNDED
    traversals at 100 TB use the iterative DataFrame loop with
    per-level dedup instead (`dedup_components` is exactly that); the
    recursive CTE materializes every step of the walk relation, so it
    is the authoring convenience for shallow expansions, not the scale
    path for deep ones.
    """
    from taipei_bi_etl_spark.io import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_BFS_SQL)


# ---------------------------------------------------------------------------
# Triangle counting — degree-oriented wedge join.
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM parts a JOIN parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""


@query(
    "copurchase_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    tags=("graph", "join"),
)
def copurchase_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the co-purchase graph — the canonical graph metric
    whose NAIVE three-way self-join (the oracle's form) explodes on
    skewed degree distributions: a hub of degree d contributes O(d²)
    join rows.

    The engine side uses DEGREE ORIENTATION: every undirected edge
    points from its (degree, id)-smaller endpoint to the larger, and
    triangles are counted as oriented wedges (a→b, a→c) closed by an
    oriented edge b→c.  Each triangle is counted exactly once (it has
    a unique minimum vertex in the total order), and the wedge count
    is Σ_a C(outdeg(a), 2) where orientation caps outdeg at O(√m) —
    the hub's quadratic blowup moves to low-degree sources.  This is
    the standard MapReduce-era trick (Suri & Vassilvitskii's
    partition-aware variant descends from it) expressed as three
    DataFrame joins; same count, scale-safe wedge volume.

    The lexicographic (degree, id) compare is done inline — no global
    rank window, so nothing serializes on |V|.
    """
    li = read_table(spark, sf_dir, "lineitem")
    parts = li.select("l_orderkey", "l_partkey").distinct()
    a = parts.alias("a")
    b = parts.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .persist()  # three consumers: deg (×2 via union) + the ed join —
        # unpersisted, the orders self-join + dedup re-executes for each
        # (measured: over half the query's runtime at sf0.1)
    )
    # materialize the cache BEFORE the guarded broadcasts below: a
    # non-materialized persist propagates the self-join's size-only
    # estimate (children multiplied — terabytes), while a materialized
    # InMemoryRelation reports ACTUAL bytes, which is the number
    # bcast_dim should judge.
    edges.count()
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # |V| rows of (node, degree): broadcast both sides of the degree
    # enrichment so the edge list never shuffles for it
    du = bcast_dim(deg.select(F.col("n").alias("u"), F.col("d").alias("du")))
    dv = bcast_dim(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")))
    ed = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).persist()
    oriented.count()  # materialize: three consumers below scan the cache
    edges.unpersist()
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedge_ordered = (F.col("o1.ddst") < F.col("o2.ddst")) | (
        (F.col("o1.ddst") == F.col("o2.ddst"))
        & (F.col("o1.dst") < F.col("o2.dst"))
    )
    # (b, c) packed into one long: the wedge stream is the big side
    # (Σ C(outdeg, 2) rows), so its join key should be one 8-byte
    # compare, not two
    wedges = o1.join(
        o2, (F.col("o1.src") == F.col("o2.src")) & wedge_ordered
    ).select(
        (
            F.col("o1.dst").cast("long") * F.lit(1 << 32) + F.col("o2.dst")
        ).alias("bc")
    )
    closer = oriented.select(
        (F.col("src").cast("long") * F.lit(1 << 32) + F.col("dst")).alias(
            "bc"
        )
    )
    # BROADCAST the closing-edge side: |E| longs (~10 MB at sf0.1, and
    # still broadcastable far beyond) vs the 30×-larger wedge stream —
    # without the hint Catalyst shuffles every wedge row; with it the
    # wedge side never leaves its map task and the whole count is one
    # scan over the cached oriented edges.  Beyond broadcast range,
    # drop the hint: the same plan degrades to a shuffled hash join.
    # inner (not semi): every wedge is a distinct (a;b,c), so one match
    # per closing edge = one triangle
    return wedges.join(bcast_dim(closer), ["bc"], "inner").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# k-core decomposition — iterative peeling to a fixpoint.
# ---------------------------------------------------------------------------

KCORE_K = 40

_KCORE_ORACLE = f"""
WITH RECURSIVE
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
peel AS (
  SELECT 0 AS iter, u, v,
         CAST(0 AS BIGINT) + (SELECT COUNT(*) FROM edges) AS cnt
  FROM edges
  UNION ALL
  SELECT iter + 1, u, v, COUNT(*) OVER () AS cnt FROM (
    SELECT iter, u, v, cnt,
           COUNT(*) OVER (PARTITION BY u) AS du,
           COUNT(*) OVER (PARTITION BY v) AS dv
    FROM peel
  ) WHERE du >= {KCORE_K} AND dv >= {KCORE_K}
  QUALIFY COUNT(*) OVER () < cnt
),
last AS (
  SELECT u, v,
         COUNT(*) OVER (PARTITION BY u) AS du,
         COUNT(*) OVER (PARTITION BY v) AS dv
  FROM peel WHERE iter = (SELECT MAX(iter) FROM peel)
)
SELECT u AS p_partkey, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM last WHERE du >= {KCORE_K} AND dv >= {KCORE_K}
GROUP BY u
"""


@query("copurchase_kcore", oracle=_KCORE_ORACLE, tags=("graph", "iterative"))
def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k}-core of the co-purchase graph: the maximal subgraph in
    which every part has ≥ k co-purchase partners — iterative peeling
    (drop nodes with degree < k, recompute degrees, repeat) until a
    fixpoint.  Cores are how a curation pipeline finds the dense
    "backbone" of an item/document graph (and prunes long-tail noise
    before expensive per-node work).

    Oracle: the k-core is UNIQUE (independent of peeling order), so
    the data-dependent fixpoint does have an ANSI twin — a recursive
    CTE that re-derives the surviving edge set each step and stops at
    convergence via a change-detecting QUALIFY (emit the next
    iteration only while COUNT(*) OVER () shrinks; without it the
    recursion would spin on the converged set forever or need an
    arbitrary iteration cap).  `tests/test_clustering.py` keeps the
    structural gates: (a) every surviving node has ≥ k surviving
    neighbors, (b) maximality — no peeled node does.

    Scale: per iteration one degree aggregation + one semi-join, both
    keyed on node; the driver sees ONE scalar per iteration (the
    changed-count that drives convergence), never node data.  Peeling
    converges in ≤ |V| rounds but in practice tens; each round's
    frames shrink monotonically.
    """
    li = read_table(spark, sf_dir, "lineitem")
    parts = li.select("l_orderkey", "l_partkey").distinct()
    a = parts.alias("a")
    b = parts.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .persist()
    )
    live = edges
    while True:
        deg = live.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= KCORE_K).select("u").persist()
        nxt = (
            live.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .persist()
        )
        n_before = live.select("u").distinct().count()
        n_after = nxt.select("u").distinct().count()
        # nxt is materialized by the counts above — release the
        # superseded round's caches so a long-lived session doesn't
        # accumulate |rounds| copies of the edge frame
        keep.unpersist()
        if live is not edges:
            live.unpersist()
        live = nxt
        if n_after == n_before or n_after == 0:
            break
    return (
        live.groupBy("u")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(F.col("u").alias("p_partkey"), "core_degree")
    )
