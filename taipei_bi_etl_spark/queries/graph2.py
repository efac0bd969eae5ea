"""Graph family round 3: label-propagation communities and k-shortest
path lengths over the part co-purchase graph — the two BACKLOG leads
(`BACKLOG.md` "Ideas not yet done"), in the established house pattern:
deterministic integer state, iterative DataFrame loops whose
per-iteration shape is a bounded number of keyed shuffles, and
recursive-CTE DuckDB oracles exercising aggregates + windows + QUALIFY
in the recursive term (probed working in BACKLOG's environment facts).

The reference has no graph operators (SURVEY §1.1); this extends the
catalog/recommendation surface the graph family already serves
(pagerank / BFS / triangles / k-core / components / DBSCAN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Shared co-purchase edge builders (same construction as graph.py so the
# whole family agrees on the graph).
# ---------------------------------------------------------------------------


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-both-ways distinct co-purchase edges (src, dst)."""
    li = read_table(spark, sf_dir, "lineitem")
    parts = li.select("l_orderkey", "l_partkey").distinct()
    a = parts.alias("a")
    b = parts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w) with w = 1e6 // co-purchase multiplicity: frequent
    pairs are CLOSE (small weight) — the inverse-frequency metric a
    recommendation distance wants, and exact BIGINT so path sums are
    bit-identical across engines and summation orders."""
    li = read_table(spark, sf_dir, "lineitem")
    parts = li.select("l_orderkey", "l_partkey").distinct()
    a = parts.alias("a")
    b = parts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(
            F.floor(F.lit(1_000_000) / F.count(F.lit(1)))
            .cast("long")
            .alias("w")
        )
    )


_EDGE_CTE = """
parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM parts a JOIN parts b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)
"""

# ---------------------------------------------------------------------------
# Synchronous label propagation — communities in N rounds.
# ---------------------------------------------------------------------------

LPA_ITER = 4

_LPA_ORACLE = f"""
WITH RECURSIVE
{_EDGE_CTE},
lp(iter, node, label) AS (
  SELECT 0, src, CAST(src AS BIGINT) FROM (SELECT DISTINCT src FROM edges)
  UNION ALL
  SELECT l.iter + 1, e.dst, l.label
  FROM lp l JOIN edges e ON e.src = l.node
  WHERE l.iter < {LPA_ITER}
  GROUP BY 1, 2, 3
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY e.dst ORDER BY COUNT(*) DESC, l.label ASC
  ) = 1
)
SELECT node AS p_partkey, label AS community
FROM lp WHERE iter = {LPA_ITER}
"""


@query(
    "copurchase_label_propagation",
    oracle=_LPA_ORACLE,
    tags=("graph", "iterative", "extension"),
)
def copurchase_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community labels by SYNCHRONOUS label propagation (Raghavan et
    al. 2007): every node starts labeled with its own id; each round
    every node adopts the label most frequent among its neighbors.
    Asynchronous LPA is execution-order-dependent — the synchronous
    variant with a total tie-break (max count, then MIN label) is the
    deterministic form an oracle can hash, and the fixed round count
    replaces the usual "until stable" stop (plain LPA may oscillate
    2-cycles forever precisely under synchronous updates).

    Scale: per round ONE message shuffle (edges ⋈ labels keyed on the
    label side's node) and ONE hash aggregate keyed (dst, label),
    whose per-group argmax is a second aggregate on dst — label state
    is always a |V|-row frame, never driver-side; round count is the
    only serial dimension.  The argmax is `max(struct(count, -label))`
    so both the count and the min-label tie-break resolve inside a
    single partial-aggregable max — no window function, no per-group
    sort.
    """
    # pre-partition the STATIC relation on the join key once: the
    # persisted InMemoryRelation keeps hashpartitioning(src) in its
    # outputPartitioning, so none of the LPA_ITER round joins
    # re-shuffles the edge frame — only the per-round label frame
    # (|V| rows) moves.  The classic iterate-against-static layout.
    edges = _undirected_edges(spark, sf_dir).repartition("src").persist()
    labels = (
        edges.select("src").distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
    )
    for _ in range(LPA_ITER):
        msgs = edges.join(
            labels, edges["src"] == labels["node"]
        ).select("dst", "label")
        counts = msgs.groupBy("dst", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = (
            counts.groupBy("dst")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("label")).alias("neg_label")
                    )
                ).alias("m")
            )
            .select(
                F.col("dst").alias("node"),
                (-F.col("m.neg_label")).alias("label"),
            )
        )
    return labels.select(
        F.col("node").alias("p_partkey"), F.col("label").alias("community")
    )


# ---------------------------------------------------------------------------
# k-shortest distinct path lengths — bounded-round relaxation.
# ---------------------------------------------------------------------------

KSP_K = 3
KSP_ROUNDS = 4

_KSP_ORACLE = f"""
WITH RECURSIVE
parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edgesw AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst,
         CAST(1000000 // COUNT(*) AS BIGINT) AS w
  FROM parts a JOIN parts b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
-- zero-weight self-loops carry a node's current top-k forward, so the
-- recursive term needs only ONE reference to the working table
edges_sl AS (
  SELECT src, dst, w FROM edgesw
  UNION ALL
  SELECT src, src, CAST(0 AS BIGINT) FROM (SELECT DISTINCT src FROM edgesw)
),
kd(iter, node, dist) AS (
  SELECT 0, (SELECT MIN(src) FROM edgesw), CAST(0 AS BIGINT)
  UNION ALL
  SELECT iter, node, dist FROM (
    SELECT DISTINCT l.iter + 1 AS iter, e.dst AS node, l.dist + e.w AS dist
    FROM kd l JOIN edges_sl e ON e.src = l.node
    WHERE l.iter < {KSP_ROUNDS}
  )
  QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY dist) <= {KSP_K}
)
SELECT node AS p_partkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY node ORDER BY dist) AS INT)
         AS path_rank,
       dist AS dist_micros
FROM kd WHERE iter = {KSP_ROUNDS}
"""


@query(
    "copurchase_k_shortest_paths",
    oracle=_KSP_ORACLE,
    tags=("graph", "iterative", "extension"),
)
def copurchase_k_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K shortest DISTINCT path lengths from the minimum-id part to
    every part reachable within {KSP_ROUNDS} hops, over inverse-
    frequency integer weights (1e6 // co-purchase multiplicity —
    frequently co-bought pairs are close).  Distinct-length top-k is
    the deterministic distributed form of k-shortest-paths: Yen's
    per-PATH algorithm is inherently sequential (each next path edits
    the previous one), while the length-DP below is the standard
    bounded-round relaxation that parallelizes.

    DP: D_{{i+1}}(v) = top-k distinct of {{d + w(u,v) : d ∈ D_i(u)}}
    over edges AUGMENTED WITH ZERO-WEIGHT SELF-LOOPS — the self-loop
    trick makes carry-forward a relaxation step, which is what lets
    the oracle's recursive CTE express the same DP with a single
    working-table reference (SQL allows no more).

    Scale: state is ≤ K rows per reached node; each round is one join
    keyed on the state's node and ONE hash aggregate building the
    per-node top-k via sort+slice of a collect_set bounded by
    K·deg(v) — no window function, no global sort.  Rounds are the
    only serial dimension, and the frontier grows monotonically like
    any BFS relaxation.
    """
    edges = _weighted_edges(spark, sf_dir)
    loops = edges.select("src").distinct().select(
        "src", F.col("src").alias("dst"), F.lit(0).cast("long").alias("w")
    )
    # same iterate-against-static layout as the LPA: partition the
    # loop-augmented edges on src once, so the KSP_ROUNDS joins only
    # ever shuffle the (≤ K·|V|)-row state frame
    edges_sl = edges.unionByName(loops).repartition("src").persist()
    seed_row = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    state = seed_row
    for _ in range(KSP_ROUNDS):
        st = state.alias("st")
        e = edges_sl.alias("e")
        relaxed = st.join(
            e, F.col("st.node") == F.col("e.src")
        ).select(
            F.col("e.dst").alias("dst"),
            (F.col("st.dist") + F.col("e.w")).alias("dist"),
        )
        state = (
            relaxed.groupBy("dst")
            .agg(
                F.slice(
                    F.array_sort(F.collect_set("dist")), 1, KSP_K
                ).alias("ds")
            )
            .select(F.col("dst").alias("node"), F.explode("ds").alias("dist"))
        )
    return (
        state.groupBy("node")
        .agg(F.array_sort(F.collect_set("dist")).alias("ds"))
        .select(F.col("node"), F.posexplode("ds").alias("pos", "dist"))
        .select(
            F.col("node").alias("p_partkey"),
            (F.col("pos") + 1).cast("int").alias("path_rank"),
            F.col("dist").alias("dist_micros"),
        )
    )
