"""Record linkage / fuzzy string join — deletion-neighborhood blocking
(FastSS, Bocek et al. 2007 / the Mor-Fraenkel method) with exact
Levenshtein verification.

The reference cleans identifier-shaped strings with exact equality
only; a curation pipeline also needs the TYPO-TOLERANT join: find all
pairs of records whose names differ by at most one edit (substitution,
insertion, or deletion).  A naive self-join computes n² Levenshtein
distances; blocking must cut candidates WITHOUT losing pairs.

Positional half-blocking (the SimHash pigeonhole) is degenerate here:
every TPC-H name shares the constant 9-char prefix (``Customer#``), so
the first-half block collects the whole table.  Deletion neighborhoods
are shape-proof: index each name under itself PLUS its |s| one-char
deletions; lev(s,t) ≤ 1 guarantees a shared variant —

* t = s: share s itself;
* one substitution at i: deleting position i from both yields the
  same string;
* one insertion/deletion: the longer string minus the edited char IS
  the shorter string.

Sharing a variant does NOT bound the distance (``ab``/``ba`` share
``a``), so candidates are verified with the real ``levenshtein`` —
present with identical semantics in Spark (`F.levenshtein`) and DuckDB.

100 TB design: postings = (L+1) per record — linear, not quadratic;
bucket keys are near-unique variant strings (uniform shuffle); the
verify join ships names only for candidate pairs.  The n² form never
exists in the plan, and the ORACLE uses the same neighborhood
construction (completeness is proved once, above) so the sf0.1 sweep
stays linear too.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

#: Per-block candidate-edge cap for the ER closure (r08, VERDICT r07
#: #2).  `fuzzy_linkage_clusters` ships ONE block's whole verified-edge
#: list into one pandas union-find task; with skewed geography a hot
#: nation's edge list is the binding constraint (the applyInPandas
#: parallelism is <= |blocks|).  Blocks past this cap are routed to the
#: iterative `min_label_components` path, which shuffles edges by node
#: key across ALL cores — same answer (components are identical;
#: entity_id = component minimum under both closures), different
#: physical strategy.  2M edges ~ a few hundred MB as a pandas frame —
#: comfortably one-task-sized; override for tests/stress via env.
_ER_EDGE_CAP = int(os.environ.get("SPARK_GRAFT_ER_EDGE_CAP", "2000000"))

# ASCII guard (agreed exclusion, battery-pinned): DuckDB's levenshtein
# is BYTE-based ('café'→'cafe' = 2: é is two UTF-8 bytes) while
# Spark's is CHARACTER-based (= 1) — on ASCII text bytes == chars and
# the engines agree exactly.  Both sides therefore restrict linkage to
# ASCII names; a non-ASCII typo row lives in the hostile battery to
# pin that BOTH engines exclude it (rather than silently disagreeing
# on its distance).
_FUZZY_ORACLE = """
WITH names AS (
    SELECT c_custkey, c_name FROM customer
    WHERE c_name IS NOT NULL AND regexp_matches(c_name, '^[\\x00-\\x7f]*$')
), vars AS (
    SELECT c_custkey,
           unnest(list_distinct(list_prepend(c_name,
               list_transform(range(1, len(c_name) + 1),
                   i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)))))
             AS v
    FROM names
), cand AS (
    SELECT DISTINCT a.c_custkey AS k_a, b.c_custkey AS k_b
    FROM vars a JOIN vars b USING (v)
    WHERE a.c_custkey < b.c_custkey
)
SELECT k_a AS custkey_a, k_b AS custkey_b,
       na.c_name AS name_a, nb.c_name AS name_b,
       CAST(levenshtein(na.c_name, nb.c_name) AS INT) AS dist
FROM cand
JOIN names na ON na.c_custkey = k_a
JOIN names nb ON nb.c_custkey = k_b
WHERE levenshtein(na.c_name, nb.c_name) <= 1
"""


def deletion_neighborhood(s: Column) -> Column:
    """Distinct array of ``s`` plus every one-char-deletion variant —
    the FastSS index keys for edit distance ≤ 1."""
    return F.array_distinct(
        F.concat(
            F.array(s),
            F.transform(
                F.sequence(F.lit(1), F.length(s)),
                lambda i: F.concat(
                    s.substr(F.lit(1), i - 1),
                    s.substr(i + 1, F.length(s)),
                ),
            ),
        )
    )


def _ascii_base(recs: DataFrame, key: str, name: str) -> DataFrame:
    """(key, name) under the agreed ASCII / NOT NULL linkage contract."""
    return recs.filter(
        F.col(name).isNotNull() & F.col(name).rlike("^[\\x00-\\x7f]*$")
    ).select(key, name)


def _nbr_index(base: DataFrame, key: str, name: str) -> DataFrame:
    """(k, v): each record under every deletion-neighborhood variant."""
    return base.select(
        F.col(key).alias("k"),
        F.explode(deletion_neighborhood(F.col(name))).alias("v"),
    )


def _verify_lev1(
    cand: DataFrame, base: DataFrame, key: str, name: str
) -> DataFrame:
    """Exact-verify candidate (k_a, k_b) pairs: join names, keep
    levenshtein ≤ 1, emit the linkage output columns."""
    na = base.select(F.col(key).alias("k_a"), F.col(name).alias("name_a"))
    nb = base.select(F.col(key).alias("k_b"), F.col(name).alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.join(na, "k_a")
        .join(nb, "k_b")
        .filter(dist <= 1)
        .select(
            F.col("k_a").alias("custkey_a"),
            F.col("k_b").alias("custkey_b"),
            "name_a",
            "name_b",
            dist.cast("int").alias("dist"),
        )
    )


def fuzzy_pairs_lev1(
    recs: DataFrame, key: str, name: str
) -> DataFrame:
    """All (key_a, key_b, name_a, name_b, dist) pairs with
    levenshtein ≤ 1 over a (key, name) frame — deletion-neighborhood
    candidates, exact verify.  Completeness proof in the module doc.

    ASCII-only contract (agreed with the oracle): DuckDB levenshtein
    counts BYTES, Spark counts CHARS — identical only on ASCII, so
    non-ASCII names are excluded in BOTH engines (battery-pinned)."""
    # base feeds three subtrees (index + both verify sides); persist so
    # the scan + guard run once per job (same pattern as the shingle
    # index families).  No unpersist here by design: the returned frame
    # still consumes the cache — the registry wrapper's release-on-next-
    # invocation contract (queries/__init__._TRACKED) frees it, so
    # registry-wide sweeps hold at most one query's caches.
    base = _ascii_base(recs, key, name).persist()
    idx = _nbr_index(base, key, name)
    a, b = idx.alias("a"), idx.alias("b")
    cand = (
        a.join(b, "v")
        .filter(F.col("a.k") < F.col("b.k"))
        .select(F.col("a.k").alias("k_a"), F.col("b.k").alias("k_b"))
        .distinct()
    )
    return _verify_lev1(cand, base, key, name)


@query("fuzzy_name_linkage", oracle=_FUZZY_ORACLE, tags=("linkage", "extension"))
def fuzzy_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name record linkage at edit distance ≤ 1: every pair of
    customers whose names differ by one substitution, insertion, or
    deletion (TPC-H's fixed-format ids make these one-digit typos).
    FastSS deletion-neighborhood candidates + exact levenshtein verify;
    the oracle replays the SAME neighborhood construction, so both
    engines stay linear in postings (never n² distances)."""
    return fuzzy_pairs_lev1(
        read_table(spark, sf_dir, "customer"), "c_custkey", "c_name"
    )


# Entity-resolution clusters: same-nation fuzzy pairs → connected
# components.  The nation block is the standard ER compound rule
# ("same entity iff same region AND name within one edit") and bounds
# both engines: Spark's component diameter and the oracle's recursive
# reach relation stay within one nation's customers (NULL nations
# drop out of the plain equality in BOTH engines).
#
# CANONICAL-ROW CONTRACT (r07 second review pass): a duplicated
# c_custkey with DIFFERENT (name, nation) rows would otherwise make
# the engines diverge two ways — Spark's post-join nation check could
# pair a name-row with the OTHER row's nation, and a dup key bridging
# two nations would merge components globally in the oracle's reach
# relation while landing in two per-nation groups in Spark.  ER
# requires a well-formed record id, so BOTH engines first dedupe to
# one canonical row per key (min (name, nation), nations NULLS FIRST
# — explicit, because DuckDB default-sorts ASC NULLS LAST while
# Spark sorts NULLS FIRST).  The hostile battery ships exactly the
# dup-key shape, pinning the contract.
_CLUSTER_ORACLE = """
WITH RECURSIVE names AS (
    SELECT c_custkey, c_name, c_nationkey FROM (
        SELECT c_custkey, c_name, c_nationkey FROM customer
        WHERE c_name IS NOT NULL
          AND regexp_matches(c_name, '^[\\x00-\\x7f]*$')
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY c_custkey
            ORDER BY c_name, c_nationkey NULLS FIRST) = 1
    )
), vars AS (
    SELECT c_custkey,
           unnest(list_distinct(list_prepend(c_name,
               list_transform(range(1, len(c_name) + 1),
                   i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)))))
             AS v
    FROM names
), cand AS (
    SELECT DISTINCT a.c_custkey AS k_a, b.c_custkey AS k_b
    FROM vars a JOIN vars b USING (v)
    WHERE a.c_custkey < b.c_custkey
), pairs AS (
    SELECT k_a, k_b
    FROM cand
    JOIN names na ON na.c_custkey = k_a
    JOIN names nb ON nb.c_custkey = k_b
    WHERE levenshtein(na.c_name, nb.c_name) <= 1
      AND na.c_nationkey = nb.c_nationkey
), reach(node, root) AS (
    SELECT d, d FROM (SELECT k_a AS d FROM pairs
                      UNION SELECT k_b FROM pairs) t(d)
    UNION
    SELECT e.b, r.root
    FROM reach r
    JOIN (SELECT k_a AS a, k_b AS b FROM pairs
          UNION SELECT k_b, k_a FROM pairs) e ON e.a = r.node
)
SELECT CAST(node AS BIGINT) AS c_custkey,
       CAST(MIN(root) AS BIGINT) AS entity_id
FROM reach GROUP BY node
"""


@query(
    "fuzzy_linkage_clusters",
    oracle=_CLUSTER_ORACLE,
    tags=("linkage", "graph", "extension"),
)
def fuzzy_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution clusters: customers whose names are within one
    edit AND share a nation are the same entity; output (c_custkey,
    entity_id = min custkey of the component) for every customer in at
    least one fuzzy pair.

    The compound blocking rule is the point at scale: the edit-distance
    block alone chains one-digit typos across the whole id space (a
    giant component and an unbounded oracle reach relation); the nation
    conjunct caps every component at one nation's customers — the ER
    analog of the df_cap/bucket_cap guards.

    BECAUSE components are bounded by the block, the closure is one
    ``applyInPandas`` union-find per nation — ONE shuffle on the block
    key, no driver-side loop.  The iterative `min_label_components`
    form was measured and REJECTED here: the fuzzy typo graph's
    diameter pushes it past ~20 rounds, where the per-round checkpoint
    cost doubles each round (measured 0.6 s → 136 s by round 20 at
    sf0.1 on 11 K nodes — see SCALE.md "min-label round-cost doubling").
    Iterative CC remains the right tool when components are UNBOUNDED
    (dedup near-clique graphs: few rounds); blocked ER is exactly the
    bounded case.

    The pandas closure is SELF-CONTAINED (no module references) so the
    driver's foreign-cwd workers can unpickle it.

    CANONICAL-ROW CONTRACT: both engines first dedupe to one row per
    c_custkey (min (name, nation), NULLS FIRST explicit — DuckDB
    defaults ASC NULLS LAST, Spark NULLS FIRST).  Without it a dup
    key with differing rows decouples the name match from the nation
    check and can bridge two nations' components — the second r07
    review pass caught both as latent driver-gate divergences; the
    hostile battery's dup-key customer pins the contract."""
    from pyspark.sql import Window as _W

    cust = read_table(spark, sf_dir, "customer")
    rn = F.row_number().over(
        _W.partitionBy("c_custkey").orderBy(
            F.col("c_name").asc(), F.col("c_nationkey").asc_nulls_first()
        )
    )
    names = (
        cust.filter(
            F.col("c_name").isNotNull()
            & F.col("c_name").rlike("^[\\x00-\\x7f]*$")
        )
        .select("c_custkey", "c_name", "c_nationkey")
        .withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .persist()
    )
    idx = _nbr_index(names, "c_custkey", "c_name")
    a, b = idx.alias("a"), idx.alias("b")
    cand = (
        a.join(b, "v")
        .filter(F.col("a.k") < F.col("b.k"))
        .select(F.col("a.k").alias("k_a"), F.col("b.k").alias("k_b"))
        .distinct()
    )
    na = names.select(
        F.col("c_custkey").alias("k_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"),
    )
    nb = names.select(
        F.col("c_custkey").alias("k_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat_b"),
    )
    same_nation = (
        cand.join(na, "k_a")
        .join(nb, "k_b")
        .filter(
            (F.levenshtein("name_a", "name_b") <= 1)
            & (F.col("nat_a") == F.col("nat_b"))
        )
        .select(
            F.col("nat_a"),
            F.col("k_a").alias("custkey_a"),
            F.col("k_b").alias("custkey_b"),
        )
    )
    return blocked_components(same_nation, edge_cap=_ER_EDGE_CAP)


#: Above this many oversized block keys the small/big split goes
#: through a broadcast join on the keys frame instead of a driver-list
#: `isin` (a 500k-literal IN expression would bloat the plan string and
#: the codegen source).  The oversized-key COUNT is always bounded by
#: construction (each holds > edge_cap edges, so there are at most
#: total_edges / edge_cap of them); this cap only picks the split
#: MECHANISM.
_ER_ISIN_CAP = int(os.environ.get("SPARK_GRAFT_ER_ISIN_CAP", "64"))


def blocked_components(
    edges: DataFrame,
    edge_cap: int = _ER_EDGE_CAP,
    isin_cap: int = _ER_ISIN_CAP,
) -> DataFrame:
    """Connected components of block-bounded (``nat_a``, ``custkey_a``,
    ``custkey_b``) edges; output (c_custkey, entity_id = component
    minimum) for every endpoint.

    EDGE-COUNT GUARD (r08, VERDICT r07 #2 — the `bcast_dim`/`df_cap`
    pattern): per-block edge counts are aggregated and only the
    OVERSIZED keys reach the driver (r09, VERDICT r08 #2 — bounded BY
    CONSTRUCTION: a key collects only by holding > ``edge_cap`` edges,
    so at most total_edges / edge_cap rows ever cross, regardless of
    block-key cardinality; the old whole-counts collect was bounded
    only because nations number 25).  Blocks at or under ``edge_cap``
    run the one-pass per-block union-find (one shuffle on the block
    key); an OVERSIZED block's edges are instead routed to the
    iterative ``min_label_components`` closure, which shuffles by NODE
    key across all cores — no single task ever holds more than
    ``edge_cap`` edges.  Few oversized keys split via a driver-list
    ``isin``; past ``isin_cap`` the split switches to a broadcast
    anti/semi join on the keys frame so the plan never embeds an
    unbounded literal list.  Both closures label a component by its
    minimum node id, so the output is identical either way (the
    routing pytest pins this on a skewed corpus AND on a synthetic
    high-cardinality block key); node sets are disjoint across blocks
    (each canonical row has one nation), so the union never duplicates
    a key.  The iterative path's round count is bounded by
    O(log diameter) pointer jumping, and ER typo graphs are near-clique
    unions (diameter ~2-3) — the min-label doubling past ~15 rounds
    (SCALE.md) is out of reach.

    EAGER-EXECUTION NOTE (ADVICE r08 #2): the oversized-key probe runs
    AT DATAFRAME-CONSTRUCTION TIME — building this frame (and any query
    that calls it, e.g. ``fuzzy_linkage_clusters``) executes the full
    upstream edge pipeline once before a plan exists.  Routing on data
    statistics cannot be lazy without a custom rule; the probe is the
    minimum action (one shuffled count per block key, oversized rows
    only to the driver), the edges are persisted so the main pass
    reuses the work, and the plan-audit tools (tools/dump_plans.py,
    shuffle/wscg audits) tolerate the side effect — their ledgers
    already carry this query's rows."""
    edges = edges.persist()
    counts = edges.groupBy("nat_a").agg(F.count(F.lit(1)).alias("n"))
    # bounded by construction: only keys holding > edge_cap edges
    oversized_rows = counts.filter(F.col("n") > edge_cap)
    oversized = [
        r["nat_a"] for r in oversized_rows.limit(isin_cap + 1).collect()
    ]
    use_isin = len(oversized) <= isin_cap

    def _cc(pdf):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf["custkey_a"], pdf["custkey_b"]):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union-by-min keeps the invariant root == component
                # minimum, so the root IS the entity id
                parent[max(ra, rb)] = min(ra, rb)
        return pd.DataFrame(
            {
                "c_custkey": list(parent),
                "entity_id": [find(n) for n in parent],
            }
        )

    small = edges
    big_edges = None
    if oversized and use_isin:
        # few oversized keys: literal IN list keeps the split
        # codegen-friendly and shuffle-free
        small = edges.filter(~F.col("nat_a").isin(oversized))
        big_edges = edges.filter(F.col("nat_a").isin(oversized))
    elif oversized:
        keys = oversized_rows.select("nat_a")
        # bounded: each oversized key holds > edge_cap edges, so keys
        # is ≤ total_edges/edge_cap rows of single longs
        small = edges.join(F.broadcast(keys), "nat_a", "left_anti")
        # bounded: the same ≤ total_edges/edge_cap keys frame as above
        big_edges = edges.join(F.broadcast(keys), "nat_a", "left_semi")
    uf = small.groupBy("nat_a").applyInPandas(
        _cc, "c_custkey long, entity_id long"
    )
    if big_edges is None:
        return uf
    from taipei_bi_etl_spark.queries.clustering import min_label_components

    big = min_label_components(
        big_edges,
        "custkey_a",
        "custkey_b",
    ).select(
        F.col("node").alias("c_custkey"),
        F.col("component_id").cast("long").alias("entity_id"),
    )
    return uf.unionByName(big)


@query(
    "fuzzy_linkage_incremental",
    oracle=_FUZZY_ORACLE,
    tags=("linkage", "ivm", "extension"),
)
def fuzzy_linkage_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental fuzzy linkage against a persisted deletion-
    neighborhood index — the daily-batch form, completing the
    incremental family (MinHash / SimHash / images / paragraphs /
    names all share the pattern: the ORACLE is the FULL recompute, so
    the driver hash gate proves the IVM identity).

    APPEND-ONLY split: new batch = custkeys above the 75th-percentile
    id cut (one 1-row aggregate, broadcast).  The full pair set
    decomposes EXACTLY (no approximation — pairs are symmetric and
    every pair has both ends in history, both in the batch, or one in
    each):

    * history × history: yesterday's stored pair set (derived in-plan
      here so the driver can hash the union; `ivm_store` applies
      verbatim if persisted);
    * new × history: the new names' variants PROBE the history index —
      daily cost ∝ |batch| postings + matched buckets;
    * new × new: batch-local self-join.

    History names are never re-indexed in the stored-state deployment;
    all new ids exceed all history ids, so cross pairs are already
    (history, new) = (smaller, larger) ordered."""
    from taipei_bi_etl_spark.queries.incremental import quantile_cut_split

    cust = read_table(spark, sf_dir, "customer")
    base = _ascii_base(cust, "c_custkey", "c_name").persist()
    hist, new = quantile_cut_split(base, "c_custkey")
    idx_h = _nbr_index(hist, "c_custkey", "c_name")
    idx_n = _nbr_index(new, "c_custkey", "c_name")

    def _cand(left, right, strict):
        cond = (
            F.col("a.k") < F.col("b.k")
            if strict
            else F.lit(True)
        )
        return (
            left.alias("a")
            .join(right.alias("b"), "v")
            .filter(cond)
            .select(F.col("a.k").alias("k_a"), F.col("b.k").alias("k_b"))
            .distinct()
        )

    hist_pairs = _cand(idx_h, idx_h, True)     # yesterday's stored set
    cross_pairs = _cand(idx_h, idx_n, False)   # probe: hist < new always
    new_pairs = _cand(idx_n, idx_n, True)      # batch-local
    cand = hist_pairs.unionByName(cross_pairs).unionByName(new_pairs)
    return _verify_lev1(cand, base, "c_custkey", "c_name")
