"""Fuzzy linkage (FastSS deletion-neighborhood + levenshtein verify)."""

from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries.linkage import (
    deletion_neighborhood,
    fuzzy_pairs_lev1,
)
from tests.conftest import SF_DIR


def test_blocking_equals_bruteforce(spark):
    """The deletion-neighborhood candidates + verify must return
    EXACTLY the n² brute-force lev ≤ 1 pairs (completeness lemma,
    checked on the real corpus)."""
    cust = read_table(spark, SF_DIR, "customer")
    blocked = fuzzy_pairs_lev1(cust, "c_custkey", "c_name")
    base = cust.select("c_custkey", "c_name")
    a = base.select(
        F.col("c_custkey").alias("custkey_a"), F.col("c_name").alias("name_a")
    )
    b = base.select(
        F.col("c_custkey").alias("custkey_b"), F.col("c_name").alias("name_b")
    )
    dist = F.levenshtein("name_a", "name_b")
    brute = (
        a.crossJoin(b)
        .filter((F.col("custkey_a") < F.col("custkey_b")) & (dist <= 1))
        .select(
            "custkey_a",
            "custkey_b",
            "name_a",
            "name_b",
            dist.cast("int").alias("dist"),
        )
    )
    assert brute.exceptAll(blocked).count() == 0
    assert blocked.exceptAll(brute).count() == 0
    assert blocked.count() > 0  # TPC-H one-digit neighbors exist


def test_contract_rows(spark):
    """The battery shapes, asserted positively: an ASCII insertion typo
    PAIRS at dist 1; a non-ASCII typo is EXCLUDED by the agreed ASCII
    guard (DuckDB levenshtein is byte-based — on 'Customér' the engines
    would disagree 1 vs 2); NULL names are dropped; duplicate adjacent
    chars don't produce duplicate pairs."""
    rows = [
        (1, "Customer#000000001"),
        (2, "Customer#000000001x"),  # insertion, dist 1
        (3, "Customér#000000001"),   # non-ASCII: excluded
        (4, None),
        (5, "aab"),
        (6, "ab"),                   # dist 1 to aab (delete one a)
    ]
    recs = spark.createDataFrame(rows, "c_custkey long, c_name string")
    got = {
        (r.custkey_a, r.custkey_b, r.dist)
        for r in fuzzy_pairs_lev1(recs, "c_custkey", "c_name").collect()
    }
    assert got == {(1, 2, 1), (5, 6, 1)}


def test_deletion_neighborhood_edges(spark):
    """Empty string → just itself; adjacent duplicate chars dedup."""
    df = spark.createDataFrame([("",), ("aab",)], "s string")
    out = df.select(
        F.col("s"), deletion_neighborhood(F.col("s")).alias("n")
    ).collect()
    by_s = {r.s: sorted(r.n) for r in out}
    assert by_s[""] == [""]
    # deletions of "aab": "ab" (twice, deduped), "aa"
    assert by_s["aab"] == ["aa", "aab", "ab"]


def test_clusters_respect_nation_blocking(spark, tmp_path):
    """Same-nation lev ≤ 1 pairs merge; a cross-nation typo pair must
    NOT merge (the compound ER rule that bounds component size)."""
    rows = [
        (1, "Customer#000000001", 7),
        (2, "Customer#000000002", 7),   # lev 1 to #1, same nation → merge
        (3, "Customer#000000003", 8),   # lev 1 to #1/#2, other nation
        (4, "Customer#000000013", 8),   # lev 1 to #3, same nation → merge
    ]
    d = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long"
    )
    d.write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    from taipei_bi_etl_spark.queries.linkage import fuzzy_linkage_clusters

    got = {
        r.c_custkey: r.entity_id
        for r in fuzzy_linkage_clusters(spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_clusters_canonical_row_contract(spark, tmp_path):
    """Duplicate c_custkey rows: both engines dedupe to the canonical
    (min name, min nation) row BEFORE pairing — the dup row's other
    nation must neither validate a pair (nation decoupled from the
    matched name row) nor bridge two nations' components (second r07
    review pass findings)."""
    import duckdb

    from taipei_bi_etl_spark.queries.linkage import (
        _CLUSTER_ORACLE,
        fuzzy_linkage_clusters,
    )
    from tests.oracle_utils import compare

    rows = [
        (1, "Customer#000000001", 7),
        (1, "Zzz#unrelated#name1", 8),   # dup key, other nation: dropped
        (2, "Customer#000000002", 7),    # pairs with canonical #1
        (3, "Zzz#unrelated#name2", 8),   # lev 1 to the DROPPED row only
    ]
    d = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long"
    )
    d.write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    got = {
        r.c_custkey: r.entity_id
        for r in fuzzy_linkage_clusters(spark, str(tmp_path)).collect()
    }
    # node 3's only fuzzy neighbor is the non-canonical dropped row, so
    # it must NOT appear; 1-2 merge in nation 7
    assert got == {1: 1, 2: 1}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{tmp_path}/customer.parquet/*.parquet')"
    )
    compare(fuzzy_linkage_clusters(spark, str(tmp_path)), con, _CLUSTER_ORACLE)
    con.close()

def test_blocked_components_edge_cap_routing(spark):
    """r08 (VERDICT r07 #2): the edge-count guard must route an
    oversized block to the iterative closure and return EXACTLY the
    un-routed union-find answer.  Skewed corpus: nation 0 holds a
    60-node near-clique chain (~50%+ of all edges), nations 1-3 hold
    small components."""
    from taipei_bi_etl_spark.queries.linkage import blocked_components

    edges = []
    # hot nation 0: chain 100..159 (one 60-node component, 59 edges)
    # plus a clique 200..209 (45 edges) => 104 edges
    edges += [(0, 100 + i, 101 + i) for i in range(59)]
    edges += [
        (0, 200 + i, 200 + j) for i in range(10) for j in range(i + 1, 10)
    ]
    # cool nations: one 3-node path each (2 edges)
    for nat in (1, 2, 3):
        edges += [(nat, 1000 * nat, 1000 * nat + 1),
                  (nat, 1000 * nat + 1, 1000 * nat + 2)]
    df = spark.createDataFrame(
        edges, "nat_a long, custkey_a long, custkey_b long"
    )
    unrouted = {
        (r.c_custkey, r.entity_id)
        for r in blocked_components(df, edge_cap=10**9).collect()
    }
    routed = {
        (r.c_custkey, r.entity_id)
        for r in blocked_components(df, edge_cap=10).collect()
    }
    assert routed == unrouted
    # sanity: the hot chain collapsed to its minimum, cliques intact
    assert (159, 100) in routed and (209, 200) in routed
    assert (3002, 3000) in routed


def test_clusters_guard_default_cap_inert_on_corpus(spark, tmp_path):
    """The production cap (2M edges) must never trip on the test corpus
    — the driver-gated plan is the one-pass union-find."""
    import os

    from taipei_bi_etl_spark.queries import linkage

    assert linkage._ER_EDGE_CAP == 2_000_000 or "SPARK_GRAFT_ER_EDGE_CAP" in os.environ


def test_blocked_components_high_cardinality_block_key(spark):
    """r09 (VERDICT r08 #2): with a GENERIC high-cardinality block key
    the guard must never collect one row per block — only oversized
    keys reach the driver (bounded by total_edges/edge_cap), and past
    `isin_cap` the small/big split goes through a broadcast join
    instead of a literal IN list.  200 blocks, edge_cap=1 makes every
    block oversized: the broadcast path (isin_cap=0) and the
    driver-list path (isin_cap=1000) must agree with each other and
    with the un-routed union-find ground truth."""
    from taipei_bi_etl_spark.queries.linkage import blocked_components

    edges = []
    for nat in range(200):
        base = 10_000 * (nat + 1)
        edges += [(nat, base, base + 1), (nat, base + 1, base + 2)]
    df = spark.createDataFrame(
        edges, "nat_a long, custkey_a long, custkey_b long"
    )
    truth = {
        (r.c_custkey, r.entity_id)
        for r in blocked_components(df, edge_cap=10**9).collect()
    }
    assert len(truth) == 600  # 200 blocks x 3 nodes
    via_broadcast = {
        (r.c_custkey, r.entity_id)
        for r in blocked_components(df, edge_cap=1, isin_cap=0).collect()
    }
    via_isin = {
        (r.c_custkey, r.entity_id)
        for r in blocked_components(df, edge_cap=1, isin_cap=1000).collect()
    }
    assert via_broadcast == truth
    assert via_isin == truth
    # every 3-node path labeled by its minimum
    assert (10_002, 10_000) in via_broadcast
