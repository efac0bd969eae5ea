"""Contract tests for CONSTRUCTION-TIME probes (VERDICT r09 #4).

Two registry queries deliberately run eager Spark jobs while BUILDING
their DataFrame (both docstrings say so):

* ``dedup_jaccard_routed`` — ``route_jaccard`` probes corpus size and
  max document-frequency share (two scalar actions over persisted
  frames the chosen arm reuses) to dispatch full-index vs df-ascending
  prefix filter;
* ``fuzzy_linkage_clusters`` — ``blocked_components`` probes for
  oversized block keys (bounded by construction:
  ≤ total_edges/edge_cap rows) to route union-find vs edge-split.

Until now the audit tools merely TOLERATED this (their ledgers carry
the queries); these tests turn the convention into a CONTRACT — the
same upgrade the JVM cache-release convention got in r09
(``test_cache_hygiene``).  The contract: a plan-only consumer (what
``tools/dump_plans.py`` does — construct the DataFrame, render the
formatted explain string, never execute) completes within a BOUNDED
number of Spark jobs, independent of how expensive the query's actual
execution is.  If a future edit accidentally moves pair-shaped or
iterative work to construction time (e.g. an eager verify join or a
label-propagation loop), the job count blows through the cap and this
fails before any audit tool slows to a crawl.

Measured at sf0.001 (2026-08-16, Spark 4.1.2): 9 jobs for the routed
Jaccard (persist materializations + count + max-df first), 12 for
fuzzy linkage (edge count + oversized-keys collect across AQE stage
jobs).  Caps sit ~2x above the measurement — loose enough for AQE
stage-count jitter across Spark patch versions, far below the dozens
of jobs a full execution runs.
"""

from __future__ import annotations

import pytest

from taipei_bi_etl_spark.queries import REGISTRY
from tests.conftest import SF_DIR

#: (query name, job cap for construct + formatted-explain)
_PROBED = [
    ("dedup_jaccard_routed", 18),
    ("fuzzy_linkage_clusters", 24),
    # r10: SemDeDup trains its integer Lloyd centroids at construction
    # (bounded codebook collects, the ann_ivf_deterministic precedent)
    # — measured 16 jobs at sf0.001
    ("dedup_semantic_centroid", 32),
]


def _job_count(spark) -> int:
    """Total Spark jobs submitted so far (AppStatusStore, catalog level
    — the same source the UI reads, not engine bookkeeping)."""
    return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()


@pytest.mark.parametrize("name,cap", _PROBED, ids=[n for n, _ in _PROBED])
def test_plan_only_consumer_job_count_bounded(spark, name, cap):
    before = _job_count(spark)
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    ran = _job_count(spark) - before
    # The plan must be the real executed-plan rendering (the thing
    # dump_plans ships), not a trivial stub.
    assert "Exchange" in plan and len(plan.splitlines()) > 20
    assert ran <= cap, (
        f"{name}: construction + formatted explain submitted {ran} Spark "
        f"jobs (cap {cap}) — a construction-time probe grew beyond its "
        "documented scalar actions; plan-only consumers (dump_plans, "
        "shuffle/wscg audits) would now execute query-shaped work"
    )


def test_probe_jobs_do_not_scale_with_reinvocation(spark):
    """Re-constructing the routed query costs the same bounded probe
    again (no hidden accumulation), and the count stays flat across two
    back-to-back constructions — the probe is a fixed set of scalar
    actions, not per-partition or per-pair work."""
    name, cap = _PROBED[0]
    counts = []
    for _ in range(2):
        before = _job_count(spark)
        REGISTRY[name].fn(spark, SF_DIR)
        counts.append(_job_count(spark) - before)
    assert max(counts) <= cap
    assert abs(counts[0] - counts[1]) <= 2, counts
