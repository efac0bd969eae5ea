"""Incremental view maintenance (IVM) for join-aggregates: keep a
materialized aggregate over A ⋈ B current as daily increments arrive,
WITHOUT recomputing over history.

The reference maintains incremental state two ways — append-only daily
partials (`sql/mango_user_rfe_daily_partial.sql` → 28d rollup) and the
self-referencing never-seen-before table
(`sql/mango_feature_cohort_date.sql:2-35`).  Both avoid the case where
the view JOINS two growing tables.  The classic delta decomposition
covers it:

    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

and for a SUM/COUNT aggregate the new view = old view ⊎ agg(Δ rows)
(merge by group key, add the measures) — history is touched only
through the (indexed/pruned) join against the small deltas, never
re-scanned in full on its own side.

At 100 TB: ΔA/ΔB are a day's partitions; the two mixed terms are
delta-broadcast joins against the big table (runtime filters prune the
history scan to matching keys), and the delta-delta term is tiny.  The
view merge is a keyed upsert (`io.upsert_partitioned` shape) of
|affected groups| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rev_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")


def revenue_per_customer(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The maintained view: per-customer order count and revenue cents.

    Design constraint that makes it maintainable: every measure must be
    DELTA-DISTRIBUTIVE (mergeable by addition).  ``COUNT(DISTINCT
    o_orderkey) over the join`` is not — an order whose lines span two
    increments would be counted twice at merge, and a line-less order
    never — so the count comes from the orders side alone (exact and
    additive under append-only increments) while revenue comes from the
    join.  The non-distributive aggregates (distinct counts over join
    results) need auxiliary state (a seen-keys table, the
    `mango_feature_cohort_date` pattern) — the boundary every IVM
    system draws.
    """
    cnt = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    j = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    rev = j.groupBy("o_custkey").agg(F.sum(_rev_cents()).alias("revenue_cents"))
    return cnt.join(rev, "o_custkey", "left").select(
        "o_custkey",
        "n_orders",
        F.coalesce("revenue_cents", F.lit(0)).alias("revenue_cents"),
    )


def delta_revenue_per_customer(
    old_orders: DataFrame,
    delta_orders: DataFrame,
    old_lineitem: DataFrame,
    delta_lineitem: DataFrame,
) -> DataFrame:
    """The delta of the view for one increment: aggregate over the three
    join-delta terms.  Assumes (as the reference's daily loads do) that
    increments are APPEND-ONLY and an order's lines arrive with or after
    the order row — so n_orders can be counted from the ΔA side alone.
    """
    t1 = delta_lineitem.join(
        old_orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    t2 = old_lineitem.join(
        delta_orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    t3 = delta_lineitem.join(
        delta_orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    rows = t1.unionByName(t2).unionByName(t3)
    rev = rows.groupBy("o_custkey").agg(
        F.sum(_rev_cents()).alias("revenue_cents")
    )
    new_orders = delta_orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        rev.join(new_orders, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue_cents", F.lit(0)).alias("revenue_cents"),
        )
    )


def merge_view(old_view: DataFrame, delta_view: DataFrame) -> DataFrame:
    """new view = old view ⊎ delta (sum measures per group) — the keyed
    merge a real deployment runs as a partition upsert."""
    return (
        old_view.unionByName(delta_view)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
    )
