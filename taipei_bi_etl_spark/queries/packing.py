"""Sequence packing — assemble documents into fixed-capacity training
examples (the last step of an LLM data pipeline: docs are concatenated
into ~context-length sequences to avoid padding waste).

Bin packing is inherently sequential, so the distributed shape is
two-level: a deterministic content-addressed assignment of docs to
PACKER GROUPS (map-side, no shuffle of text), then first-fit-decreasing
WITHIN each group via ``applyInPandas`` — each group packs
independently on one executor, state bounded by group size.  At 100 TB
the group count scales with the corpus (``n_groups ≈ corpus_tokens /
(docs_per_group · avg_tokens)``); packing quality is per-group FFD
(≥ 11/9·OPT + 1 guarantee, in practice > 0.9 fill for doc ≪ capacity).

Greedy global packing (a single sorted stream) would serialize the
whole corpus through one process — the classic scale bug this layout
avoids.  No SQL oracle (iterative state); the driver records the
rows-only check and `tests/test_packing.py` pins the invariants:
exactly-once assignment, capacity, fill floor, repartition-invariance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

CAPACITY = 256  # tokens per packed sequence (toy context length)
N_GROUPS = 16  # packer groups for the registered query


def pack_sequences(
    docs: DataFrame, capacity: int = CAPACITY, n_groups: int = N_GROUPS
) -> DataFrame:
    """Pack (doc_id, text) rows into ≤ ``capacity``-token bins.

    Returns one row per doc: (pack_group, doc_id, n_tokens, bin_id).
    Group assignment is content-addressed (xxhash64 of doc_id), so the
    result is invariant under input partitioning and re-ingestion —
    same property as corpus_hash_split.
    """

    # Closure, not module-level: pickled by VALUE so executor workers
    # need no importable taipei_bi_etl_spark (driver-contract rule —
    # the external driver imports this repo from a foreign cwd).
    def ffd_pack(pdf):
        """First-fit-decreasing within one packer group.

        Deterministic: sort by (n_tokens desc, doc_id) is a total
        order, so the same group content always yields the same bins.
        Docs longer than capacity get a dedicated overflow bin
        (truncation is the caller's policy, not silently applied).
        """
        cap = int(pdf["capacity"].iloc[0])
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        loads = []
        bin_ids = []
        for t in pdf["n_tokens"]:
            t = int(t)
            placed = None
            if t <= cap:
                for i, load in enumerate(loads):
                    if load + t <= cap:
                        placed = i
                        break
            if placed is None:
                loads.append(t)
                placed = len(loads) - 1
            else:
                loads[placed] += t
            bin_ids.append(placed)
        out = pdf[["pack_group", "doc_id", "n_tokens"]].copy()
        out["bin_id"] = bin_ids
        return out

    sized = docs.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(n_groups))
        .cast("int")
        .alias("pack_group"),
        "doc_id",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
        F.lit(capacity).alias("capacity"),
    )
    return sized.groupBy("pack_group").applyInPandas(
        ffd_pack,
        schema="pack_group int, doc_id long, n_tokens int, bin_id int",
    )


@query("pack_sequences_ffd", tags=("text", "extension"))
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed sequence packing over ``documents``
    (see module docstring for the scale rationale)."""
    d = read_table(spark, sf_dir, "documents")
    return pack_sequences(d.select("doc_id", "text"))
