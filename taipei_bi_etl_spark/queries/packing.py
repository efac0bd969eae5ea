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

    # filter on TEXT, not n_tokens: legacy size(NULL) is -1, not NULL
    sized = docs.filter(F.col("text").isNotNull()).select(
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


_PACK_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         AS total_tokens,
       TRUE AS exactly_once_ok,
       TRUE AS capacity_ok,
       TRUE AS fill_ok
FROM documents WHERE text IS NOT NULL
"""


@query("pack_sequences_ffd", oracle=_PACK_ORACLE, tags=("text", "extension"))
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed sequence packing over ``documents``
    (see module docstring for the scale rationale).  The per-doc
    assignment surface is :func:`pack_sequences`; the REGISTERED form
    audits the packing against DuckDB via the invariant-gate pattern
    (bin ids themselves are iterative FFD state with no ANSI twin):

    * ``n_docs`` / ``total_tokens`` — conservation: packing must
      neither drop nor duplicate a token (DuckDB recomputes both from
      the raw corpus with the same tokenizer);
    * ``exactly_once_ok`` — one output row per input doc;
    * ``capacity_ok`` — every bin fits the context length unless it is
      a dedicated single-doc overflow bin;
    * ``fill_ok`` — the FFD structural theorem: within a packer group
      at most ONE bin can be ≤ half-full (two half-empty bins would
      have been merged by first-fit), the quality floor that makes the
      padding-waste bound real.
    """
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # matches the packer + oracle WHERE
    )
    packed = pack_sequences(d.select("doc_id", "text"))
    bins = packed.groupBy("pack_group", "bin_id").agg(
        F.sum("n_tokens").alias("load"),
        F.count(F.lit(1)).alias("n_in_bin"),
    )
    bin_audit = bins.agg(
        F.sum(
            F.when(
                (F.col("load") > CAPACITY) & (F.col("n_in_bin") > 1), 1
            ).otherwise(0)
        ).alias("over_capacity_bins"),
    )
    halves = (
        bins.groupBy("pack_group")
        .agg(
            F.sum(
                F.when(F.col("load") <= CAPACITY / 2, 1).otherwise(0)
            ).alias("half_empty")
        )
        .agg(F.max("half_empty").alias("max_half_empty"))
    )
    doc_audit = packed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_distinct"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    n_input = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        doc_audit.crossJoin(bin_audit)
        .crossJoin(halves)
        .crossJoin(n_input)
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            (
                (F.col("n_rows") == F.col("n_docs"))
                & (F.col("n_distinct") == F.col("n_docs"))
            ).alias("exactly_once_ok"),
            (F.col("over_capacity_bins") == 0).alias("capacity_ok"),
            (F.col("max_half_empty") <= 1).alias("fill_ok"),
        )
    )
