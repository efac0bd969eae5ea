"""Classifier-evaluation operators: exact AUC and precision/recall —
the missing eval step of the curation family (BASELINE north star; a
real pipeline measures its quality filter *before* applying
`quality_classifier_linear` at corpus scale).

Cross-engine determinism strategy (the embedding_dim_stats lesson —
never hash engine-rounded floats): every statistic here is EXACT
integer arithmetic.

* The Mann-Whitney AUC uses the tie-averaged rank identity
  ``2·avgrank = 2·cum_lower + c + 1`` (c = tie-bucket size), so the
  doubled rank-sum ``S2`` is an integer, ``U2 = S2 − n_pos·(n_pos+1)``
  is an integer, and ``auc_micros = U2·10⁶ DIV (2·n_pos·n_neg)`` lands
  on the same grid point in both engines.
* Ground truth is deterministic synthetic noise over the classifier's
  own margin (``total_weight + hash-noise ≥ 0``) — the same injection
  idea as `text_pii_redact`: the corpus carries no labels, so a
  correlated-but-not-degenerate target is derived from doc_id
  arithmetic both engines evaluate identically.
* Scores are integer micros (``total_weight·10⁶ DIV n_tokens``), never
  a rounded double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import query
from taipei_bi_etl_spark.queries.text2 import (
    _CLASSIFIER_ORACLE,
    quality_classifier_linear,
)

# 31-bit Knuth constant + mod-2^32 pre-reduction: the 32-bit constant
# overflows int64 for doc_id ≥ ~3.47e9 (Spark wraps silently, DuckDB
# raises) — same fix as curation3.training_shuffle_order.
_KNUTH31 = 1327217885
_MOD32 = 4294967296

#: Deterministic noisy ground truth on the classifier's PER-TOKEN
#: margin (micros, ±500e6): noise is uniform-ish in ±498e6 from doc_id
#: hashing scaled to ±100e6 — same order as the score spread, so the label agrees with the
#: classifier sign often but not always (AUC strictly between 0.5 and
#: 1; nothing degenerate to evaluate otherwise).  The raw
#: ``total_weight`` margin is NOT usable here: it grows with document
#: length and swamps any bounded noise (measured: every sf0.01 label
#: came out positive).
_LABEL_SQL = (
    f"CASE WHEN total_weight * 1000000 // n_tokens "
    f"+ (((doc_id % {_MOD32}) * {_KNUTH31}) % 997 - 498) * 200000 >= 0 "
    "THEN 1 ELSE 0 END"
)

_SCORED_DUCK = f"""
  SELECT doc_id, source,
         CAST(total_weight * 1000000 // n_tokens AS BIGINT) AS sm,
         CAST({_LABEL_SQL} AS BIGINT) AS y
  FROM ({_CLASSIFIER_ORACLE})
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = quality_classifier_linear(spark, sf_dir)
    return base.select(
        "doc_id",
        "source",
        F.expr("CAST(total_weight * 1000000 DIV n_tokens AS BIGINT)").alias(
            "sm"
        ),
        F.expr(
            f"CAST(CASE WHEN total_weight * 1000000 DIV n_tokens"
            f" + (((doc_id % {_MOD32}) * {_KNUTH31}) % 997 - 498) * 200000 >= 0"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("y"),
    )


# ---------------------------------------------------------------------------
# Exact tie-corrected Mann-Whitney AUC, per source.
# ---------------------------------------------------------------------------

_AUC_ORACLE = f"""
WITH scored AS ({_SCORED_DUCK}),
b AS (
  SELECT source, sm, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(y) AS BIGINT) AS p
  FROM scored GROUP BY source, sm
), r AS (
  SELECT source, sm, c, p,
         COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY sm
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum
  FROM b
)
SELECT source,
       CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
       CAST(SUM(p * (2 * cum + c + 1))
            - SUM(p) * (SUM(p) + 1) AS BIGINT) AS u2,
       CAST(COALESCE((SUM(p * (2 * cum + c + 1)) - SUM(p) * (SUM(p) + 1))
            * 1000000 // NULLIF(2 * SUM(p) * (SUM(c) - SUM(p)), 0), -1)
            AS BIGINT) AS auc_micros
FROM r GROUP BY source
"""


@query(
    "classifier_auc_eval",
    oracle=_AUC_ORACLE,
    tags=("curation", "eval", "extension"),
)
def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC-AUC of the linear quality classifier against the
    deterministic synthetic ground truth — computed as the exact
    tie-corrected Mann-Whitney statistic, entirely in integers (see
    module docstring for the ``2·avgrank`` identity).

    Scale shape: scores aggregate to (source, score) tie buckets FIRST
    — the standard distributed-AUC trick (cardinality drops from
    |docs| to |distinct scores|) — then a window partitioned BY SOURCE
    accumulates bucket counts: no global sort, no single-partition
    window anywhere; every stage is keyed by source.
    """
    s = _scored(spark, sf_dir)
    b = s.groupBy("source", "sm").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("sm")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = b.withColumn("cum", F.coalesce(F.sum("c").over(w), F.lit(0)))
    return (
        r.groupBy("source")
        .agg(
            F.sum("p").cast("long").alias("n_pos"),
            (F.sum("c") - F.sum("p")).cast("long").alias("n_neg"),
            (
                F.sum(
                    F.col("p") * (2 * F.col("cum") + F.col("c") + 1)
                )
                - F.sum("p") * (F.sum("p") + 1)
            ).cast("long").alias("u2"),
        )
        .select(
            "source",
            "n_pos",
            "n_neg",
            "u2",
            F.expr(
                "CAST(COALESCE(u2 * 1000000 DIV NULLIF(2 * n_pos * n_neg, 0),"
                " -1) AS BIGINT)"
            ).alias("auc_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Precision/recall curve on a fixed threshold grid.
# ---------------------------------------------------------------------------

#: Threshold grid in score micros — fixed so the curve is a stable
#: artifact, not data-dependent quantiles (the per-score granularity
#: is the AUC query's job).
_THRESHOLDS = [t * 100_000_000 for t in range(-4, 5)]

_PR_ORACLE = f"""
WITH scored AS ({_SCORED_DUCK}),
t(thr) AS (VALUES {', '.join(f'({t}::BIGINT)' for t in _THRESHOLDS)})
SELECT thr,
       CAST(SUM(CASE WHEN sm >= thr AND y = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN sm >= thr AND y = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN sm < thr AND y = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS fn,
       CAST(COALESCE(SUM(CASE WHEN sm >= thr AND y = 1 THEN 1 ELSE 0 END)
            * 1000000 // NULLIF(SUM(CASE WHEN sm >= thr THEN 1 ELSE 0 END), 0),
            -1) AS BIGINT) AS precision_micros,
       CAST(COALESCE(SUM(CASE WHEN sm >= thr AND y = 1 THEN 1 ELSE 0 END)
            * 1000000 // NULLIF(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END), 0),
            -1) AS BIGINT) AS recall_micros
FROM scored CROSS JOIN t GROUP BY thr
"""


@query(
    "classifier_pr_curve",
    oracle=_PR_ORACLE,
    tags=("curation", "eval", "extension"),
)
def classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall (and raw confusion counts) of the quality
    classifier at nine fixed thresholds across the score range — the
    operating-point table a curation pipeline reads to pick its keep
    threshold.  Exact integer micros; zero-count denominators yield
    the -1 sentinel via NULLIF+COALESCE in both engines (the r03
    dedup_impact_report division lesson, plus the harness rule that a
    NULL in the first sorted column breaks row ordering).

    Scale shape: ONE conditional-aggregation pass — 27 `SUM(CASE …)`
    accumulators over the scan, stacked to 9 rows afterward.  No
    threshold cross join ever touches the full corpus (the oracle's
    CROSS JOIN form is the readable spelling; the Spark plan is a
    single partial-aggregated reduce to one row).
    """
    s = _scored(spark, sf_dir)
    aggs = []
    for i, t in enumerate(_THRESHOLDS):
        pred = F.col("sm") >= t
        aggs += [
            F.sum(F.when(pred & (F.col("y") == 1), 1).otherwise(0))
            .cast("long").alias(f"tp_{i}"),
            F.sum(F.when(pred & (F.col("y") == 0), 1).otherwise(0))
            .cast("long").alias(f"fp_{i}"),
            F.sum(F.when(~pred & (F.col("y") == 1), 1).otherwise(0))
            .cast("long").alias(f"fn_{i}"),
        ]
    wide = s.agg(*aggs)
    stack = ", ".join(
        f"{t}L, tp_{i}, fp_{i}, fn_{i}" for i, t in enumerate(_THRESHOLDS)
    )
    rows = wide.select(
        F.expr(
            f"stack({len(_THRESHOLDS)}, {stack}) AS (thr, tp, fp, fn)"
        )
    )
    return rows.select(
        "thr",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CAST(COALESCE(tp * 1000000 DIV NULLIF(tp + fp, 0), -1) AS BIGINT)"
        ).alias("precision_micros"),
        F.expr(
            "CAST(COALESCE(tp * 1000000 DIV NULLIF(tp + fn, 0), -1) AS BIGINT)"
        ).alias("recall_micros"),
    )
