"""Data-quality assertion operators (SURVEY.md §2.11 V1-V6) — the
reference's post-transform validation layer as reusable DataFrame checks.

Design for scale: every check that must scan data computes its verdict
with ONE aggregate job (min/max/counts in a single pass) instead of
per-rule actions; schema/column checks are metadata-only (no job).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import date, datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CheckError(AssertionError):
    """Raised when a data-quality check fails (the reference raises
    ValueError/assert from pandas_schema validation, tasks/base.py:670-674)."""


def assert_schema(df: DataFrame, expected: T.StructType, strict_nullable: bool = False) -> None:
    """V1 — declared-schema validation (tasks/base.py:90-93,670-674).
    Metadata-only: compares the analyzed schema, runs no job."""
    actual = df.schema
    def norm(s: T.StructType):
        return [
            (f.name, f.dataType.simpleString(), f.nullable if strict_nullable else None)
            for f in s.fields
        ]
    if norm(actual) != norm(expected):
        raise CheckError(
            f"schema mismatch:\n  actual:   {actual.simpleString()}\n"
            f"  expected: {expected.simpleString()}"
        )


def assert_columns(df: DataFrame, required: Sequence[str]) -> None:
    """V3 — required-columns assertion (tasks/revenue.py:126-133)."""
    missing = set(required) - set(df.columns)
    if missing:
        raise CheckError(f"missing required columns: {sorted(missing)}")


def run_data_checks(
    df: DataFrame,
    date_col: str | None = None,
    date_range: tuple[date | datetime | str, date | datetime | str] | None = None,
    not_null: Sequence[str] = (),
    min_rows: int = 0,
) -> dict:
    """V2 (date-range), V4 (non-null keys), V5 (min-row-count) in a single
    aggregate pass (the reference runs each as its own pandas scan,
    tasks/revenue.py:109-144, tasks/rps.py:94,169-171).

    Returns the computed stats so callers can log them.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    if date_col and date_range:
        aggs += [F.min(date_col).alias("__dmin"), F.max(date_col).alias("__dmax")]
    for c in not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    if row["__n"] < min_rows:
        raise CheckError(f"row count {row['__n']} < required minimum {min_rows}")
    if date_col and date_range:
        lo, hi = date_range
        if row["__dmin"] is not None and (str(row["__dmin"]) < str(lo) or str(row["__dmax"]) > str(hi)):
            raise CheckError(
                f"{date_col} out of range: [{row['__dmin']}, {row['__dmax']}] "
                f"not within [{lo}, {hi}]"
            )
    for c in not_null:
        if row[f"__nulls_{c}"] > 0:
            raise CheckError(f"column {c} has {row[f'__nulls_{c}']} null values")
    return row


def compare_to_previous(current: DataFrame, previous: DataFrame, keys: Sequence[str]) -> dict:
    """V6 — cross-run consistency base (tasks/revenue.py:41-55): how many
    key rows appeared/disappeared vs the previous batch.  One anti-join
    each way, counted in the same job via union."""
    cur_k = current.select(*keys).dropDuplicates()
    prev_k = previous.select(*keys).dropDuplicates()
    added = cur_k.join(prev_k, list(keys), "left_anti").select(F.lit("added").alias("kind"))
    removed = prev_k.join(cur_k, list(keys), "left_anti").select(F.lit("removed").alias("kind"))
    counts = {
        r["kind"]: r["n"]
        for r in added.unionByName(removed).groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {"added": counts.get("added", 0), "removed": counts.get("removed", 0)}


def observed(
    df: DataFrame,
    name: str = "checks",
    count_col: str | None = None,
    not_null: Sequence[str] = (),
    bounds: Sequence[str] = (),
) -> tuple[DataFrame, "Observation"]:
    """Attach V-family metrics to ``df`` as a zero-cost ``observe``:
    row count, per-column null counts (V4), per-column min/max (V2) —
    computed BY THE ACTION THAT RUNS ANYWAY, no second scan, no extra
    job (the reference's asserts each re-scan the pandas frame).

    Returns ``(df, observation)``; read ``observation.get`` after any
    action on the returned frame.  At 100 TB a validation pass that
    re-aggregates the output is a whole extra job — observe rides the
    existing one.
    """
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        )
    for c in bounds:
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    if count_col:
        # DISTINCT aggregates are disallowed in observed metrics —
        # the HLL sketch is the observe-compatible (and 100 TB) form
        metrics.append(
            F.approx_count_distinct(count_col).alias(f"distinct_{count_col}")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def compare_tables_checksum(
    spark, df_a, df_b, key_cols, value_exprs=None
) -> dict:
    """Reconcile two copies of a table WITHOUT sorting or co-locating
    them: per-table (row count, XOR of md5 row fingerprints, SUM of the
    same fingerprints mod 2^64), computed with one scan per side
    regardless of partitioning/engine/layout (the
    `partition_checksum_audit` primitive as a reusable check; at 100 TB
    this replaces the untenable full anti-join diff for the common
    "did the copy land intact" question — fall back to the join diff
    only AFTER a mismatch, to find the rows).

    Canonical serialization is injective per row: every column is
    md5-hashed individually with NULL mapped to a reserved token, so
    NULL vs '' vs a value containing the separator all produce distinct
    fingerprints (ADVICE r01: the naive ``concat_ws`` form silently
    dropped NULL columns, collapsing (1, NULL, 'x') and (1, 'x', NULL)
    to one fingerprint).

    Collision notes: XOR alone is blind to even-multiplicity swaps
    (replace a pair {r,r} with {s,s} and the fold cancels) — the
    additive sum-mod-2^64 fingerprint is computed alongside precisely
    to catch that class; a multiset forgery now has to fool count, XOR
    and SUM simultaneously.  key/value columns should still be
    integerized by the caller via ``value_exprs`` — float/timestamp
    *rendering* differs across engines before hashing even begins.
    """
    from pyspark.sql import functions as F

    cols = list(key_cols) + list(value_exprs or [])

    def fingerprint(df):
        # Injective per-row serialization: hash each column separately
        # (fixed 32-hex output, so no value can straddle a separator),
        # with a NULL sentinel distinct from any md5 digest.
        parts = [
            F.coalesce(
                F.md5((F.col(c) if isinstance(c, str) else c).cast("string")),
                F.lit("NULL"),
            )
            for c in cols
        ]
        canon = F.concat_ws("|", *parts)
        fp = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(fp).alias("x"),
            # decimal(38,0) accumulator: exact under ANSI mode (a long
            # SUM would abort on overflow), reduced mod 2^64 driver-side
            F.sum(fp.cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return (
            int(row.n),
            (int(row.x) if row.x is not None else 0),
            (int(row.s) % (1 << 64) if row.s is not None else 0),
        )

    na, xa, sa = fingerprint(df_a)
    nb, xb, sb = fingerprint(df_b)
    return {
        "rows_a": na,
        "rows_b": nb,
        "match": na == nb and xa == xb and sa == sb,
    }
