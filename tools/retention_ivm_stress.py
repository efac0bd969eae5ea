#!/usr/bin/env python
"""Measure the IVM claim for the retention pivot (VERDICT r03 #5):
the day-T delta update must stay FLAT as event history grows, while
the full recompute scales with history.

Synthesizes H days of events (fixed daily volume) for H in {112, 448},
materializes yesterday's warehouse state (per-user cohort/occurrence
state + the T−1 pivot) to parquet — the artifacts a production DAG
maintains — then times (a) the full pivot recompute at T and (b)
`retention_delta_update` reading only day-T events + the state tables.

Usage: python tools/retention_ivm_stress.py          (~2 min)
Prints one JSON line per H; record the summary in SCALE.md.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from taipei_bi_etl_spark.queries.retention import (  # noqa: E402
    AS_OF,
    AS_OF_PREV,
    WINDOW_DAYS,
    _full_pivot,
    _user_day_dims,
    retention_delta_update,
)
from taipei_bi_etl_spark.session import get_spark  # noqa: E402

USERS = 150_000
ACTIVE_PCT = 30  # each (user, day) active with ~30% probability


def synth_events(spark, h_days: int, out_dir: str) -> None:
    """H days of events ending AS_OF, deterministic, fixed daily volume."""
    t_end = dt.date.fromisoformat(AS_OF)
    start = t_end - dt.timedelta(days=h_days - 1)
    df = (
        spark.range(USERS)
        .withColumnRenamed("id", "user_id")
        .crossJoin(
            spark.range(h_days).withColumnRenamed("id", "day_off")
        )
        .filter(
            F.pmod(F.xxhash64("user_id", "day_off"), 100) < ACTIVE_PCT
        )
        .select(
            "user_id",
            F.concat(
                F.lit("ev_"), (F.col("user_id") % 4).cast("string")
            ).alias("event_type"),
            F.timestamp_seconds(
                F.unix_timestamp(
                    F.date_add(F.lit(start.isoformat()).cast("date"),
                               F.col("day_off").cast("int"))
                    .cast("timestamp")
                )
            ).alias("ts"),
        )
    )
    df.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def materialize_state(spark, src_dir: str, state_dir: str) -> None:
    """Yesterday's warehouse artifacts: per-user state + T−1 pivot."""
    t1 = F.lit(AS_OF_PREV).cast("date")
    lo_t = F.date_sub(F.lit(AS_OF).cast("date"), WINDOW_DAYS)
    ud = _user_day_dims(
        spark.read.parquet(f"{src_dir}/events.parquet")
    )
    prior = (
        ud.filter(F.col("day") <= t1)
        .groupBy("user_id", "os", "country", "cohort_name")
        .agg(
            F.min("day").alias("prior_cohort"),
            F.collect_set(
                F.when(F.col("day") >= lo_t, F.col("day"))
            ).alias("prior_days"),
        )
    )
    prior.write.mode("overwrite").parquet(f"{state_dir}/prior.parquet")
    _full_pivot(spark, src_dir, AS_OF_PREV).write.mode("overwrite").parquet(
        f"{state_dir}/prev_pivot.parquet"
    )
    # today's slice as its own file — a warehouse lands each day as a
    # partition, so the delta job never scans history at all
    ud.filter(F.col("day") == F.lit(AS_OF).cast("date")).select(
        "user_id", "os", "country", "cohort_name"
    ).distinct().write.mode("overwrite").parquet(
        f"{state_dir}/today.parquet"
    )


def main() -> None:
    spark = get_spark(app_name="retention_ivm_stress")
    spark.range(1).count()
    results = []
    for h in (112, 448):
        base = tempfile.mkdtemp(prefix=f"ret_ivm_h{h}_")
        synth_events(spark, h, base)
        materialize_state(spark, base, base)
        spark.catalog.clearCache()

        # best-of-2 each to push JVM warm-up out of the comparison
        full_s = delta_s = None
        for _ in range(2):
            t0 = time.perf_counter()
            _full_pivot(spark, base, AS_OF).count()
            s = time.perf_counter() - t0
            full_s = s if full_s is None else min(full_s, s)

            t0 = time.perf_counter()
            today = spark.read.parquet(f"{base}/today.parquet")
            prior = spark.read.parquet(f"{base}/prior.parquet")
            prev = spark.read.parquet(f"{base}/prev_pivot.parquet")
            retention_delta_update(today, prior, prev, AS_OF).count()
            s = time.perf_counter() - t0
            delta_s = s if delta_s is None else min(delta_s, s)

        # the PRODUCTION form: stored-state advance end-to-end — read
        # the committed version, apply the day-T delta, WRITE the new
        # version (user state + pivot + marker).  Single-shot timing:
        # an advance consumes the day, so it cannot be re-run (the
        # one-day contract), and production runs it exactly once/day.
        from taipei_bi_etl_spark import ivm_store

        store = f"{base}/store"
        ev = spark.read.parquet(f"{base}/events.parquet")
        day = F.to_date("ts")
        ivm_store.retention_state_init(
            spark, ev.filter(day <= F.lit(AS_OF_PREV)), store, AS_OF_PREV
        )
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        ivm_store.retention_state_advance(
            spark, ev.filter(day == F.lit(AS_OF)), store
        )
        advance_s = time.perf_counter() - t0

        # input-volume accounting — the axis that actually scales: the
        # full recompute re-reads the whole event history every day
        # (the cohort min is a full-history MIN), the delta reads one
        # day + window-bounded state regardless of history length
        full_rows = spark.read.parquet(f"{base}/events.parquet").count()
        delta_rows = (
            spark.read.parquet(f"{base}/today.parquet").count()
            + spark.read.parquet(f"{base}/prior.parquet").count()
            + spark.read.parquet(f"{base}/prev_pivot.parquet").count()
        )
        results.append(
            {"history_days": h, "full_sec": round(full_s, 3),
             "delta_sec": round(delta_s, 3),
             "store_advance_sec": round(advance_s, 3),
             "full_input_rows": full_rows,
             "delta_input_rows": delta_rows}
        )
        print(json.dumps(results[-1]), flush=True)
        shutil.rmtree(base, ignore_errors=True)
    r0, r1 = results
    print(json.dumps({
        "full_sec_ratio_4x_history": round(r1["full_sec"] / r0["full_sec"], 2),
        "delta_sec_ratio_4x_history": round(
            r1["delta_sec"] / r0["delta_sec"], 2
        ),
        "store_advance_ratio_4x_history": round(
            r1["store_advance_sec"] / r0["store_advance_sec"], 2
        ),
        "full_rows_ratio_4x_history": round(
            r1["full_input_rows"] / r0["full_input_rows"], 2
        ),
        "delta_rows_ratio_4x_history": round(
            r1["delta_input_rows"] / r0["delta_input_rows"], 2
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
