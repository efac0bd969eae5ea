"""Spark 4 `transformWithStateInPandas` surface — the modern arbitrary
stateful-processing API (successor to `applyInPandasWithState`, which
`streaming/jobs.py` uses for the RFE accumulator).

ENVIRONMENT GATE: the TWS driver worker imports `google.protobuf`
(Spark's python runner ships state-server protos); in containers
without a working protobuf runtime the query crashes at init with
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE``.  `tws_available()`
probes for that precondition so callers (and the test suite) can fall
back to the applyInPandasWithState twin.  The processor itself is
plain public-API code and runs unchanged where protobuf is present.

Semantics mirrored from the reference's incremental-state pattern
(`sql/mango_feature_cohort_date.sql:2-35` — a table that accumulates
never-seen keys across daily runs): per-user running event totals,
emitted on every update.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql.types import LongType, StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

#: Conf required by transformWithState (any mode); the default
#: HDFS-backed provider does not implement the TWS state API.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n_events", LongType()),
        StructField("value_sum", LongType()),
    ]
)


def tws_available() -> bool:
    """True when the python streaming-runner's protobuf dependency is
    importable — the precondition for transformWithStateInPandas."""
    try:  # pragma: no cover - environment probe
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def make_running_totals_processor():
    """Build the StatefulProcessor lazily (class body touches no gated
    imports, but keeping construction behind a function lets modules
    import this file on protobuf-less containers)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        """Per-user running (count, value-sum) with ValueState — the
        TWS twin of `streaming/jobs.py`'s applyInPandasWithState RFE
        accumulator.  Integer value units (micros) per the repo float
        policy; state is one fixed-width row per user, so state size
        is O(|users|) regardless of stream length."""

        def init(self, handle) -> None:
            self.totals = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("s", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timer_values):
            n, s = 0, 0
            for pdf in rows:
                n += len(pdf)
                s += int(pdf["value_micros"].sum())
            prev = self.totals.get()
            if prev is not None:
                n += int(prev[0])
                s += int(prev[1])
            self.totals.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [s],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def stream_running_totals(events_stream: "DataFrame") -> "DataFrame":
    """Wire the TWS processor onto a stream with columns
    (user_id STRING, value_micros LONG).  Caller must set
    ``spark.sql.streaming.stateStore.providerClass`` to
    :data:`ROCKSDB_PROVIDER` before starting the query.

    Scale: state is partitioned by the grouping key across executors
    (RocksDB per-partition instances, changelog-checkpointed); each
    micro-batch shuffles only that batch's rows on user_id — identical
    distribution story to the applyInPandasWithState twin, but with
    typed per-field state, timers, and TTL available."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        make_running_totals_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
