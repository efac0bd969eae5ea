"""Structured Streaming layer.

The reference is pure daily batch (SURVEY §2.9): tumbling daily windows
are one BigQuery partition per day (``tasks/bigquery.py:179-195``),
sessions are a LEAD-with-30-min-cap rewrite
(``sql/mango_user_rfe_daily_session.sql:66-114``), and late data is
handled by re-running trailing partitions (``backfill_days``,
``configs/bigquery.py:314``).  This package expresses the same
semantics on Spark's streaming runtime, where they are first-class:

* tumbling daily window  → ``window(ts, '1 day')`` + watermark
* session windows        → ``session_window(ts, '30 minutes')``
* late data              → watermark instead of partition re-runs
* incremental state      → ``applyInPandasWithState``

Every job runs identically via ``Trigger.AvailableNow`` over a static
directory (how the tests and the driver exercise it) or continuously
against a live file/Kafka source — the DataFrame program is the same.
"""

from taipei_bi_etl_spark.streaming.jobs import (  # noqa: F401
    click_purchase_interval_join,
    daily_type_rollup,
    run_available_now,
    sessionize,
    sliding_wau,
    stream_events,
    user_rfe_state,
)
