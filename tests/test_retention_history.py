"""Regression: cohort_retention_full must derive cohort_date from FULL
history, not from events pre-filtered to the 112-day window.

The reference precomputes first-activity over all history
(`/root/reference/sql/mango_cohort_retained_users.sql` joins against
the cohort table built from unwindowed occurrence data), so a user
whose true first-activity day precedes AS_OF-112 falls OUT of the
retention window entirely — they must not be re-cohorted to their
first in-window day.  The shared testdata spans only Jan 2024, which
can never exercise this; this test builds an events table with
activity older than the window.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from taipei_bi_etl_spark.queries.retention import (
    AS_OF,
    WINDOW_DAYS,
    cohort_retention_full,
)


def _events(rows):
    return pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [pd.Timestamp(d) for d, _ in rows],
            "user_id": [u for _, u in rows],
            "event_type": ["app_open"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )


def test_old_history_user_is_excluded_not_recohorted(spark, tmp_path):
    as_of = dt.date.fromisoformat(AS_OF)
    lo = as_of - dt.timedelta(days=WINDOW_DAYS)
    old_day = lo - dt.timedelta(days=200)  # true cohort, pre-window
    in_win = as_of - dt.timedelta(days=10)

    rows = [
        # user 1: first activity long before the window, plus recent
        # activity — must contribute NO cohort row (reference drops
        # cohorts older than the window; re-cohorting to `in_win`
        # would be the bug)
        (old_day, 1),
        (in_win, 1),
        # user 2: first activity inside the window, retained at +7
        (as_of - dt.timedelta(days=20), 2),
        (as_of - dt.timedelta(days=13), 2),
    ]
    _events(rows).to_parquet(os.path.join(tmp_path, "events.parquet"))
    out = cohort_retention_full(spark, str(tmp_path)).collect()

    cohort_dates = {r["cohort_date"] for r in out}
    assert in_win not in cohort_dates, (
        "user with pre-window history was re-cohorted to their first "
        "in-window day"
    )
    assert cohort_dates == {as_of - dt.timedelta(days=20)}
    (r,) = out
    assert r["daily_cohort_size"] == 1
    assert r["d7_retained_users"] == 1
    assert r["d1_retained_users"] == 0
    assert r["w1_retained_users"] == 1
    assert r["weekly_cohort_size"] == 1
    assert r["monthly_cohort_size"] == 1
