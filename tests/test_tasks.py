"""Task-layer gates: the reference's revenue/rps/adjust transforms on
hand-computable fixtures, plus the EtlTask lifecycle (api fan-out
extraction, reflection dispatch, schema validation)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from taipei_bi_etl_spark.tasks.adjust import AdjustTask, flatten_adjust
from taipei_bi_etl_spark.tasks.base import EtlTask
from taipei_bi_etl_spark.tasks.revenue import RevenueTask, upsert_keep_latest
from taipei_bi_etl_spark.tasks.rps import RpsTask

# ---------------------------------------------------------------------------
# revenue
# ---------------------------------------------------------------------------

REV_COLS = (
    "source string, country string, os string, created_at timestamp, "
    "updated_at timestamp, conversion_status string, currency string, "
    "sales_amount double, payout double"
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_upsert_keeps_latest_batch_with_ties(spark):
    old = spark.createDataFrame(
        [
            ("a", "ID", "android", _ts("2024-01-01T10:00:00"), _ts("2024-01-02T00:00:00"), "approved", "IDR", 1.0, 0.1),
            ("b", "ID", "android", _ts("2024-01-01T11:00:00"), _ts("2024-01-02T00:00:00"), "approved", "IDR", 2.0, 0.2),
        ],
        REV_COLS,
    )
    new = spark.createDataFrame(
        [
            # source a re-delivered with newer updated_at: replaces BOTH old a rows
            ("a", "ID", "ios", _ts("2024-01-01T10:00:00"), _ts("2024-01-03T00:00:00"), "approved", "IDR", 9.0, 0.9),
            ("a", "ID", "ios", _ts("2024-01-01T12:00:00"), _ts("2024-01-03T00:00:00"), "pending", "IDR", 8.0, 0.8),
        ],
        REV_COLS,
    )
    got = upsert_keep_latest(old, new).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    # source a: only the two new-batch rows (tie on max updated_at → both kept)
    assert len(by_src["a"]) == 2
    assert all(r.updated_at == _ts("2024-01-03T00:00:00") for r in by_src["a"])
    # source b: untouched
    assert len(by_src["b"]) == 1


def test_revenue_transform_tz_and_filter(spark):
    task = RevenueTask()
    new = spark.createDataFrame(
        [
            ("bukalapak", "ID", "android", _ts("2024-01-01T00:30:00"), _ts("2024-01-02T00:00:00"), "approved", "IDR", 1.5, 0.3),
            ("bukalapak", "ID", "android", _ts("2024-01-01T09:00:00"), _ts("2024-01-02T00:00:00"), "pending", "IDR", 2.5, 0.4),
        ],
        REV_COLS,
    )
    out = task.transform_bukalapak(new).collect()
    assert len(out) == 1  # pending dropped
    r = out[0]
    # Jakarta +07:00: 00:30 local → 17:30 UTC previous day
    assert r.utc_datetime == _ts("2023-12-31T17:30:00")
    assert str(r.utc_date) == "2023-12-31"
    assert r.tz == "+07:00"


# ---------------------------------------------------------------------------
# rps
# ---------------------------------------------------------------------------


def test_rps_transform_formula(spark):
    vol = spark.createDataFrame(
        [("US", 100), ("IN", 300), ("__", 5)], "country string, volume long"
    )
    fb = spark.createDataFrame(
        [
            ("USA", 2.0, 0), ("IND", 1.0, 0),
            ("USA", 4.0, 1), ("IND", 3.0, 1),
        ],
        "country_code string, cost_index double, iter_id int",
    )
    fb_latest = spark.createDataFrame(
        [("USA", 6.0, 0), ("IND", 4.0, 0)],
        "country_code string, cost_index double, iter_id int",
    )
    cb = spark.createDataFrame(
        [
            ("US", "Google Play", "Average", 92.28),
            ("US", "iOS", "Average", 92.28),
            ("IN", "Google Play", "Average", 184.56),
            ("IN", "iOS", "Average", 184.56),
        ],
        "country_code string, platform string, category string, cpi double",
    )
    pkg = spark.createDataFrame([(1000.0,)], "package double")
    out = {
        r.country: r
        for r in RpsTask()
        .transform_google_search_rps(vol, fb, fb_latest, cb, pkg)
        .collect()
    }
    assert set(out) == {"US", "IN"}  # "__" fails the regex filter
    # cost_idx_base: US avg(2,4)=3, IN avg(1,3)=2 → denom = 100*3+300*2=900
    # factor = 1000/900; rps_US = 6 * 1000/900
    assert out["US"].cost_idx_base == pytest.approx(3.0)
    assert out["IN"].cost_idx_base == pytest.approx(2.0)
    assert out["US"].rps == pytest.approx(6 * 1000 / 900)
    assert out["IN"].rps == pytest.approx(4 * 1000 / 900)
    # cb weighting collapses to cpi itself when android==ios==x:
    # x/base*android + x/base*ios = x
    assert out["US"].cost_idx_cb == pytest.approx(92.28)


# ---------------------------------------------------------------------------
# adjust
# ---------------------------------------------------------------------------

PAYLOAD = json.dumps(
    {
        "result_set": {
            "networks": [
                {
                    "name": "net1",
                    "token": "n1",
                    "campaigns": [
                        {
                            "name": "camp1",
                            "token": "c1",
                            "adgroups": [
                                {
                                    "name": "ag1",
                                    "token": "g1",
                                    "creatives": [
                                        {"name": "cr1", "token": "r1"},
                                        {"name": "cr2", "token": "r2"},
                                    ],
                                }
                            ],
                        }
                    ],
                },
                {"name": "net2", "token": "n2", "campaigns": []},
            ]
        }
    }
)


def test_adjust_flatten_with_outer_levels(spark):
    raw = spark.createDataFrame([(PAYLOAD,)], "payload string")
    rows = flatten_adjust(raw).collect()
    # net1 → 2 creatives; net2 → 1 row with null descendants
    assert len(rows) == 3
    leaf = {(r.network_name, r.creative_token) for r in rows}
    assert ("net1", "r1") in leaf and ("net1", "r2") in leaf
    net2 = [r for r in rows if r.network_name == "net2"][0]
    assert net2.campaign_name is None and net2.creative_token is None


# ---------------------------------------------------------------------------
# EtlTask lifecycle: api fan-out + reflection dispatch
# ---------------------------------------------------------------------------


class _ApiTask(EtlTask):
    sources = {
        "metrics": {
            "type": "api",
            "url": "https://api.example.test/v1/metrics?country={it}",
            "iterator": ["US", "IN"],
            "iterator_field": "country",
            "json_path": "data",
        },
    }

    def transform_metrics(self, metrics):
        return metrics.groupBy("country").agg(F.sum("value").alias("total"))


def _fake_fetcher(url: str) -> str:
    country = url.rsplit("=", 1)[1]
    return json.dumps(
        {"data": [{"value": 1}, {"value": 2}]}
        if country == "US"
        else {"data": [{"value": 10}]}
    )


def test_api_fanout_and_dispatch(spark):
    task = _ApiTask(fetcher=_fake_fetcher)
    out = task.run(spark)
    got = {r.country: r.total for r in out["metrics"].collect()}
    assert got == {"US": 3, "IN": 10}


def test_raw_cache_skips_refetch(spark, tmp_path):
    calls = []

    def counting_fetcher(url: str) -> str:
        calls.append(url)
        return _fake_fetcher(url)

    raw = str(tmp_path / "raw")
    t1 = _ApiTask(fetcher=counting_fetcher, raw_dir=raw)
    t1.run(spark)
    n_first = len(calls)
    assert n_first == 2  # one per iterator value
    # second run: raw zone hit, no new fetches
    t2 = _ApiTask(fetcher=counting_fetcher, raw_dir=raw)
    out = t2.run(spark)
    assert len(calls) == n_first
    got = {r.country: r.total for r in out["metrics"].collect()}
    assert got == {"US": 3, "IN": 10}


def test_etl_dispatch(spark):
    from taipei_bi_etl_spark.etl import get_task, run_task

    assert get_task("revenue").__name__ == "RevenueTask"
    out = run_task(
        spark,
        "adjust",
        sources={"adjust": {"type": "const", "values": [(PAYLOAD,)],
                            "schema": "payload string"}},
    )
    assert out["adjust"].count() == 3
