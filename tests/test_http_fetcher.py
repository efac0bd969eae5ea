"""Production HTTP fetcher (S1) against a REAL local http.server:
the reference's three extract modes (single-shot / page-count loop /
iterator fan-out, ``tasks/base.py:449-556``), URL templating, payload
parsing (json with json_path, jsonl, csv header injection), page-count
discovery, and the distributed data-source integration."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from taipei_bi_etl_spark.sources.http_fetcher import (
    discover_page_count,
    http_fetcher,
    parse_payload,
)

N_PAGES = 3
ROWS_PER_PAGE = 2


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        if u.path == "/paged":
            page = int(q.get("page", 1))
            body = json.dumps(
                {
                    "meta": {"page_count": N_PAGES},
                    "data": [
                        {
                            "key": q.get("key", ""),
                            "page": page,
                            "i": i,
                            "window": f"{q.get('from','')}..{q.get('to','')}",
                        }
                        for i in range(ROWS_PER_PAGE)
                    ],
                }
            )
        elif u.path == "/by_country":
            body = "\n".join(
                json.dumps({"country": q["it"], "rank": i}) for i in range(2)
            )
        elif u.path == "/rates.csv":
            body = "US,1.5\nTW,2.5\n"
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_single_shot_with_url_template(server):
    opts = {
        "url": server
        + "/paged?key={api_key}&from={start_date}&to={end_date}&page={page}",
        "api_key": "K",
        "start_date": "2024-01-01",
        "end_date": "2024-01-31",
        "filetype": "json",
        "json_path": "$.data",
    }
    rows = http_fetcher(1, opts)
    assert len(rows) == ROWS_PER_PAGE
    assert rows[0]["key"] == "K"
    assert rows[0]["window"] == "2024-01-01..2024-01-31"


def test_page_count_discovery_then_distributed_scan(spark, server):
    """Reference mode 2: read page 1 for the count (driver-side), then
    every page is an executor partition."""
    opts = {
        "url": server + "/paged?page={page}&limit={limit}",
        "page_size": 10,
        "filetype": "json",
        "json_path": "$.data",
        "json_path_page_count": "$.meta.page_count",
    }
    count = discover_page_count(opts)
    assert count == N_PAGES
    from taipei_bi_etl_spark.sources.paged_api import PagedApiDataSource

    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api")
        .schema("page int, i int")
        .options(
            fetcher="taipei_bi_etl_spark.sources.http_fetcher:http_fetcher",
            pages=str(count),
            **{k: str(v) for k, v in opts.items()},
        )
        .load()
    )
    rows = df.collect()
    assert len(rows) == N_PAGES * ROWS_PER_PAGE
    assert {r.page for r in rows} == {0, 1, 2}


def test_iterator_fanout_jsonl(spark, server):
    """Reference mode 3: one partition per iterator value."""
    from taipei_bi_etl_spark.sources.paged_api import PagedApiDataSource

    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api")
        .schema("country string, rank int")
        .options(
            fetcher="taipei_bi_etl_spark.sources.http_fetcher:http_fetcher",
            iterator="id,in,tw",
            url=server + "/by_country?it={iterator}",
            filetype="jsonl",
        )
        .load()
    )
    rows = df.collect()
    assert len(rows) == 6
    assert {r.country for r in rows} == {"id", "in", "tw"}


def test_csv_header_injection(server):
    """S8: a headerless CSV feed gets its schema from config."""
    rows = http_fetcher(
        0,
        {
            "url": server + "/rates.csv",
            "filetype": "csv",
            "csv_header": "country,rps",
        },
    )
    assert rows == [
        {"country": "US", "rps": "1.5"},
        {"country": "TW", "rps": "2.5"},
    ]


def test_parse_payload_json_path_nested():
    text = json.dumps({"a": {"b": [{"c": [{"x": 1}, {"x": 2}]}]}})
    rows = parse_payload(
        text, {"filetype": "json", "json_path": "$.a.b[0].c"}
    )
    assert rows == [{"x": 1}, {"x": 2}]
