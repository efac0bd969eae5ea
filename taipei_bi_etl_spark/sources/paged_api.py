"""Paged-API scan (S1) as a Spark 4 Python DataSource — the reference's
``extract_via_api`` (``tasks/base.py:449-556``: single-shot /
page-count loop / iterator fan-out with request throttling) re-expressed
so the FETCH itself is distributed: one Spark input partition per page
or iterator value, executed on executors, not looped on the driver.

The driver-side ThreadPool form lives in ``tasks/base.py`` (orchestration
for small feeds); this source is the scale path — a 10k-page extract
becomes a 10k-partition scan with ordinary Spark retries/locality, and
lands directly in a DataFrame without a driver round-trip.

No network leaves the process in tests: fetchers are importable
``module:function`` refs resolved on the executor (a real deployment
points one at ``requests``); each partition sleeps ``request_interval``
before fetching — the reference's throttle, now per-executor-slot.
"""

from __future__ import annotations

import importlib
import json
import time
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: Fetchers are addressed as ``"module.path:function"`` and resolved by
#: importlib ON THE EXECUTOR — Python workers are separate processes, so
#: a driver-side registry would not reach them.  Any importable
#: module-level callable works; closures do not.


def resolve_fetcher(ref: str) -> Callable[..., list[dict]]:
    mod, _, fn = ref.partition(":")
    return getattr(importlib.import_module(mod), fn)


def call_fetcher(ref: str, value: int | str, options: dict) -> list[dict]:
    """Invoke a fetcher, passing the source options through when its
    signature takes them (the production HTTP fetcher needs the URL
    template / parse config; simple synthetic fetchers take only the
    partition value)."""
    import inspect

    fetcher = resolve_fetcher(ref)
    try:
        n_params = len(inspect.signature(fetcher).parameters)
    except (TypeError, ValueError):
        n_params = 1
    if n_params >= 2:
        return fetcher(value, dict(options))
    return fetcher(value)


def synthetic_rates_fetcher(value: int | str) -> list[dict]:
    """Deterministic stand-in for a paged rates API (used by tests and
    offline runs): 3 rows per page / iterator value."""
    seed = int(value) if str(value).isdigit() else sum(ord(c) for c in str(value))
    return [
        {
            "page": str(value),
            "country": f"C{(seed * 7 + i) % 50:02d}",
            "cost_index": round(0.5 + ((seed * 31 + i * 17) % 100) / 100.0, 2),
        }
        for i in range(3)
    ]


class _PagePartition(InputPartition):
    def __init__(self, value: int | str):
        self.value = value


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api")`` options:

    - ``fetcher``: dotted ``module:function`` fetcher ref (required)
    - ``pages``: int page count → partitions 0..pages-1, or
    - ``iterator``: comma-separated values → one partition each (the
      reference's per-country fan-out, ``configs/rps.py:24``)
    - ``request_interval``: seconds slept in each partition before the
      fetch (reference throttle, ``tasks/base.py:480-489``)
    """

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        # caller passes an explicit schema via .schema(...); this is the
        # fallback for schema-less reads of generic JSON rows
        return "value string"

    def reader(self, schema: StructType) -> "PagedApiReader":
        return PagedApiReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "PagedApiStreamReader":
        return PagedApiStreamReader(schema, self.options)


class PagedApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._options = options

    def partitions(self) -> Sequence[InputPartition]:
        if "iterator" in self._options:
            vals: Sequence[int | str] = [
                v for v in str(self._options["iterator"]).split(",") if v
            ]
        else:
            vals = list(range(int(self._options.get("pages", 1))))
        return [_PagePartition(v) for v in vals]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        interval = float(self._options.get("request_interval", 0))
        if interval:
            time.sleep(interval)
        names = self._schema.fieldNames()
        for row in call_fetcher(
            self._options["fetcher"], partition.value, self._options
        ):
            if names == ["value"] and "value" not in row:
                yield (json.dumps(row, sort_keys=True),)
            else:
                yield tuple(row.get(n) for n in names)


# ---------------------------------------------------------------------------
# Streaming form — the same paged API as an incremental source.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the paged API: the offset is the page
    cursor ``{"page": N}``; each batch advances by ``pages_per_batch``
    up to ``max_pages`` (open-ended in production — a cursor/timestamp
    API would fetch "pages since offset").

    Exactly-once comes from determinism, not storage: the checkpoint
    persists offsets, and ``readBetweenOffsets`` re-fetches the SAME
    pages on recovery — valid for append-only/paged feeds (the
    reference's daily exports), the same assumption its raw-cache
    idempotency (K9, `utils/cache.py:11-61`) already makes.
    """

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._options = options

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _fetch_range(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: the simple-reader machinery pickles
        # the prefetched batch into its block cache
        names = self._schema.fieldNames()
        return [
            tuple(row.get(n) for n in names)
            for page in range(lo, hi)
            for row in call_fetcher(self._options["fetcher"], page, self._options)
        ]

    def read(self, start: dict):
        lo = int(start["page"])
        per = int(self._options.get("pages_per_batch", 1))
        cap = int(self._options.get("max_pages", 2**31))
        hi = min(lo + per, cap)
        if hi <= lo:  # feed exhausted (bounded test mode): no new data
            return iter([]), start
        # an ITERATOR over materialized (picklable) tuples: the simple-
        # reader machinery iterates AND pickles the prefetched batch
        return iter(self._fetch_range(lo, hi)), {"page": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._fetch_range(int(start["page"]), int(end["page"])))
