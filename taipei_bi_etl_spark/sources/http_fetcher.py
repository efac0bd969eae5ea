"""Production HTTP fetcher for the paged-API source (S1) — the
`requests`-based extract of the reference (``tasks/base.py:449-556``)
behind the ``resolve_fetcher`` seam of
:mod:`taipei_bi_etl_spark.sources.paged_api`.

Reference parity:

* URL template interpolation with ``api_key`` / ``start_date`` /
  ``end_date`` / ``page`` / ``limit`` / ``iterator``
  (``tasks/base.py:492-497,507-513,545-547``);
* the three modes — single-shot, page-count loop, iterator fan-out —
  map onto the data source's partitioning (``pages`` / ``iterator``
  options); :func:`discover_page_count` performs the reference's
  read-page-1-then-loop discovery (``:516-527``) as a driver-side
  single fetch, after which every page is an executor partition;
* response parsing per ``filetype``: ``json`` (with an optional
  ``json_path`` to the row array), ``jsonl``, and ``csv`` with the
  header-injection option (S8, ``tasks/base.py:600-614``).

Transport is stdlib ``urllib`` (redirects followed, matching
``allow_redirects=True``) with bounded retries; ``requests`` is used
instead when importable, purely for parity with the reference's
behavior.  Tests exercise all modes against a local ``http.server`` —
no external network.
"""

from __future__ import annotations

import csv as _csv
import io
import json
import time
from typing import Any


def _get(url: str, timeout: float = 30.0, retries: int = 2) -> str:
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            try:
                import requests  # type: ignore

                r = requests.get(url, allow_redirects=True, timeout=timeout)
                r.raise_for_status()
                return r.text
            except ImportError:
                from urllib.request import urlopen

                with urlopen(url, timeout=timeout) as resp:  # noqa: S310
                    return resp.read().decode("utf-8")
        except Exception as e:  # noqa: BLE001 — retry any transport error
            last = e
            if attempt < retries:
                time.sleep(0.2 * (attempt + 1))
    raise last  # type: ignore[misc]


def _json_path(obj: Any, path: str) -> Any:
    """``$.a.b[0].c``-style extraction (the reference's ``json_extract``
    helper, ``utils/query.py``)."""
    cur = obj
    for part in path.lstrip("$").strip(".").split("."):
        if not part:
            continue
        while "[" in part:
            name, _, rest = part.partition("[")
            if name:
                cur = cur[name]
            idx, _, part = rest.partition("]")
            cur = cur[int(idx)]
            if not part.startswith("["):
                break
        else:
            cur = cur[part]
    return cur


def parse_payload(text: str, options: dict) -> list[dict]:
    """Response text → row dicts per the source config (the reference's
    ``convert_df``, ``utils/query.py``: json/jsonl/csv with optional
    header injection)."""
    filetype = str(options.get("filetype", "json")).lower()
    if filetype == "json":
        obj = json.loads(text)
        if "json_path" in options:
            obj = _json_path(obj, str(options["json_path"]))
        if isinstance(obj, dict):
            obj = [obj]
        return list(obj)
    if filetype == "jsonl":
        return [json.loads(line) for line in text.splitlines() if line.strip()]
    if filetype == "csv":
        buf = io.StringIO(text)
        if "csv_header" in options:
            names = str(options["csv_header"]).split(",")
            return list(_csv.DictReader(buf, fieldnames=names))
        return list(_csv.DictReader(buf))
    raise ValueError(f"unknown filetype: {filetype}")


def _build_url(value: int | str, options: dict) -> str:
    return str(options["url"]).format(
        api_key=options.get("api_key", ""),
        start_date=options.get("start_date", ""),
        end_date=options.get("end_date", ""),
        page=value,
        limit=options.get("page_size", ""),
        iterator=value,
    )


def http_fetcher(value: int | str, options: dict) -> list[dict]:
    """The production fetcher: interpolate the URL template with the
    partition's page / iterator value, GET, parse.  Referenced as
    ``taipei_bi_etl_spark.sources.http_fetcher:http_fetcher`` in the
    data source's ``fetcher`` option; runs ON THE EXECUTOR, one call
    per partition."""
    return parse_payload(_get(_build_url(value, options)), options)


def discover_page_count(options: dict) -> int:
    """The reference's page-count discovery (``tasks/base.py:516-527``):
    fetch page 1, extract ``json_path_page_count``.  Driver-side single
    request; the returned count becomes the source's ``pages`` option
    so the actual extraction is fully distributed."""
    text = _get(_build_url(1, options))
    count = _json_path(json.loads(text), str(options["json_path_page_count"]))
    return max(1, int(count))
