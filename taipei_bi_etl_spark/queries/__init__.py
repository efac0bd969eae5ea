"""Query registry — the engine's public operator surface.

Every operator from SURVEY.md §2 that is SQL-expressible is registered
here twice: once as a Spark DataFrame program (``fn(spark, sf_dir)``)
and once as an ANSI-SQL oracle string that DuckDB runs over the same
parquet tables.  The driver (``__spark_entry__.py``) compares the two by
row count + schema + order-insensitive value hash at sf0.01.

Registration is by decorator; importing :mod:`taipei_bi_etl_spark.queries`
pulls in all query modules.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    """A named query: Spark program + optional DuckDB oracle twin."""

    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register ``fn`` as a named engine query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


# Import for side effect: populates REGISTRY.
from taipei_bi_etl_spark.queries import (  # noqa: E402,F401
    relational,
    relational2,
    telemetry,
    pipeline,
    similarity,
    dedup,
    text,
    streaming_queries,
    multimodal_queries,
    rfe,
    clustering,
    curation,
    pandas_api,
    packing,
    temporal,
    history,
    relational3,
    search,
    quantization,
    tokenizer,
    sequence,
    timegrid,
    text2,
    relational4,
    relational5,
    temporal2,
    arrays,
    modern_api,
    sketches,
    relational6,
    attribution,
    relational7,
    relational8,
    modern_api2,
    graph,
    graph2,
    relational9,
    retention,
    mango_parity,
    suffix,
    sampling,
    multimodal_real,
    label_quality,
    profiling,
    tar_ingest,
    curation2,
    dsir,
    curation3,
    curation4,
    curation5,
    ml_eval,
)
