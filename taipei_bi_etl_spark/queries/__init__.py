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


#: DataFrames persisted during registry-query construction (r04 VERDICT
#: #8 / ADVICE #3).  Registry queries persist() subtrees their RETURNED
#: frame consumes, so they cannot unpersist before their action — the
#: contract is instead unpersist-on-next-invocation: each registry call
#: first releases every frame the PREVIOUS call persisted (by then its
#: returned frame has been consumed), so a long-lived session running
#: registry queries holds at most one query's caches, with no harness
#: obliged to remember clearCache.  Harness teardown can call
#: :func:`release_tracked` directly for a zero-residue end state.
_TRACKED: list[DataFrame] = []

#: (name, thread_ident) of the registry query currently holding the
#: persist-instrumentation window; None when closed (r05 ADVICE #5).
#: Guarded by _ACTIVE_LOCK: the check-and-set must be atomic or two
#: concurrent driver threads could both observe None and cross-track
#: silently — the exact failure the guard exists to make loud (r06
#: code review).
_ACTIVE_QUERY: tuple[str, int] | None = None

import threading as _threading  # noqa: E402

_ACTIVE_LOCK = _threading.Lock()


def release_tracked() -> None:
    """Unpersist every DataFrame tracked from prior registry calls."""
    while _TRACKED:
        entry = _TRACKED.pop()
        try:
            if callable(entry):
                entry()  # localCheckpoint releaser
            else:
                entry.unpersist()
        except Exception:  # session gone / already unpersisted — fine
            pass


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register ``fn`` as a named engine query with its oracle SQL.

    The registered callable is a thin wrapper enforcing the cache
    contract above: it releases the previous query's tracked persists,
    then records every ``DataFrame.persist`` issued while ``fn`` builds
    its plan (instrumented at the method level, so no query site needs
    a special helper).

    SINGLE-THREADED DRIVER CONTRACT: the class-level instrumentation
    and the shared ``_TRACKED`` list are not thread-safe — invoking
    registry queries concurrently from multiple driver threads can
    untrack a sibling's persists or release frames it has not consumed
    (recompute, or a checkpoint-block loss).  Every harness in this
    repo (driver sim, bench, sweeps, stress, pytest) is sequential.
    The contract is ENFORCED at runtime (r05 ADVICE #5): a nested or
    concurrent registry invocation while the instrumentation window is
    open raises RuntimeError instead of silently cross-tracking."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            import threading

            global _ACTIVE_QUERY
            with _ACTIVE_LOCK:  # atomic check-and-set
                if _ACTIVE_QUERY is not None:
                    raise RuntimeError(
                        "registry cache contract violated: query "
                        f"{name!r} invoked while {_ACTIVE_QUERY[0]!r} "
                        "holds the persist instrumentation window "
                        "(nested or concurrent registry call; compose "
                        "queries by calling the RAW functions, and "
                        "drive the registry from one thread)"
                    )
                _ACTIVE_QUERY = (name, threading.get_ident())
            try:
                return _wrapped_inner(spark, sf_dir)
            finally:
                with _ACTIVE_LOCK:
                    _ACTIVE_QUERY = None

        def _wrapped_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_tracked()
            # Spark 4 splits the API: pyspark.sql.DataFrame is the
            # abstract base and the classic implementation OVERRIDES
            # persist — instrument the concrete class, not the base.
            try:
                from pyspark.sql.classic.dataframe import (
                    DataFrame as _ConcreteDF,
                )
            except ImportError:  # older layout: one class
                _ConcreteDF = DataFrame
            orig = _ConcreteDF.persist
            orig_lcp = _ConcreteDF.localCheckpoint

            def tracking_persist(self, *a, **k):  # noqa: ANN001
                _TRACKED.append(self)
                return orig(self, *a, **k)

            def tracking_lcp(self, *a, **k):  # noqa: ANN001
                ret = orig_lcp(self, *a, **k)
                # a localCheckpoint materializes cached RDD blocks that
                # unpersist() cannot reach; grab the LogicalRDD's JVM
                # RDD handle so release_tracked can drop the blocks
                try:
                    jrdd = ret._jdf.queryExecution().analyzed().rdd()
                    _TRACKED.append(lambda: jrdd.unpersist(False))
                except Exception:
                    pass
                return ret

            _ConcreteDF.persist = tracking_persist
            _ConcreteDF.localCheckpoint = tracking_lcp
            try:
                return fn(spark, sf_dir)
            finally:
                _ConcreteDF.persist = orig
                _ConcreteDF.localCheckpoint = orig_lcp

        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, tags=tags
        )
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
    mango_materialized,
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
    variant_ingest,
    sparse_sim,
    cdc,
    paragraph_dedup,
    journey,
    linkage,
    privacy,
    fingerprint,
    ann_deterministic,
    semdedup,
)
