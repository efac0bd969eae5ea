"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship full-grain cohort-retention pivot at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's full registered
operator surface (taipei_bi_etl_spark.queries.REGISTRY) for the driver's
DuckDB cross-check at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from taipei_bi_etl_spark.queries import oracle_queries, spark_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the FULL 22-aggregate cohort retention pivot
    (SURVEY §2.4 A5 at reference grain — day/week/month points over the
    rolling 112-day window, Expand-free single pass) at sf0.001."""
    return spark_queries()["cohort_retention_full"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each hash-checkable query."""
    return oracle_queries()
