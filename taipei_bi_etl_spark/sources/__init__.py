"""Custom Spark data sources (Spark 4 Python DataSource API)."""

from taipei_bi_etl_spark.sources.paged_api import (  # noqa: F401
    PagedApiDataSource,
    resolve_fetcher,
    synthetic_rates_fetcher,
)
