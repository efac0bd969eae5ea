"""Spark 4 Python DataSource re-expression of the paged-API scan (S1):
the fetch is a distributed scan — one input partition per page or
iterator value — not a driver loop."""

from __future__ import annotations


def _register(spark):
    from taipei_bi_etl_spark.sources import PagedApiDataSource

    spark.dataSource.register(PagedApiDataSource)


def test_paged_read_partitions_and_rows(spark):
    _register(spark)
    df = (
        spark.read.format("paged_api")
        .schema("page string, country string, cost_index double")
        .option("fetcher", "taipei_bi_etl_spark.sources.paged_api:synthetic_rates_fetcher")
        .option("pages", 5)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 15
    assert {r.page for r in rows} == {str(i) for i in range(5)}
    # one spark partition per page — the distributed-fetch contract
    assert df.rdd.getNumPartitions() == 5


def test_iterator_fanout_matches_reference_mode(spark):
    """The reference's per-iterator fan-out (configs/rps.py:24: one
    request per country) becomes one partition per iterator value."""
    _register(spark)
    df = (
        spark.read.format("paged_api")
        .schema("page string, country string, cost_index double")
        .option("fetcher", "taipei_bi_etl_spark.sources.paged_api:synthetic_rates_fetcher")
        .option("iterator", "us,de,jp")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    assert sorted({r.page for r in df.collect()}) == ["de", "jp", "us"]


def test_fetch_is_deterministic(spark):
    _register(spark)

    def grab():
        return sorted(
            map(
                tuple,
                spark.read.format("paged_api")
                .schema("page string, country string, cost_index double")
                .option(
                    "fetcher",
                    "taipei_bi_etl_spark.sources.paged_api:synthetic_rates_fetcher",
                )
                .option("pages", 4)
                .load()
                .collect(),
            )
        )

    assert grab() == grab()


def test_paged_api_streaming_source_incremental_exactly_once(spark, tmp_path):
    """The paged API as a STREAMING source: page-cursor offsets advance
    per micro-batch, the bounded test feed (max_pages) drains to
    exactly pages×3 rows with no duplicates, and offsets land in the
    checkpoint (recovery replays deterministically via
    readBetweenOffsets)."""
    from taipei_bi_etl_spark.sources.paged_api import PagedApiDataSource

    spark.dataSource.register(PagedApiDataSource)
    stream = (
        spark.readStream.format("paged_api")
        .schema("page string, country string, cost_index double")
        .option(
            "fetcher",
            "taipei_bi_etl_spark.sources.paged_api:synthetic_rates_fetcher",
        )
        .option("pages_per_batch", 2)
        .option("max_pages", 5)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("paged_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM paged_stream").collect()
    assert len(rows) == 5 * 3
    assert len({(r.page, r.country) for r in rows}) == len(rows)
    pages = {int(r.page) for r in rows}
    assert pages == set(range(5))
