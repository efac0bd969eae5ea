"""Direct gates for the BigQuery-dialect Column shims (SURVEY §2.8) —
each checked against DuckDB's equivalent expression."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark import functions as fn


def test_date_shims_f1_f4(spark, duck):
    df = spark.createDataFrame(
        [("2024-03-10 13:45:30.250", 19875)], "ts_s string, days long"
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"),
        "days",
    )
    row = df.select(
        fn.to_day("ts").alias("day"),
        fn.date_sub_days(fn.to_day("ts"), 7).alias("minus7"),
        fn.date_diff_days(fn.to_day("ts"), F.lit("2024-03-01").cast("date")).alias(
            "dd"
        ),
        fn.date_from_unix_date("days").alias("from_unix"),
        fn.timestamp_trunc_day("ts").alias("trunc"),
    ).collect()[0]
    d = duck.execute(
        """
        SELECT CAST('2024-03-10' AS DATE),
               CAST('2024-03-03' AS DATE),
               datediff('day', DATE '2024-03-01', DATE '2024-03-10'),
               DATE '1970-01-01' + 19875,
               TIMESTAMP '2024-03-10 00:00:00'
        """
    ).fetchone()
    assert str(row.day) == str(d[0])
    assert str(row.minus7) == str(d[1])
    assert row.dd == d[2]
    assert str(row.from_unix) == str(d[3])
    assert str(row.trunc) == str(d[4])


def test_datetime_ms_shims_f5_f6(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 00:00:01.500")],
        "a string, b string",
    ).select(
        F.col("a").cast("timestamp").alias("a"),
        F.col("b").cast("timestamp").alias("b"),
    )
    row = df.select(
        fn.datetime_diff_ms(F.col("b"), F.col("a")).alias("diff"),
        fn.datetime_add_ms(F.col("a"), F.lit(1500)).alias("plus"),
    ).collect()[0]
    assert row.diff == 1500
    assert row.plus == row.plus.__class__(2024, 1, 1, 0, 0, 1, 500000)


def test_gen_uuid_f17(spark):
    rows = (
        spark.range(100).select(fn.gen_uuid().alias("u")).distinct().count()
    )
    assert rows == 100


def test_kv_and_null_helpers(spark):
    df = spark.createDataFrame(
        [([{"key": "A", "value": "x"}], "", None)],
        "arr array<struct<key string, value string>>, empty string, nul string",
    )
    row = df.select(
        fn.kv_get("arr", "A").alias("hit"),
        fn.kv_get("arr", "missing").alias("miss"),
        fn.empty_to_null(F.col("empty")).alias("e2n"),
        fn.ifnull(F.col("nul"), "dflt").alias("filled"),
        fn.lower_or_empty(F.col("nul")).alias("loe"),
    ).collect()[0]
    assert row.hit == "x"
    assert row.miss is None
    assert row.e2n is None
    assert row.filled == "dflt"
    assert row.loe == ""


def test_anonymize_columns_deterministic_and_consistent(spark):
    """V-family fixture scrubber: reproducible (same input → same
    output), format-correct, and key-consistent (equal inputs map to
    equal outputs so cross-table joins still line up)."""
    from taipei_bi_etl_spark.functions import anonymize_columns

    df = spark.createDataFrame(
        [("1.2.3.4", "user-77", 123, 9.5), ("1.2.3.4", "user-88", 456, 1.25)],
        "ip string, uid string, amount int, payout double",
    )
    spec = {"ip": "ip", "uid": "uid", "amount": "int", "payout": "float"}
    a = anonymize_columns(df, spec).collect()
    b = anonymize_columns(df, spec).collect()
    assert a == b  # reproducible
    assert a[0].ip == a[1].ip  # same input -> same output (consistency)
    assert a[0].ip.startswith("10.") and a[0].ip.count(".") == 3
    assert a[0].ip != "1.2.3.4" and a[0].uid != "user-77"
    assert 0 <= a[0].amount < 10000
    assert 0.0 <= a[0].payout < 100.0
    # ADVICE r01: uid is a FIXED 16-hex-char token (conv() alone emits
    # an unpadded ≤15-digit string)
    assert all(len(r.uid) == 16 for r in a)
    assert all(set(r.uid) <= set("0123456789abcdef") for r in a)
