"""Tests for the V1-V6 data-quality operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from taipei_bi_etl_spark import checks
from taipei_bi_etl_spark.io import read_table
from tests.conftest import SF_DIR


def test_assert_schema_v1(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    checks.assert_schema(
        df,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]),
    )
    with pytest.raises(checks.CheckError, match="schema mismatch"):
        checks.assert_schema(df, T.StructType([T.StructField("id", T.IntegerType())]))


def test_assert_columns_v3(spark):
    df = spark.createDataFrame([(1,)], "id long")
    checks.assert_columns(df, ["id"])
    with pytest.raises(checks.CheckError, match="missing required"):
        checks.assert_columns(df, ["id", "nope"])


def test_run_data_checks_v2_v4_v5(spark):
    ev = read_table(spark, SF_DIR, "events")
    stats = checks.run_data_checks(
        ev.withColumn("day", F.to_date("ts")),
        date_col="day",
        date_range=("2020-01-01", "2030-01-01"),
        not_null=["user_id", "event_type"],
        min_rows=100,
    )
    assert stats["__n"] >= 100
    with pytest.raises(checks.CheckError, match="row count"):
        checks.run_data_checks(ev.limit(5), min_rows=100)
    with pytest.raises(checks.CheckError, match="out of range"):
        checks.run_data_checks(
            ev.withColumn("day", F.to_date("ts")),
            date_col="day",
            date_range=("2020-01-01", "2020-01-02"),
        )
    with pytest.raises(checks.CheckError, match="null values"):
        checks.run_data_checks(
            ev.withColumn("bad", F.when(F.col("event_id") % 2 == 0, F.lit(None)).otherwise(F.lit(1))),
            not_null=["bad"],
        )


def test_compare_to_previous_v6(spark):
    cur = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    prev = spark.createDataFrame([(2,), (3,), (4,), (5,)], "k long")
    out = checks.compare_to_previous(cur, prev, ["k"])
    assert out == {"added": 1, "removed": 2}


def test_observed_metrics_ride_the_action(spark):
    """V2/V4 as df.observe: metrics must materialize from the SAME
    action that produced the output — no second scan."""
    from taipei_bi_etl_spark.checks import observed
    from taipei_bi_etl_spark.io import read_table
    from tests.conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events")
    df, obs = observed(
        ev, not_null=["user_id"], bounds=["ts"], count_col="event_id"
    )
    n = df.count()  # the one action
    got = obs.get
    assert got["n_rows"] == n
    assert got["nulls_user_id"] == 0
    assert abs(got["distinct_event_id"] - n) / n < 0.05  # HLL ±rsd
    assert got["min_ts"] <= got["max_ts"]


def test_compare_tables_checksum_detects_any_change(spark):
    """The XOR-fingerprint reconciliation must accept identical copies
    under different layouts and reject a single changed/extra row."""
    from taipei_bi_etl_spark.checks import compare_tables_checksum
    from taipei_bi_etl_spark.io import read_table
    from tests.conftest import SF_DIR

    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    relaid = o.repartition(13)
    assert compare_tables_checksum(
        spark, o, relaid, ["o_orderkey", "o_custkey", "o_orderstatus"]
    )["match"]
    # one mutated row flips the fingerprint
    from pyspark.sql import functions as F

    mutated = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    assert not compare_tables_checksum(
        spark, o, mutated, ["o_orderkey", "o_custkey", "o_orderstatus"]
    )["match"]
    # one extra row flips the count and the fingerprint
    extra = o.unionByName(o.limit(1))
    r = compare_tables_checksum(
        spark, o, extra, ["o_orderkey", "o_custkey", "o_orderstatus"]
    )
    assert not r["match"] and r["rows_b"] == r["rows_a"] + 1


def test_compare_tables_checksum_null_and_separator_safety(spark):
    """ADVICE r01 regression: NULL placement and separator characters
    must not collapse distinct rows to one fingerprint, and an
    even-multiplicity row swap must not cancel in the fold."""
    from taipei_bi_etl_spark.checks import compare_tables_checksum

    cols = ["k", "a", "b"]
    schema = "k int, a string, b string"
    # (1, NULL, 'x') vs (1, 'x', NULL) — concat_ws would drop the NULL
    # and serialize both as '1|x'
    da = spark.createDataFrame([(1, None, "x")], schema)
    db = spark.createDataFrame([(1, "x", None)], schema)
    assert not compare_tables_checksum(spark, da, db, cols)["match"]
    # NULL vs empty string
    dc = spark.createDataFrame([(1, "", "x")], schema)
    assert not compare_tables_checksum(spark, da, dc, cols)["match"]
    # value containing the separator: ('a|b', 'c') vs ('a', 'b|c')
    dd = spark.createDataFrame([(1, "a|b", "c")], schema)
    de = spark.createDataFrame([(1, "a", "b|c")], schema)
    assert not compare_tables_checksum(spark, dd, de, cols)["match"]
    # even-multiplicity swap: {r, r} vs {s, s} — XOR alone cancels;
    # the additive fingerprint must catch it
    df_rr = spark.createDataFrame([(1, "r", "r"), (1, "r", "r")], schema)
    df_ss = spark.createDataFrame([(1, "s", "s"), (1, "s", "s")], schema)
    assert not compare_tables_checksum(spark, df_rr, df_ss, cols)["match"]
    # identical multisets still match
    assert compare_tables_checksum(
        spark, df_rr, df_rr.repartition(3), cols
    )["match"]


def test_skew_report_empty_input(spark):
    """ADVICE r01 regression: empty input returns a zeroed report, not
    a TypeError from None arithmetic."""
    from taipei_bi_etl_spark.scale import skew_report

    df = spark.createDataFrame([], "k int, v string")
    r = skew_report(df, "k")
    assert r == {
        "rows": 0,
        "distinct_keys": 0,
        "max_freq": 0,
        "skew_ratio": 0.0,
        "top": [],
    }


def test_compare_tables_checksum_property(spark):
    """Property test (hypothesis): for random small row multisets over
    a NULL/separator/empty-string-rich alphabet, the checksum matches
    IFF the multisets are equal."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from taipei_bi_etl_spark.checks import compare_tables_checksum

    alphabet = [None, "", "|", "a", "a|b", "NULL", "x"]
    row = st.tuples(
        st.integers(0, 2), st.sampled_from(alphabet), st.sampled_from(alphabet)
    )
    rows = st.lists(row, min_size=0, max_size=5)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows, rows)
    def check(rows_a, rows_b):
        schema = "k int, a string, b string"
        da = spark.createDataFrame(rows_a, schema) if rows_a else (
            spark.createDataFrame([], schema)
        )
        db = spark.createDataFrame(rows_b, schema) if rows_b else (
            spark.createDataFrame([], schema)
        )
        got = compare_tables_checksum(spark, da, db, ["k", "a", "b"])["match"]
        expect = sorted(rows_a, key=repr) == sorted(rows_b, key=repr)
        assert got == expect, (rows_a, rows_b)

    check()
