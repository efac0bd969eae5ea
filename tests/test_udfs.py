"""Unit tests for the UDF ports (SURVEY §2.10 D1-D14) against the JS/SQL
semantics transcribed from /root/reference/udf_js and /root/reference/udf."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from taipei_bi_etl_spark import udfs
from taipei_bi_etl_spark.functions import kv_clean, kv_get


def test_json_extract_events_d1(spark):
    payload = (
        '[[123,"Action","Click","Tab","Toolbar",{"Source":"GOOGLE","n":null}],'
        '[null,null,"open",null,"X",{}]]'
    )
    df = spark.createDataFrame([(payload,), (None,), ("[]",)], "input string")
    out = df.select(udfs.json_extract_events("input").alias("ev")).collect()
    first = out[0].ev
    assert first[0] == Row(
        event_timestamp=123, event_category="action", event_method="click",
        event_object="tab", event_value="toolbar",
        event_extra=[Row(key="source", value="google"), Row(key="n", value="")],
    )
    # null positional fields → 0 / ""
    assert first[1] == Row(
        event_timestamp=0, event_category="", event_method="open",
        event_object="", event_value="x", event_extra=[],
    )
    assert out[1].ev is None  # JS: null input → null
    assert out[2].ev == []


def test_cleanup_extra_d2(spark):
    arr = [
        Row(key="SESSION_TIME", value="-5"),
        Row(key="session_time", value="17"),
        Row(key="URL_COUNTS", value="3"),
        Row(key="url_counts", value="abc"),
        Row(key="Other", value=None),
    ]
    df = spark.createDataFrame([Row(extra=arr)])
    (res,) = df.select(udfs.cleanup_extra("extra").alias("x")).collect()
    assert [tuple(r) for r in res.x] == [
        ("session_time", "0"),      # negative clamped
        ("session_time", "17"),     # non-negative kept
        ("url_counts", "4"),        # +1 patch (mango#818)
        ("url_counts", "NaN"),      # unparseable, JS parseInt → NaN
        ("other", ""),              # lowercase key, null value → ""
    ]


def test_cleanup_settings_and_kv_get_d3_a6(spark):
    arr = [Row(key="Pref_Search_Engine", value="GOOGLE"), Row(key="B", value=None)]
    df = spark.createDataFrame([Row(settings=arr)])
    (res,) = df.select(
        kv_clean("settings").alias("s"),
        kv_get(kv_clean("settings"), "pref_search_engine").alias("engine"),
    ).collect()
    assert [tuple(r) for r in res.s] == [("pref_search_engine", "google"), ("b", "")]
    assert res.engine == "google"


def test_categorical_maps_d5_d9(spark):
    df = spark.createDataFrame(
        [("Organic", "IN"), ("Appier", "HK"), (None, None), ("X", "US")],
        "cohort string, country string",
    )
    rows = df.select(
        udfs.map_channels(F.col("cohort")).alias("ch"),
        udfs.map_markets(F.col("country")).alias("mk"),
        udfs.match_target_countries(F.col("country")).alias("tgt"),
    ).collect()
    assert [tuple(r) for r in rows] == [
        ("Earned Media", "IN", True),
        ("Paid Media", "THS", True),
        ("Unknown", "Unknown", None),  # isin(NULL) is NULL in Spark & BQ
        ("Others", "Others", False),
    ]


def test_order_udfs_d10_d14(spark):
    df = spark.createDataFrame(
        [("Earned Media", "campaign", "THS", "TW", "vertical: game"),
         ("Nope", "nope", "nope", None, "nope")],
        "ch string, lvl string, mk string, ctry string, vert string",
    )
    rows = df.select(
        udfs.order_channels(F.col("ch")).alias("a"),
        udfs.order_channel_levels(F.col("lvl")).alias("b"),
        udfs.order_markets(F.col("mk")).alias("c"),
        udfs.order_target_countries(F.col("ctry")).alias("d"),
        udfs.order_verticals(F.col("vert")).alias("e"),
    ).collect()
    assert tuple(rows[0]) == (1, 2, 3, "03", 3)
    assert tuple(rows[1]) == (9999, 9999, 9999, "~", 9999)


def test_map_verticals_d7(spark):
    df = spark.createDataFrame([("Browser",), ("feature: tab_swipe",), ("x",)], "c string")
    got = [r.v for r in df.select(udfs.map_verticals(F.col("c")).alias("v")).collect()]
    assert got == ["vertical: browser", "shopping: shopping tab_swipe", ""]


def test_register_sql_udfs(spark):
    udfs.register_sql_udfs(spark)
    row = spark.sql(
        "SELECT udf_map_markets('TW') mk, udf_order_channels('Paid Media') oc, "
        "udf_match_verticals('Vertical', 'Game') mv, "
        "udf_match_target_countries('US') tc"
    ).collect()[0]
    assert tuple(row) == ("THS", 3, True, False)


def test_sql_udfs_match_column_builders(spark):
    """The SQL bodies and the Column builders are maintained separately —
    prove they agree on a probe set covering every branch + null."""
    udfs.register_sql_udfs(spark)
    probes = [
        "Organic", "Product Marketing (Owned media)", "Appier", "GMobi",
        "InviteReferrals", "IN", "ID", "TW", "HK", "SG", "PH", "VN", "TH",
        "MY", "BD", "MM", "KH", "LA", "BN", "US", "Overall", "Earned Media",
        "Owned Media", "Paid Media", "Distribution", "Referral", "Unknown",
        "Others", "Target Markets", "appstore", "network", "campaign",
        "adgroup", "creative", "Browser", "Shopping", "Game", "Lifestyle",
        "Travel", "feature: tab_swipe", "feature: visit_shopping_content_tab",
        "feature: visit_game_content_tab", "feature: visit_lifestyle_content_tab",
        "feature: visit_travel_content_tab", "vertical: browser",
        "vertical: shopping", "vertical: game", "vertical: lifestyle",
        "vertical: travel", "shopping: shopping tab_swipe",
        "shopping: shopping content_tab", "game: game content_tab",
        "lifestyle: lifestyle content_tab", "travel: travel content_tab",
        "", "zzz", None,
    ]
    df = spark.createDataFrame([(p,) for p in probes], "x string")
    pairs = [
        ("udf_map_channels", udfs.map_channels),
        ("udf_map_markets", udfs.map_markets),
        ("udf_map_verticals", udfs.map_verticals),
        ("udf_order_channels", udfs.order_channels),
        ("udf_order_channel_levels", udfs.order_channel_levels),
        ("udf_order_markets", udfs.order_markets),
        ("udf_order_target_countries", udfs.order_target_countries),
        ("udf_order_verticals", udfs.order_verticals),
        ("udf_match_target_countries", udfs.match_target_countries),
    ]
    sel = []
    for name, fn in pairs:
        sel.append(F.expr(f"{name}(x)").alias(f"sql_{name}"))
        sel.append(fn(F.col("x")).alias(f"col_{name}"))
    for r in df.select(*sel).collect():
        for name, _ in pairs:
            assert r[f"sql_{name}"] == r[f"col_{name}"], (name, dict(r.asDict()))


def test_pii_scrub_and_counts(spark):
    """pii_scrub replaces emails/IPs/phones with typed tokens; the scan
    counts match, including docs with several PII kinds at once."""
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.text import (
        PII_EMAIL,
        PII_IP,
        PII_PHONE,
        pii_scrub,
    )

    rows = [
        (1, "contact a.smith+x@mail-host.co.uk or b@c.io today"),
        (2, "server at 10.0.255.7 answered"),
        (3, "call +1-415-555-0199 or (02) 2345-6789 now"),
        (4, "mixed: root@box.net from 192.168.0.1 dial 0912345678!"),
        (5, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        pii_scrub(F.col("text")).alias("scrubbed"),
        F.regexp_count("text", F.lit(PII_EMAIL)).alias("emails"),
        F.regexp_count("text", F.lit(PII_PHONE)).alias("phones"),
        F.regexp_count("text", F.lit(PII_IP)).alias("ips"),
    )
    got = {r.doc_id: r for r in df.collect()}
    assert got[1].scrubbed == "contact <EMAIL> or <EMAIL> today"
    assert (got[1].emails, got[1].phones, got[1].ips) == (2, 0, 0)
    assert got[2].scrubbed == "server at <IP> answered"
    assert (got[2].emails, got[2].phones, got[2].ips) == (0, 0, 1)
    assert got[3].scrubbed == "call <PHONE> or <PHONE> now"
    assert (got[3].emails, got[3].phones, got[3].ips) == (0, 2, 0)
    assert got[4].scrubbed == "mixed: <EMAIL> from <IP> dial <PHONE>!"
    assert (got[4].emails, got[4].phones, got[4].ips) == (1, 1, 1)
    assert got[5].scrubbed == rows[4][1]
