"""Ports of the reference's BigQuery UDF surface (SURVEY.md §2.10) as
pure Catalyst expressions — zero Python/JS in the row path.

D1  udf_js_json_extract_events → VARIANT parse + transform
D2  udf_js_cleanup_extra       → F.transform
D3  udf_js_cleanup_settings    → functions.kv_clean (F.transform)
D4  udf_js_feature_mapping     → feature_mapping.feature_mapping
D5-D14 map_*/match_*/order_*   → when-chains / isin

The reference registers these as BigQuery SQL/JS functions per dataset
(`tasks/bigquery.py:112-135`); here they are importable Column builders —
``register_sql_udfs(spark)`` additionally exposes them to ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.feature_mapping import feature_mapping  # noqa: F401  (D4)
from taipei_bi_etl_spark.functions import kv_clean  # noqa: F401  (D3)

# ---------------------------------------------------------------------------
# D1 — positional event 6-tuple JSON → ARRAY<STRUCT<...>>
# (udf_js/json_extract_events.sql:1-27: [ts, category, method, object,
#  value, {extra}] with lowercase + null→""/0 coercion).
# ---------------------------------------------------------------------------

_EXTRACT_EVENTS_TEMPLATE = """
transform(
  cast(try_parse_json({col}) as array<variant>),
  e -> struct(
    coalesce(try_variant_get(e, '$[0]', 'bigint'), 0L) as event_timestamp,
    lower(coalesce(try_variant_get(e, '$[1]', 'string'), '')) as event_category,
    lower(coalesce(try_variant_get(e, '$[2]', 'string'), '')) as event_method,
    lower(coalesce(try_variant_get(e, '$[3]', 'string'), '')) as event_object,
    lower(coalesce(try_variant_get(e, '$[4]', 'string'), '')) as event_value,
    transform(
      map_entries(coalesce(try_variant_get(e, '$[5]', 'map<string,string>'), map())),
      kv -> struct(lower(kv.key) as key, lower(coalesce(kv.value, '')) as value)
    ) as event_extra
  )
)
"""


def json_extract_events(col: str) -> Column:
    """D1: parse a telemetry ping's positional events JSON entirely in the
    JVM via Spark 4 VARIANT — the reference needs a JS UDF because BigQuery
    SQL can't destructure mixed-type arrays; ``try_parse_json`` +
    ``try_variant_get`` can.  NULL input → NULL, like the JS early
    return — and a MALFORMED payload also degrades to NULL (one bad
    ping must not fail a 100 TB scan; plain ``parse_json`` throws).
    """
    return F.expr(_EXTRACT_EVENTS_TEMPLATE.format(col=col))


# ---------------------------------------------------------------------------
# D2 — cleanup_extra (udf_js/cleanup_extra.sql:1-25): lowercase, clamp
# negative session_time to "0", patch url_counts +1 (mozilla-tw/mango#818
# workaround).
# ---------------------------------------------------------------------------

def cleanup_extra(arr: Column | str) -> Column:
    """D2 as a pure ``transform``.  JS parseInt semantics approximated with
    try_cast: non-numeric url_counts values become 'NaN' (JS produces 'NaN'
    via parseInt; JS would also accept '12px'→12, a corner we document
    rather than emulate)."""
    c = F.col(arr) if isinstance(arr, str) else arr

    def fix(x: Column) -> Column:
        k = F.lower(x["key"])
        v = F.coalesce(F.lower(x["value"]), F.lit(""))
        n = v.try_cast("long")
        fixed = (
            F.when((k == "session_time") & (n < 0), F.lit("0"))
            .when(k == "url_counts", F.coalesce((n + 1).cast("string"), F.lit("NaN")))
            .otherwise(v)
        )
        return F.struct(k.alias("key"), fixed.alias("value"))

    return F.transform(c, fix)


# ---------------------------------------------------------------------------
# D5-D9 — categorical mapping / matching functions (udf/*.sql).
# ---------------------------------------------------------------------------

def map_channels(cohort_name: Column) -> Column:
    """D5 — udf/map_channels.sql:1-27: attribution cohort → media type."""
    return (
        F.when(
            cohort_name.isin(
                "Organic", "Google Organic Search", "New Release",
                "2019 TW launch NR", "Marcom",
            ),
            "Earned Media",
        )
        .when(cohort_name.isin("Product Marketing (Owned media)"), "Owned Media")
        .when(
            cohort_name.isin(
                "Adwords UAC Installs", "Twitter Installs",
                "Twitter Audience Platform", "2019quiz_campaign",
                "Facebook Installs", "Off-Facebook Installs", "Appier", "FlashAds",
            ),
            "Paid Media",
        )
        .when(cohort_name.isin("GMobi", "CherryMobile", "MoMagic", "ARVE"), "Distribution")
        .when(cohort_name.isin("InviteReferrals"), "Referral")
        .when(cohort_name.isNull(), "Unknown")
        .otherwise("Others")
    )


def map_markets(country: Column) -> Column:
    """D6 — udf/map_markets.sql:1-19: ISO country → market group."""
    return (
        F.when(country.isin("IN", "ID"), country)
        .when(country.isin("TW", "HK", "SG"), "THS")
        .when(country.isin("PH", "VN", "TH", "MY"), "PVTM")
        .when(country.isin("BD", "MM", "KH", "LA", "BN"), "BMKLB")
        .when(country.isNull(), "Unknown")
        .otherwise("Others")
    )


def map_verticals(cohort_name: Column) -> Column:
    """D7 — udf/map_verticals.sql:1-16."""
    return _case_map(
        cohort_name,
        {
            "Browser": "vertical: browser",
            "Shopping": "vertical: shopping",
            "Game": "vertical: game",
            "Lifestyle": "vertical: lifestyle",
            "Travel": "vertical: travel",
            "feature: tab_swipe": "shopping: shopping tab_swipe",
            "feature: visit_shopping_content_tab": "shopping: shopping content_tab",
            "feature: visit_game_content_tab": "game: game content_tab",
            "feature: visit_lifestyle_content_tab": "lifestyle: lifestyle content_tab",
            "feature: visit_travel_content_tab": "travel: travel content_tab",
        },
        "",
    )


TARGET_COUNTRIES = [
    "IN", "ID", "TH", "PH", "VN", "TW", "HK",
    "SG", "MY", "BD", "KH", "LA", "MM", "BN",
]


def match_target_countries(country: Column) -> Column:
    """D8 — udf/match_target_countries.sql:1 (14-country whitelist)."""
    return country.isin(TARGET_COUNTRIES)


def match_verticals(cohort_level: Column, cohort_name: Column) -> Column:
    """D9 — udf/match_verticals.sql:1-18."""
    return cohort_level.isin("Vertical", "Feature") & cohort_name.isin(
        "Browser", "Game", "Lifestyle", "Shopping", "Travel",
        "feature: visit_shopping_content_tab", "feature: visit_game_content_tab",
        "feature: visit_lifestyle_content_tab", "feature: visit_travel_content_tab",
        "feature: tab_swipe",
    )


# ---------------------------------------------------------------------------
# D10-D14 — presentation-ordering keys (udf/order_*.sql).
# ---------------------------------------------------------------------------

def _case_map(col: Column, mapping: dict, default) -> Column:
    out = None
    for k, v in mapping.items():
        out = F.when(col == k, v) if out is None else out.when(col == k, v)
    return out.otherwise(default)


def order_channels(channel: Column) -> Column:
    """D10 — udf/order_channels.sql:1-13."""
    return _case_map(
        channel,
        {"Overall": 0, "Earned Media": 1, "Owned Media": 2, "Paid Media": 3,
         "Distribution": 4, "Referral": 5, "Unknown": 99, "Others": 100},
        9999,
    )


def order_channel_levels(level: Column) -> Column:
    """D11 — udf/order_channel_levels.sql:1-10."""
    return _case_map(
        level,
        {"appstore": 0, "network": 1, "campaign": 2, "adgroup": 3, "creative": 4},
        9999,
    )


def order_markets(market: Column) -> Column:
    """D12 — udf/order_markets.sql:1-14."""
    return _case_map(
        market,
        {"Overall": 0, "IN": 1, "ID": 2, "THS": 3, "PVTM": 4, "BMKLB": 5,
         "Unknown": 99, "Others": 100},
        9999,
    )


def order_target_countries(country: Column) -> Column:
    """D13 — udf/order_target_countries.sql:1-22 (string sort keys)."""
    mapping = {
        "Overall": "!!", "Target Markets": "00", "IN": "01", "ID": "02",
        "TW": "03", "HK": "04", "SG": "05", "PH": "06", "VN": "07",
        "TH": "08", "MY": "09", "BD": "10", "MM": "11", "KH": "12",
        "LA": "13", "BN": "14", "Others": "999",
    }
    out = None
    for k, v in mapping.items():
        out = F.when(country == k, v) if out is None else out.when(country == k, v)
    return out.when(country.isNull() | (country == ""), "~").otherwise(country)


def order_verticals(feature: Column) -> Column:
    """D14 — udf/order_verticals.sql:1-16."""
    return _case_map(
        feature,
        {"vertical: browser": 1, "vertical: shopping": 2, "vertical: game": 3,
         "vertical: lifestyle": 4, "vertical: travel": 5,
         "shopping: shopping tab_swipe": 11, "shopping: shopping content_tab": 12,
         "game: game content_tab": 13, "lifestyle: lifestyle content_tab": 14,
         "travel: travel content_tab": 15},
        9999,
    )


# ---------------------------------------------------------------------------
# SQL registration — exposes the ports to spark.sql, mirroring the
# reference's CREATE OR REPLACE FUNCTION lifecycle (tasks/bigquery.py:112-135).
# ---------------------------------------------------------------------------

#: SQL bodies for the registered functions — cross-checked against the
#: Column builders in tests/test_udfs.py::test_sql_udfs_match_columns.
_SQL_UDFS: dict[str, tuple[str, str, str]] = {
    "udf_map_channels": ("x STRING", "STRING", """
        CASE WHEN x IN ('Organic','Google Organic Search','New Release',
                        '2019 TW launch NR','Marcom') THEN 'Earned Media'
             WHEN x IN ('Product Marketing (Owned media)') THEN 'Owned Media'
             WHEN x IN ('Adwords UAC Installs','Twitter Installs',
                        'Twitter Audience Platform','2019quiz_campaign',
                        'Facebook Installs','Off-Facebook Installs',
                        'Appier','FlashAds') THEN 'Paid Media'
             WHEN x IN ('GMobi','CherryMobile','MoMagic','ARVE') THEN 'Distribution'
             WHEN x IN ('InviteReferrals') THEN 'Referral'
             WHEN x IS NULL THEN 'Unknown'
             ELSE 'Others' END"""),
    "udf_map_markets": ("x STRING", "STRING", """
        CASE WHEN x IN ('IN','ID') THEN x
             WHEN x IN ('TW','HK','SG') THEN 'THS'
             WHEN x IN ('PH','VN','TH','MY') THEN 'PVTM'
             WHEN x IN ('BD','MM','KH','LA','BN') THEN 'BMKLB'
             WHEN x IS NULL THEN 'Unknown'
             ELSE 'Others' END"""),
    "udf_map_verticals": ("x STRING", "STRING", """
        CASE WHEN x = 'Browser' THEN 'vertical: browser'
             WHEN x = 'Shopping' THEN 'vertical: shopping'
             WHEN x = 'Game' THEN 'vertical: game'
             WHEN x = 'Lifestyle' THEN 'vertical: lifestyle'
             WHEN x = 'Travel' THEN 'vertical: travel'
             WHEN x = 'feature: tab_swipe' THEN 'shopping: shopping tab_swipe'
             WHEN x = 'feature: visit_shopping_content_tab' THEN 'shopping: shopping content_tab'
             WHEN x = 'feature: visit_game_content_tab' THEN 'game: game content_tab'
             WHEN x = 'feature: visit_lifestyle_content_tab' THEN 'lifestyle: lifestyle content_tab'
             WHEN x = 'feature: visit_travel_content_tab' THEN 'travel: travel content_tab'
             ELSE '' END"""),
    "udf_order_channels": ("x STRING", "INT", """
        CASE WHEN x = 'Overall' THEN 0 WHEN x = 'Earned Media' THEN 1
             WHEN x = 'Owned Media' THEN 2 WHEN x = 'Paid Media' THEN 3
             WHEN x = 'Distribution' THEN 4 WHEN x = 'Referral' THEN 5
             WHEN x = 'Unknown' THEN 99 WHEN x = 'Others' THEN 100
             ELSE 9999 END"""),
    "udf_order_channel_levels": ("x STRING", "INT", """
        CASE WHEN x = 'appstore' THEN 0 WHEN x = 'network' THEN 1
             WHEN x = 'campaign' THEN 2 WHEN x = 'adgroup' THEN 3
             WHEN x = 'creative' THEN 4 ELSE 9999 END"""),
    "udf_order_markets": ("x STRING", "INT", """
        CASE WHEN x = 'Overall' THEN 0 WHEN x = 'IN' THEN 1
             WHEN x = 'ID' THEN 2 WHEN x = 'THS' THEN 3 WHEN x = 'PVTM' THEN 4
             WHEN x = 'BMKLB' THEN 5 WHEN x = 'Unknown' THEN 99
             WHEN x = 'Others' THEN 100 ELSE 9999 END"""),
    "udf_order_target_countries": ("x STRING", "STRING", """
        CASE WHEN x = 'Overall' THEN '!!' WHEN x = 'Target Markets' THEN '00'
             WHEN x = 'IN' THEN '01' WHEN x = 'ID' THEN '02'
             WHEN x = 'TW' THEN '03' WHEN x = 'HK' THEN '04'
             WHEN x = 'SG' THEN '05' WHEN x = 'PH' THEN '06'
             WHEN x = 'VN' THEN '07' WHEN x = 'TH' THEN '08'
             WHEN x = 'MY' THEN '09' WHEN x = 'BD' THEN '10'
             WHEN x = 'MM' THEN '11' WHEN x = 'KH' THEN '12'
             WHEN x = 'LA' THEN '13' WHEN x = 'BN' THEN '14'
             WHEN x = 'Others' THEN '999'
             WHEN x = '' OR x IS NULL THEN '~' ELSE x END"""),
    "udf_order_verticals": ("x STRING", "INT", """
        CASE WHEN x = 'vertical: browser' THEN 1 WHEN x = 'vertical: shopping' THEN 2
             WHEN x = 'vertical: game' THEN 3 WHEN x = 'vertical: lifestyle' THEN 4
             WHEN x = 'vertical: travel' THEN 5
             WHEN x = 'shopping: shopping tab_swipe' THEN 11
             WHEN x = 'shopping: shopping content_tab' THEN 12
             WHEN x = 'game: game content_tab' THEN 13
             WHEN x = 'lifestyle: lifestyle content_tab' THEN 14
             WHEN x = 'travel: travel content_tab' THEN 15
             ELSE 9999 END"""),
    "udf_match_target_countries": ("x STRING", "BOOLEAN",
        "x IN ('IN','ID','TH','PH','VN','TW','HK','SG','MY','BD','KH','LA','MM','BN')"),
    "udf_match_verticals": ("cohort_level STRING, cohort_name STRING", "BOOLEAN", """
        cohort_level IN ('Vertical','Feature') AND cohort_name IN (
          'Browser','Game','Lifestyle','Shopping','Travel',
          'feature: visit_shopping_content_tab','feature: visit_game_content_tab',
          'feature: visit_lifestyle_content_tab','feature: visit_travel_content_tab',
          'feature: tab_swipe')"""),
}


def register_sql_udfs(spark: SparkSession) -> None:
    """Expose the categorical maps to ``spark.sql`` as Spark 4 SQL scalar
    UDFs (CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN <expr>) — the
    Catalyst inliner substitutes the body at call sites, so SQL callers
    get the same native CASE chain as Python callers.  Mirrors the
    reference's per-dataset CREATE FUNCTION lifecycle
    (tasks/bigquery.py:112-135) without the JS engine."""
    for name, (sig, ret, body) in _SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
            f"RETURNS {ret} RETURN {body}"
        )
