"""Feature-mapping rule engine (D4) — the reference's centerpiece UDF
(`/root/reference/udf_js/feature_mapping.sql:1-1050`, ~150 if-rules in 5
vertical rule-sets with a first-match-wins cascade) re-expressed as pure
Catalyst Column expressions.

The reference evaluates 1,050 lines of JavaScript per event row inside
BigQuery.  Here every rule is a `when(cond, array(items))` fragment;
a vertical's feature list is `flatten(array(rule1, rule2, ...))` and the
cascade is a single `when` chain — all whole-stage-codegen'd, no Python
in the hot path.  At 100 TB this is the difference between a JS/Python
row loop and vectorized JVM evaluation.

Inputs are assumed lowercased and null-coalesced to '' by the upstream
cleanup stage (`sql/mango_events_feature_mapping.sql:34-46`); callers can
use :func:`normalized` to apply that contract.

Fidelity is property-tested against an independent Python transcription
of the JS in tests/test_feature_mapping.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: udf_js/feature_mapping.sql:20-25
PARTNER_LIST = [
    "bukalapak", "flipkart", "liputan6", "gameloft", "atmegame",
    "gamezop", "frvr", "booking.com", "dailyhunt", "google",
]

def normalized(col: Column) -> Column:
    """The upstream null→''/lowercase contract (mango_events_feature_mapping
    .sql:34-46)."""
    return F.coalesce(F.lower(col), F.lit(""))


def _rule(cond: Column, *items) -> Column:
    """One JS ``if (...) feature.push(...)`` block → conditional array."""
    return F.when(
        cond, F.array(*[i if isinstance(i, Column) else F.lit(i) for i in items])
    ).otherwise(F.array().cast("array<string>"))


def _cat(*parts) -> Column:
    return F.concat(*[p if isinstance(p, Column) else F.lit(p) for p in parts])


def _browser(m, o, v, ek, ev, vert, se) -> Column:
    """do_browser — udf_js/feature_mapping.sql:30-404."""
    partner = ev.isin(PARTNER_LIST)
    rules = [
        _rule((m == "add") & (o == "tab") & v.isin("toolbar", "tab_tray"), "feature: add_tab"),
        _rule((m == "change") & (o == "tab"), "feature: change_tab"),
        _rule((m == "click") & (o == "close_all") & (v == "tab_tray"), "feature: close_all_tab"),
        _rule(m.isin("remove", "swipe") & (o == "tab") & (v == "tab_tray"), "feature: remove_tab"),
        _rule(v == "block_image", "feature: change_block_image"),
        _rule((m != "share") & (v == "bookmark"), "feature: bookmark"),
        _rule(
            (m.isin("click", "show") & (v == "history"))
            | ((m == "open") & (o == "panel") & (v == "link")),
            "feature: visit_history",
        ),
        _rule(
            ((m == "clear") & (o == "panel") & (v == "history"))
            | ((m == "remove") & (o == "panel") & (v == "link")),
            "feature: clean_history",
        ),
        _rule(v == "clear_cache", "feature: clear_cache"),
        _rule(
            (m.isin("change", "click") & (o == "default_browser"))
            | (m.isin("change", "click") & v.contains("default_browser")),
            "feature: change_default_browser",
        ),
        _rule(
            m.isin("click", "change") & v.contains("save_downloads_to"),
            "feature: settings_change_download_location",
        ),
        _rule(v.contains("clear_browsing_data"), "feature: settings_clear_browsing_data"),
        _rule(v == "pref_locale", "feature: settings_change_locale"),
        _rule((o == "setting") & (v == "telemetry"), "feature: settings_change_collection_telemetry"),
        _rule((m == "click") & (o == "menu") & (v == "settings"), "feature: visit_settings"),
        _rule(
            (v == "download") | ((m == "open") & (o == "panel") & (v == "file")),
            "feature: visit_download",
        ),
        _rule(m.isin("remove", "delete") & (o == "panel") & (v == "file"), "feature: clean_download_file"),
        _rule((m == "click") & (o == "menu") & (v == "exit"), "feature: exit"),
        _rule((m == "click") & ((o == "feedback") | v.contains("feedback")), "feature: give_feedback"),
        _rule((o == "find_in_page") | (v == "find_in_page"), "feature: find_in_page"),
        _rule(v == "forward", "feature: forward_page"),
        _rule(v == "fullscreen", "feature: fullscreen"),
        _rule(o == "landscape_mode", "feature: landscape_mode"),
        _rule((m == "open") & (o == "home") & (v == "link"), "feature: visit_topsite"),
        _rule(
            (m == "open") & (o == "home") & (v == "link") & (ek == "source") & partner,
            _cat("visit_topsite_source: ", ev),
            "visit_topsite_partner: true",
        ),
        _rule((m == "remove") & (o == "home") & (v == "link"), "feature: remove_topsite"),
        _rule((m == "change") & v.contains("night_mode"), "feature: change_night_mode"),
        _rule(m == "pin_shortcut", "feature: pin_shortcut"),
        _rule(
            ((m != "show") & o.contains("private_"))
            | (~m.isin("show", "launch") & v.contains("private_")),
            "feature: private_mode",
        ),
        _rule(v == "reload_page", "feature: reload_page"),
        _rule((m != "share") & ((o == "capture") | (v == "capture")), "feature: screenshot"),
        _rule(
            (o == "browser_contextmenu") | ((m == "long_press") & (o == "browser")),
            "feature: browse",
        ),
        _rule(
            (m.isin("show", "cancel", "clear") & (o == "search_bar") & (v != "content_home"))
            | ((m == "long_press") & (o == "search_suggestion")),
            "feature: pre_search",
        ),
        _rule(
            (m.isin("type_query", "select_query") & (o == "search_bar"))
            | ((m == "click") & (o == "quicksearch"))
            | ((m == "open") & (o == "search_bar") & (v == "link")),
            "feature: search",
        ),
        _rule(
            m.isin("type_query", "select_query") & (o == "search_bar") & se.isin("google", ""),
            "search_source: google",
            "search_feed: google",
            "search_partner: true",
        ),
        _rule(m.isin("type_query", "select_query") & (o == "search_bar"), "tags: keyword_search"),
        _rule((m == "click") & (o == "quicksearch"), "tags: quicksearch"),
        _rule(
            (m == "click") & (o == "quicksearch") & (ek == "engine") & partner,
            _cat("quicksearch_source: ", ev),
            "quicksearch_partner: true",
        ),
        _rule((m == "open") & (o == "search_bar") & (ek == "link"), "tags: url_search"),
        _rule(
            m.isin("change", "click") & (o == "setting") & (v == "search_engine"),
            "feature: settings_change_search_engine",
        ),
        _rule(
            (m == "share") | ((o == "setting") & v.contains("share_with_friends")),
            "feature: share",
        ),
        _rule(o == "themetoy", "feature: themetoy"),
        _rule((m == "change") & v.contains("turbo"), "feature: change_turbo_mode"),
        _rule(
            ((m == "click") & o.contains("vpn") & (v == "positive"))
            | ((m == "click") & v.contains("vpn")),
            "feature: vpn",
        ),
        _rule((m == "click") & (o == "setting") & (v == "learn_more"), "feature: settings_learn_more"),
        _rule((m == "launch") & (o == "app"), "feature: launch_app"),
        _rule((m == "launch") & (o == "app") & (v == "external_app"), "tags: launch_app_from_external"),
        _rule((m == "launch") & (o == "app") & (v == "launcher"), "tags: launch_app_from_launcher"),
        _rule(
            (m == "launch") & (o == "app") & v.isin("shortcut", "private_mode", "game_shortcut"),
            "tags: launch_app_from_shortcut",
        ),
        _rule(vert == "all", "tags: browser_vertical"),
    ]
    return F.flatten(F.array(*rules))


_CONTENT_TAB_KEYS = ["feed", "source", "category", "component_id", "subcategory_id"]


def _content_vertical_rules(m, o, v, ek, ev, vert, name: str) -> list[Column]:
    """Shared content_hub/category/content_tab rule block, parameterized by
    vertical name (shopping/lifestyle/game/travel share it verbatim:
    udf_js/feature_mapping.sql:534-577, 674-717, 774-817, 839-882)."""
    partner = ev.isin(PARTNER_LIST)
    return [
        _rule((o == "content_hub") & (vert == name), f"feature: visit_{name}_content_hub"),
        _rule((m == "open") & (o == "category") & (vert == name), f"feature: open_category_{name}"),
        _rule(
            (m == "open") & (o == "category") & (vert == name) & (ek == "category"),
            _cat(f"tags: open_category_{name}_", ev),
        ),
        _rule((o == "content_tab") & (vert == name), f"feature: visit_{name}_content_tab"),
        _rule(
            (o == "content_tab") & (vert == name) & ek.isin(_CONTENT_TAB_KEYS),
            _cat(f"visit_{name}_content_tab_", ek, ": ", ev),
        ),
        _rule(
            (o == "content_tab") & (vert == name) & (ek == "source") & partner,
            f"visit_{name}_content_tab_partner: true",
        ),
    ]


def _toolbar_rules(m, o, v, ek, ev, vert, name: str) -> list[Column]:
    """Shared content-tab toolbar block (udf_js/feature_mapping.sql:579-612
    et al).  NB the 'tags: {name}_toolbar_' rule concatenates EXTRA_VALUE,
    not event_value — faithful to the reference (line 592)."""
    partner = ev.isin(PARTNER_LIST)
    return [
        _rule((m == "click") & (o == "toolbar") & (vert == name), f"feature: {name}_toolbar"),
        _rule(
            (m == "click") & (o == "toolbar")
            & v.isin("share", "reload", "back", "close") & (vert == name),
            _cat(f"tags: {name}_toolbar_", ev),
        ),
        _rule(
            (m == "click") & (o == "toolbar") & (v == "share") & (vert == name)
            & ek.isin(_CONTENT_TAB_KEYS),
            _cat(f"{name}_toolbar_share_", ek, ": ", ev),
        ),
        _rule(
            (m == "click") & (o == "toolbar") & (v == "share") & (vert == name)
            & (ek == "source") & partner,
            f"{name}_toolbar_share_partner: true",
        ),
    ]


def _shopping(m, o, v, ek, ev, vert, se) -> Column:
    """do_shopping — udf_js/feature_mapping.sql:409-625."""
    partner = ev.isin(PARTNER_LIST)
    rules = [
        _rule(v == "lifefeed_ec", "feature: lifefeed", "category: e_ticket"),
        _rule(
            (m == "click") & (v == "lifefeed_ec") & (ek == "category"),
            "component_type_id: 9",
            _cat("tags: ", ev),
        ),
        _rule(
            (m == "click") & (v == "lifefeed_ec") & (ek == "source"),
            "component_type_id: 9",
            _cat("lifefeed_ec_feed: ", ev),
            _cat("lifefeed_ec_source: ", ev),
        ),
        _rule(
            (m == "click") & (v == "lifefeed_ec") & (ek == "source") & partner,
            "lifefeed_ec_partner: true",
        ),
        _rule(v == "lifefeed_promo", "feature: lifefeed", "category: coupon"),
        _rule(
            (m == "click") & (v == "lifefeed_promo") & (ek == "feed") & (ev == "list"),
            "component_type_id: 7",
        ),
        _rule(
            (m == "click") & (v == "lifefeed_promo") & (ek == "feed") & (ev == "banner"),
            "component_type_id: 6",
        ),
        _rule(
            (m == "click") & (v == "lifefeed_promo") & (ek == "source"),
            _cat("lifefeed_promo_feed: ", ev),
            _cat("lifefeed_promo_source: ", ev),
        ),
        _rule((m == "click") & (v == "lifefeed_promo") & (ek == "subcategory"), _cat("tags: ", ev)),
        _rule(
            (m == "click") & (v == "lifefeed_promo") & (ek == "source") & partner,
            "lifefeed_promo_partner: true",
        ),
        _rule(
            m.isin("click", "start", "end", "clear")
            & (v.contains("tab_swipe") | (o == "tab_swipe"))
            & (vert == "shopping"),
            "feature: tab_swipe",
        ),
        _rule((m == "end") & (o == "tab_swipe") & (ek == "feed"), _cat("tab_swipe_feed: ", ev)),
        _rule((m == "end") & (o == "tab_swipe") & (ek == "source"), _cat("tab_swipe_source: ", ev)),
        _rule(
            (m == "end") & (o == "tab_swipe") & (ek == "source") & partner,
            "tab_swipe_partner: true",
        ),
        _rule(
            (m == "change") & (o == "setting") & (v == "tab_swipe"),
            "tags: change_tab_swipe_settings",
        ),
        *_content_vertical_rules(m, o, v, ek, ev, vert, "shopping"),
        *_toolbar_rules(m, o, v, ek, ev, vert, "shopping"),
        _rule(vert == "shopping", "tags: shopping_vertical"),
    ]
    return F.flatten(F.array(*rules))


def _lifestyle(m, o, v, ek, ev, vert, se) -> Column:
    """do_lifestyle — udf_js/feature_mapping.sql:629-765."""
    partner = ev.isin(PARTNER_LIST)
    rules = [
        _rule(v == "lifefeed_news", "feature: lifefeed_news"),
        _rule((m == "open") & (v == "lifefeed_news") & (ek == "category"), _cat("category: ", ev)),
        _rule(
            (m == "click") & (o == "panel") & (v == "lifefeed_news") & (ek == "feed"),
            "component_type_id: 7",
            _cat("lifefeed_news_feed: ", ev),
        ),
        _rule(
            (m == "click") & (o == "panel") & (v == "lifefeed_news") & (ek == "source"),
            "component_type_id: 7",
            _cat("lifefeed_news_source: ", ev),
        ),
        _rule(
            (m == "click") & (o == "panel") & (v == "lifefeed_news") & (ek == "feed") & partner,
            "lifefeed_news_partner: true",
        ),
        *_content_vertical_rules(m, o, v, ek, ev, vert, "lifestyle"),
        *_toolbar_rules(m, o, v, ek, ev, vert, "lifestyle"),
        _rule(vert == "lifestyle", "tags: lifestyle_vertical"),
    ]
    return F.flatten(F.array(*rules))


def _game(m, o, v, ek, ev, vert, se) -> Column:
    """do_game — udf_js/feature_mapping.sql:769-830."""
    rules = [
        *_content_vertical_rules(m, o, v, ek, ev, vert, "game"),
        _rule(vert == "game", "tags: game_vertical"),
    ]
    return F.flatten(F.array(*rules))


def _travel(m, o, v, ek, ev, vert, se) -> Column:
    """do_travel — udf_js/feature_mapping.sql:834-1009."""
    partner = ev.isin(PARTNER_LIST)
    rules = [
        *_content_vertical_rules(m, o, v, ek, ev, vert, "travel"),
        _rule(
            (m == "show") & (o == "search_bar") & (v == "content_home") & (vert == "travel"),
            "feature: travel_pre_search",
        ),
        _rule(
            (m == "select_query") & (o == "search_bar") & (v == "content_home") & (vert == "travel"),
            "feature: travel_search",
        ),
        _rule(
            (m == "select_query") & (o == "search_bar") & (v == "content_home")
            & (vert == "travel") & (ek == "source"),
            _cat("travel_search_source: ", ev),
        ),
        _rule(
            (m == "click") & (o == "content_home") & (v == "item") & (vert == "travel"),
            "feature: travel_visit_home_item",
        ),
        _rule(
            (m == "click") & (o == "content_home") & (v == "item") & (vert == "travel")
            & ek.isin("category", "item_name", "item_id"),
            _cat("travel_visit_home_item_", ek, ": ", ev),
        ),
        _rule(
            (m == "open") & (o == "detail_page") & (v == "more") & (vert == "travel"),
            "feature: travel_open_home_more",
        ),
        _rule(
            (m == "open") & (o == "detail_page") & (v == "more") & (vert == "travel")
            & ek.isin("category", "subcategory_id", "item_name", "item_id"),
            _cat("travel_open_home_more_", ek, ": ", ev),
        ),
        *_toolbar_rules(m, o, v, ek, ev, vert, "travel"),
        _rule(
            (m == "change") & (o == "setting") & v.isin("detail_page", "content_home")
            & (vert == "travel"),
            "feature: change_travel_settings",
        ),
        _rule(
            (m == "change") & (o == "setting") & v.isin("detail_page", "content_home")
            & (vert == "travel") & (ek == "action"),
            _cat("tags: change_travel_settings_", ev),
        ),
        _rule(vert == "travel", "tags: travel_vertical"),
    ]
    return F.flatten(F.array(*rules))


def feature_mapping(
    event_method: Column,
    event_object: Column,
    event_value: Column,
    extra_key: Column,
    extra_value: Column,
    event_vertical: Column,
    settings_search_engine: Column,
) -> Column:
    """The full D4 mapping → STRUCT<feature ARRAY<STRING>, vertical STRING,
    app STRING> with the first-match-wins vertical cascade
    (udf_js/feature_mapping.sql:1017-1046) and 'Others' fallback (:1011-1015).

    The 'travel' toolbar rules appear in both shopping and travel rule-sets
    only through their own vertical guard, so each event matches exactly one
    vertical — the cascade is a flat `when` chain on feature-list emptiness.
    """
    args = (
        event_method, event_object, event_value,
        extra_key, extra_value, event_vertical, settings_search_engine,
    )

    def pack(features: Column, vertical: str, app: str) -> Column:
        return F.struct(
            features.alias("feature"),
            F.lit(vertical).alias("vertical"),
            F.lit(app).alias("app"),
        )

    b, s, l, g, t = (fn(*args) for fn in (_browser, _shopping, _lifestyle, _game, _travel))
    return (
        F.when(F.size(b) > 0, pack(b, "Browser", "App"))
        .when(F.size(s) > 0, pack(s, "Shopping", "App"))
        .when(F.size(l) > 0, pack(l, "Lifestyle", "App"))
        .when(F.size(g) > 0, pack(g, "Game", "App"))
        .when(F.size(t) > 0, pack(t, "Travel", "App"))
        .otherwise(pack(F.array(F.lit("feature: others")), "Others", "Others"))
    )
