"""Session-normalized bench budgets (r05 VERDICT #2).

The r05 driver bench session ran uniformly ~1.16× hot and
`scd2_dimension_build` breached its absolute tripwire by 0.023 s on
machine weather alone, reddening the round's bench artifact.  These
tests pin the required behavior of :func:`bench.compute_breaches` on
exactly those two scenarios: a deliberately throttled (uniformly
inflated) run must NOT breach, and a single-query plan regression
inside an otherwise-normal run MUST.
"""

from __future__ import annotations

import bench


BUDGETS = {f"q{i}": b for i, b in enumerate([0.5, 1.2, 2.0, 0.3, 7.5, 0.4])}


def _at_budget() -> dict[str, float]:
    return dict(BUDGETS)


def test_clean_run_no_breach():
    infl, breaches = bench.compute_breaches(_at_budget(), BUDGETS)
    assert infl == 1.0
    assert breaches == {}


def test_uniformly_throttled_run_no_breach():
    # The r05 driver scenario, exaggerated: EVERY query 1.9× its budget
    # (each individually past the absolute 1.5× tripwire for the
    # multi-second entries).  The common mode is session weather, not a
    # plan change — nothing may fire.  r07: inflation caps at 1.5 (just
    # above the ±40% weather band), so 1.9× reads back capped; 1.9b is
    # still under the capped limit max(1.5·1.5·b, b+0.5) = 2.25b.
    hot = {n: 1.9 * b for n, b in BUDGETS.items()}
    infl, breaches = bench.compute_breaches(hot, BUDGETS)
    assert abs(infl - 1.5) < 1e-9
    assert breaches == {}


def test_single_query_regression_fires():
    # One 2-second query triples while the rest sit at budget — the
    # r04 scd2 triple-parse class.  The median ratio barely moves, the
    # regressed query must breach.
    t = _at_budget()
    t["q2"] = 6.0
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert list(breaches) == ["q2"]
    assert breaches["q2"]["sec"] == 6.0


def test_single_query_regression_fires_even_when_session_hot():
    # Regression AND uniform 1.3× heat together: the tripwire scales
    # with the session but the outlier still fires.
    t = {n: 1.3 * b for n, b in BUDGETS.items()}
    t["q2"] = 1.3 * 2.0 * 4  # 4× its (inflated) expectation
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert list(breaches) == ["q2"]


def test_subsecond_jitter_floor():
    # A 0.3 s query at 0.72 s (2.4× budget) is inside BOTH the +0.5 s
    # absolute floor and the 2.5× ratio cap — per-query jitter on tiny
    # entries must not fire.  (r08: was pinned at 0.79 = 2.63×, which
    # the ratio tier now deliberately catches — see the tier tests.)
    t = _at_budget()
    t["q3"] = 0.72
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert breaches == {}


def test_subsecond_ratio_tier_fires_inside_floor():
    # r08 (VERDICT r07 #3): a tiny-budget entry regressing past 2.5×
    # its budget must fire EVEN under the +0.5 s floor.  q3 (budget
    # 0.3) at 0.79 s = 2.63× sits inside the old floor limit (0.8 s)
    # — the ratio cap (2.5 × 0.3 = 0.75) catches it.
    t = _at_budget()
    t["q3"] = 0.79
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert list(breaches) == ["q3"]
    assert breaches["q3"]["limit"] == 0.75


def test_subsecond_ratio_tier_scales_with_inflation():
    # The ratio cap multiplies the session common mode like the
    # proportional term.  Budget 0.15 in a 1.4×-hot session: cap =
    # 1.4 × 2.5 × 0.15 = 0.525 (binding — below the 0.65 floor), so
    # 0.45 s (3× raw but ≈2.1× normalized) must NOT fire while 0.55 s
    # (>2.6× normalized) must.
    budgets = dict(BUDGETS, tiny=0.15)
    t = {n: 1.4 * b for n, b in budgets.items()}
    t["tiny"] = 0.45
    infl, breaches = bench.compute_breaches(t, budgets)
    assert breaches == {}
    t["tiny"] = 0.55
    infl, breaches = bench.compute_breaches(t, budgets)
    assert list(breaches) == ["tiny"]
    assert abs(breaches["tiny"]["limit"] - 0.525) < 1e-9


def test_ratio_tier_inert_for_proportional_budgets():
    # For budgets ≥ 1 s the 1.5× proportional term is the binding limit
    # (2.5× > 1.5×); the tier must not loosen or tighten anything: a
    # 2 s entry at 2.9 s (< 3.0 limit) stays green, 3.1 s fires.
    t = _at_budget()
    t["q2"] = 2.9
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert breaches == {}
    t["q2"] = 3.1
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert list(breaches) == ["q2"]


def test_unbudgeted_queries_ignored():
    t = _at_budget()
    t["brand_new_query"] = 99.0
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert breaches == {}


def test_headline_budget_coverage():
    # Every headline entry carries a budget so the tripwire cannot
    # silently skip a regression in a new headline query.
    missing = [n for n in bench.HEADLINE if n not in bench.BUDGETS]
    assert missing == []


def test_catastrophic_uniform_slowdown_still_breaches():
    # r06 code review (tightened r07 per ADVICE #1): inflation is
    # capped at 1.5, so a session-wide genuine regression (flipped
    # conf, codegen fallback) that slows EVERY query past the capped
    # limit (2.25× for proportional-dominated entries) must still
    # redden the run — only weather-band uniform inflation is absorbed.
    hot = {n: 2.5 * b for n, b in BUDGETS.items()}
    infl, breaches = bench.compute_breaches(hot, BUDGETS)
    assert infl == 1.5  # capped
    assert breaches, "uniform catastrophic slowdown must fire"


def test_breaches_fatal_only_at_calibration_width():
    # r10 OPTIMIZATION: budgets are 32-core medians; the driver's
    # lower-core bench re-run measures each query's Amdahl scaling, and
    # a genuinely-parallel query slowing against the driver-bound pack
    # there is the scaling signal, not a regression.  Breaches stay
    # REPORTED at every width but only exit non-zero at or above the
    # calibration width — ABOVE it queries only get faster, so the
    # budgets remain valid upper bounds and a wider host must not
    # silently disarm the tripwire (r10 review).
    some = {"q2": {"sec": 6.0, "budget": 2.0, "limit": 3.0}}
    assert bench.breaches_are_fatal(some, bench.CALIBRATION_CPUS)
    assert bench.breaches_are_fatal(some, 64)
    assert not bench.breaches_are_fatal(some, 8)
    assert not bench.breaches_are_fatal(some, 16)
    assert not bench.breaches_are_fatal({}, bench.CALIBRATION_CPUS)


def test_confirmed_breaches_real_regression_persists():
    # r11 (VERDICT r10 #1): an injected real single-query regression
    # reproduces in the confirming re-pass and MUST stay fatal.
    t = _at_budget()
    t["q2"] = 6.0
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert list(breaches) == ["q2"]
    confirmed = bench.confirmed_breaches(breaches, {"q2": 5.8})
    assert list(confirmed) == ["q2"]
    assert confirmed["q2"]["confirm_sec"] == 5.8
    assert bench.breaches_are_fatal(confirmed, bench.CALIBRATION_CPUS)


def test_confirmed_breaches_weather_gust_clears():
    # The r10 driver scenario: cohort_retention breached at capped
    # inflation (1.284 s vs limit 1.193) while the same query minutes
    # later read 0.516 s.  A confirming measurement back inside the
    # limit must clear the breach — rc=0, nothing fatal.
    t = _at_budget()
    t["q2"] = 6.0
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    confirmed = bench.confirmed_breaches(breaches, {"q2": 2.1})
    assert confirmed == {}
    assert not bench.breaches_are_fatal(confirmed, bench.CALIBRATION_CPUS)


def test_confirmed_breaches_fail_closed_without_confirmation():
    # A breach with no confirming measurement (registry miss, crash in
    # the confirm loop) must stay fatal — the confirm pass may only
    # absorb breaches it positively re-measured under the limit.
    t = _at_budget()
    t["q2"] = 6.0
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    confirmed = bench.confirmed_breaches(breaches, {})
    assert list(confirmed) == ["q2"]
    assert bench.breaches_are_fatal(confirmed, bench.CALIBRATION_CPUS)


def test_confirmed_breaches_exact_limit_boundary_clears():
    # The confirm comparison uses the SAME limit as the original breach
    # (no re-normalization): a confirm reading exactly AT the limit is
    # inside it — same strict-inequality semantics as compute_breaches.
    t = _at_budget()
    t["q2"] = 6.0
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    limit = breaches["q2"]["limit"]
    confirmed = bench.confirmed_breaches(breaches, {"q2": limit})
    assert confirmed == {}


def test_jitter_floor_not_inflated():
    # ADVICE r06 #1: the +0.5 s floor must NOT scale with session
    # inflation — in a 1.4×-hot (band-edge) session, a 0.3 s-budget
    # query at 0.95 s is a real regression (old formula absorbed it at
    # limit 1.4·max(0.45, 0.8) = 1.12; new limit max(1.4·0.45, 0.8) =
    # 0.8 fires), while the same query at hot-session jitter levels
    # (1.4·0.3 + 0.3 ≈ 0.72) stays inside the un-inflated floor.
    t = {n: 1.4 * b for n, b in BUDGETS.items()}
    t["q3"] = 0.95  # budget 0.3
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert "q3" in breaches
    t["q3"] = 0.72
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert breaches == {}
