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
    # plan change — nothing may fire.
    hot = {n: 1.9 * b for n, b in BUDGETS.items()}
    infl, breaches = bench.compute_breaches(hot, BUDGETS)
    assert abs(infl - 1.9) < 1e-9
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
    # A 0.3 s query at 0.75 s is inside the +0.5 s absolute floor —
    # per-query jitter on tiny entries must not fire.
    t = _at_budget()
    t["q3"] = 0.79
    infl, breaches = bench.compute_breaches(t, BUDGETS)
    assert breaches == {}


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
    # r06 code review: inflation is capped, so a session-wide genuine
    # regression (flipped conf, codegen fallback) that slows EVERY
    # query 3x must still redden the run — only weather-band uniform
    # inflation (< 2x) is absorbed.
    hot = {n: 3.0 * b for n, b in BUDGETS.items()}
    infl, breaches = bench.compute_breaches(hot, BUDGETS)
    assert infl == 2.0  # capped
    # every multi-second entry is past 2.0 * 1.5 = 3.0x? exactly at
    # 3.0x the budget == the limit -> not strictly greater; use 3.2x
    hot = {n: 3.2 * b for n, b in BUDGETS.items()}
    infl, breaches = bench.compute_breaches(hot, BUDGETS)
    assert breaches, "uniform catastrophic slowdown must fire"
