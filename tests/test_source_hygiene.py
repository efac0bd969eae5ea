"""Source-hygiene pins (VERDICT r08 #7): every file in the package,
tests, and tools compiles without ANY compile-time warning — in
particular the `invalid escape sequence` SyntaxWarning class that crept
into six oracle SQL literals (regex `\\s` inside non-raw triple-quoted
strings).  Python 3.12 warns; a future version makes it a SyntaxError,
so the pin is forward-compat, not cosmetics.  All oracle literals that
embed regexes are raw strings now; this test keeps them that way."""

from __future__ import annotations

import pathlib
import warnings

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_no_compile_warnings_anywhere():
    bad: list[tuple[str, int | None, str]] = []
    roots = ["taipei_bi_etl_spark", "tests", "tools"]
    files = [p for r in roots for p in (REPO / r).rglob("*.py")]
    files += list(REPO.glob("*.py"))  # bench.py, stress.py, entry
    assert len(files) > 100  # the walk actually found the tree
    for p in files:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            compile(p.read_text(), str(p), "exec")
        bad.extend(
            (str(p.relative_to(REPO)), w.lineno, str(w.message))
            for w in caught
        )
    assert bad == []
