"""Strict-props guard pair (r06 VERDICT #3 + ADVICE #4): Spark's
``functions.json_strict`` and DuckDB's ``functions.json_valid_strict_sql``
must ADMIT and REJECT exactly the same shapes — including the formerly
one-way residuals (trailing garbage: Spark's parser alone accepts;
nested duplicate keys: DuckDB's json_valid alone accepts).  The textual
contract (object root / balance / no concatenated roots / no repeated
key text, computed identically in both engines) closes both directions.
"""

from __future__ import annotations

import duckdb
import pytest

from taipei_bi_etl_spark import functions as FN

# (shape, expected_admitted) — expected is the AGREED contract value.
SHAPES = [
    # plain valid objects: admitted
    ('{"k": 1}', True),
    ("{}", True),
    ('  {"k": 1}  ', True),
    ('{"k": "v", "j": [1, 2, {"x": true}]}', True),
    ('{"a": {"b": {"c": 1}}}', True),
    ('{"k": 1e999}', True),  # overflow number: valid JSON, both admit
    ('{"k": null}', True),
    ('{"a":"b:c","d":1}', True),  # colon inside a string value
    ('{"a:b": 1}', True),  # colon inside a KEY
    ('{"k": "{ ] } : , nan"}', True),  # JSON punctuation + nan in a string
    ('{"k": 10, "note": "\\"k\\": 11 looks like a key"}', True),
    ('{"k": "a\\\\"}', True),  # value ending in an escaped backslash
    ('{"πκ": "ünïcode"}', True),
    # malformed: rejected by both parsers
    (None, False),
    ("", False),
    ("   ", False),
    ("not json {", False),
    ("{'k': 1}", False),
    # trailing commas: DuckDB's json_valid is LENIENT here (probed:
    # '{"k":1,}' and '[1,2,]' are json_valid=true) while Spark rejects
    # — textual rule 5 (no ',' before a close) excludes identically
    ('{"k": 1,}', False),
    ('{"k": [1,]}', False),
    ('{"k": [1,],}', False),
    # non-object roots: rejected by the object-root contract
    ("[1, 2]", False),
    ('"scalar"', False),
    ("42", False),
    # duplicate keys — any depth (Spark rejects; textual rule 4 makes
    # DuckDB reject too)
    ('{"k": 1, "k": 2}', False),
    ('{"a": {"k": 1, "k": 2}}', False),
    ('{"a": [{"k": 7, "k": 8}], "k": 9}', False),
    ('{"a": [[{"k": 1, "k": 2}]]}', False),
    # conservative rule-4 rejection: same key text in DIFFERENT objects
    # (legal JSON both parsers accept — the agreed contract quarantines)
    ('{"a": {"k": 1}, "b": {"k": 2}}', False),
    # bare nan / inf at any depth (DuckDB json_valid accepts)
    ("nan", False),
    ('{"j": nan}', False),
    ('{"k": [1, Infinity]}', False),
    ('{"k": -inf}', False),
    # trailing garbage — every variant (Spark's parser accepts all)
    ('{"k": 3} x', False),
    ('{"k": 4}}', False),
    ('{"k": 5} {"k": 6}', False),
    ('{"k": 1} [1]', False),
    ('{"k": 1} "x"', False),
    ('{"k": 1} 5', False),
    ('{"k": 1} nan', False),
]


@pytest.fixture(scope="module")
def verdicts(spark):
    rows = [(i, s) for i, (s, _) in enumerate(SHAPES)]
    df = spark.createDataFrame(rows, "i int, props string")
    got_spark = {
        r.i: bool(r.ok)
        for r in df.select(
            "i",
            FN.json_strict(df.props).eqNullSafe(True).alias("ok"),
        ).collect()
    }
    con = duckdb.connect()
    got_duck = {}
    for i, (s, _) in enumerate(SHAPES):
        pred = FN.json_valid_strict_sql("props")
        got_duck[i] = bool(
            con.execute(
                f"SELECT COALESCE({pred}, FALSE) FROM (SELECT ? AS props)",
                [s],
            ).fetchone()[0]
        )
    return got_spark, got_duck


def test_engines_agree_on_every_shape(verdicts):
    got_spark, got_duck = verdicts
    diverged = [
        (SHAPES[i][0], got_spark[i], got_duck[i])
        for i in range(len(SHAPES))
        if got_spark[i] != got_duck[i]
    ]
    assert diverged == [], f"engine divergence: {diverged}"


def test_contract_values(verdicts):
    got_spark, _ = verdicts
    wrong = [
        (s, got_spark[i], want)
        for i, (s, want) in enumerate(SHAPES)
        if got_spark[i] != want
    ]
    assert wrong == [], f"contract drift: {wrong}"


def test_documented_residual_unicode_escaped_nested_dup():
    """The ONE remaining one-way shape, pinned with its direction: a
    nested duplicate key written once plainly and once as a unicode
    escape (``"k"`` vs ``"\\u006b"``).  Spark decodes escapes before
    duplicate detection (rejects); the textual rule sees two different
    key texts and DuckDB's json_keys only reads the top level (admits).
    Corpora must not contain unicode-escaped keys — if this test ever
    FAILS, the residual closed and the docstring in functions.py
    should be updated."""
    con = duckdb.connect()
    shape = '{"a": {"k": 1, "\\u006b": 2}}'
    pred = FN.json_valid_strict_sql("props")
    duck = bool(
        con.execute(
            f"SELECT COALESCE({pred}, FALSE) FROM (SELECT ? AS props)",
            [shape],
        ).fetchone()[0]
    )
    assert duck is True  # DuckDB admits (documented direction)
    # Spark rejects — asserted via try_parse_json semantics in the
    # module-level battery would need a session; the direction that
    # MATTERS for oracle parity is that corpora exclude the shape,
    # which tools/hostile_corpus_sweep.py's battery deliberately does.


def test_top_level_unicode_escaped_dup_still_caught():
    """At the TOP level the decoded json_keys term does catch the
    escaped duplicate — only the nested form is residual."""
    con = duckdb.connect()
    shape = '{"k": 1, "\\u006b": 2}'
    pred = FN.json_valid_strict_sql("props")
    duck = bool(
        con.execute(
            f"SELECT COALESCE({pred}, FALSE) FROM (SELECT ? AS props)",
            [shape],
        ).fetchone()[0]
    )
    assert duck is False
