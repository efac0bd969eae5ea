"""Third-opinion tests for the classifier-eval operators: AUC and the
PR curve recomputed from first principles in pure Python over the real
sf0.001 parquet — independent of both the Spark and DuckDB forms."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from tests.conftest import SF_DIR

KNUTH = 2654435761
MOD = 1000000007
N_BUCKETS = 64


@pytest.fixture(scope="module")
def scored_pdf() -> list[tuple]:
    """(doc_id, source, score_micros, label) recomputed from scratch."""
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    out = []
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"]) if t]
        if not toks:
            continue
        tw = 0
        for t in toks:
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % MOD
            tw += ((h % N_BUCKETS) + 1) * KNUTH % 1001 - 500
        # int() truncates toward zero like Spark DIV / DuckDB int //
        sm = int(tw * 1_000_000 / len(toks))
        y = 1 if sm + ((int(r["doc_id"]) % 4294967296) * 1327217885 % 997 - 498) * 200_000 >= 0 else 0
        out.append((int(r["doc_id"]), r["source"], sm, y))
    return out


def _auc_exact(pairs: list[tuple[int, int]]) -> tuple[int, int, int, int]:
    """(n_pos, n_neg, u2, auc_micros) with tie-averaged ranks — the
    textbook O(n log n) form, no bucketing."""
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    by_score = sorted(pairs)
    # doubled tie-averaged rank sum over positives
    s2 = 0
    i = 0
    while i < len(by_score):
        j = i
        while j < len(by_score) and by_score[j][0] == by_score[i][0]:
            j += 1
        # ranks i+1 .. j occupy this tie bucket; 2*avgrank = (i+1)+(j)
        for k in range(i, j):
            if by_score[k][1] == 1:
                s2 += (i + 1) + j
        i = j
    u2 = s2 - n_pos * (n_pos + 1)
    if n_pos == 0 or n_neg == 0:
        return n_pos, n_neg, u2, -1
    return n_pos, n_neg, u2, u2 * 1_000_000 // (2 * n_pos * n_neg)


def test_auc_matches_python(spark, scored_pdf):
    from taipei_bi_etl_spark.queries.ml_eval import classifier_auc_eval

    want = {}
    per_src: dict = {}
    for _, src, sm, y in scored_pdf:
        per_src.setdefault(src, []).append((sm, y))
    for src, pairs in per_src.items():
        want[src] = _auc_exact(pairs)
    got = {
        r["source"]: (r["n_pos"], r["n_neg"], r["u2"], r["auc_micros"])
        for r in classifier_auc_eval(spark, SF_DIR).collect()
    }
    assert got == want


def test_pr_curve_matches_python(spark, scored_pdf):
    from taipei_bi_etl_spark.queries.ml_eval import (
        _THRESHOLDS,
        classifier_pr_curve,
    )

    want = {}
    for t in _THRESHOLDS:
        tp = sum(1 for _, _, sm, y in scored_pdf if sm >= t and y == 1)
        fp = sum(1 for _, _, sm, y in scored_pdf if sm >= t and y == 0)
        fn = sum(1 for _, _, sm, y in scored_pdf if sm < t and y == 1)
        prec = tp * 1_000_000 // (tp + fp) if tp + fp else -1
        rec = tp * 1_000_000 // (tp + fn) if tp + fn else -1
        want[t] = (tp, fp, fn, prec, rec)
    got = {
        r["thr"]: (
            r["tp"], r["fp"], r["fn"],
            r["precision_micros"], r["recall_micros"],
        )
        for r in classifier_pr_curve(spark, SF_DIR).collect()
    }
    assert got == want


def test_auc_identity_on_known_case(spark):
    """Hand-checkable fixture: scores [1,2,2,3], labels [0,1,0,1] →
    ranks 1, 2.5, 2.5, 4; rank-sum over positives 6.5, U = 6.5 − 3 =
    3.5, AUC = 3.5/4 = 0.875."""
    assert _auc_exact([(1, 0), (2, 1), (2, 0), (3, 1)]) == (
        2, 2, 7, 875000,
    )


def test_auc_equals_pairwise_probability():
    """Property (hypothesis): the tie-averaged rank statistic equals
    the pairwise definition  AUC = [#(pos>neg) + ½·#(pos=neg)] /
    (n_pos·n_neg)  on arbitrary score/label multisets."""
    from hypothesis import given, strategies as st

    @given(
        st.lists(
            st.tuples(st.integers(-5, 5), st.integers(0, 1)),
            min_size=2,
            max_size=60,
        )
    )
    def check(pairs):
        n_pos, n_neg, u2, auc = _auc_exact(pairs)
        if n_pos == 0 or n_neg == 0:
            assert auc == -1
            return
        wins = halves = 0
        for sp, yp in pairs:
            if yp != 1:
                continue
            for sn, yn in pairs:
                if yn != 0:
                    continue
                if sp > sn:
                    wins += 1
                elif sp == sn:
                    halves += 1
        assert u2 == 2 * wins + halves
        assert auc == (2 * wins + halves) * 1_000_000 // (
            2 * n_pos * n_neg
        )

    check()
