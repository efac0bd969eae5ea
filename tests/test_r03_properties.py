"""Property tests for the round-3 operators against independent
pure-Python references: randomized corpora/graphs, semantics recomputed
from first principles (no Spark, no SQL), compared exactly.  These
close the "same author wrote both transcriptions" hole the same way
test_feature_mapping's Python model does for D4."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries.suffix import WINDOW


# ---------------------------------------------------------------------------
# ExactSubstr spans vs a brute-force reference (both physical forms).
# ---------------------------------------------------------------------------


def _py_spans(docs: dict[int, list[str]], w: int) -> set[tuple[int, int, int]]:
    """Reference: group positions by their literal w-token window across
    the whole corpus, keep windows occurring >= 2 times, merge per-doc
    positions whose gap <= w into maximal runs."""
    from collections import defaultdict

    occ: dict[tuple[str, ...], list[tuple[int, int]]] = defaultdict(list)
    for did, toks in docs.items():
        for p in range(1, len(toks) - w + 2):
            occ[tuple(toks[p - 1 : p - 1 + w])].append((did, p))
    dup_pos: dict[int, list[int]] = defaultdict(list)
    for positions in occ.values():
        if len(positions) >= 2:
            for did, p in positions:
                dup_pos[did].append(p)
    out = set()
    for did, ps in dup_pos.items():
        ps = sorted(set(ps))
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > w:
                out.add((did, start, prev - start + w))
                start = p
            prev = p
        out.add((did, start, prev - start + w))
    return out


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_substring_spans_both_forms_match_python_reference(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab → many duplicates
    docs = {}
    for did in range(12):
        n = rng.randrange(WINDOW, 60)
        docs[did] = [rng.choice(vocab) for _ in range(n)]
    # inject a guaranteed shared passage across two docs
    passage = [rng.choice(vocab) for _ in range(WINDOW + 5)]
    docs[100] = passage + [rng.choice(vocab) for _ in range(9)]
    docs[101] = [rng.choice(vocab) for _ in range(3)] + passage

    pdf = pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": [" ".join(t) for t in docs.values()],
            "lang": "en",
            "source": "s",
            "n_chars": [len(" ".join(t)) for t in docs.values()],
        }
    )
    d = str(tmp_path)
    pdf.to_parquet(f"{d}/documents.parquet")
    expected = _py_spans(docs, WINDOW)

    from taipei_bi_etl_spark.queries.suffix import (
        dedup_exact_substring_sa,
        dedup_exact_substring_spans,
    )

    got_win = {
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup_exact_substring_spans(spark, d).collect()
    }
    got_sa = {
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup_exact_substring_sa(spark, d).collect()
    }
    assert got_win == expected
    assert got_sa == expected


# ---------------------------------------------------------------------------
# Graph ops vs pure-Python references on a constructed co-purchase graph.
# ---------------------------------------------------------------------------


def _lineitem_for_orders(orders: list[list[int]]) -> pd.DataFrame:
    rows = []
    for okey, parts in enumerate(orders, start=1):
        for ln, p in enumerate(parts, start=1):
            rows.append((okey, p, 1 + p % 7, ln))
    return pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    ).assign(
        l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
        l_returnflag="N", l_linestatus="O", l_shipdate="1994-01-01",
    )


def _copurchase(orders: list[list[int]]):
    """(undirected neighbor sets, weighted edges w = 1e6 // multiplicity)."""
    from collections import defaultdict

    mult: dict[tuple[int, int], int] = defaultdict(int)
    for parts in orders:
        ps = sorted(set(parts))
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                mult[(a, b)] += 1
    nbrs: dict[int, set[int]] = defaultdict(set)
    w: dict[tuple[int, int], int] = {}
    for (a, b), m in mult.items():
        nbrs[a].add(b)
        nbrs[b].add(a)
        w[(a, b)] = w[(b, a)] = 1_000_000 // m
    return nbrs, w


def _py_lpa(nbrs, n_iter: int) -> dict[int, int]:
    labels = {u: u for u in nbrs}
    for _ in range(n_iter):
        new = {}
        for u in nbrs:
            counts: dict[int, int] = {}
            for v in nbrs[u]:
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[u] = best[0]
        labels = new
    return labels


def _py_ksp(nbrs, w, rounds: int, k: int) -> dict[int, list[int]]:
    src = min(nbrs)
    state = {src: [0]}
    for _ in range(rounds):
        new: dict[int, set[int]] = {}
        for u, dists in state.items():
            for v in list(nbrs[u]) + [u]:
                step = 0 if v == u else w[(u, v)]
                new.setdefault(v, set()).update(d + step for d in dists)
        state = {v: sorted(ds)[:k] for v, ds in new.items()}
    return state


@pytest.mark.parametrize("seed", [3, 11])
def test_graph_ops_match_python_reference(spark, tmp_path, seed):
    from taipei_bi_etl_spark.queries.graph2 import (
        KSP_K,
        KSP_ROUNDS,
        LPA_ITER,
        copurchase_k_shortest_paths,
        copurchase_label_propagation,
    )

    rng = random.Random(seed)
    parts = list(range(1, 25))
    orders = [
        rng.sample(parts, rng.randrange(2, 5)) for _ in range(40)
    ]
    d = str(tmp_path)
    _lineitem_for_orders(orders).to_parquet(f"{d}/lineitem.parquet")
    nbrs, w = _copurchase(orders)

    exp_lpa = _py_lpa(nbrs, LPA_ITER)
    got_lpa = {
        r.p_partkey: r.community
        for r in copurchase_label_propagation(spark, d).collect()
    }
    assert got_lpa == exp_lpa

    exp_ksp = _py_ksp(nbrs, w, KSP_ROUNDS, KSP_K)
    got = {}
    for r in copurchase_k_shortest_paths(spark, d).collect():
        got.setdefault(r.p_partkey, []).append((r.path_rank, r.dist_micros))
    got_ksp = {
        n: [dm for _, dm in sorted(v)] for n, v in got.items()
    }
    assert got_ksp == exp_ksp


def test_knn_label_consistency_matches_numpy(spark):
    """Third opinion for the consistency screen: numpy cosine +
    argsort with the same (sim DESC, id ASC) tie-break over the real
    sf0.001 embeddings — independent of both the Spark HOF kernel and
    the DuckDB oracle arithmetic."""
    import numpy as np
    import pyarrow.parquet as pq

    from taipei_bi_etl_spark.queries.label_quality import (
        K_NN,
        knn_label_consistency,
    )
    from tests.conftest import SF_DIR

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    labels = np.asarray(t["label"])
    emb = np.asarray([list(v) for v in t["embedding"].to_pylist()], dtype=np.float64)
    order = np.argsort(ids)
    ids, labels, emb = ids[order], labels[order], emb[order]
    norms = np.linalg.norm(emb, axis=1)
    sims = (emb @ emb.T) / np.outer(norms, norms)
    expected = {}
    n = len(ids)
    for i in range(n):
        cand = [(-sims[i, j], ids[j], j) for j in range(n) if j != i]
        cand.sort()
        top = cand[:K_NN]
        k_same = sum(1 for _, _, j in top if labels[j] == labels[i])
        expected[int(ids[i])] = (int(labels[i]), k_same, k_same * 2 < K_NN)
    got = {
        r.vec_id: (r.label, r.k_same, r.flagged)
        for r in knn_label_consistency(spark, SF_DIR).collect()
    }
    assert got == expected


def test_knn_label_consistency_jl_agrees_with_exact(spark):
    """Recall-style gate for the bucketed twin (VERDICT r03 item #2):
    the LSH-candidate + JL-shortlist screen must cover ≥99% of the
    vectors the exact kernel scores and agree on the `flagged` verdict
    for ≥90% of the covered vectors.  Also pins the r04 plan fix: the
    twin's optimized plan carries NO user broadcast hint (candidate and
    re-rank joins are plain equi-joins; AQE decides)."""
    from taipei_bi_etl_spark.queries.label_quality import (
        knn_label_consistency,
        knn_label_consistency_jl,
    )
    from tests.conftest import SF_DIR

    exact = {
        r.vec_id: r.flagged
        for r in knn_label_consistency(spark, SF_DIR).collect()
    }
    jl_df = knn_label_consistency_jl(spark, SF_DIR)
    assert "ResolvedHint" not in jl_df._jdf.queryExecution().optimizedPlan().toString()
    jl = {r.vec_id: r.flagged for r in jl_df.collect()}
    common = set(exact) & set(jl)
    assert len(common) >= 0.99 * len(exact)
    agree = sum(1 for v in common if exact[v] == jl[v])
    assert agree >= 0.9 * len(common)


def test_dedup_embedding_lsh_no_forced_corpus_broadcast(spark):
    """VERDICT r03 item #1 regression pin: the registered embedding-
    dedup path must not force-broadcast the corpus anywhere — no
    user-supplied broadcast hint survives into the optimized plan."""
    from taipei_bi_etl_spark.queries.similarity import dedup_embedding_lsh
    from tests.conftest import SF_DIR

    df = dedup_embedding_lsh(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan
