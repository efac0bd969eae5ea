"""BPE merge training pinned against a pure-Python reference, plus
sampler quota invariants (the oracle hash covers value equality)."""

from __future__ import annotations

from collections import Counter

from taipei_bi_etl_spark.queries.tokenizer import (
    N_MERGES,
    SAMPLE_K,
    bpe_train_merges,
    stratified_fixed_k_sample,
)
from tests.conftest import SF_DIR


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE: same tie-break (count desc, then (l, r) asc)."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark, duck):
    counts = dict(
        duck.execute(
            "SELECT t, COUNT(*) FROM (SELECT unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))"
            " AS t FROM documents) GROUP BY t"
        ).fetchall()
    )
    expected = _python_bpe(counts, N_MERGES)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(spark, SF_DIR).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_bpe_merged_symbols_are_concatenations(spark):
    rows = bpe_train_merges(spark, SF_DIR).collect()
    assert len(rows) == N_MERGES
    seen = set()
    for r in sorted(rows, key=lambda r: r.merge_rank):
        # every symbol is a single char or a previously produced merge
        for s in (r.left, r.right):
            assert len(s) == 1 or s in seen, (s, seen)
        assert r.pair_count > 0
        seen.add(r.left + r.right)


def test_fixed_k_sample_quota_and_stability(spark):
    df = stratified_fixed_k_sample(spark, SF_DIR)
    rows = df.collect()
    per_source = Counter(r.source for r in rows)
    assert all(v <= SAMPLE_K for v in per_source.values())
    assert all(1 <= r.sample_rank <= SAMPLE_K for r in rows)
    # content-addressed: a different physical layout yields the same set
    again = {(r.source, r.doc_id) for r in stratified_fixed_k_sample(spark, SF_DIR).collect()}
    assert {(r.source, r.doc_id) for r in rows} == again


def _python_encode(word: str, merges) -> int:
    out: list[str] = []
    syms = list(word)
    for _, l, r, _ in merges:
        out = []
        for x in syms:
            if out and out[-1] == l and x == r:
                out[-1] = l + r
            else:
                out.append(x)
        syms = out
    return len(syms)


def test_bpe_encode_matches_python_reference(spark, duck):
    from taipei_bi_etl_spark.queries.tokenizer import bpe_encode_apply

    counts = duck.execute(
        "SELECT source, t, COUNT(*) FROM (SELECT source, unnest(list_filter("
        "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))"
        " AS t FROM documents) GROUP BY source, t"
    ).fetchall()
    word_freq: Counter = Counter()
    for _, w, k in counts:
        word_freq[w] += k
    merges = _python_bpe(dict(word_freq), N_MERGES)
    expected: dict[str, tuple[int, int]] = {}
    for src, w, k in counts:
        tw, tp = expected.get(src, (0, 0))
        expected[src] = (tw + k, tp + k * _python_encode(w, merges))
    got = {
        r.source: (r.total_words, r.total_pieces)
        for r in bpe_encode_apply(spark, SF_DIR).collect()
    }
    assert got == expected
