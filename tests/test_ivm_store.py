"""Stored-state IVM for the packed-window accounting
(`taipei_bi_etl_spark.ivm_store`): multi-step append == full
recompute, idempotent retry after a simulated crash, and the
append-only contract check."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from taipei_bi_etl_spark import ivm_store
from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries.curation2 import (
    _offsets_from,
    _windows_from,
)
from tests.conftest import SF_DIR


def _full_accounting(spark, docs):
    d = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    off = _offsets_from(spark, d)
    return [] if off is None else sorted(
        _windows_from(off).collect(), key=lambda r: r["chunk_id"]
    )


def _state_rows(spark, state_dir):
    acc, total, max_id, v = ivm_store.read_state(spark, state_dir)
    return sorted(acc.collect(), key=lambda r: r["chunk_id"]), total, max_id, v


@pytest.fixture()
def docs(spark):
    return read_table(spark, SF_DIR, "documents")


def _batches(docs, cuts):
    """Split docs into doc_id-range batches at the given cut points."""
    lo = None
    out = []
    for hi in [*cuts, None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") < hi)
        out.append(docs.filter(cond))
        lo = hi
    return out


def test_three_appends_equal_full_recompute(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    b0, b1, b2, b3 = _batches(docs, [12, 25, 40])
    assert ivm_store.pack_state_init(spark, b0, state) == 1
    for i, b in enumerate((b1, b2, b3)):
        assert ivm_store.pack_state_append(spark, b, state) == i + 2
    rows, total, max_id, v = _state_rows(spark, state)
    assert v == 4
    assert rows == _full_accounting(spark, docs)
    d = docs.select(
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("long").alias("n")
    )
    assert total == d.agg(F.sum("n")).collect()[0][0]


def test_crash_retry_is_idempotent(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    b0, b1 = _batches(docs, [25])
    ivm_store.pack_state_init(spark, b0, state)
    ivm_store.pack_state_append(spark, b1, state)
    want = _state_rows(spark, state)
    # simulate a crash between data write and commit marker: delete the
    # marker so v2 looks uncommitted, then retry the same append
    os.remove(os.path.join(state, "v000002", "_COMMITTED"))
    assert ivm_store.latest_version(state) == 1
    assert ivm_store.pack_state_append(spark, b1, state) == 2
    assert _state_rows(spark, state) == want


def test_append_only_contract_enforced(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    b0, b1 = _batches(docs, [25])
    ivm_store.pack_state_init(spark, b1, state)  # higher ids first
    with pytest.raises(ValueError, match="append-only"):
        ivm_store.pack_state_append(spark, b0, state)


def test_empty_batch_bumps_version_without_change(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    ivm_store.pack_state_init(spark, docs, state)
    rows0, total0, max0, _ = _state_rows(spark, state)
    empty = docs.filter(F.lit(False))
    assert ivm_store.pack_state_append(spark, empty, state) == 2
    rows1, total1, max1, v = _state_rows(spark, state)
    assert (rows1, total1, max1, v) == (rows0, total0, max0, 2)


def test_empty_init_then_append(spark, docs, tmp_path):
    state = str(tmp_path / "state")
    ivm_store.pack_state_init(spark, docs.filter(F.lit(False)), state)
    acc, total, max_id, _ = ivm_store.read_state(spark, state)
    assert (acc.count(), total, max_id) == (0, 0, -1)
    ivm_store.pack_state_append(spark, docs, state)
    rows, total, _, _ = _state_rows(spark, state)
    assert rows == _full_accounting(spark, docs)


# ---------------------------------------------------------------------------
# Stored-state retention IVM: daily advances == full recompute.
# ---------------------------------------------------------------------------


def _pivot_rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()]
    )


@pytest.fixture()
def events(spark):
    return read_table(spark, SF_DIR, "events")


def test_retention_daily_advances_equal_full(spark, events, tmp_path):
    from taipei_bi_etl_spark.queries.retention import _pivot_from_events

    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    assert ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-27")), state, "2024-01-27"
    ) == 1
    for i, d in enumerate(("2024-01-28", "2024-01-29", "2024-01-30")):
        assert ivm_store.retention_state_advance(
            spark, events.filter(day == F.lit(d)), state
        ) == i + 2
    _, pivot, as_of, v = ivm_store.read_retention_state(spark, state)
    assert (as_of, v) == ("2024-01-30", 4)
    want = _pivot_from_events(events, "2024-01-30")
    assert _pivot_rows(pivot) == _pivot_rows(want)


def test_retention_one_day_contract_enforced(spark, events, tmp_path):
    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-28")), state, "2024-01-28"
    )
    with pytest.raises(ValueError, match="one-day-advance"):
        ivm_store.retention_state_advance(
            spark, events.filter(day == F.lit("2024-01-30")), state
        )


def test_retention_crash_retry_is_idempotent(spark, events, tmp_path):
    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-29")), state, "2024-01-29"
    )
    batch = events.filter(day == F.lit("2024-01-30"))
    ivm_store.retention_state_advance(spark, batch, state)
    _, pivot, as_of, v = ivm_store.read_retention_state(spark, state)
    want = _pivot_rows(pivot)
    os.remove(os.path.join(state, "v000002", "_COMMITTED"))
    assert ivm_store.latest_version(state) == 1
    assert ivm_store.retention_state_advance(spark, batch, state) == 2
    _, pivot2, as_of2, _ = ivm_store.read_retention_state(spark, state)
    assert (_pivot_rows(pivot2), as_of2) == (want, "2024-01-30")


def test_pack_double_apply_fails_closed(spark, docs, tmp_path):
    """Crash AFTER the commit marker: re-applying the same batch must
    raise (append-only check), never double-count — the fail-closed
    half of the recovery contract."""
    state = str(tmp_path / "state")
    b0, b1 = _batches(docs, [25])
    ivm_store.pack_state_init(spark, b0, state)
    ivm_store.pack_state_append(spark, b1, state)  # committed OK
    with pytest.raises(ValueError, match="append-only"):
        ivm_store.pack_state_append(spark, b1, state)


def test_retention_double_apply_fails_closed(spark, events, tmp_path):
    state = str(tmp_path / "ret")
    day = F.to_date("ts")
    ivm_store.retention_state_init(
        spark, events.filter(day <= F.lit("2024-01-29")), state, "2024-01-29"
    )
    batch = events.filter(day == F.lit("2024-01-30"))
    ivm_store.retention_state_advance(spark, batch, state)  # committed OK
    with pytest.raises(ValueError, match="one-day-advance"):
        ivm_store.retention_state_advance(spark, batch, state)


# ---------------------------------------------------------------------------
# Embedding LSH bucket-index store (r10, VERDICT r09 #1).
# ---------------------------------------------------------------------------


def _emb_corpus(spark):
    from taipei_bi_etl_spark.queries.similarity import _corpus_with_norm

    return _corpus_with_norm(spark, SF_DIR).select("vec_id", "emb", "norm")


def test_emb_index_store_advance_equals_full(spark, tmp_path):
    """Stored-state N-batch advance ≡ full recompute: init with batch
    1, advance with batches 2 and 3 — init-batch self-pairs ∪ the two
    advances' probe pairs equals the full bucketed run
    (`dedup_embedding_lsh`); history vectors are never re-hashed (each
    advance computes signatures for its own batch only)."""
    from taipei_bi_etl_spark.ivm_store import (
        emb_index_advance,
        emb_index_init,
        read_emb_state,
    )
    from taipei_bi_etl_spark.queries.similarity import (
        _lsh_bucket_index,
        dedup_embedding_lsh,
        emb_pairs_from_index,
    )

    corpus = _emb_corpus(spark).persist()
    ids = sorted(r.vec_id for r in corpus.select("vec_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    b1 = corpus.filter(F.col("vec_id") <= c1)
    b2 = corpus.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2))
    b3 = corpus.filter(F.col("vec_id") > c2)

    sd = str(tmp_path / "emb_state")
    emb_index_init(spark, b1, sd)
    bands1 = _lsh_bucket_index(b1)
    got = {
        (r.vec_a, r.vec_b, r.cosine_sim)
        for r in emb_pairs_from_index(bands1, bands1, b1).collect()
    }
    bands1.unpersist()
    for batch in (b2, b3):
        pairs, _v = emb_index_advance(spark, batch, sd)
        got |= {(r.vec_a, r.vec_b, r.cosine_sim) for r in pairs.collect()}
    want = {
        (r.vec_a, r.vec_b, r.cosine_sim)
        for r in dedup_embedding_lsh(spark, SF_DIR).collect()
    }
    assert want and got == want
    _idx, _vecs, watermark, n_vecs, v = read_emb_state(spark, sd)
    assert v == 3
    assert n_vecs == corpus.count()
    assert watermark == ids[-1]

    # append-only contract: replaying batch 3 must fail loudly
    with pytest.raises(ValueError, match="append-only"):
        emb_index_advance(spark, b3, sd)
    corpus.unpersist()


def test_emb_index_store_equals_in_plan_ivm(spark, tmp_path):
    """The store run at the registered query's OWN split (quantile
    cut) reproduces `dedup_embedding_incremental` frame-exactly —
    the stored-index deployment form and the hash-proven in-plan
    identity are the same computation with yesterday's term read from
    parquet instead of re-derived."""
    from taipei_bi_etl_spark.ivm_store import (
        emb_index_advance,
        emb_index_init,
    )
    from taipei_bi_etl_spark.queries.incremental import quantile_cut_split
    from taipei_bi_etl_spark.queries.similarity import (
        _lsh_bucket_index,
        dedup_embedding_incremental,
        emb_pairs_from_index,
    )

    corpus = _emb_corpus(spark).persist()
    hist, new = quantile_cut_split(corpus, "vec_id")
    sd = str(tmp_path / "emb_state")
    emb_index_init(spark, hist, sd)
    hist_bands = _lsh_bucket_index(hist)
    yesterday = {
        (r.vec_a, r.vec_b, r.cosine_sim)
        for r in emb_pairs_from_index(hist_bands, hist_bands, hist).collect()
    }
    hist_bands.unpersist()
    delta, _v = emb_index_advance(spark, new, sd)
    got = yesterday | {
        (r.vec_a, r.vec_b, r.cosine_sim) for r in delta.collect()
    }
    want = {
        (r.vec_a, r.vec_b, r.cosine_sim)
        for r in dedup_embedding_incremental(spark, SF_DIR).collect()
    }
    assert want and got == want
    corpus.unpersist()


# ---------------------------------------------------------------------------
# MinHash band-index store + version GC (r10).
# ---------------------------------------------------------------------------


def test_minhash_index_store_advance_equals_full(spark, tmp_path):
    """Stored-state N-batch advance ≡ full recompute for the MinHash
    family (the last banded family without a deployment-shape store):
    init-batch self-pairs ∪ two advances' probe pairs equals
    `dedup_minhash_lsh`; history is never re-sketched."""
    from taipei_bi_etl_spark.ivm_store import (
        minhash_index_advance,
        minhash_index_init,
        read_minhash_state,
    )
    from taipei_bi_etl_spark.queries.dedup import (
        _doc_shingle_hashes,
        dedup_minhash_lsh,
        minhash_band_index,
        minhash_pairs_from_index,
    )

    docs_sh = _doc_shingle_hashes(spark, SF_DIR).persist()
    ids = sorted(r.doc_id for r in docs_sh.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    import pyspark.sql.functions as F

    b1 = docs_sh.filter(F.col("doc_id") <= c1)
    b2 = docs_sh.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2))
    b3 = docs_sh.filter(F.col("doc_id") > c2)

    sd = str(tmp_path / "mh_state")
    minhash_index_init(spark, b1, sd)
    idx1 = minhash_band_index(b1)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_pairs_from_index(
            idx1, idx1, normalized=False
        ).collect()
    }
    for batch in (b2, b3):
        pairs, _v = minhash_index_advance(spark, batch, sd)
        got |= {(r.doc_a, r.doc_b, r.jaccard) for r in pairs.collect()}
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    assert want and got == want
    _idx, watermark, n_docs, v = read_minhash_state(spark, sd)
    assert v == 3 and watermark == ids[-1]
    assert n_docs == docs_sh.count()
    with pytest.raises(ValueError, match="append-only"):
        minhash_index_advance(spark, b3, sd)
    docs_sh.unpersist()


def test_gc_versions_keeps_newest_and_live_state(spark, tmp_path):
    """gc_versions prunes old committed versions (keep-newest-N), never
    the latest, removes dead crashed-attempt dirs but leaves an
    in-flight attempt NEWER than the latest commit."""
    import pyspark.sql.functions as F

    from taipei_bi_etl_spark.ivm_store import (
        emb_index_advance,
        emb_index_init,
        gc_versions,
        latest_version,
        read_emb_state,
    )
    from taipei_bi_etl_spark.queries.similarity import _corpus_with_norm

    corpus = _corpus_with_norm(spark, SF_DIR).select(
        "vec_id", "emb", "norm"
    )
    ids = sorted(r.vec_id for r in corpus.select("vec_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    sd = str(tmp_path / "emb_state")
    emb_index_init(spark, corpus.filter(F.col("vec_id") <= c1), sd)
    for lo, hi in ((c1, c2), (c2, None)):
        batch = corpus.filter(F.col("vec_id") > lo)
        if hi is not None:
            batch = batch.filter(F.col("vec_id") <= hi)
        pairs, _ = emb_index_advance(spark, batch, sd)
        pairs.count()
    assert latest_version(sd) == 3
    # a dead crashed attempt below the latest commit, and an in-flight
    # attempt above it
    os.makedirs(os.path.join(sd, "v000002_tmp"), exist_ok=True)  # junk name: ignored
    os.rename(
        os.path.join(sd, "v000002_tmp"), os.path.join(sd, "v000099")
    )  # in-flight (no marker, newer than v3)
    dead = os.path.join(sd, "v000000")  # dead attempt older than v3
    os.makedirs(dead, exist_ok=True)

    removed = gc_versions(sd, keep=1)
    assert removed == [0, 1, 2]
    assert latest_version(sd) == 3
    assert os.path.isdir(os.path.join(sd, "v000099"))  # in-flight kept
    # live state still readable after GC
    _i, _vecs, _wm, n_vecs, v = read_emb_state(spark, sd)
    assert v == 3 and n_vecs == len(ids)
    # keep clamps to >= 1: never removes the only live version
    assert gc_versions(sd, keep=0) == []
    assert latest_version(sd) == 3


# ---------------------------------------------------------------------------
# SemDeDup trained-state store (r10 — twelfth incremental form, frozen
# codebook).
# ---------------------------------------------------------------------------


def _semd_quant(spark):
    from pyspark.sql import functions as F

    from taipei_bi_etl_spark.queries.ann_deterministic import PICO
    from taipei_bi_etl_spark.queries.emb_common import read_embeddings

    return read_embeddings(spark, SF_DIR).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * PICO).cast("long"),
        ).alias("qv"),
    )


def test_semdedup_state_advance_equals_frozen_full(spark, tmp_path):
    """The twelfth incremental form — and the first TRAINED-STATE one:
    with the codebook FROZEN at init (the production pattern; the
    registered query retrains, a documented semantic difference), the
    per-pair-local drop rule decomposes exactly:
    doomed_frozen(b1 ∪ b2 ∪ b3) = doomed(init self-pairs) ∪
    advance(b2) ∪ advance(b3), frame-exact on the real corpus."""
    import pyspark.sql.functions as F

    from taipei_bi_etl_spark.ivm_store import (
        _semd_members,
        read_semdedup_state,
        semdedup_state_advance,
        semdedup_state_init,
    )
    from taipei_bi_etl_spark.queries.semdedup import semdedup_doomed_ids

    quant = _semd_quant(spark).persist()
    ids = sorted(r.vec_id for r in quant.select("vec_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    b1 = quant.filter(F.col("vec_id") <= c1)
    b2 = quant.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2))
    b3 = quant.filter(F.col("vec_id") > c2)

    sd = str(tmp_path / "semd_state")
    semdedup_state_init(spark, b1, sd)
    members1, cent_df, _wm, _n, _v = read_semdedup_state(spark, sd)
    cents = [
        [int(x) for x in r["cv"]] for r in cent_df.orderBy("cell").collect()
    ]
    got = {
        r.vec_id
        for r in semdedup_doomed_ids(members1, members1).collect()
    }
    for batch in (b2, b3):
        doomed, _v = semdedup_state_advance(spark, batch, sd)
        got |= {r.vec_id for r in doomed.collect()}
    all_members = _semd_members(quant, cents)
    want = {
        r.vec_id
        for r in semdedup_doomed_ids(all_members, all_members).collect()
    }
    assert want and got == want
    # bookkeeping advanced; replay fails closed
    _m, _c, watermark, n_vecs, v = read_semdedup_state(spark, sd)
    assert v == 3 and watermark == ids[-1] and n_vecs == len(ids)
    with pytest.raises(ValueError, match="append-only"):
        semdedup_state_advance(spark, b3, sd)
    quant.unpersist()


def test_semdedup_advance_can_doom_a_history_id(spark, tmp_path):
    """Unique among the twelve forms: a new arrival can out-rank an OLD
    member (higher centroid cosine loses), so the advance must emit
    HISTORY ids — pinned on a planted pair where the batch vector is
    farther from the frozen centroid than the history vector it
    collides with."""
    from taipei_bi_etl_spark.ivm_store import (
        semdedup_state_advance,
        semdedup_state_init,
    )

    hist = spark.createDataFrame(
        [(0, [1_000_000, 0, 0, 0])], "vec_id long, qv array<long>"
    )
    sd = str(tmp_path / "semd_tiny")
    semdedup_state_init(spark, hist, sd)
    batch = spark.createDataFrame(
        [(2, [980_000, 199_000, 0, 0])], "vec_id long, qv array<long>"
    )
    doomed, v = semdedup_state_advance(spark, batch, sd)
    # centroid == v0 (trained on it alone): csim(v0)=1.0 > csim(v2)
    # ≈0.98, pair cos ≈0.98 ≥ T → the HISTORY id 0 is doomed
    assert {r.vec_id for r in doomed.collect()} == {0}
    assert v == 2
