"""r07 additions: paragraph dedup, incremental SimHash, retrieval eval."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_paragraph_dedup_drops_planted_duplicate(spark, tmp_path):
    """A segment repeated verbatim in a later document must be dropped
    from the later doc only; unique segments survive everywhere."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from taipei_bi_etl_spark.queries.paragraph_dedup import SEG_WORDS

    boiler = " ".join(f"b{i}" for i in range(SEG_WORDS))
    uniq_a = " ".join(f"a{i}" for i in range(SEG_WORDS))
    uniq_b = " ".join(f"c{i}" for i in range(SEG_WORDS))
    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            boiler + " " + uniq_a,  # first occurrence of boiler
            boiler + " " + uniq_b,  # duplicate boiler — must drop 1 seg
            uniq_a,                 # duplicate of doc 1's tail segment
        ],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": [1, 1, 1],
    }
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table(rows), d / "documents.parquet")
    out = {
        r.doc_id: r
        for r in REGISTRY["paragraph_dedup_report"].fn(spark, str(d)).collect()
    }
    assert out[1].n_segments == 2 and out[1].n_kept == 2
    assert out[2].n_segments == 2 and out[2].n_kept == 1
    assert out[3].n_segments == 1 and out[3].n_kept == 0
    assert abs(out[2].retained_ratio - 0.5) < 1e-9


def test_simhash_incremental_matches_full(spark):
    full = {
        tuple(r)
        for r in REGISTRY["dedup_simhash"].fn(spark, SF_DIR).collect()
    }
    inc = {
        tuple(r)
        for r in REGISTRY["dedup_simhash_incremental"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert inc == full
    # non-degenerate split
    from taipei_bi_etl_spark.queries.dedup import (
        _doc_shingles,
        simhash_fingerprints,
    )

    fps = simhash_fingerprints(_doc_shingles(spark, SF_DIR))
    assert fps.filter(F.col("doc_id") % 4 == 3).count() > 0
    assert fps.filter(F.col("doc_id") % 4 != 3).count() > 0


def test_rank_eval_metrics_sane(spark):
    rows = {r.query_id: r for r in
            REGISTRY["search_rank_eval"].fn(spark, SF_DIR).collect()}
    assert rows, "no eval queries matched"
    for qid, r in rows.items():
        assert 0 <= r.n_rel_topk <= 10
        assert r.n_rel_topk <= r.n_relevant <= r.n_matched
        assert 0 <= r.first_rel_rank <= 10
        if r.first_rel_rank == 1:
            assert r.mrr_micros == 1_000_000
        assert 0.0 <= r.ndcg_at_k <= 1.0
        if r.n_relevant > 0 and r.first_rel_rank == 0:
            assert r.dcg_micros == 0 and r.ndcg_at_k == 0.0
    # the eval must not be vacuous: at least one query has a relevant
    # hit in the top-10 and at least one NDCG is strictly inside (0,1)
    assert any(r.first_rel_rank > 0 for r in rows.values())


def test_paragraph_incremental_matches_full(spark):
    full = {
        tuple(r)
        for r in REGISTRY["paragraph_dedup_report"].fn(spark, SF_DIR).collect()
    }
    inc = {
        tuple(r)
        for r in REGISTRY["paragraph_dedup_incremental"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert inc == full and full


def test_scene_cuts_land_on_scene_boundaries(spark):
    from taipei_bi_etl_spark.queries.fingerprint import (
        SCENE_FRAMES,
        SCENE_LEN,
    )

    rows = REGISTRY["multimodal_video_scene_cuts"].fn(spark, SF_DIR).collect()
    assert rows
    boundaries = {
        str(f) for f in range(SCENE_LEN, SCENE_FRAMES, SCENE_LEN)
    }
    for r in rows:
        got = set(r.cut_frames_csv.split(",")) if r.cut_frames_csv else set()
        # cuts may only occur at scene boundaries (within-scene frames
        # are byte-identical); a boundary may be missed only by hash
        # coincidence
        assert got <= boundaries
    # non-vacuous: the overwhelming majority detect every boundary
    n_all = sum(
        1 for r in rows
        if set(r.cut_frames_csv.split(",")) == boundaries
    )
    assert n_all >= 0.9 * len(rows)


def test_audio_segments_match_silence_arithmetic(spark):
    from taipei_bi_etl_spark.queries.fingerprint import AF_FRAMES, AF_MIX_MOD

    rows = REGISTRY["multimodal_audio_segments"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        silent = [
            k for k in range(AF_FRAMES)
            if (r.media_id % AF_MIX_MOD + k) % 4 == 0
        ]
        assert r.n_silent == len(silent)
        # reconstruct expected spans
        spans, start = [], None
        for k in range(AF_FRAMES):
            if k in silent:
                if start is not None:
                    spans.append(f"{start}-{k - 1}")
                    start = None
            elif start is None:
                start = k
        if start is not None:
            spans.append(f"{start}-{AF_FRAMES - 1}")
        assert r.segments_csv == ",".join(sorted(spans))
        assert r.n_segments == len(spans)


def test_session_gap_millisecond_boundary_semantics(spark):
    """The 30-min session gap must count MILLISECOND BOUNDARIES
    (FN.unix_ms truncate-then-subtract, the oracle's
    datediff('millisecond') twin) — a fractional-ms diff
    (unix_micros/1000) would split a session whose gap is
    1800000.999 ms while the oracle does not (r07 review find)."""
    import datetime as dt

    from pyspark.sql import functions as F, Window
    from taipei_bi_etl_spark import functions as FN

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 0)
    t1 = t0 + dt.timedelta(microseconds=1_800_000_999)  # 1800000.999 ms
    ev = spark.createDataFrame(
        [(1, t0, 10), (1, t1, 11)], "user_id long, ts timestamp, event_id long"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = FN.unix_ms(F.col("ts")) - FN.unix_ms(F.lag("ts").over(w))
    got = (
        ev.withColumn("gap", gap_ms)
        .filter(F.col("gap").isNotNull())
        .collect()[0]
        .gap
    )
    assert got == 1_800_000  # boundaries crossed — NOT > threshold
    assert not (got > 30 * 60 * 1000)
