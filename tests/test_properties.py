"""Hypothesis property gates for driver-side helpers (pure Python —
no Spark job per example, so hundreds of cases run in milliseconds)."""

from __future__ import annotations

import re

from hypothesis import given
from hypothesis import strategies as st

from taipei_bi_etl_spark.functions import to_snake_case
from taipei_bi_etl_spark.geo import ALPHA3_TO_ALPHA2, COUNTRY_TZ_OFFSET
from taipei_bi_etl_spark.multimodal import N_FEATURES, fake_decode
from taipei_bi_etl_spark.scale import plan_partitions

identifiers = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,30}", fullmatch=True)


@given(identifiers)
def test_snake_case_idempotent(name):
    once = to_snake_case(name)
    assert to_snake_case(once) == once


@given(identifiers)
def test_snake_case_shape(name):
    out = to_snake_case(name)
    assert out == out.lower()
    assert re.fullmatch(r"[a-z0-9_]+", out)


def test_geo_tables_shape():
    assert all(
        re.fullmatch(r"[+-]\d{2}:\d{2}", v) for v in COUNTRY_TZ_OFFSET.values()
    )
    assert all(re.fullmatch(r"[A-Z]{2}", k) for k in COUNTRY_TZ_OFFSET)
    assert all(re.fullmatch(r"[A-Z]{3}", k) for k in ALPHA3_TO_ALPHA2)
    assert all(re.fullmatch(r"[A-Z]{2}", v) for v in ALPHA3_TO_ALPHA2.values())
    # the reference's XK workaround is preserved
    assert COUNTRY_TZ_OFFSET["XK"] == "+01:00"


@given(st.binary(max_size=2048))
def test_fake_decode_is_normalized_histogram(payload):
    feats = fake_decode(payload)
    assert len(feats) == N_FEATURES
    assert all(f >= 0 for f in feats)
    if payload:
        assert abs(sum(feats) - 1.0) < 1e-9
    else:
        assert feats == [0.0] * N_FEATURES


@given(st.integers(min_value=0, max_value=10**18))
def test_plan_partitions_monotone_and_bounded(nbytes):
    n = plan_partitions(nbytes)
    assert 32 <= n <= 200_000
    assert plan_partitions(nbytes * 2) >= n


def test_jl_sign_matrix_balanced_and_deterministic():
    """The inlined JL projection matrix must be a fixed ±1 matrix with
    both signs present in every output row (an all-equal row would
    collapse that dimension to a scaled sum)."""
    from taipei_bi_etl_spark.queries.similarity import IN_DIM, _jl_rows

    a, b = _jl_rows(), _jl_rows()
    assert a == b
    for row in a:
        assert len(row) == IN_DIM
        assert set(row) == {-1, 1}


def test_multi_touch_credit_is_conserved(spark):
    """Every conversion's attributed credit must sum to exactly
    1,000,000 ppm — the invariant integer weighting exists for."""
    from taipei_bi_etl_spark.queries import REGISTRY
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    df = REGISTRY["multi_touch_attribution"].fn(spark, SF_DIR)
    bad = (
        df.groupBy("conv_id")
        .agg(F.sum("weight_ppm").alias("total"))
        .filter(F.col("total") != 1_000_000)
        .count()
    )
    assert bad == 0
