"""Byte-level codec roundtrips for the numpy-only multimodal codecs
(the oracle queries verify decode-vs-closed-form; these verify
encode↔decode inverse and the real resize)."""

from __future__ import annotations

import numpy as np

from taipei_bi_etl_spark.multimodal import (
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    resize_nearest,
)


def test_ppm_roundtrip_and_newline_safety():
    """Raw pixel bytes may contain 0x0A — the header parse must not
    split on newlines inside the data section."""
    pix = np.full((3, 4, 3), 10, dtype=np.uint8)  # every byte is '\n'
    out = decode_ppm(encode_ppm(4, 3, pix))
    assert out.shape == (3, 4, 3) and (out == 10).all()
    rng = (np.arange(7 * 5 * 3) * 13 % 256).astype(np.uint8).reshape(5, 7, 3)
    assert (decode_ppm(encode_ppm(7, 5, rng)) == rng).all()


def test_wav_roundtrip_full_range():
    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype="<i2")
    sr, out = decode_wav_pcm16(encode_wav_pcm16(samples, sr=44100))
    assert sr == 44100
    assert list(out) == list(samples)


def test_wav_rejects_non_riff():
    import pytest

    with pytest.raises(ValueError):
        decode_wav_pcm16(b"nope" * 10)


def test_resize_nearest_preserves_corners_and_ratio():
    pix = np.zeros((100, 200, 3), dtype=np.uint8)
    pix[0, 0] = 7
    small = resize_nearest(pix, 50)
    assert small.shape == (25, 50, 3)  # aspect ratio kept
    assert (small[0, 0] == 7).all()  # corner sample survives
    same = resize_nearest(pix, 500)  # never upscales
    assert same.shape == pix.shape
