"""Real netpbm PPM/PGM codec tests (pure numpy)."""

import numpy as np
import pytest

from dupion_spark.functions.codec import (
    decode_image,
    encode_png,
    try_decode_image,
)
from dupion_spark.functions.pnm import decode_real_pnm, encode_real_ppm


def _pixels(seed=0, shape=(13, 9, 3)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape).astype(np.uint8)


def test_ppm_roundtrip():
    px = _pixels(0)
    assert np.array_equal(decode_real_pnm(encode_real_ppm(px)), px)


def test_ppm_header_comments_and_whitespace():
    px = _pixels(1, shape=(2, 3, 3))
    data = (
        b"P6 # inline comment\n# full-line comment\n  3\t2 # dims\n 255\n"
        + px.tobytes()
    )
    assert np.array_equal(decode_real_pnm(data), px)


def test_pgm_grayscale_replicates():
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    data = b"P5\n3 2\n255\n" + gray.tobytes()
    out = decode_real_pnm(data)
    assert out.shape == (2, 3, 3)
    for c in range(3):
        assert np.array_equal(out[:, :, c], gray)


def test_ppm_16bit_big_endian_scales():
    # maxval 65535: big-endian 16-bit samples scale to 8-bit
    samples = np.array([[0, 32768, 65535]], dtype=">u2")  # one RGB pixel
    data = b"P6\n1 1\n65535\n" + samples.tobytes()
    out = decode_real_pnm(data)
    assert tuple(out[0, 0]) == (0, 128, 255)


def test_ppm_odd_maxval_scales():
    data = b"P6\n1 1\n100\n" + bytes([0, 50, 100])
    out = decode_real_pnm(data)
    assert tuple(out[0, 0]) == (0, 128, 255)


def test_ppm_truncated_degrades():
    px = _pixels(2)
    data = encode_real_ppm(px)
    assert try_decode_image(data[: len(data) // 2]) is None
    assert try_decode_image(b"P6\n3 2\n") is None
    with pytest.raises(ValueError):
        decode_real_pnm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM: not binary PNM


def test_ppm_dispatches_via_decode_image_and_collides_with_png():
    px = _pixels(3)
    assert np.array_equal(
        decode_image(encode_real_ppm(px)), decode_image(encode_png(px))
    )
