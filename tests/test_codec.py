import numpy as np
import pytest

from dupion_spark.functions.codec import (
    decode_image,
    encode_jpeg,
    encode_png,
    psnr_db,
)


def _pixels(seed=0, shape=(32, 24, 3)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape).astype(np.uint8)


def test_lossless_roundtrip():
    pixels = _pixels()
    assert np.array_equal(decode_image(encode_png(pixels)), pixels)


def test_lossy_roundtrip_psnr_above_gate():
    pixels = _pixels(1)
    decoded = decode_image(encode_jpeg(pixels))
    assert decoded.shape == pixels.shape
    assert psnr_db(pixels, decoded) >= 40.0


def test_lossy_is_idempotent_after_first_encode():
    # re-encoding an already-quantized image is lossless at the same step
    pixels = _pixels(2)
    once = decode_image(encode_jpeg(pixels))
    twice = decode_image(encode_jpeg(once))
    assert psnr_db(once, twice) == float("inf")


def test_degenerate_1x1():
    pixels = np.full((1, 1, 3), 7, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(pixels)), pixels)


def test_unknown_magic_raises():
    with pytest.raises(ValueError):
        decode_image(b"NOPE1234")


def test_psnr_shape_mismatch_never_similar():
    assert psnr_db(_pixels(0, (8, 8, 3)), _pixels(0, (16, 16, 3))) == float("-inf")
