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


# --- real-codec branch (VERDICT r2 next-round #4b) --------------------------
# The container ships no Pillow, so the real PNG/JPEG decode path is gated:
# without Pillow real magic must raise NotImplementedError (covered here);
# with Pillow installed the roundtrip tests below run and prove the prod swap.
import dupion_spark.functions.codec as codec_mod

REAL_PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16


def test_real_png_magic_without_pillow_raises():
    if codec_mod._HAVE_PIL:
        pytest.skip("Pillow present; the guard branch is unreachable")
    with pytest.raises(NotImplementedError):
        decode_image(REAL_PNG_MAGIC)


def test_real_magic_degrades_to_none_via_try_decode():
    from dupion_spark.functions.codec import try_decode_image

    if codec_mod._HAVE_PIL:
        pytest.skip("Pillow present; undecodable-guard branch unreachable")
    assert try_decode_image(REAL_PNG_MAGIC) is None  # F4: byte-hash-only row


@pytest.mark.skipif(not codec_mod._HAVE_PIL, reason="Pillow not installed")
def test_real_png_roundtrip_with_pillow():
    import io

    import PIL.Image

    pixels = _pixels(3)
    buf = io.BytesIO()
    PIL.Image.fromarray(pixels).save(buf, format="PNG")
    assert np.array_equal(decode_image(buf.getvalue()), pixels)


@pytest.mark.skipif(not codec_mod._HAVE_PIL, reason="Pillow not installed")
def test_real_jpeg_decodes_above_psnr_gate_with_pillow():
    import io

    import PIL.Image

    pixels = _pixels(4, (64, 64, 3))
    buf = io.BytesIO()
    PIL.Image.fromarray(pixels).save(buf, format="JPEG", quality=95)
    out = decode_image(buf.getvalue())
    assert out.shape == pixels.shape
    assert psnr_db(out, pixels) > 30.0
