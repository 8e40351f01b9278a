"""Real-GIF and real-BMP codec tests (pure python/numpy, no Pillow).

The GIF decoder is additionally validated against a HAND-DERIVED spec vector
(LZW codes worked out on paper from the GIF89a appendix), so decoder
correctness does not rest on roundtripping against our own encoder.
"""

import numpy as np
import pytest

from dupion_spark.functions.bmp import decode_real_bmp, encode_real_bmp
from dupion_spark.functions.codec import (
    decode_image,
    encode_png,
    psnr_db,
    try_decode_image,
)
from dupion_spark.functions.gif import decode_real_gif, encode_real_gif


def _quantized_pixels(seed=0, shape=(32, 24, 3), levels=5):
    """Random RGB image with at most levels^3 distinct colors (GIF-safe)."""
    rng = np.random.default_rng(seed)
    vals = np.linspace(0, 255, levels).astype(np.uint8)
    return vals[rng.integers(0, levels, size=shape)]


# --- GIF ---------------------------------------------------------------------


def test_gif_roundtrip():
    px = _quantized_pixels(0)
    assert np.array_equal(decode_real_gif(encode_real_gif(px)), px)


def test_gif_roundtrip_interlaced():
    px = _quantized_pixels(1, shape=(37, 19, 3))
    assert np.array_equal(
        decode_real_gif(encode_real_gif(px, interlace=True)), px
    )


def test_gif_roundtrip_two_colors_min_code_size_floor():
    # 1-bit palette exercises the min_code_size >= 2 floor
    px = np.where(
        np.arange(11 * 13).reshape(11, 13, 1) % 3 == 0, 255, 0
    ).astype(np.uint8).repeat(3, axis=2)
    assert np.array_equal(decode_real_gif(encode_real_gif(px)), px)


def test_gif_roundtrip_full_palette_table_reset():
    # 256 colors + enough pixels that the LZW table hits 4096 and resets
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, size=(128, 128, 1)).astype(np.uint8)
    px = gray.repeat(3, axis=2)
    assert np.array_equal(decode_real_gif(encode_real_gif(px)), px)


def test_gif_hand_derived_spec_vector():
    # 3x1 image, palette [(10,20,30),(200,100,50)], pixels [1,1,0].
    # Per the spec (min code size 2, clear=4, EOI=5) the LZW code stream is
    # 4,1,1,0,5 at width 3; packed LSB-first that is bytes 0x4C 0x50.
    data = (
        b"GIF89a"
        + bytes([3, 0, 1, 0])      # logical screen 3x1
        + bytes([0x80, 0, 0])      # global color table, 2 entries
        + bytes([10, 20, 30, 200, 100, 50])
        + b"\x2c" + bytes([0, 0, 0, 0, 3, 0, 1, 0, 0])  # image descriptor
        + bytes([2])               # LZW min code size
        + bytes([2, 0x4C, 0x50, 0])  # one 2-byte sub-block + terminator
        + b"\x3b"
    )
    out = decode_real_gif(data)
    expected = np.array(
        [[[200, 100, 50], [200, 100, 50], [10, 20, 30]]], dtype=np.uint8
    )
    assert np.array_equal(out, expected)


def test_gif_skips_extension_blocks():
    px = _quantized_pixels(3, shape=(5, 7, 3))
    data = encode_real_gif(px)
    # splice a graphic control extension between the LSD+table and the
    # image descriptor (0x2c)
    idx = data.index(b"\x2c", 13)
    gce = b"\x21\xf9" + bytes([4, 0, 0, 0, 0, 0])
    spliced = data[:idx] + gce + data[idx:]
    assert np.array_equal(decode_real_gif(spliced), px)


def test_gif_too_many_colors_raises():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_real_gif(px)


def test_gif_truncated_degrades_to_none():
    data = encode_real_gif(_quantized_pixels(5))
    assert try_decode_image(data[: len(data) // 2]) is None
    assert try_decode_image(b"GIF89a\x03") is None


def test_gif_dispatches_via_decode_image_and_collides_with_png():
    # a GIF and a PNG of the same frame must exact-collide on decoded pixels
    # (the graft's content-hash semantic vs dupion's raw-byte blake3,
    # dupion/src/driver/platterwalker.rs:268-344)
    px = _quantized_pixels(6)
    gif_px = decode_image(encode_real_gif(px))
    png_px = decode_image(encode_png(px))
    assert np.array_equal(gif_px, png_px)
    assert psnr_db(gif_px, png_px) == float("inf")


# --- BMP ---------------------------------------------------------------------


def test_bmp_roundtrip_24bit_odd_width_padding():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 13, 3)).astype(np.uint8)  # 39B rows -> pad 1
    assert np.array_equal(decode_real_bmp(encode_real_bmp(px)), px)


def test_bmp_top_down_negative_height():
    import struct

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_real_bmp(px))
    # flip to top-down: negate height, reverse stored row order
    h = struct.unpack("<i", bytes(data[22:26]))[0]
    data[22:26] = struct.pack("<i", -h)
    offset = struct.unpack("<I", bytes(data[10:14]))[0]
    stride = (len(data) - offset) // h
    rows = [bytes(data[offset + i * stride : offset + (i + 1) * stride])
            for i in range(h)]
    data[offset:] = b"".join(reversed(rows))
    assert np.array_equal(decode_real_bmp(bytes(data)), px)


def test_bmp_8bit_palette():
    import struct

    # hand-build: 4x2 8-bit image over a 4-entry palette
    pal = [(5, 6, 7), (250, 0, 0), (0, 250, 0), (0, 0, 250)]  # RGB
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    stride = 4  # width 4, already 4-aligned
    offset = 14 + 40 + 4 * len(pal)
    data = (
        b"BM"
        + struct.pack("<IHHI", offset + stride * 2, 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 0, stride * 2,
                      0, 0, len(pal), 0)
        + b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal)
        + idx[::-1].tobytes()  # bottom-up
    )
    out = decode_real_bmp(data)
    expected = np.array([[pal[i] for i in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(out, expected)


def test_bmp_32bit():
    import struct

    px = np.arange(1 * 2 * 3, dtype=np.uint8).reshape(1, 2, 3)
    data24 = encode_real_bmp(px)
    # rebuild as 32-bit BGRA manually
    bgra = np.concatenate(
        [px[:, :, ::-1], np.full((1, 2, 1), 9, dtype=np.uint8)], axis=2
    )
    offset = 14 + 40
    data = (
        b"BM"
        + struct.pack("<IHHI", offset + bgra.size, 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 32, 0, bgra.size,
                      0, 0, 0, 0)
        + bgra[::-1].tobytes()
    )
    assert np.array_equal(decode_real_bmp(data), decode_real_bmp(data24))


def test_bmp_compressed_or_truncated_degrades():
    import struct

    px = _quantized_pixels(8, shape=(4, 4, 3))
    data = bytearray(encode_real_bmp(px))
    assert try_decode_image(bytes(data[:30])) is None  # truncated header
    assert try_decode_image(bytes(data[:-5])) is None  # truncated pixels
    data[30:34] = struct.pack("<I", 1)  # RLE8 flag on 24-bit: invalid
    assert try_decode_image(bytes(data)) is None
    data[30:34] = struct.pack("<I", 4)  # BI_JPEG: honestly unsupported
    assert try_decode_image(bytes(data)) is None


def test_bmp_dispatches_via_decode_image_and_collides_with_png():
    px = _quantized_pixels(9)
    assert np.array_equal(
        decode_image(encode_real_bmp(px)), decode_image(encode_png(px))
    )


def test_real_four_format_planted_group_passes_verify_gate():
    """The reference's re-encode semantic across ALL four real codecs: the
    same frame as PNG / JPEG / GIF / BMP must pairwise clear the PSNR >= 40 dB
    verify predicate (operators/verify), so a mixed-format corpus clusters
    re-encodes of one image into one group."""
    from dupion_spark.functions.jpeg import encode_real_jpeg
    from dupion_spark.functions.png import encode_real_png

    # smooth, palette-bounded pixels (GIF needs <=256 colors; JPEG is lossy)
    y, x = np.mgrid[0:24, 0:32]
    px = ((y * 4 + x * 2) % 256 // 16 * 16).astype(np.uint8)
    px = np.stack([px, px, 255 - px], axis=2)
    decoded = [
        decode_image(enc(px))
        for enc in (encode_real_png, encode_real_jpeg, encode_real_gif,
                    encode_real_bmp)
    ]
    for i in range(len(decoded)):
        for j in range(i + 1, len(decoded)):
            assert psnr_db(decoded[i], decoded[j]) >= 40.0, (i, j)


# --- property: LZW encoder/decoder lockstep over arbitrary index streams -----

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:
    from dupion_spark.functions.gif import _lzw_decode, _lzw_encode

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(0, 255), min_size=1, max_size=2000),
        st.integers(2, 8),
    )
    def test_lzw_roundtrip_property(vals, min_code_size):
        # indices must fit the root-code space for the chosen code size
        # (mod BEFORE the uint8 cast: uint8 % 256 promotes to int16)
        arr = (np.array(vals) % (1 << min_code_size)).astype(np.uint8)
        enc = _lzw_encode(arr, min_code_size)
        dec = _lzw_decode(enc, min_code_size, len(arr))
        assert np.array_equal(dec, arr)


# --- animated GIF as a video container --------------------------------------

def test_gif_animation_frames_roundtrip_via_media_dispatch():
    """An animated GIF walks frame spans and decodes per-frame through the
    SAME media container API as DVID/AVI (functions/media.iter_frame_spans):
    seek-without-decode, standalone one-frame rebuilds."""
    from dupion_spark.functions import media
    from dupion_spark.functions.gif import (
        encode_real_gif_animation,
        gif_frame_count,
    )

    rng = np.random.default_rng(31)
    frames = [
        (rng.integers(0, 256, size=(24, 32, 3)).astype(np.uint8) // 64 * 64)
        for _ in range(5)
    ]
    anim = encode_real_gif_animation(frames)
    assert gif_frame_count(anim) == 5
    assert media.video_frame_count(anim) == 5
    for idx, start, end in media.iter_frame_spans(anim):
        px = decode_image(media.extract_frame_bytes(anim, start, end))
        assert np.array_equal(px, frames[idx]), idx
    # whole-animation decode_image still yields the first frame
    assert np.array_equal(decode_image(anim), frames[0])


def test_gif_animation_partial_frame_degrades():
    """A composited (partial-canvas) animation frame is honestly refused at
    extraction — F4 degrade, not a wrong composite."""
    import struct

    from dupion_spark.functions import media
    from dupion_spark.functions.gif import encode_real_gif_animation

    rng = np.random.default_rng(32)
    frames = [
        (rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8) // 64 * 64)
        for _ in range(2)
    ]
    anim = bytearray(encode_real_gif_animation(frames))
    spans = list(media.iter_frame_spans(bytes(anim)))
    # shrink frame 1's descriptor to a 4x4 sub-rectangle (descriptor bytes:
    # 0x2c, then <HHHH> left/top/width/height). The LZW payload still holds
    # 64 pixels but extraction must refuse BEFORE decoding.
    _, start, _ = spans[1]
    anim[start + 5 : start + 9] = struct.pack("<HH", 4, 4)
    data = bytes(anim)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s, e = spans[1][1], spans[1][2]
        media.extract_frame_bytes(data, s, e)
    # frame 0 (still full-canvas) keeps working
    s0, e0 = spans[0][1], spans[0][2]
    assert np.array_equal(
        decode_image(media.extract_frame_bytes(data, s0, e0)), frames[0]
    )


# --- BMP RLE8 ----------------------------------------------------------------

def _rle8_bmp(w, h, pal, stream):
    import struct

    offset = 14 + 40 + 4 * len(pal)
    return (
        b"BM"
        + struct.pack("<IHHI", offset + len(stream), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream),
                      0, 0, len(pal), 0)
        + b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal)
        + stream
    )


def test_bmp_rle8_runs_absolute_padding_eol_eob():
    pal = [(9, 9, 9), (250, 0, 0), (0, 250, 0), (0, 0, 250)]
    # storage rows (bottom-up): runs, odd absolute mode (word-padded), EOLs
    stream = bytes(
        [3, 1] + [0, 3, 2, 3, 2, 0] + [0, 0]      # s0: 1,1,1 | abs 2,3,2 | EOL
        + [6, 3, 0, 0]                             # s1: 3*6 | EOL
        + [2, 0] + [0, 4, 1, 1, 2, 2] + [0, 1]    # s2: 0,0 | abs 1,1,2,2 | EOB
    )
    out = decode_real_bmp(_rle8_bmp(6, 3, pal, stream))
    storage = np.array(
        [[1, 1, 1, 2, 3, 2], [3, 3, 3, 3, 3, 3], [0, 0, 1, 1, 2, 2]]
    )
    expected = np.array([[pal[i] for i in row] for row in storage[::-1]],
                        dtype=np.uint8)
    assert np.array_equal(out, expected)


def test_bmp_rle8_delta_skips_default_to_zero():
    pal = [(1, 2, 3), (250, 0, 0), (0, 250, 0)]
    stream = bytes([1, 1] + [0, 2, 2, 1] + [1, 2] + [0, 1])
    out = decode_real_bmp(_rle8_bmp(4, 2, pal, stream))
    storage = np.array([[1, 0, 0, 0], [0, 0, 0, 2]])
    expected = np.array([[pal[i] for i in row] for row in storage[::-1]],
                        dtype=np.uint8)
    assert np.array_equal(out, expected)


def test_bmp_rle8_truncated_degrades():
    pal = [(0, 0, 0), (255, 255, 255)]
    stream = bytes([200, 1])  # run overflows a 4-wide row
    assert try_decode_image(_rle8_bmp(4, 2, pal, stream)) is None
    assert try_decode_image(_rle8_bmp(4, 2, pal, bytes([2, 1]))) is None  # no EOB


def test_gif_partial_first_frame_raises_without_pillow_too():
    """A first frame smaller than the logical screen must degrade via F4 in
    decode_real_gif exactly like extract_gif_frame — otherwise the pixel sha
    depends on whether a compositing decoder (Pillow) is installed."""
    import struct

    import pytest

    data = bytearray(encode_real_gif(_quantized_pixels(7, shape=(8, 9, 3))))
    # enlarge the logical screen so the (full-size) frame no longer covers it
    sw, sh = struct.unpack("<HH", bytes(data[6:10]))
    data[6:10] = struct.pack("<HH", sw + 4, sh + 2)
    with pytest.raises(ValueError, match="not composited"):
        decode_real_gif(bytes(data))
