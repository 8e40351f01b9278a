"""Real-TIFF codec tests (pure numpy, no Pillow / libtiff).

PackBits decoding is validated against the worked example in the public
TIFF 6.0 specification (section 9), so decoder correctness does not rest
only on roundtripping against our own encoder.
"""

import struct

import numpy as np
import pytest

from dupion_spark.functions.tiff import (
    _packbits_decode,
    decode_real_tiff,
    encode_real_tiff,
)


def _pixels(seed=0, shape=(21, 17, 3)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape).astype(np.uint8)


def test_tiff_roundtrip():
    px = _pixels(0)
    assert np.array_equal(decode_real_tiff(encode_real_tiff(px)), px)


def test_tiff_roundtrip_1x1():
    px = np.full((1, 1, 3), 42, dtype=np.uint8)
    assert np.array_equal(decode_real_tiff(encode_real_tiff(px)), px)


def test_packbits_spec_worked_example():
    # TIFF 6.0 section 9's example: 15 packed bytes -> 24 unpacked
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    expected = (
        b"\xaa\xaa\xaa\x80\x00\x2a" + b"\xaa" * 4 + b"\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert _packbits_decode(packed, 24) == expected


def test_packbits_noop_code_128_is_skipped():
    packed = b"\x80" + bytes.fromhex("FEAA") + b"\x80"
    # decoder stops once `expected` bytes are produced; the trailing no-op
    # never needs reading
    assert _packbits_decode(packed, 3) == b"\xaa\xaa\xaa"


def _ifd_entry(bo, tag, typ, count, value):
    return struct.pack(bo + "HHII", tag, typ, count, value)


def _build_tiff(bo, tags, payload):
    """Minimal builder: header | payload | IFD with inline-value tags."""
    ifd_off = 8 + len(payload)
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    out = bytearray(magic + struct.pack(bo + "I", ifd_off))
    out += payload
    out += struct.pack(bo + "H", len(tags))
    for t in tags:
        out += _ifd_entry(bo, *t)
    out += struct.pack(bo + "I", 0)
    return bytes(out)


def test_tiff_big_endian_grayscale():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = _build_tiff(
        ">",
        [
            (256, 3, 1, 4 << 16),    # width (SHORT in upper half inline, BE)
            (257, 3, 1, 3 << 16),
            (258, 3, 1, 8 << 16),
            (259, 3, 1, 1 << 16),
            (262, 3, 1, 1 << 16),    # BlackIsZero
            (273, 4, 1, 8),          # strip at offset 8
            (277, 3, 1, 1 << 16),
            (278, 3, 1, 3 << 16),
            (279, 4, 1, 12),
        ],
        gray.tobytes(),
    )
    # inline SHORT values sit in the first two bytes of the 4-byte value
    # field; in big-endian that is the HIGH half of the packed uint32 above
    out = decode_real_tiff(data)
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_tiff_white_is_zero_inverts():
    gray = np.array([[0, 255]], dtype=np.uint8)
    data = _build_tiff(
        "<",
        [
            (256, 3, 1, 2), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 0),              # WhiteIsZero
            (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 1), (279, 4, 1, 2),
        ],
        gray.tobytes(),
    )
    out = decode_real_tiff(data)
    assert np.array_equal(out[0, :, 0], np.array([255, 0], dtype=np.uint8))


def test_tiff_packbits_multi_strip():
    # 4x3 RGB, RowsPerStrip=2: two strips, each PackBits literal-packed with
    # an interleaved repeat run to exercise both code paths
    px = _pixels(3, shape=(4, 3, 3))
    px[1, :, :] = 7  # a row of a constant byte -> repeat-packable
    row_bytes = 3 * 3

    def pack_rows(rows):
        raw = rows.tobytes()
        out = bytearray()
        for i in range(0, len(raw), 4):  # small literal chunks
            chunk = raw[i : i + 4]
            if len(set(chunk)) == 1 and len(chunk) > 1:
                out += bytes([257 - len(chunk), chunk[0]])
            else:
                out += bytes([len(chunk) - 1]) + chunk
        return bytes(out)

    strip0 = pack_rows(px[0:2])
    strip1 = pack_rows(px[2:4])
    payload = strip0 + strip1
    # strip offset/count arrays (2 LONGs each, too big for inline values)
    # follow the strips; the IFD follows them
    body = (
        payload
        + struct.pack("<II", 8, 8 + len(strip0))
        + struct.pack("<II", len(strip0), len(strip1))
    )
    data = _build_tiff(
        "<",
        [
            (256, 3, 1, 3), (257, 3, 1, 4), (259, 3, 1, 32773),
            (262, 3, 1, 2),
            (273, 4, 2, 8 + len(payload)),
            (277, 3, 1, 3), (278, 3, 1, 2),
            (279, 4, 2, 8 + len(payload) + 8),
        ],
        body,
    )
    assert np.array_equal(decode_real_tiff(data), px)


def test_tiff_palette_color():
    pal16 = np.zeros((3, 4), dtype=np.uint16)  # 3 channels x 4 entries
    pal16[:, 1] = [65535, 0, 0]       # red
    pal16[:, 2] = [0, 65535, 0]       # green
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    cmap_off = 8 + idx.size
    data = _build_tiff(
        "<",
        [
            (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 3),              # palette-color
            (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 2), (279, 4, 1, 4),
            (320, 3, 12, cmap_off),
        ],
        idx.tobytes() + pal16.tobytes(),
    )
    out = decode_real_tiff(data)
    assert tuple(out[0, 1]) == (255, 0, 0)
    assert tuple(out[1, 0]) == (0, 255, 0)
    assert tuple(out[0, 0]) == (0, 0, 0)


def test_tiff_rgba_extra_sample_dropped():
    px = _pixels(5, shape=(2, 2, 3))
    rgba = np.concatenate(
        [px, np.full((2, 2, 1), 128, dtype=np.uint8)], axis=2
    )
    data = _build_tiff(
        "<",
        [
            (256, 3, 1, 2), (257, 3, 1, 2), (259, 3, 1, 1), (262, 3, 1, 2),
            (273, 4, 1, 8), (277, 3, 1, 4), (278, 3, 1, 2), (279, 4, 1, 16),
        ],
        rgba.tobytes(),
    )
    assert np.array_equal(decode_real_tiff(data), px)


def test_tiff_truncated_or_unsupported_raises():
    px = _pixels(6, shape=(4, 4, 3))
    data = encode_real_tiff(px)
    with pytest.raises(ValueError):
        decode_real_tiff(data[:20])
    with pytest.raises(ValueError):
        decode_real_tiff(b"II+\x00" + data[4:])
    unsupported = bytearray(data)
    # flip the COMPRESSION tag value to 7 (JPEG-in-TIFF): honestly unsupported
    ifd_off = struct.unpack("<I", data[4:8])[0]
    n = struct.unpack("<H", data[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        if struct.unpack("<H", data[pos : pos + 2])[0] == 259:
            unsupported[pos + 8 : pos + 12] = struct.pack("<I", 7)
    with pytest.raises(NotImplementedError):
        decode_real_tiff(bytes(unsupported))


def test_tiff_dispatches_via_decode_image_and_collides_with_png():
    from dupion_spark.functions.codec import decode_image, encode_png

    px = _pixels(7)
    assert np.array_equal(
        decode_image(encode_real_tiff(px)), decode_image(encode_png(px))
    )


# --- LZW (compression 5) ----------------------------------------------------

def test_tiff_lzw_spec_walkthrough_vector():
    """Hand-derived from the TIFF 6.0 section 13 walkthrough: input
    7 7 7 8 8 7 7 6 6 encodes (per the spec algorithm) to codes
    256,7,258,8,8,258,6,6,257 at 9 bits, MSB-first-packed below. Validates
    the decoder against the spec independent of our own encoder."""
    from dupion_spark.functions.tiff import _lzw_decode_tiff

    packed = bytes.fromhex("8001E040804408 0C 06 80 80".replace(" ", ""))
    assert _lzw_decode_tiff(packed, 9) == bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])


def test_tiff_lzw_roundtrip_with_early_change():
    """Enough distinct pairs to push the code width through the EARLY
    9->10->11 changes (the spec's famous off-by-one vs GIF)."""
    from dupion_spark.functions.tiff import _lzw_decode_tiff, _lzw_encode_tiff

    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, size=6000).astype(np.uint8).tobytes()
    assert _lzw_decode_tiff(_lzw_encode_tiff(raw), len(raw)) == raw


def test_tiff_lzw_roundtrip_table_reset():
    from dupion_spark.functions.tiff import _lzw_decode_tiff, _lzw_encode_tiff

    rng = np.random.default_rng(10)
    raw = rng.integers(0, 256, size=40000).astype(np.uint8).tobytes()
    assert _lzw_decode_tiff(_lzw_encode_tiff(raw), len(raw)) == raw


def test_tiff_lzw_compressed_file_decodes():
    from dupion_spark.functions.tiff import _lzw_encode_tiff

    px = _pixels(11, shape=(5, 6, 3))
    strip = _lzw_encode_tiff(px.tobytes())
    data = _build_tiff(
        "<",
        [
            (256, 3, 1, 6), (257, 3, 1, 5), (259, 3, 1, 5),
            (262, 3, 1, 2),
            (273, 4, 1, 8), (277, 3, 1, 3), (278, 3, 1, 5),
            (279, 4, 1, len(strip)),
        ],
        strip,
    )
    assert np.array_equal(decode_real_tiff(data), px)


def test_tiff_lzw_predictor_2_degrades_not_garbage():
    """Predictor=2 (tag 317, horizontal differencing) stores deltas; decoding
    them as raw pixels would be silently wrong pixels -> wrong sha/phash.
    Outside scope => NotImplementedError (F4 degraded path), and an explicit
    Predictor=1 still decodes."""
    from dupion_spark.functions.tiff import _lzw_encode_tiff

    px = _pixels(12, shape=(4, 5, 3))
    strip = _lzw_encode_tiff(px.tobytes())
    base = [
        (256, 3, 1, 5), (257, 3, 1, 4), (259, 3, 1, 5),
        (262, 3, 1, 2),
        (273, 4, 1, 8), (277, 3, 1, 3), (278, 3, 1, 4),
        (279, 4, 1, len(strip)),
    ]
    with pytest.raises(NotImplementedError, match="predictor 2"):
        decode_real_tiff(_build_tiff("<", base + [(317, 3, 1, 2)], strip))
    out = decode_real_tiff(_build_tiff("<", base + [(317, 3, 1, 1)], strip))
    assert np.array_equal(out, px)
