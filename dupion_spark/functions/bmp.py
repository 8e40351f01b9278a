"""Pure numpy real-BMP codec (no Pillow dependency).

Windows BMP is the simplest real raster container: a 14-byte file header, a
BITMAPINFOHEADER, optional palette, then bottom-up rows padded to 4 bytes
(public Windows GDI format documentation). Decoding it makes `BM` payloads
first-class in functions/codec.decode_image alongside the pure-numpy PNG /
JPEG / GIF decoders.

Scope (ValueError / NotImplementedError outside it — the F4 validity path
degrades such rows to byte-hash handling, never kills the job):
  - decode: uncompressed (BI_RGB) 8-bit paletted, 24-bit BGR and 32-bit BGRA,
    plus BI_RLE8 run-length 8-bit paletted (encoded runs, absolute mode,
    end-of-line / end-of-bitmap / delta escapes per the GDI spec),
    BITMAPINFOHEADER or larger (V4/V5 headers share the 40-byte prefix),
    top-down (negative height) or bottom-up; output is HxWx3 RGB uint8
  - encode: 24-bit bottom-up BI_RGB (what ~every BMP writer emits)

Role in the reference: dupion hashes raw file bytes
(dupion/src/driver/platterwalker.rs:268-344); the graft hashes *decoded
pixels* (input_hint), so a BMP and a PNG of the same frame exact-collide.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"


def encode_real_bmp(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit bottom-up BI_RGB BMP."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_real_bmp expects HxWx3 RGB uint8")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB -> BGR, bottom-up, each row padded to a 4-byte boundary
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    offset = 14 + 40
    header = (
        BMP_MAGIC
        + struct.pack("<IHHI", offset + len(data), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    )
    return header + data


def _rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) palette-index rows in BOTTOM-UP storage order
    (matching the uncompressed layout, so the caller's row flip applies
    uniformly). Escapes: 00 00 end-of-line, 00 01 end-of-bitmap,
    00 02 dx dy delta, 00 n>=3 absolute mode (word-aligned)."""
    out = np.zeros((h, w), dtype=np.uint8)  # skipped pixels default to 0
    row = 0  # storage row (bottom-up: row 0 is the visual bottom)
    col = 0
    pos = 0
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("BMP RLE8 stream truncated")
        count, value = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # encoded run: value repeated count times
            if row >= h or col + count > w:
                raise ValueError("BMP RLE8 run overflows row")
            out[row, col : col + count] = value
            col += count
            continue
        if value == 0:  # end of line
            row += 1
            col = 0
            continue
        if value == 1:  # end of bitmap
            return out
        if value == 2:  # delta: skip right/up
            if pos + 2 > n:
                raise ValueError("BMP RLE8 delta truncated")
            col += data[pos]
            row += data[pos + 1]
            pos += 2
            if row > h or col > w:
                raise ValueError("BMP RLE8 delta out of bounds")
            continue
        # absolute mode: `value` literal bytes, padded to a word boundary
        end = pos + value
        if end > n or row >= h or col + value > w:
            raise ValueError("BMP RLE8 absolute run truncated/overflows")
        out[row, col : col + value] = np.frombuffer(data[pos:end], np.uint8)
        col += value
        pos = end + (value & 1)


def decode_real_bmp(data: bytes) -> np.ndarray:
    """Decode real BMP bytes -> HxWx3 uint8 RGB."""
    if data[:2] != BMP_MAGIC:
        raise ValueError(f"not a BMP stream: {data[:2]!r}")
    if len(data) < 54:
        raise ValueError("BMP header truncated")
    offset = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size}")
    w, h_signed, _planes, bpp, compression = struct.unpack(
        "<iiHHI", data[18:34]
    )
    if compression not in (0, 1):  # BI_RGB / BI_RLE8
        raise NotImplementedError(f"BMP compression {compression}")
    if w <= 0 or h_signed == 0:
        raise ValueError("BMP has zero/negative width or zero height")
    top_down = h_signed < 0
    h = abs(h_signed)

    if compression == 1 and bpp != 8:
        raise ValueError(f"BMP RLE8 requires 8-bit pixels, got {bpp}")
    if bpp == 8:
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal_off = 14 + hdr_size
        raw = data[pal_off : pal_off + 4 * n_colors]
        if len(raw) < 4 * n_colors:
            raise ValueError("BMP palette truncated")
        # palette entries are BGRX
        palette = np.frombuffer(raw, dtype=np.uint8).reshape(n_colors, 4)
        palette = palette[:, 2::-1]  # -> RGB
        row_bytes = w
    elif bpp in (24, 32):
        palette = None
        row_bytes = w * (bpp // 8)
    else:
        raise NotImplementedError(f"BMP bit depth {bpp}")
    if compression == 1:
        # RLE streams are stored bottom-up by spec; _rle8_decode returns
        # rows in storage order so the same flip applies
        rows = _rle8_decode(data[offset:], w, h)
    else:
        stride = row_bytes + ((-row_bytes) % 4)
        need = stride * h
        raw = data[offset : offset + need]
        if len(raw) < need:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        rows = rows[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]
    if palette is not None:
        idx = rows
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP pixel index outside palette")
        return palette[idx]
    px = rows.reshape(h, w, bpp // 8)
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB
