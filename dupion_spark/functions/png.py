"""Pure numpy+zlib real-PNG codec (no Pillow / libpng dependency).

The container ships no image libraries, but PNG itself is stdlib-decodable:
chunks + zlib + five per-scanline filters (RFC 2083). This module makes the
"real bytes" branch of functions/codec.decode_image PROVABLE in this sandbox —
real `\x89PNG` payloads decode here when Pillow is absent, so the
real-codec roundtrip tests run unskipped instead of being Pillow-gated.

Scope (raises NotImplementedError outside it — the F4 validity path treats
those rows as undecodable, it never kills the job):
  - bit depth 8, interlace 0 (the overwhelming majority of real PNGs)
  - color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
  - output is always HxWx3 RGB uint8, mirroring the Pillow branch's
    `convert("RGB")` (alpha dropped, gray replicated, palette resolved)

The reference hashes raw bytes (dupion/src/driver/platterwalker.rs:268-344);
the graft hashes decoded pixels, so decoder parity across environments (with
and without Pillow) is what keeps exact-hash groups stable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per color type (bit depth 8)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_real_png(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as a real (spec-compliant) RGB PNG,
    filter 0 on every scanline."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_real_png expects HxWx3 RGB uint8")
    h, w, _ = pixels.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level=6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering -> (h, w*bpp) uint8 reconstructed bytes."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG IDAT truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:
            recon = line.copy()
        elif ftype == 2:  # Up — vectorizes (depends only on prior row)
            recon = line + prior
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            recon = np.empty(stride, dtype=np.uint8)
            li = line.tolist()
            pr = prior.tolist()
            rc = [0] * stride
            for x in range(stride):
                left = rc[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    val = li[x] + left
                elif ftype == 3:
                    val = li[x] + ((left + pr[x]) >> 1)
                else:
                    ul = pr[x - bpp] if x >= bpp else 0
                    val = li[x] + _paeth(left, pr[x], ul)
                rc[x] = val & 0xFF
            recon[:] = rc
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon
        prior = recon
    return out


def decode_real_png(data: bytes) -> np.ndarray:
    """Decode real PNG bytes -> HxWx3 RGB uint8 (see module docstring)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG chunk truncated")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (only 8)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    bpp = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    # normalize to RGB exactly as the Pillow branch's convert("RGB") does
    if ctype == 2:
        return px
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ctype == 6:
        return px[:, :, :3].copy()
    # ctype == 3: palette lookup
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= plte.shape[0]:
        # malformed file: a pixel indexes past the palette. Raise the
        # ValueError the try_decode_image F4 wrapper catches, not a bare
        # IndexError that would escape it and kill the task
        raise ValueError("PNG palette index out of range")
    return plte[idx]
