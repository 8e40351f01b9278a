"""Pure numpy real-PNM codec (netpbm PPM/PGM, no dependencies).

The netpbm formats (public netpbm documentation) are the simplest real
raster containers — an ASCII header then raw samples — and are what
ImageMagick/netpbm toolchains emit in batch pipelines. Decoding them makes
`P5`/`P6` payloads first-class in functions/codec.decode_image alongside the
pure-numpy PNG / JPEG / GIF / BMP / TIFF decoders.

Scope (ValueError outside it — the F4 validity path degrades such rows to
byte-hash handling, never kills the job):
  - decode: binary P5 (grayscale) and P6 (RGB), maxval 1..65535 (16-bit
    samples are big-endian per spec and scale to 8-bit), header comments
    and arbitrary whitespace; output is HxWx3 RGB uint8
  - encode: P6 maxval 255

Role in the reference: dupion hashes raw file bytes
(dupion/src/driver/platterwalker.rs:268-344); the graft hashes *decoded
pixels* (input_hint), so a PPM and a PNG of the same frame exact-collide.
"""

from __future__ import annotations

import numpy as np

PNM_MAGICS = (b"P5", b"P6")


def encode_real_ppm(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a binary P6 PPM (maxval 255)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_real_ppm expects HxWx3 RGB uint8")
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _read_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Read n_tokens ASCII integers after the magic, skipping whitespace and
    `#` comments; returns (values, offset past the single whitespace byte
    that terminates the header)."""
    tokens: list[int] = []
    pos = 2  # past magic
    n = len(data)
    while len(tokens) < n_tokens:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos] == ord("#"):
            while pos < n and data[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            if data[pos] == ord("#"):
                break
            pos += 1
        if pos == start:
            raise ValueError("PNM header truncated")
        try:
            tokens.append(int(data[start:pos]))
        except ValueError:
            raise ValueError(f"bad PNM header token {data[start:pos]!r}")
    if pos >= n or not data[pos : pos + 1].isspace():
        raise ValueError("PNM header not terminated by whitespace")
    return tokens, pos + 1  # exactly ONE whitespace byte before raster


def decode_real_pnm(data: bytes) -> np.ndarray:
    """Decode binary PPM/PGM bytes -> HxWx3 uint8 RGB."""
    magic = data[:2]
    if magic not in PNM_MAGICS:
        raise ValueError(f"not a binary PNM stream: {magic!r}")
    (w, h, maxval), pos = _read_header_tokens(data, 3)
    if w <= 0 or h <= 0:
        raise ValueError("PNM has zero dimension")
    if not 1 <= maxval <= 65535:
        raise ValueError(f"bad PNM maxval {maxval}")
    channels = 3 if magic == b"P6" else 1
    wide = maxval > 255
    need = w * h * channels * (2 if wide else 1)
    raw = data[pos : pos + need]
    if len(raw) < need:
        raise ValueError("PNM raster truncated")
    if wide:  # 16-bit samples are big-endian per the netpbm spec
        px = np.frombuffer(raw, dtype=">u2").astype(np.uint32)
    else:
        px = np.frombuffer(raw, dtype=np.uint8).astype(np.uint32)
    if maxval != 255:
        px = (px * 255 + maxval // 2) // maxval
    px = px.astype(np.uint8).reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    return px
