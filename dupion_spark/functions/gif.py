"""Pure python+numpy real-GIF codec (no Pillow dependency).

GIF (87a/89a) is fully decodable from the public spec: logical screen
descriptor + color tables + LZW-compressed palette indices in length-prefixed
sub-blocks (GIF89a specification, CompuServe 1990). This module makes `GIF8`
payloads first-class in functions/codec.decode_image alongside the pure-numpy
PNG (functions/png.py) and baseline JPEG (functions/jpeg.py) decoders, so a
real-world image-dedup corpus with mixed PNG/JPEG/GIF rows exact-hashes on
decoded pixels in THIS container.

Scope (raises NotImplementedError / ValueError outside it — the F4 validity
path treats those rows as undecodable, never killing the job):
  - decode: first image frame of 87a/89a streams, global or local color
    table, interlaced or sequential, extensions skipped; output is always
    HxWx3 RGB uint8 (palette resolved, transparency ignored), mirroring the
    Pillow branch's `convert("RGB")`
  - encode: single-frame GIF89a with a global color table built from the
    image's distinct colors (<= 256 required — test fixtures quantize first);
    real variable-width LZW with table reset at 4096, optional interlacing

Role in the reference: dupion hashes raw file bytes
(dupion/src/driver/platterwalker.rs:268-344); the graft hashes *decoded
pixels* (input_hint), so a GIF and a PNG of the same frame land in the same
exact-dup group here even though their bytes differ.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start_row, step)


# ---------------------------------------------------------------------------
# LZW (GIF variable-width variant: LSB-first bit packing, clear/EOI codes,
# width grows when the DECODER's table reaches 2^width, hard cap 12 bits)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Decode a GIF LZW code stream (sub-block payloads already joined)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1

    # table entries are byte strings of palette indices
    roots = [bytes([i]) for i in range(clear)]
    table = roots + [b"", b""]

    out = bytearray()
    prev: bytes | None = None
    acc = 0  # bit accumulator, LSB-first
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = roots + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if not entry:
                raise ValueError("GIF LZW code refers to clear/EOI slot")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # non-early-change variant: next code is read at width+1 bits
            # once the table has filled the current width
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF pixel data short: {len(out)} of {n_pixels} decoded"
        )
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


class _BitWriter:
    """LSB-first variable-width code packer (GIF appendix F)."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW compression of palette indices.

    The width schedule mirrors the decoder exactly by tracking the size the
    DECODER's table will have after it processes each emitted code (the
    decoder adds one entry per code except the first after a clear, and
    widens when its table reaches 2^width). Encoder dictionary entries are
    assigned the same codes in the same order, so the two stay in lockstep.
    """
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()

    def reset() -> tuple[dict[bytes, int], int, int]:
        return ({bytes([i]): i for i in range(clear)}, clear + 2,
                min_code_size + 1)

    table, next_code, width = reset()
    w.write(clear, width)
    buf = b""
    for pix in indices.tobytes():
        cand = buf + bytes([pix])
        if cand in table:
            buf = cand
            continue
        w.write(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder (one entry behind) reaches 2^width exactly when
            # our next free code first exceeds it — bump in lockstep
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            # table full: the decoder adds its 4096th entry on this code,
            # then both sides reset on the clear
            w.write(clear, width)
            table, next_code, width = reset()
        buf = bytes([pix])
    if buf:
        w.write(table[buf], width)
    w.write(eoi, width)
    return w.finish()


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap payload into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += data[pos : pos + size]
        if pos + size > len(data):
            raise ValueError("GIF sub-block payload truncated")
        pos += size


def encode_real_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an HxWx3 uint8 array as a real single-frame GIF89a.

    The global color table is the image's distinct colors; more than 256
    distinct colors raises ValueError (GIF is palette-bound by spec — callers
    quantize first, e.g. `(pixels // 32) * 32`).
    """
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_real_gif expects HxWx3 RGB uint8")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs <=256 distinct colors, image has {len(palette)}"
        )
    # color table size must be a power of two >= 2
    ct_bits = max(1, int(len(palette) - 1).bit_length())
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    indices = indices.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = np.concatenate(
            [np.arange(s, h, step) for s, step in _INTERLACE_PASSES]
        )
        indices = indices[rows]

    min_code_size = max(2, ct_bits)
    lzw = _lzw_encode(indices.reshape(-1), min_code_size)

    out = bytearray()
    out += b"GIF89a"
    # logical screen descriptor: global color table flag, color resolution,
    # sort flag 0, size bits
    packed = 0x80 | ((ct_bits - 1) << 4) | (ct_bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += ct.tobytes()
    # image descriptor (no local color table)
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    out += _sub_blocks(lzw)
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_real_gif_animation(frames: list[np.ndarray]) -> bytes:
    """Encode same-shape HxWx3 uint8 frames as a multi-frame GIF89a
    animation. Each frame carries its own LOCAL color table (so palettes
    need not be shared); every frame must quantize to <=256 colors."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    h, w = frames[0].shape[:2]
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global CT
    for px in frames:
        px = np.ascontiguousarray(px, dtype=np.uint8)
        if px.shape != (h, w, 3):
            raise ValueError("animation frames must share one HxWx3 shape")
        flat = px.reshape(-1, 3)
        palette, indices = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(
                f"GIF frame needs <=256 distinct colors, has {len(palette)}"
            )
        ct_bits = max(1, int(len(palette) - 1).bit_length())
        ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
        ct[: len(palette)] = palette
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x80 | (ct_bits - 1)  # local CT flag
        )
        out += ct.tobytes()
        min_code_size = max(2, ct_bits)
        out.append(min_code_size)
        out += _sub_blocks(
            _lzw_encode(indices.astype(np.uint8).reshape(-1), min_code_size)
        )
    out += b"\x3b"
    return bytes(out)


def _header_end(data: bytes) -> int:
    """Offset just past the logical screen descriptor + global color table
    (the prefix a standalone single-frame rebuild must carry)."""
    if data[:6] not in GIF_MAGICS or len(data) < 13:
        raise ValueError("GIF header truncated")
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    if pos > len(data):
        raise ValueError("GIF global color table truncated")
    return pos


def gif_frame_spans(data: bytes):
    """Yield (frame_idx, start, end) byte spans of every image descriptor
    block WITHOUT LZW-decoding payloads — the same seek-without-decode
    contract as functions/media.iter_frame_spans for DVID/AVI. Extensions
    between frames are skipped."""
    pos = _header_end(data)
    idx = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ended without trailer")
        block = data[pos]
        if block == 0x3B:
            return
        if block == 0x21:
            _, pos = _read_sub_blocks(data, pos + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        start = pos
        if pos + 10 > len(data):
            raise ValueError("GIF image descriptor truncated")
        ipacked = data[pos + 9]
        pos += 10
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        _, pos = _read_sub_blocks(data, pos)
        yield idx, start, pos
        idx += 1


def gif_frame_count(data: bytes) -> int:
    return sum(1 for _ in gif_frame_spans(data))


def extract_gif_frame(data: bytes, start: int, end: int) -> bytes:
    """Standalone single-frame GIF bytes for a span from gif_frame_spans:
    original header + global color table + the frame block + trailer.
    Only full-canvas frames are supported — a partial-frame (composited)
    animation frame raises ValueError and degrades via the F4 path; exact
    compositing with disposal methods is out of scope."""
    sw, sh = struct.unpack("<HH", data[6:10])
    ix, iy, iw, ih = struct.unpack("<HHHH", data[start + 1 : start + 9])
    if (ix, iy, iw, ih) != (0, 0, sw, sh):
        raise ValueError(
            "partial-frame GIF animation frames are not composited"
        )
    return data[: _header_end(data)] + data[start:end] + b"\x3b"


def decode_real_gif(data: bytes) -> np.ndarray:
    """Decode real GIF bytes -> HxWx3 uint8 RGB (first frame)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError(f"not a GIF stream: {data[:6]!r}")
    if len(data) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_ct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = data[pos : pos + 3 * n]
        if len(raw) < 3 * n:
            raise ValueError("GIF global color table truncated")
        global_ct = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ended before an image descriptor")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label byte then sub-blocks, skip
            pos += 1
            _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("GIF image descriptor truncated")
        _ix, _iy, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        # a first frame smaller than the logical screen would decode as just
        # the sub-rectangle while a compositing decoder returns a canvas-sized
        # image — degrade via F4 (mirrors extract_gif_frame) so the pixel sha
        # cannot depend on which decoder is installed
        if (_ix, _iy, iw, ih) != (0, 0, sw, sh):
            raise ValueError(
                "partial-frame GIF (descriptor != logical screen) not composited"
            )
        ct = global_ct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            raw = data[pos : pos + 3 * n]
            if len(raw) < 3 * n:
                raise ValueError("GIF local color table truncated")
            ct = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        if iw == 0 or ih == 0:
            raise ValueError("GIF image has zero dimension")
        if pos >= len(data):
            raise ValueError("GIF LZW header truncated")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code_size}")
        lzw, pos = _read_sub_blocks(data, pos)
        indices = _lzw_decode(lzw, min_code_size, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.concatenate(
                [np.arange(s, ih, step) for s, step in _INTERLACE_PASSES]
            )
            deinterlaced = np.empty_like(indices)
            deinterlaced[rows] = indices
            indices = deinterlaced
        if int(indices.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside color table")
        return ct[indices]
