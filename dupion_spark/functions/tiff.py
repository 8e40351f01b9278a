"""Pure numpy real-TIFF codec (no Pillow / libtiff dependency).

Baseline TIFF (TIFF 6.0 specification, Adobe 1992) is IFD-walk simple: a
byte-order header, a chain of tag directories, strip offsets, and raster
data that is either uncompressed or PackBits RLE. Decoding it makes `II*`/
`MM*` payloads first-class in functions/codec.decode_image alongside the
pure-numpy PNG / JPEG / GIF / BMP decoders.

Scope (ValueError / NotImplementedError outside it — the F4 validity path
degrades such rows to byte-hash handling, never kills the job):
  - decode: first IFD, 8-bit grayscale / RGB / RGBA (extra samples
    dropped) / palette-color, strip layout (any RowsPerStrip), compression
    1 (none), 5 (LZW, MSB-first with the spec's early code-width change)
    or 32773 (PackBits), both byte orders, PlanarConfiguration 1
  - encode: little-endian uncompressed 8-bit RGB, single strip (what a
    minimal TIFF writer emits)

Role in the reference: dupion hashes raw file bytes
(dupion/src/driver/platterwalker.rs:268-344); the graft hashes *decoded
pixels* (input_hint), so a TIFF and a PNG of the same frame exact-collide.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

# tag ids (TIFF 6.0 baseline)
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_COLOR_MAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def encode_real_tiff(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a minimal little-endian TIFF
    (uncompressed, one strip)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_real_tiff expects HxWx3 RGB uint8")
    h, w, _ = pixels.shape
    data = pixels.tobytes()
    # layout: 8-byte header | pixel data | BitsPerSample array | IFD
    data_off = 8
    bps_off = data_off + len(data)
    ifd_off = bps_off + 6
    tags = [
        (_IMAGE_WIDTH, 3, 1, w),
        (_IMAGE_LENGTH, 3, 1, h),
        (_BITS_PER_SAMPLE, 3, 3, bps_off),
        (_COMPRESSION, 3, 1, 1),
        (_PHOTOMETRIC, 3, 1, 2),          # RGB
        (_STRIP_OFFSETS, 4, 1, data_off),
        (_SAMPLES_PER_PIXEL, 3, 1, 3),
        (_ROWS_PER_STRIP, 3, 1, h),
        (_STRIP_BYTE_COUNTS, 4, 1, len(data)),
        (_PLANAR_CONFIG, 3, 1, 1),
    ]
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += data
    out += struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<H", len(tags))
    for tag, typ, count, value in tags:
        out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 section 13): MSB-first bit packing,
    ClearCode 256 / EOI 257, and the spec's EARLY code-width change (width
    grows when the table reaches 2^width - 1, one code earlier than the
    GIF variant in functions/gif.py)."""
    roots = [bytes([i]) for i in range(256)]
    table = roots + [b"", b""]
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == 256:
            table = roots + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if code < len(table):
            entry = table[code]
            if not entry:
                raise ValueError("TIFF LZW code refers to clear/EOI slot")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:  # early change
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(f"TIFF LZW short: {len(out)} of {expected}")
    return bytes(out[:expected])


def _lzw_encode_tiff(raw: bytes) -> bytes:
    """TIFF-variant LZW compressor, in exact lockstep with
    _lzw_decode_tiff's width schedule (used to synthesize test fixtures)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def write(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    def reset() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = reset()
    write(256, width)
    buf = b""
    for b in raw:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        write(table[buf], width)
        if next_code < 4093:  # spec: clear before the table fills
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:  # early change
                width += 1
        else:
            write(256, width)
            table, next_code, width = reset()
        buf = bytes([b])
    if buf:
        write(table[buf], width)
    write(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 section 9)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while len(out) < expected:
        if pos >= n:
            raise ValueError("PackBits stream truncated")
        code = data[pos]
        pos += 1
        if code < 128:  # literal run of code+1 bytes
            end = pos + code + 1
            if end > n:
                raise ValueError("PackBits literal truncated")
            out += data[pos:end]
            pos = end
        elif code > 128:  # repeat next byte 257-code times
            if pos >= n:
                raise ValueError("PackBits repeat truncated")
            out += bytes([data[pos]]) * (257 - code)
            pos += 1
        # code == 128: no-op per spec
    return bytes(out[:expected])


def decode_real_tiff(data: bytes) -> np.ndarray:
    """Decode real TIFF bytes -> HxWx3 uint8 RGB (first IFD)."""
    if data[:4] not in TIFF_MAGICS:
        raise ValueError(f"not a TIFF stream: {data[:4]!r}")
    bo = "<" if data[:2] == b"II" else ">"
    if len(data) < 8:
        raise ValueError("TIFF header truncated")
    ifd_off = struct.unpack(bo + "I", data[4:8])[0]

    def read_entry(pos: int) -> tuple[int, int, int, bytes]:
        tag, typ, count = struct.unpack(bo + "HHI", data[pos : pos + 8])
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = data[pos + 8 : pos + 8 + size]
        else:
            off = struct.unpack(bo + "I", data[pos + 8 : pos + 12])[0]
            raw = data[off : off + size]
            if len(raw) < size:
                raise ValueError("TIFF tag payload truncated")
        return tag, typ, count, raw

    def values(typ: int, count: int, raw: bytes) -> list[int]:
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            raise NotImplementedError(f"TIFF tag type {typ}")
        return list(struct.unpack(bo + fmt * count, raw))

    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD truncated")
    n_tags = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])[0]
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        pos = ifd_off + 2 + 12 * i
        if pos + 12 > len(data):
            raise ValueError("TIFF IFD entry truncated")
        tag, typ, count, raw = read_entry(pos)
        if tag in (_IMAGE_WIDTH, _IMAGE_LENGTH, _BITS_PER_SAMPLE,
                   _COMPRESSION, _PHOTOMETRIC, _STRIP_OFFSETS,
                   _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP, _STRIP_BYTE_COUNTS,
                   _PLANAR_CONFIG, _PREDICTOR, _COLOR_MAP):
            tags[tag] = values(typ, count, raw)

    try:
        w = tags[_IMAGE_WIDTH][0]
        h = tags[_IMAGE_LENGTH][0]
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_BYTE_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}")
    if w == 0 or h == 0:
        raise ValueError("TIFF has zero dimension")
    compression = tags.get(_COMPRESSION, [1])[0]
    if compression not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {compression}")
    # Predictor 2 (horizontal differencing, the common libtiff/Adobe LZW
    # default) stores per-sample deltas; decoding those bytes as raw pixels
    # would be silently wrong — degrade via F4 instead (TIFF 6.0 §14)
    if tags.get(_PREDICTOR, [1])[0] != 1:
        raise NotImplementedError(f"TIFF predictor {tags[_PREDICTOR][0]}")
    if tags.get(_PLANAR_CONFIG, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bps = tags.get(_BITS_PER_SAMPLE, [8] * spp)
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bit depths {bps}")
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0] or h

    row_bytes = w * spp
    raster = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF strip truncated")
        n_rows = min(rows_per_strip, h - i * rows_per_strip)
        if n_rows <= 0:
            break
        if compression == 32773:
            raster += _packbits_decode(strip, n_rows * row_bytes)
        elif compression == 5:
            raster += _lzw_decode_tiff(strip, n_rows * row_bytes)
        else:
            if cnt < n_rows * row_bytes:
                raise ValueError("TIFF strip short")
            raster += strip[: n_rows * row_bytes]
    if len(raster) < h * row_bytes:
        raise ValueError("TIFF raster short")
    px = np.frombuffer(bytes(raster[: h * row_bytes]), dtype=np.uint8)
    px = px.reshape(h, w, spp)

    if photometric == 3:  # palette-color: ColorMap is 3*2^bps 16-bit values
        if _COLOR_MAP not in tags:
            raise ValueError("TIFF palette image missing ColorMap")
        cmap = np.array(tags[_COLOR_MAP], dtype=np.uint16)
        n = len(cmap) // 3
        # 16-bit palette entries scale to 8-bit (TIFF 6.0: 0..65535)
        palette = (cmap.reshape(3, n).T // 257).astype(np.uint8)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF pixel index outside ColorMap")
        return palette[idx]
    if photometric == 0:  # WhiteIsZero grayscale: invert
        px = 255 - px
        photometric = 1
    if spp == 1:
        return np.repeat(px, 3, axis=2)
    if spp >= 3:
        return np.ascontiguousarray(px[:, :, :3])
    raise NotImplementedError(f"TIFF samples per pixel {spp}")
