"""Pure numpy baseline JPEG codec (no Pillow / libjpeg).

Decoder: baseline sequential DCT JPEG (ITU-T T.81 / ISO 10918-1) — SOI,
APPn/COM, DQT (8/16-bit), SOF0, DHT, DRI, SOS, RSTn; grayscale or YCbCr with
arbitrary 1-2 sampling factors (4:4:4, 4:2:2, 4:2:0). Entropy decode is a
canonical-Huffman bit reader honoring 0xFF00 stuffing and restart markers;
dequantize + zigzag + batched IDCT run vectorized over all blocks of a
component (one einsum per component, not per block).

Encoder: baseline 4:4:4 with the T.81 Annex K example tables (quant tables
K.1/K.2 scaled by the libjpeg quality formula, Huffman tables K.3) — enough
to synthesize spec-compliant JPEGs for the verify path and the tests, the
same role functions/png.py plays for PNG.

Role in the engine: the reference hashes raw file bytes (dupion/src/driver/
platterwalker.rs:268-344); the graft hashes DECODED PIXELS (input_hint), so a
re-encoded duplicate (PNG <-> JPEG of the same image) must still verify at
PSNR >= 40 dB. This module makes that real for actual JPEG bytes in this
container instead of Pillow-gating it.

Not the 100 TB throughput path by itself: per-image decode runs inside the
existing Arrow-batched pandas UDFs (functions/spark_udfs.py), which is where
the parallelism lives; a production deployment would swap in libjpeg-turbo
via Pillow/pyturbojpeg per worker — decode_image already prefers Pillow when
importable, and this module keeps the semantics identical when it is not.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared 8x8 DCT machinery -----------------------------------------------
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal DCT-II matrix: T @ block @ T.T = forward, T.T @ coef @ T = inverse
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
_DCT_T = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_DCT_T[0, :] = np.sqrt(1.0 / 8.0)


# --- T.81 Annex K example tables ---------------------------------------------
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) — K.3.3.1/K.3.3.2
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the decoder."""
    return {
        (length, code): val
        for val, (code, length) in _canonical_codes(bits, values).items()
    }


# =============================================================================
# Decoder
# =============================================================================
class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 stuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # past the scan (EOI/next marker): T.81 pads with 1-bits
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume the RSTn marker and byte-align."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        # skip to the marker (reader may already sit on it)
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        val = table.get((length, code))
        if val is not None:
            return val
    raise ValueError("invalid JPEG: huffman code longer than 16 bits")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_real_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential JPEG bytes -> HxWx3 uint8 RGB array
    (grayscale replicates into 3 channels, matching Pillow's convert('RGB')
    in codec.decode_image). Truncated/corrupt inputs raise ValueError —
    the F4 validity contract try_decode_image depends on."""
    try:
        return _decode_real_jpeg(data)
    except (IndexError, struct.error) as exc:  # truncated segment/stream
        raise ValueError(f"invalid JPEG: {exc}") from exc
    except KeyError as exc:  # scan references a table no DQT/DHT defined
        # (e.g. MJPEG frames relying on fixed tables — see functions/avi.py
        # ensure_dht); must surface as ValueError for the F4 validity path
        raise ValueError(f"invalid JPEG: undefined table {exc}") from exc


def _decode_real_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > n:
            raise ValueError("invalid JPEG: truncated segment header")
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError("invalid JPEG: bad segment length")
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qt[tq] = tbl  # kept in ZIGZAG order (coef storage matches)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17:p + 17 + nvals])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF0")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + si * 2:3 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            pixels = _decode_scan(
                data, pos + seg_len, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
            return pixels
        pos += seg_len
    raise ValueError("invalid JPEG: no scan data")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    # per-component coefficient storage: (blocks_y, blocks_x, 64)
    coefs = {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
        for c in comps
    }
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            try:
                for comp, td, ta in scan:
                    dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = np.zeros(64, dtype=np.int64)
                            size = _huff_decode(reader, dc_tbl)
                            diff = _extend(reader.read_bits(size), size)
                            pred[comp["id"]] += diff
                            blk[0] = pred[comp["id"]]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(reader, ac_tbl)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("invalid JPEG: AC overrun")
                                blk[k] = _extend(reader.read_bits(s), s)
                                k += 1
                            coefs[comp["id"]][
                                my * comp["v"] + by, mx * comp["h"] + bx
                            ] = blk
            except _RestartMarker:
                raise ValueError("invalid JPEG: unexpected restart marker")
            mcu_index += 1

    # dequantize + batched IDCT + reassemble per component
    planes = []
    for comp in comps:
        cf = coefs[comp["id"]].astype(np.float64)
        cf *= qt[comp["tq"]].astype(np.float64)[None, None, :]  # both zigzag
        by, bx = cf.shape[:2]
        blocks = cf[:, :, _UNZIGZAG]  # zigzag -> natural order
        blocks = blocks.reshape(by, bx, 8, 8)
        spatial = np.einsum("ki,yxij,jl->yxkl", _DCT_T.T, blocks, _DCT_T)
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample to full MCU-grid resolution, then crop to (h, w)
        ry, rx = max_v // comp["v"], max_h // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# =============================================================================
# Encoder (baseline, 4:4:4, Annex K tables, libjpeg quality scaling)
# =============================================================================
def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _magnitude(v: int) -> tuple[int, int]:
    """(size, SIZE-bit representation) of a coefficient (T.81 F.1.2.1.1)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def encode_real_jpeg(pixels: np.ndarray, quality: int = 98) -> bytes:
    """Encode an HxWx3 (or HxWx1) uint8 array as a baseline 4:4:4 JFIF JPEG.

    Default quality 98: the synthetic fixtures carry +-6 high-frequency
    noise, and a re-encoded DUPLICATE must stay above the engine's 40 dB
    PSNR verify gate (measured on the fixture texture: q92 -> 34.5 dB,
    q97 -> 40.1, q98 -> 43.3) — same contract as the DPJG stand-in codec's
    ~46.9 dB."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3:
        raise ValueError("expected HxWxC pixels")
    h, w, c = pixels.shape
    rgb = pixels.astype(np.float64)
    if c == 1:
        rgb = np.repeat(rgb, 3, axis=2)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qy = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)
    enc_dc = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    enc_ac = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    # pad to 8 via edge replication, block-split, batch forward DCT
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8

    def _blocks(plane: np.ndarray) -> np.ndarray:
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        by, bx = ph // 8, pw // 8
        blk = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        return np.einsum("ki,yxij,lj->yxkl", _DCT_T, blk, _DCT_T)

    comps = [(1, y, qy, 0), (2, cb, qc, 1), (3, cr, qc, 1)]
    quantized = []
    for _cid, plane, q, _t in comps:
        coef = _blocks(plane)
        qz = np.round(coef / q.reshape(8, 8)).astype(np.int64)
        quantized.append(qz.reshape(qz.shape[0], qz.shape[1], 64)[:, :, _ZIGZAG])

    writer = _BitWriter()
    pred = [0, 0, 0]
    by, bx = ph // 8, pw // 8
    for yb in range(by):
        for xb in range(bx):
            for ci, (_cid, _plane, _q, t) in enumerate(comps):
                zz = quantized[ci][yb, xb]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, bitsv = _magnitude(diff)
                code, length = enc_dc[t][size]
                writer.write(code, length)
                if size:
                    writer.write(bitsv, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc_ac[t][0xF0]  # ZRL
                        writer.write(code, length)
                        run -= 16
                    size, bitsv = _magnitude(v)
                    code, length = enc_ac[t][(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bitsv, size)
                    run = 0
                if last_nz < 63:
                    code, length = enc_ac[t][0x00]  # EOB
                    writer.write(code, length)
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    # quant tables go on the wire in zigzag order of the natural-order table
    for tq, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in q[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w)
    out += b"\x03"
    for cid, _plane, _q, t in comps:
        out += bytes([cid, 0x11, t])  # 1x1 sampling, quant table t
    for tc_th, (bits, vals) in ((0x00, _DC_LUMA), (0x10, _AC_LUMA),
                                (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
    for cid, _plane, _q, t in comps:
        out += bytes([cid, (t << 4) | t])
    out += b"\x00\x3f\x00"
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
