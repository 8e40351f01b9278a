"""Pure python+numpy real-FLAC codec (no libFLAC / soundfile dependency).

Decoder: the FLAC stream format (RFC 9639 / xiph.org spec) — STREAMINFO +
skipped metadata blocks, then frames with CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32) subframes, Rice-coded residuals (both
4- and 5-bit parameter methods, escape-to-raw partitions), wasted bits,
and all four stereo decorrelation modes (independent, left-side,
side-right, mid-side). Frame-header CRC-8 and whole-frame CRC-16 are
verified — a corrupt frame raises ValueError, which try_decode_audio's F4
validity path turns into a degraded row, never a dead job.

Encoder: fixed 4096-sample blocks, independent channels, per-channel
CONSTANT / FIXED-order-2-with-Rice / VERBATIM selection (whichever is
smallest), correct CRCs and the spec's MD5 of the unencoded PCM — enough
to synthesize spec-compliant FLAC for the verify path and tests, the same
role functions/png.py and functions/jpeg.py play for images.

Role in the engine: the reference hashes raw file bytes (dupion/src/driver/
platterwalker.rs:268-344); the graft fingerprints DECODED SAMPLES
(functions/media.audio_fingerprint64), so a re-encoded duplicate
(WAV <-> FLAC of the same recording) must map to the same fingerprint.
This module makes that real for actual fLaC bytes in this container.

Not the 100 TB throughput path by itself: decode runs inside the existing
Arrow-batched pandas UDFs (operators/media.py); a production deployment
would swap in libFLAC via soundfile per worker — decode_audio can prefer
it when importable, with this module keeping semantics identical when not.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        r = byte << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader with byte-aligned position tracking (FLAC frames
    are byte-aligned at both ends, which is what the CRC spans need)."""

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos   # next byte to pull into the buffer
        self.buf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated stream")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        val = self.buf >> self.nbits
        self.buf &= (1 << self.nbits) - 1
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        drop = self.nbits % 8
        self.nbits -= drop
        self.buf &= (1 << self.nbits) - 1

    def byte_pos(self) -> int:
        """Current position in bytes; valid only when byte-aligned."""
        assert self.nbits % 8 == 0
        return self.pos - self.nbits // 8


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.buf = (self.buf << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.buf >> self.nbits) & 0xFF)
        self.buf &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q > 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then the terminating one bit

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    ones = 0
    probe = first
    while probe & 0x80:
        ones += 1
        probe = (probe << 1) & 0xFF
    if ones == 1 or ones > 7:
        raise ValueError("flac: bad UTF-8 coded number")
    val = first & (0x7F >> ones)
    for _ in range(ones - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _write_utf8_number(bw: _BitWriter, val: int) -> None:
    if val < 0x80:
        bw.write(val, 8)
        return
    chunks = []
    nbytes = 2
    while val >= (1 << (1 + 5 * nbytes)):  # capacity of an n-byte sequence
        nbytes += 1
    for _ in range(nbytes - 1):
        chunks.append(0x80 | (val & 0x3F))
        val >>= 6
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | val
    bw.write(lead, 8)
    for c in reversed(chunks):
        bw.write(c, 8)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    plen, escape = (4, 15) if method == 0 else (5, 31)
    po = br.read(4)
    if blocksize % (1 << po):
        raise ValueError("flac: blocksize not divisible by partition count")
    out: list[int] = []
    for part in range(1 << po):
        n = (blocksize >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | (br.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    code = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")

    if code == 0:  # CONSTANT
        samples = [br.read_signed(eff)] * blocksize
    elif code == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= code <= 12:  # FIXED
        order = code - 8
        samples = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        coeffs = _FIXED_COEFFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(r + pred)
    elif code >= 32:  # LPC
        order = (code & 31) + 1
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {code}")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(
    data: bytes, byte_pos: int, stream_rate: int, stream_bps: int,
    stream_channels: int,
) -> tuple[list[list[int]], int, int]:
    """Decode one frame starting at byte_pos. Returns (channels-major
    samples, sample_rate, next_byte_pos)."""
    br = _BitReader(data, byte_pos)
    sync = br.read(14)
    if sync != 0b11111111111110:
        raise ValueError("flac: lost frame sync")
    if br.read(1):
        raise ValueError("flac: reserved frame bit set")
    br.read(1)  # blocking strategy — frame/sample number parses identically
    bs_code = br.read(4)
    rate_code = br.read(4)
    chan_code = br.read(4)
    bps_code = br.read(3)
    if br.read(1):
        raise ValueError("flac: reserved frame bit set")
    _read_utf8_number(br)

    if bs_code == 0:
        raise ValueError("flac: reserved blocksize code")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODES[bs_code]

    if rate_code == 0:
        rate = stream_rate
    elif rate_code == 12:
        rate = br.read(8) * 1000
    elif rate_code == 13:
        rate = br.read(16)
    elif rate_code == 14:
        rate = br.read(16) * 10
    elif rate_code == 15:
        raise ValueError("flac: invalid sample-rate code")
    else:
        rate = _RATE_CODES[rate_code]

    bps = stream_bps if bps_code == 0 else _BPS_CODES.get(bps_code)
    if bps is None:
        raise ValueError("flac: reserved sample-size code")

    header_end = br.byte_pos()
    crc8 = br.read(8)
    if _crc8(data[byte_pos:header_end]) != crc8:
        raise ValueError("flac: frame header CRC-8 mismatch")

    if chan_code < 8:
        n_ch = chan_code + 1
        if n_ch != stream_channels:
            raise ValueError("flac: frame/stream channel count mismatch")
        chans = [_decode_subframe(br, blocksize, bps) for _ in range(n_ch)]
    elif chan_code in (8, 9, 10):
        if stream_channels != 2:
            raise ValueError("flac: stereo decorrelation in non-stereo stream")
        # the side channel carries one extra bit
        bps0 = bps + (1 if chan_code == 9 else 0)
        bps1 = bps + (1 if chan_code in (8, 10) else 0)
        c0 = _decode_subframe(br, blocksize, bps0)
        c1 = _decode_subframe(br, blocksize, bps1)
        if chan_code == 8:      # left / side
            chans = [c0, [left - s for left, s in zip(c0, c1)]]
        elif chan_code == 9:    # side / right
            chans = [[s + right for s, right in zip(c0, c1)], c1]
        else:                   # mid / side
            left, right = [], []
            for m, s in zip(c0, c1):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            chans = [left, right]
    else:
        raise ValueError(f"flac: reserved channel assignment {chan_code}")

    br.align()
    frame_end = br.byte_pos()
    crc16 = br.read(16)
    if _crc16(data[byte_pos:frame_end]) != crc16:
        raise ValueError("flac: frame CRC-16 mismatch")
    return chans, rate, br.byte_pos()


def decode_real_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a real FLAC stream -> (int16 samples [n, channels], rate).

    Sample sizes other than 16 bits are rescaled into the int16 range the
    engine's fingerprint path expects (>>(bps-16) / <<(16-bps)) — the
    fingerprint is amplitude-normalized anyway (functions/media.py)."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError(f"flac: bad magic {data[:4]!r}")
    pos = 4
    rate = channels = bps = None
    total = 0
    last = False
    first = True
    while not last:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + length]
        if first:
            if btype != 0 or length != 34:
                raise ValueError("flac: first metadata block not STREAMINFO")
            bits = int.from_bytes(body[10:18], "big")
            rate = bits >> 44
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            first = False
        pos += 4 + length

    if rate == 0:
        raise ValueError("flac: zero sample rate")
    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(data) and (total == 0 or len(chans[0]) < total):
        frame, rate, pos = _decode_frame(data, pos, rate, bps, channels)
        for c, samples in zip(chans, frame):
            c.extend(samples)
    if total and len(chans[0]) < total:
        raise ValueError("flac: stream ended before total_samples")
    if total:
        chans = [c[:total] for c in chans]

    arr = np.array(chans, dtype=np.int64).T  # [n, channels]
    if bps > 16:
        arr >>= bps - 16
    elif bps < 16:
        arr <<= 16 - bps
    return arr.astype(np.int16), int(rate)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

_ENC_BLOCK = 4096


def _rice_cost(zig: np.ndarray, k: int) -> int:
    return int(np.sum(zig >> k)) + len(zig) * (k + 1)


def _write_rice_residual(bw: _BitWriter, resid: np.ndarray) -> None:
    """Residual block, method 0 (4-bit params), partition order 0."""
    zig = ((resid << 1) ^ (resid >> 63)).astype(np.uint64)
    best_k, best_cost = 0, _rice_cost(zig, 0)
    for k in range(1, 15):
        c = _rice_cost(zig, k)
        if c < best_cost:
            best_k, best_cost = k, c
    bw.write(0, 2)        # method 0
    bw.write(0, 4)        # partition order 0
    bw.write(best_k, 4)
    for u in zig.tolist():
        bw.write_unary(u >> best_k)
        if best_k:
            bw.write(u & ((1 << best_k) - 1), best_k)


def _encode_subframe(bw: _BitWriter, samples: np.ndarray, bps: int) -> None:
    n = len(samples)
    if n and np.all(samples == samples[0]):
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)  # CONSTANT, no waste
        bw.write(int(samples[0]), bps)
        return
    order = 2 if n > 2 else 0
    use_fixed = False
    if order:
        s = samples.astype(np.int64)
        resid = s[2:] - 2 * s[1:-1] + s[:-2]
        zig = ((resid << 1) ^ (resid >> 63)).astype(np.uint64)
        cost = min(_rice_cost(zig, k) for k in range(15)) + 2 * bps + 6
        use_fixed = cost < n * bps
    if use_fixed:
        bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
        for v in samples[:order].tolist():
            bw.write(int(v), bps)
        _write_rice_residual(bw, resid)
    else:
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)  # VERBATIM
        for v in samples.tolist():
            bw.write(int(v), bps)


def encode_real_flac(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM (shape [n] or [n, channels<=8]) as spec-compliant
    FLAC: fixed 4096-sample blocks, independent channels, per-channel
    CONSTANT/FIXED-2/VERBATIM selection, correct CRC-8/CRC-16 and PCM MD5."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if not 1 <= ch <= 8:
        raise ValueError("flac: 1-8 channels")
    if sample_rate <= 0 or sample_rate >= (1 << 20):
        raise ValueError("flac: sample rate out of range")

    rate_code = next(
        (c for c, r in _RATE_CODES.items() if r == sample_rate), None
    )
    if rate_code is None:
        if sample_rate >= (1 << 16):
            raise NotImplementedError("flac: non-table rate >= 65536")
        rate_code = 13  # 16-bit Hz follows the coded number

    frames = bytearray()
    for idx, start in enumerate(range(0, n, _ENC_BLOCK)):
        block = samples[start:start + _ENC_BLOCK]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking strategy
        if bs == _ENC_BLOCK:
            bw.write(12, 4)         # 4096 from the table
        else:
            bw.write(7, 4)          # 16-bit blocksize-1 follows
        bw.write(rate_code, 4)
        bw.write(ch - 1, 4)         # independent channels
        bw.write(4, 3)              # 16-bit samples
        bw.write(0, 1)
        _write_utf8_number(bw, idx)
        if bs != _ENC_BLOCK:
            bw.write(bs - 1, 16)
        if rate_code == 13:
            bw.write(sample_rate, 16)
        bw.align()
        header = bw.bytes()
        bw2 = _BitWriter()
        for c in range(ch):
            _encode_subframe(bw2, block[:, c].astype(np.int64), 16)
        bw2.align()
        body = header + bytes([_crc8(header)]) + bw2.bytes()
        frames += body + struct.pack(">H", _crc16(body))

    md5 = hashlib.md5(
        np.ascontiguousarray(samples).tobytes()  # interleaved LE int16
    ).digest()
    info = struct.pack(">HH", _ENC_BLOCK, _ENC_BLOCK)
    info += b"\x00\x00\x00" * 2  # min/max framesize unknown
    bits = (sample_rate << 44) | ((ch - 1) << 41) | (15 << 36) | n
    info += bits.to_bytes(8, "big") + md5
    header = FLAC_MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:] + info
    return header + bytes(frames)
