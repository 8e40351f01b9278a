"""Real-FLAC codec (functions/flac.py): spec-compliant roundtrips through
the subframe types the encoder emits, hand-built frames for the decode-only
paths (LPC, stereo decorrelation, escaped Rice partitions), CRC rejection,
and the engine-level property that matters: a WAV<->FLAC re-encode of the
same recording fingerprints identically. No Spark needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dupion_spark.functions import flac as F
from dupion_spark.functions.media import (
    audio_fingerprint64,
    decode_audio,
    encode_audio,
    try_decode_audio,
)


def _tone(n=10000, rate=8000, freq=440.0, amp=9000, ch=1, seed=0):
    t = np.arange(n) / rate
    rng = np.random.default_rng(seed)
    sig = amp * np.sin(2 * np.pi * freq * t) + rng.normal(0, 40, n)
    mono = np.clip(sig, -32768, 32767).astype(np.int16)
    if ch == 1:
        return mono[:, None]
    return np.stack([mono, np.roll(mono, 7)], axis=1)


def test_roundtrip_mono_tone():
    pcm = _tone()
    data = F.encode_real_flac(pcm, 8000)
    out, rate = F.decode_real_flac(data)
    assert rate == 8000
    assert np.array_equal(out, pcm)
    # the FIXED+Rice path engaged: tonal PCM must beat raw 16-bit storage
    assert len(data) < pcm.nbytes


def test_roundtrip_stereo_multiblock():
    pcm = _tone(n=3 * 4096 + 123, ch=2, seed=1)  # forces a short last frame
    data = F.encode_real_flac(pcm, 44100)
    out, rate = F.decode_real_flac(data)
    assert rate == 44100
    assert np.array_equal(out, pcm)


def test_roundtrip_constant_and_noise():
    silence = np.zeros((5000, 1), dtype=np.int16)
    out, _ = F.decode_real_flac(F.encode_real_flac(silence, 16000))
    assert np.array_equal(out, silence)
    # full-scale white noise defeats the fixed predictor -> VERBATIM frames
    rng = np.random.default_rng(2)
    noise = rng.integers(-32768, 32768, size=(5000, 1)).astype(np.int16)
    out, _ = F.decode_real_flac(F.encode_real_flac(noise, 16000))
    assert np.array_equal(out, noise)


def test_roundtrip_nontable_rate_and_empty():
    pcm = _tone(n=777)
    out, rate = F.decode_real_flac(F.encode_real_flac(pcm, 11025))
    assert rate == 11025 and np.array_equal(out, pcm)
    out, rate = F.decode_real_flac(
        F.encode_real_flac(np.zeros((0, 1), np.int16), 8000)
    )
    assert out.shape == (0, 1)


def test_crc_rejection():
    data = bytearray(F.encode_real_flac(_tone(n=2000), 8000))
    data[-3] ^= 0x40  # flip a bit inside the last frame's subframe data
    # usually surfaces as a CRC-16 mismatch; a flip that derails Rice
    # decoding first still raises ValueError (never wrong samples)
    with pytest.raises(ValueError):
        F.decode_real_flac(bytes(data))
    assert try_decode_audio(bytes(data)) is None


def test_truncated_and_garbage():
    data = F.encode_real_flac(_tone(n=2000), 8000)
    with pytest.raises(ValueError):
        F.decode_real_flac(data[: len(data) // 2])
    assert try_decode_audio(b"fLaC" + b"\x00" * 20) is None


def _hand_frame(stream_rate, subframe_writers, chan_code, blocksize, bps=16):
    """Build one frame with caller-supplied subframe writers (decode-only
    paths the encoder never emits)."""
    bw = F._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)             # 16-bit blocksize-1 follows
    bw.write(0, 4)             # rate from STREAMINFO
    bw.write(chan_code, 4)
    bw.write(4, 3)             # 16-bit
    bw.write(0, 1)
    F._write_utf8_number(bw, 0)
    bw.write(blocksize - 1, 16)
    bw.align()
    header = bw.bytes()
    bw2 = F._BitWriter()
    for w in subframe_writers:
        w(bw2)
    bw2.align()
    body = header + bytes([F._crc8(header)]) + bw2.bytes()
    return body + struct.pack(">H", F._crc16(body))


def _stream(frame_bytes, rate, channels, total):
    info = struct.pack(">HH", 4096, 4096) + b"\x00" * 6
    bits = (rate << 44) | ((channels - 1) << 41) | (15 << 36) | total
    info += bits.to_bytes(8, "big") + b"\x00" * 16
    return F.FLAC_MAGIC + bytes([0x80, 0, 0, 34]) + info + frame_bytes


def test_lpc_subframe_decodes():
    # order-2 LPC: coeffs [3, -1] at shift 1 -> pred = (3*s1 - s2) >> 1
    warm = [100, 110]
    resid = [5, -3, 0, 7, -2, 1, 4, -6, 2, 0, 3, -1, 8, -4]
    expect = list(warm)
    for r in resid:
        expect.append(r + ((3 * expect[-1] - expect[-2]) >> 1))
    n = len(expect)

    def w(bw):
        bw.write(0, 1)
        bw.write(0b100001, 6)   # LPC order 2
        bw.write(0, 1)          # no wasted bits
        for v in warm:
            bw.write(v, 16)
        bw.write(14, 4)         # precision 15
        bw.write(1, 5)          # shift 1
        bw.write(3, 15)
        bw.write(-1, 15)
        bw.write(0, 2)          # rice method 0
        bw.write(0, 4)          # partition order 0
        bw.write(3, 4)          # rice param 3
        for r in resid:
            u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
            bw.write_unary(u >> 3)
            bw.write(u & 7, 3)

    data = _stream(_hand_frame(8000, [w], 0, n), 8000, 1, n)
    out, _ = F.decode_real_flac(data)
    assert out[:, 0].tolist() == expect


@pytest.mark.parametrize("chan_code", [8, 9, 10])
def test_stereo_decorrelation(chan_code):
    left = [100, -200, 300, 47, -1, 0, 8191, -8192]
    right = [90, -210, 310, 50, 1, -3, 8000, -8000]
    n = len(left)
    side = [l - r for l, r in zip(left, right)]
    if chan_code == 8:    # left / side
        c0, b0, c1, b1 = left, 16, side, 17
    elif chan_code == 9:  # side / right
        c0, b0, c1, b1 = side, 17, right, 16
    else:                 # mid / side
        c0 = [(l + r) >> 1 for l, r in zip(left, right)]
        b0, c1, b1 = 16, side, 17

    def verbatim(vals, bits):
        def w(bw):
            bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
            for v in vals:
                bw.write(v, bits)
        return w

    data = _stream(
        _hand_frame(8000, [verbatim(c0, b0), verbatim(c1, b1)], chan_code, n),
        8000, 2, n,
    )
    out, _ = F.decode_real_flac(data)
    assert out[:, 0].tolist() == left
    assert out[:, 1].tolist() == right


def test_escaped_rice_partition():
    # FIXED order 0 with an escaped (raw 6-bit) residual partition
    vals = [1, -2, 3, -4, 5, -6, 7, -8]

    def w(bw):
        bw.write(0, 1)
        bw.write(8, 6)          # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)          # method 0
        bw.write(0, 4)          # partition order 0
        bw.write(15, 4)         # ESCAPE
        bw.write(6, 5)          # raw 6-bit residuals
        for v in vals:
            bw.write(v, 6)

    n = len(vals)
    data = _stream(_hand_frame(8000, [w], 0, n), 8000, 1, n)
    out, _ = F.decode_real_flac(data)
    assert out[:, 0].tolist() == vals


def test_wasted_bits():
    # CONSTANT subframe with 2 wasted bits: stored value 25 -> sample 100
    def w(bw):
        bw.write(0, 1); bw.write(0, 6)
        bw.write(1, 1)          # wasted-bits flag
        bw.write_unary(1)       # unary 1 -> wasted = 2
        bw.write(25, 14)        # bps - wasted = 14 bits

    data = _stream(_hand_frame(8000, [w], 0, 4), 8000, 1, 4)
    out, _ = F.decode_real_flac(data)
    assert out[:, 0].tolist() == [100] * 4


def test_dispatch_and_fingerprint_invariance():
    """The engine property: WAV and FLAC encodings of the same recording —
    including a half-volume FLAC remaster — carry the same fingerprint."""
    pcm = _tone(n=16000, rate=16000, freq=523.25, seed=4)
    wav_like = encode_audio(pcm, 16000)
    flac_bytes = F.encode_real_flac(pcm, 16000)
    s1, r1 = decode_audio(wav_like)
    s2, r2 = decode_audio(flac_bytes)   # dispatches on b"fLaC"
    assert r1 == r2 and np.array_equal(s1, s2)
    half = F.encode_real_flac((pcm.astype(np.int32) // 2).astype(np.int16), 16000)
    s3, _ = decode_audio(half)
    assert audio_fingerprint64(s1, r1) == audio_fingerprint64(s3, 16000)
