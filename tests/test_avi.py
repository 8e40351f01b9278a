"""Real AVI (RIFF/MJPEG) container tests: encode -> span walk -> per-frame
JPEG decode without ffmpeg/Pillow, DHT-omission quirk, F4 degradation, and
the Spark frame-sampling path over a mixed DVID + AVI corpus."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dupion_spark.functions import avi, codec, media
from dupion_spark.functions.jpeg import encode_real_jpeg


def _pixels(seed: int, h: int = 32, w: int = 24) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth gradient + mild noise: survives JPEG quality 98 at high PSNR
    base = np.linspace(0, 200, w, dtype=np.float64)[None, :, None]
    img = base + rng.normal(0, 3, size=(h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _make_avi(n_frames: int = 5, seed: int = 7) -> tuple[bytes, list[np.ndarray]]:
    pix = [_pixels(seed + i) for i in range(n_frames)]
    frames = [encode_real_jpeg(p, quality=98) for p in pix]
    return avi.encode_avi_mjpeg(frames, width=24, height=32, fps=10), pix


def test_avi_roundtrip_spans_and_decode():
    data, pix = _make_avi(5)
    assert avi.is_avi(data)
    meta = avi.avi_meta(data)
    assert (meta["width"], meta["height"]) == (24, 32)
    assert meta["total_frames"] == 5
    assert meta["handler"] == "MJPG"
    assert abs(meta["fps"] - 10.0) < 0.01
    spans = list(avi.avi_frame_spans(data))
    assert [i for i, _, _ in spans] == list(range(5))
    for i, start, end in spans:
        decoded = codec.decode_image(data[start:end])
        assert _psnr(decoded, pix[i]) >= 40.0


def test_avi_frame_count_header_and_fallback():
    data, _ = _make_avi(4)
    assert avi.avi_frame_count(data) == 4
    # zero out avih dwTotalFrames (streamed-writer convention): falls back
    # to the movi walk
    pos = data.find(b"avih") + 8 + 16
    lying = data[:pos] + b"\x00\x00\x00\x00" + data[pos + 4:]
    assert avi.avi_meta(lying)["total_frames"] == 0
    assert avi.avi_frame_count(lying) == 4


def test_avi_odd_length_frame_padding():
    # force an odd-length JPEG payload to exercise RIFF even-padding
    p = _pixels(3)
    f = encode_real_jpeg(p, quality=98)
    if len(f) % 2 == 0:
        f += b"\xff\xd9"[:0] + b""  # keep bytes valid; instead append COM
    if len(f) % 2 == 0:
        # append a 1-byte-odd COM segment before EOI to make length odd
        com = b"\xff\xfe" + struct.pack(">H", 3) + b"x"
        f = f[:-2] + com + f[-2:]
    assert len(f) % 2 == 1
    data = avi.encode_avi_mjpeg([f, f], width=24, height=32)
    spans = list(avi.avi_frame_spans(data))
    assert len(spans) == 2
    for _, start, end in spans:
        assert _psnr(codec.decode_image(data[start:end]), p) >= 40.0


def test_ensure_dht_splices_standard_tables():
    p = _pixels(11)
    jpeg = encode_real_jpeg(p, quality=98)
    # strip every DHT segment (the MJPEG fixed-tables convention)
    out, pos = bytearray(jpeg[:2]), 2
    while pos < len(jpeg):
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            break
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos:pos + 2 + seg_len]
        pos += 2 + seg_len
    stripped = bytes(out)
    assert b"\xff\xc4" not in stripped.split(b"\xff\xda")[0]
    with pytest.raises(ValueError):
        codec.decode_image(stripped)
    fixed = avi.ensure_dht(stripped)
    assert np.array_equal(codec.decode_image(fixed), codec.decode_image(jpeg))
    # idempotent on frames that already carry tables
    assert avi.ensure_dht(jpeg) is jpeg


def test_media_dispatch_real_avi():
    data, pix = _make_avi(6)
    assert media.video_frame_count(data) == 6
    assert media.try_video_frame_count(data) == 6
    spans = list(media.iter_frame_spans(data))
    assert len(spans) == 6
    frame3 = media.decode_video_frame(data, 3)
    assert _psnr(frame3, pix[3]) >= 40.0


def test_media_dispatch_corrupt_avi_degrades():
    data, _ = _make_avi(3)
    truncated = data[: len(data) // 2]
    # the avih header survives truncation (metadata-only count is fine);
    # the span walk — the path that touches payload extents — must raise,
    # which sample_frames degrades to the frame_idx=-1 F4 row
    with pytest.raises((ValueError, struct.error)):
        list(media.iter_frame_spans(truncated))
    # bad magic altogether -> None
    assert media.try_video_frame_count(b"\x00" * 16) is None


def test_sample_frames_mixed_dvid_and_avi(spark):
    from dupion_spark.config import DedupConfig
    from dupion_spark.operators.media import sample_frames

    avi_bytes, _ = _make_avi(7, seed=21)
    dvid_frames = [codec.encode_png(_pixels(31 + i)) for i in range(4)]
    dvid_bytes = media.encode_video(dvid_frames)
    corrupt = avi_bytes[:40]
    df = spark.createDataFrame(
        [("v_avi", avi_bytes), ("v_dvid", dvid_bytes), ("v_bad", corrupt)],
        "video_id string, bytes binary",
    )
    rows = sample_frames(df, DedupConfig(), stride=3).collect()
    by_vid: dict[str, list] = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r)
    # stride 3 over 7 frames -> indices 0, 3, 6
    assert sorted(r.frame_idx for r in by_vid["v_avi"]) == [0, 3, 6]
    assert all(r.n_frames == 7 for r in by_vid["v_avi"])
    assert all(r.phash is not None for r in by_vid["v_avi"])
    assert sorted(r.frame_idx for r in by_vid["v_dvid"]) == [0, 3]
    assert [r.frame_idx for r in by_vid["v_bad"]] == [-1]
