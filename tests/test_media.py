"""Multimodal (audio/video/resize) operator tests.

Codec roundtrips run without Spark; operator tests use the shared session and
tiny in-test tables — the point is the Arrow plumbing (schemas, batch shapes,
NULL degradation) plus the dedup-relevant invariants (fingerprint stability
under re-encode, frame-sample seek semantics)."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from dupion_spark.functions import codec, media
from dupion_spark.operators import media as media_ops


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _tone(rate: int, secs: float, freqs, seed: int = 0) -> np.ndarray:
    """Deterministic multi-tone int16 clip with a little noise floor."""
    t = np.arange(int(rate * secs)) / rate
    sig = sum(np.sin(2 * np.pi * f * t) / len(list(freqs)) for f in freqs)
    sig = sig + 0.01 * _rng(seed).standard_normal(t.shape)
    return np.clip(sig * 12000, -32768, 32767).astype(np.int16)


# --------------------------------------------------------------------------
# codecs (no Spark)
# --------------------------------------------------------------------------

def test_audio_roundtrip_mono_and_stereo():
    mono = _tone(8000, 0.5, [440])
    blob = media.encode_audio(mono, 8000)
    samples, rate = media.decode_audio(blob)
    assert rate == 8000 and samples.shape == (4000, 1)
    assert np.array_equal(samples[:, 0], mono)

    stereo = np.stack([mono, mono[::-1]], axis=1)
    samples2, _ = media.decode_audio(media.encode_audio(stereo, 8000))
    assert samples2.shape == (4000, 2)
    assert np.array_equal(samples2, stereo)


def test_real_riff_wav_decodes_via_stdlib():
    mono = _tone(8000, 0.25, [440])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(mono.tobytes())
    samples, rate = media.decode_audio(buf.getvalue())
    assert rate == 8000
    assert np.array_equal(samples[:, 0], mono)


def test_audio_validity_degradation():
    assert media.try_decode_audio(b"garbage-not-audio") is None
    assert media.try_decode_audio(media.MAGIC_AUDIO + b"\x01") is None  # truncated
    # compressed formats are an honest NotImplementedError -> None via try_
    assert media.try_decode_audio(b"fLaC" + b"\x00" * 16) is None


def test_audio_fingerprint_volume_invariant_and_content_sensitive():
    rate = 8000
    a = _tone(rate, 1.0, [440, 1200], seed=1)
    quiet = (a.astype(np.int32) // 4).astype(np.int16)  # -12 dB re-master
    different = _tone(rate, 1.0, [3100, 700], seed=2)

    fp = media.audio_fingerprint64(a[:, None], rate)
    fp_quiet = media.audio_fingerprint64(quiet[:, None], rate)
    fp_diff = media.audio_fingerprint64(different[:, None], rate)

    def ham(x, y):
        return bin((x & (2**64 - 1)) ^ (y & (2**64 - 1))).count("1")

    assert ham(fp, fp_quiet) <= 6  # near-dup after volume change
    assert ham(fp, fp_diff) >= 16  # different content stays far


def _frame(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    return _rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_video_container_roundtrip_and_seek():
    frames = [codec.encode_png(_frame(i)) for i in range(7)]
    blob = media.encode_video(frames)
    assert media.video_frame_count(blob) == 7
    spans = list(media.iter_frame_spans(blob))
    assert [i for i, _, _ in spans] == list(range(7))
    # span slices are exactly the encoded frames — seek needs no decompression
    for i, start, end in spans:
        assert blob[start:end] == frames[i]
    assert np.array_equal(media.decode_video_frame(blob, 3), _frame(3))
    assert media.try_video_frame_count(b"nope") is None


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def video_df(spark):
    shared = [codec.encode_png(_frame(100 + i)) for i in range(4)]
    rows = [
        # v_a and v_b share sampled frames 0 and 10 (stride 10 samples both)
        ("v_a", media.encode_video(shared[:1] * 10 + shared[1:2] * 5)),
        ("v_b", media.encode_video(shared[:1] * 10 + shared[1:2] * 3)),
        ("v_c", media.encode_video([codec.encode_png(_frame(200 + i)) for i in range(12)])),
        ("v_bad", b"not-a-video"),
    ]
    return spark.createDataFrame(rows, "video_id string, bytes binary")


def test_sample_frames_stride_and_validity(spark, video_df, cfg):
    frames = media_ops.sample_frames(video_df, cfg, stride=10).toPandas()
    by_vid = frames.groupby("video_id")["frame_idx"].apply(list).to_dict()
    assert sorted(by_vid["v_a"]) == [0, 10]
    assert sorted(by_vid["v_b"]) == [0, 10]
    assert sorted(by_vid["v_c"]) == [0, 10]
    assert by_vid["v_bad"] == [-1]
    bad = frames[frames.video_id == "v_bad"]
    assert bad.phash.isna().all() and bad.n_frames.isna().all()
    ok = frames[frames.video_id != "v_bad"]
    assert ok.phash.notna().all() and ok.simhash.notna().all()


def test_video_pair_candidates_find_planted_pair(spark, video_df, cfg):
    frames = media_ops.sample_frames(video_df, cfg, stride=10)
    pairs = media_ops.video_pair_candidates(frames, min_shared=2).toPandas()
    assert len(pairs) == 1
    row = pairs.iloc[0]
    assert (row.id_l, row.id_r) == ("v_a", "v_b")
    assert row.shared_frames == 2


def test_resize_images(spark, cfg):
    big = _frame(7, h=64, w=48)
    rows = [
        ("i1", codec.encode_png(big)),
        ("i2", b"corrupt"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = media_ops.resize_images(df, 16, 16).toPandas()
    assert list(out.image_id) == ["i1"]  # corrupt row dropped
    assert (out.w == 16).all() and (out.h == 16).all()
    pixels = codec.decode_image(bytes(out.bytes.iloc[0]))
    assert pixels.shape == (16, 16, 3)
    # nearest-neighbor: every output pixel is some input pixel
    rows_idx = np.minimum((np.arange(16) * 64) // 16, 63)
    cols_idx = np.minimum((np.arange(16) * 48) // 16, 47)
    assert np.array_equal(pixels, big[rows_idx[:, None], cols_idx[None, :]])


def test_audio_features_and_near_dup_fingerprints(spark):
    rate = 8000
    a = _tone(rate, 1.0, [440, 1200], seed=1)
    quiet = (a.astype(np.int32) // 4).astype(np.int16)
    other = _tone(rate, 2.0, [3100, 700], seed=2)
    rows = [
        ("a1", media.encode_audio(a, rate)),
        ("a1_quiet", media.encode_audio(quiet, rate)),
        ("a2", media.encode_audio(other, rate)),
        ("a_bad", b"\x00\x01\x02"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    feats = media_ops.audio_features(df).toPandas().set_index("audio_id")

    assert feats.loc["a1", "duration_s"] == pytest.approx(1.0)
    assert feats.loc["a2", "duration_s"] == pytest.approx(2.0)
    assert int(feats.loc["a1", "sample_rate"]) == rate
    assert feats.loc["a1", "rms"] > feats.loc["a1_quiet", "rms"] * 3
    assert np.isnan(feats.loc["a_bad", "duration_s"])
    assert feats.loc["a_bad", "fingerprint"] is None or np.isnan(
        feats.loc["a_bad", "fingerprint"]
    )

    def ham(x, y):
        return bin((int(x) & (2**64 - 1)) ^ (int(y) & (2**64 - 1))).count("1")

    fp, fp_q, fp_o = (
        feats.loc["a1", "fingerprint"],
        feats.loc["a1_quiet", "fingerprint"],
        feats.loc["a2", "fingerprint"],
    )
    assert ham(fp, fp_q) <= 6
    assert ham(fp, fp_o) >= 16


# --------------------------------------------------------------------------
# F4 degradation regressions: corrupt payloads must never kill a task
# --------------------------------------------------------------------------

def test_malformed_riff_wav_degrades_to_none():
    """RIFF/WAVE magic with garbage chunks raises wave.Error inside the
    stdlib — the try_ wrapper must convert it to None (F4), not escape."""
    junk = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"\x00" * 32
    assert media.try_decode_audio(junk) is None


def test_truncated_video_container_degrades(spark, cfg):
    """Valid DVID magic + frame count but truncated body: the length-prefix
    walk hits struct.error mid-container; the whole video must degrade to
    the single frame_idx=-1 NULL-signature row, same as a bad-magic blob."""
    good = media.encode_video([codec.encode_png(_frame(3)) for _ in range(4)])
    truncated = good[:10]
    # a container whose prefix LIES (points past the buffer) degrades too
    lying = media.MAGIC_VIDEO + struct.pack("<H", 2) + struct.pack("<I", 10**6)
    df = spark.createDataFrame(
        [("t1", truncated), ("t2", lying), ("ok", good)],
        "video_id string, bytes binary",
    )
    frames = media_ops.sample_frames(df, cfg, stride=2).toPandas()
    by_vid = frames.groupby("video_id")["frame_idx"].apply(list).to_dict()
    assert by_vid["t1"] == [-1]
    assert by_vid["t2"] == [-1]
    assert sorted(by_vid["ok"]) == [0, 2]
    bad = frames[frames.video_id.isin(["t1", "t2"])]
    assert bad.phash.isna().all() and bad.n_frames.isna().all()


def test_video_pair_df_cutoff_drops_nondiscriminative_hash(spark, cfg):
    """A frame hash shared by more videos than max_videos_per_hash is a
    non-discriminative df-cutoff casualty: it must contribute no pairs (and
    no quadratic join blowup); pairs sharing rarer hashes still surface."""
    common = codec.encode_png(_frame(500))  # the "black frame"
    rare = [codec.encode_png(_frame(600 + i)) for i in range(2)]
    rows = [
        (f"v{i:02d}", media.encode_video([common])) for i in range(6)
    ] + [
        ("dup_a", media.encode_video([common] + rare)),
        ("dup_b", media.encode_video([common] + rare)),
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    frames = media_ops.sample_frames(df, cfg, stride=1)
    pairs = media_ops.video_pair_candidates(
        frames, min_shared=2, max_videos_per_hash=4
    ).toPandas()
    # the common hash (8 videos > cap 4) is dropped: dup_a/dup_b still pair
    # via their 2 rare shared hashes; no other pair reaches min_shared=2
    assert len(pairs) == 1
    row = pairs.iloc[0]
    assert (row.id_l, row.id_r) == ("dup_a", "dup_b")
    assert row.shared_frames == 2


def test_real_wav_8_24_32_bit_normalize_to_int16():
    """8/24/32-bit integer PCM WAVs decode to int16 with consistent scaling:
    the same waveform written at every width must decode to (nearly) the
    same int16 samples — so a re-encoded bit-depth change stays a near-dup
    under the volume-invariant fingerprint."""
    import io
    import wave as _wave

    import numpy as np

    from dupion_spark.functions.media import decode_audio

    rng = np.random.default_rng(41)
    rate = 8000
    base16 = (rng.integers(-12000, 12000, size=(500, 1)) // 256 * 256).astype(
        np.int16
    )  # multiples of 256 survive the 8-bit roundtrip exactly

    def wav(samples_bytes: bytes, sw: int) -> bytes:
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(sw)
            wf.setframerate(rate)
            wf.writeframes(samples_bytes)
        return buf.getvalue()

    # 8-bit: unsigned offset encoding of the high byte
    u8 = ((base16.astype(np.int32) >> 8) + 128).astype(np.uint8)
    s8, r8 = decode_audio(wav(u8.tobytes(), 1))
    assert r8 == rate and np.array_equal(s8, base16)

    # 24-bit: value << 8, packed little-endian 3-byte
    v24 = base16.astype(np.int32) << 8
    b = np.zeros((v24.size, 3), dtype=np.uint8)
    u = v24.reshape(-1) & 0xFFFFFF
    b[:, 0], b[:, 1], b[:, 2] = u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF
    s24, _ = decode_audio(wav(b.tobytes(), 3))
    assert np.array_equal(s24, base16)

    # 32-bit: value << 16
    v32 = (base16.astype(np.int32) << 16).astype("<i4")
    s32, _ = decode_audio(wav(v32.tobytes(), 4))
    assert np.array_equal(s32, base16)


def test_sample_frames_values_partition_invariant(spark, video_df, cfg):
    """The nullable int64 columns (n_frames/phash/simhash) coerce through
    float64 deterministically (operators/media dtype pin): re-partitioning
    the input — e.g. the _fan_out input-skew guard — must not change a single
    output value, even though pandas would otherwise round 64-bit hashes only
    in batches that happen to contain a corrupt row."""
    one = media_ops.sample_frames(video_df.coalesce(1), cfg, stride=10)
    many = media_ops.sample_frames(video_df.repartition(8, "video_id"), cfg, stride=10)
    assert one.exceptAll(many).count() == 0
    assert many.exceptAll(one).count() == 0
