"""Multimodal operators over opaque binary media columns.

Extends the image flagship path (operators/features.py) to the other two
modalities a training-data pipeline carries: audio and video, plus image
resize. All three follow the same scale rules the image path established:

  * bytes are decoded WORKER-SIDE inside Arrow-batched `mapInPandas` — raw
    payloads never cross a shuffle boundary; what shuffles is the skinny
    derived row (id + longs/doubles).
  * per-row failures degrade to NULL features (F4 validity), never job death.
  * video frame sampling walks the container's length prefixes and
    decompresses ONLY sampled frames (functions/media.iter_frame_spans) —
    a stride-k sample of an f-frame video does f/k of the decode work, not f.

Reference mapping: dupion has no media pipeline — these are the axis-B
"training-data pipeline" operators the graft adds on top of the reference's
hash-then-group core (SURVEY.md §2.10 applies its G-operators to the
fingerprints these produce: an audio fingerprint or frame phash feeds
operators/lsh.py banding unchanged).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dupion_spark.config import DedupConfig
from dupion_spark.functions import codec, media, signatures

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(df: DataFrame, out_h: int, out_w: int, fmt: str = "png") -> DataFrame:
    """Decode -> nearest-neighbor resize to (out_h, out_w) -> re-encode.

    Input: (image_id, bytes, ...); output (image_id, bytes, w, h, fmt) with the
    resized payload. Undecodable rows are dropped (they carry no pixels to
    resize; the caller keeps them via the exact byte-hash path). Nearest
    neighbor (index gather) keeps the kernel pure-numpy and deterministic —
    a real deployment swaps one line for a Pillow/cv2 interpolator."""
    if fmt not in ("png", "jpeg"):
        raise ValueError(f"fmt must be png|jpeg, got {fmt!r}")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, blobs = [], []
            for image_id, blob in zip(batch["image_id"], batch["bytes"]):
                pixels = codec.try_decode_image(bytes(blob))
                if pixels is None:
                    continue
                h, w = pixels.shape[:2]
                rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                small = pixels[rows[:, None], cols[None, :]]
                enc = codec.encode_png if fmt == "png" else codec.encode_jpeg
                ids.append(image_id)
                blobs.append(enc(small))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": blobs,
                    "w": [out_w] * len(ids),
                    "h": [out_h] * len(ids),
                    "fmt": [fmt] * len(ids),
                }
            )

    return df.select("image_id", "bytes").mapInPandas(_resize, _RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    cfg: DedupConfig,
    stride: int = 10,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Explode videos into sampled-frame signature rows.

    Every stride-th frame (always including frame 0) is decoded and reduced to
    (phash, simhash) longs — the same signatures the image path bands on, so
    video near-dup detection is "sample frames, then run the image LSH
    machinery on frame rows". Unsampled frames are SKIPPED at the container
    level (length-prefix walk, no decompression). Corrupt containers yield a
    single row with frame_idx = -1 and NULL signatures (F4)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("video_id", "frame_idx", "n_frames",
                                     "phash", "simhash")}
            for vid, blob in zip(batch[id_col], batch[bytes_col]):
                data = bytes(blob)
                n = media.try_video_frame_count(data)
                rows: list[tuple] = []
                if n is not None:
                    try:
                        for idx, start, end in media.iter_frame_spans(data):
                            if idx % stride:
                                continue  # skipped without decompression
                            pixels = codec.try_decode_image(
                                media.extract_frame_bytes(data, start, end))
                            sh, ph = (
                                (None, None)
                                if pixels is None
                                else signatures.pixel_signatures(pixels, cfg)
                            )
                            rows.append((idx, n, ph, sh))
                    except (struct.error, ValueError, IndexError):
                        # valid magic but truncated/lying length prefixes:
                        # the container is corrupt even if a prefix of its
                        # frames parsed — degrade the WHOLE video (F4), same
                        # as a bad-magic row
                        rows = []
                if not rows:
                    rows = [(-1, None, None, None)]
                for idx, nf, ph, sh in rows:
                    out["video_id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(nf)
                    out["phash"].append(ph)
                    out["simhash"].append(sh)
            df = pd.DataFrame(out)
            # Pin the nullable-int dtype semantics regardless of batch
            # composition: pandas coerces an int list CONTAINING None to
            # float64 (None -> NaN), rounding 64-bit hashes at 2^53 — and the
            # golden tables (sources/synth_media.py, same pd.DataFrame
            # construction over rows that include corrupt/None entries) have
            # exactly that rounding baked in. Without the explicit cast the
            # coercion is data-dependent per batch, so re-partitioning the
            # input (guide §2.5 fan-out) would change which rows round.
            for c in ("n_frames", "phash", "simhash"):
                df[c] = pd.Series(out[c], dtype="float64")
            yield df

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(_frames, _FRAME_SCHEMA)


def video_pair_candidates(
    frames: DataFrame, min_shared: int = 2, max_videos_per_hash: int = 64
) -> DataFrame:
    """Candidate near-dup video pairs from sampled-frame phash overlap.

    Two videos are candidates when >= min_shared sampled frames share an
    exact phash. GroupBy-phash keeps the frame side linear (no all-pairs
    across videos); the downstream verifier re-checks candidates frame-by-
    frame. Frames whose phash is unique corpus-wide never shuffle into the
    pair join (left_semi prefilter).

    max_videos_per_hash is the document-frequency cutoff that bounds the
    per-hash self-join: a frame hash shared by more than this many videos
    (black frames, intro cards — the norm in real corpora) would emit a
    quadratic pair blowup while carrying no discriminative signal, exactly
    the hot-bucket pattern operators/lsh.candidate_pairs caps. Such hashes
    are dropped (standard df-cutoff); a genuine near-dup pair still needs
    only min_shared of its OTHER shared frames to surface."""
    f = frames.filter(F.col("phash").isNotNull())
    dup_hashes = (
        f.groupBy("phash")
        .agg(F.count_distinct("video_id").alias("_nv"))
        .filter(
            (F.col("_nv") >= 2) & (F.col("_nv") <= max_videos_per_hash)
        )
        .select("phash")
    )
    hot = f.join(dup_hashes, "phash", "left_semi").select("video_id", "phash")
    l, r = hot.alias("l"), hot.alias("r")
    return (
        l.join(r, F.col("l.phash") == F.col("r.phash"))
        .filter(F.col("l.video_id") < F.col("r.video_id"))
        .groupBy(
            F.col("l.video_id").alias("id_l"), F.col("r.video_id").alias("id_r")
        )
        .agg(F.count_distinct(F.col("l.phash")).alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared)
    )


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


def audio_features(
    df: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Decode audio -> (duration, rate, channels, rms, zero-crossing rate,
    64-bit spectral fingerprint). The fingerprint is volume-invariant
    (functions/media.audio_fingerprint64), so banding it through
    operators/lsh.py finds re-encoded / re-normalized near-dup audio exactly
    as pixel signatures do for images. Undecodable rows -> NULL features."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("audio_id", "duration_s", "sample_rate",
                                     "channels", "rms", "zcr", "fingerprint")}
            for aid, blob in zip(batch[id_col], batch[bytes_col]):
                out["audio_id"].append(aid)
                decoded = media.try_decode_audio(bytes(blob))
                if decoded is None:
                    for k in ("duration_s", "sample_rate", "channels", "rms",
                              "zcr", "fingerprint"):
                        out[k].append(None)
                    continue
                samples, rate = decoded
                mono = samples.astype(np.float64).mean(axis=1)
                n = mono.shape[0]
                out["duration_s"].append(n / rate if rate else None)
                out["sample_rate"].append(rate)
                out["channels"].append(samples.shape[1])
                out["rms"].append(float(np.sqrt(np.mean(mono**2))) if n else 0.0)
                signs = np.signbit(mono)
                out["zcr"].append(
                    float(np.mean(signs[1:] != signs[:-1])) if n > 1 else 0.0
                )
                out["fingerprint"].append(
                    media.audio_fingerprint64(samples, rate) if n else None
                )
            df = pd.DataFrame(out)
            # same dtype pin as sample_frames: nullable numeric columns
            # coerce through float64 deterministically (see comment there)
            for c in ("duration_s", "sample_rate", "channels", "rms", "zcr",
                      "fingerprint"):
                df[c] = pd.Series(out[c], dtype="float64")
            yield df

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(_feats, _AUDIO_SCHEMA)
