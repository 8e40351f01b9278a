"""Distributed deterministic fixture generation (for throughput/scaling runs).

The pandas generator in sources/synth.py is oracle-grade but single-process;
scaling benchmarks need ~10^5 images of realistic size, so this module
generates the same input_hint shape WITH Spark (mapInPandas over a range),
deterministically: every row's content derives only from (seed, row id), so
the output is independent of partitioning/parallelism.

Planted structure per 100-row block (enough real dedup work to exercise every
pipeline stage at scale):
  r in {0,1}  -> exact byte-duplicate pair (same content seed, same encode)
  r in {2,3}  -> near-duplicate pair (same content seed; r==3 perturbed)
  r == 4      -> member of THE mega-cluster (one shared base, tiny noise)
  else        -> unique

No golden tables here — recall gates run on the oracle-grade small fixture;
this one measures throughput.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dupion_spark.config import DedupConfig
from dupion_spark.functions.codec import encode_jpeg, encode_png
from dupion_spark.functions.signatures import phash64
from dupion_spark.streaming.dedup_stream import IMAGE_SCHEMA

VOCAB = (
    "aurora bramble cascade dune ember fjord glacier harbor islet juniper "
    "kestrel lagoon meadow nimbus orchard prairie quartz ridge summit thicket"
).split()

DIMS = (96, 128, 160)


def _smooth(rng: np.random.Generator, dim: int, channels: int) -> np.ndarray:
    coarse = rng.integers(16, 240, size=(dim // 4, dim // 4, channels))
    up = np.repeat(np.repeat(coarse, 4, axis=0), 4, axis=1)
    noise = rng.integers(-6, 7, size=up.shape)
    return np.clip(up + noise, 0, 255).astype(np.uint8)


def _make_row(i: int, seed: int, cfg: DedupConfig) -> dict:
    # content seed is pure arithmetic on (seed, i) — python hash() is
    # process-salted and would break determinism across executors
    block, r = divmod(i, 100)
    base_seed = seed * 1_000_000_007
    if r in (0, 1):
        content_seed, perturb, fmt = base_seed + block * 8 + 0, False, "png"
    elif r in (2, 3):
        content_seed, perturb, fmt = base_seed + block * 8 + 1, r == 3, "png"
    elif r == 4:
        content_seed, perturb, fmt = base_seed + 5, True, "png"
    else:
        content_seed, perturb, fmt = (
            base_seed + i * 8 + 2, False, ("png" if i % 3 else "jpeg")
        )

    content_rng = np.random.default_rng(content_seed)
    dim = int(DIMS[int(content_rng.integers(0, len(DIMS)))])
    pixels = _smooth(content_rng, dim, cfg.channels)
    if perturb:
        row_rng = np.random.default_rng(seed * 7 + i)
        for _ in range(3):
            y = int(row_rng.integers(0, dim))
            x = int(row_rng.integers(0, dim))
            c = int(row_rng.integers(0, cfg.channels))
            pixels[y, x, c] = min(254, int(pixels[y, x, c])) + 1
    caption_rng = np.random.default_rng(seed * 13 + i)
    caption = " ".join(
        np.asarray(VOCAB)[caption_rng.integers(0, len(VOCAB), size=10)].tolist()
    )
    data = encode_png(pixels) if fmt == "png" else encode_jpeg(pixels)
    return {
        "image_id": f"s{i:010d}",
        "bytes": data,
        "w": dim,
        "h": dim,
        "fmt": fmt,
        "caption": caption,
        "phash": phash64(pixels, cfg),
    }


def append_scaling_delta(
    spark: SparkSession,
    out_path: str,
    start: int,
    n_rows: int,
    seed: int = 42,
    cfg: DedupConfig | None = None,
) -> None:
    """Append rows [start, start+n_rows) of the SAME deterministic sequence
    as additional parquet part files — the daily-append shape the per-row
    incremental resume exists for. mode=append leaves every existing part
    file untouched, so their (size, mtime_ns) fingerprints stay valid and
    the resume path (pipeline.run_pipeline/_features) reuses their feature
    rows; only the new files are decoded. image_ids continue the s%010d
    sequence, disjoint from [0, start)."""
    cfg = cfg or DedupConfig()
    base = spark.range(start, start + n_rows).repartition(4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([_make_row(int(i), seed, cfg) for i in pdf["id"]])

    (
        base.mapInPandas(gen, IMAGE_SCHEMA).write.mode("append")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.size", str(256 * 1024))
        .option("parquet.page.size.row.check.min", "2")
        .option("parquet.page.size.row.check.max", "32")
        .parquet(out_path)
    )


def generate_scaling_fixture(
    spark: SparkSession,
    out_path: str,
    n_rows: int,
    seed: int = 42,
    cfg: DedupConfig | None = None,
) -> DataFrame:
    """Write a deterministic n_rows fixture as parquet (idempotent)."""
    cfg = cfg or DedupConfig()
    marker = os.path.join(out_path, "_SUCCESS")
    if not os.path.exists(marker):
        base = spark.range(n_rows).repartition(64)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame([_make_row(int(i), seed, cfg) for i in pdf["id"]])

        # dictionary encoding off + bounded pages: unique image blobs gain
        # nothing from a dictionary (and a dict-encoded chunk defeats the
        # page-selective verify gather — see sources/synth.py); 256 KiB pages
        # keep the gather's decompress unit at ~a few images.
        # row.check.min matters more than page.size for ~45 KB blobs:
        # parquet-mr only CHECKS the page-size budget every
        # page.size.row.check.min records (default 100), so without it every
        # page holds ~100 blobs (~4.5 MB) and the 256 KiB target is never
        # honored — at that granularity any realistic candidate density
        # covers ~every page and the selective gather rightly falls back to
        # whole-chunk reads (observed: 256/256 dense fallbacks at 600k)
        (
            base.mapInPandas(gen, IMAGE_SCHEMA).write.mode("overwrite")
            .option("parquet.enable.dictionary", "false")
            .option("parquet.page.size", str(256 * 1024))
            .option("parquet.page.size.row.check.min", "2")
            .option("parquet.page.size.row.check.max", "32")
            .parquet(out_path)
        )
    return spark.read.parquet(out_path)
