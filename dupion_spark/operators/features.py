"""One-pass per-image feature extraction with direct storage reads.

Motivation (measured, this sandbox): shipping a corpus-sized binary column
through the JVM->Python Arrow boundary runs at ~60 MB/s aggregate — a no-op
pandas UDF over 4.4 GB of bytes costs ~75-140 s regardless of batch size or
encoding. Production image pipelines avoid exactly this by passing
REFERENCES through the engine and letting workers fetch payloads straight
from storage (object store / table files). Here: each Spark task receives
parquet file PATHS, reads them with pyarrow directly (no JVM transfer), and
emits only the small feature columns:

    image_id, byte_len, byte_sha256, pixel_sha256, w, h, fmt, caption_ref,
    minhash, simhash, phash

This single pass replaces the separate hash + signature UDF stages (bytes
would otherwise cross the boundary twice). The DataFrame-input path in
operators/exact + operators/lsh remains the fallback for non-file inputs
(small fixtures, tests).

At cluster scale the same shape holds for Iceberg: plan file scan tasks from
the manifest, read data files directly in the workers, emit features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dupion_spark.config import DedupConfig
from dupion_spark.functions import codec, signatures

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("byte_sha256", T.StringType()),
        T.StructField("pixel_sha256", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("caption", T.StringType()),
        # int32: minhash values are mod (2^31-1) by construction — halves
        # the dominant column of the feature checkpoint + Arrow transfer
        T.StructField("minhash", T.ArrayType(T.IntegerType())),
        T.StructField("simhash", T.LongType()),
        T.StructField("phash", T.LongType()),
        # payload locator: which (file, row group, row position) holds this
        # row's bytes — lets downstream stages (pair verification) re-fetch
        # payloads worker-side instead of shipping binary columns through
        # joins/Arrow, and `take` exactly the needed rows instead of
        # materializing whole row groups. Null on the DataFrame-input
        # fallback path.
        T.StructField("src_file", T.StringType()),
        T.StructField("src_rg", T.IntegerType()),
        T.StructField("src_pos", T.IntegerType()),
        # sid: data-derived LONG surrogate id (file_idx<<40 | rg<<20 | pos on
        # the file path; monotonically_increasing_id on the DataFrame path,
        # stable because the feature stage is materialized). The LSH band
        # explode and pair self-joins shuffle and compare sid instead of the
        # string image_id — 310M string compares in the join condition and
        # ~40% of the band-row shuffle bytes were id strings. Strings are
        # restored by a join on the tiny pair output only.
        T.StructField("sid", T.LongType()),
    ]
)


def _extract_rows(table, cfg: DedupConfig, src_file: str = None,
                  src_rg: int = None, file_idx: int = None) -> pd.DataFrame:
    out = {k: [] for k in ("image_id", "byte_len", "byte_sha256", "pixel_sha256",
                           "w", "h", "caption", "minhash", "simhash", "phash")}
    ids = table.column("image_id").to_pylist()
    blobs = table.column("bytes").to_pylist()
    captions = table.column("caption").to_pylist()
    # caption MinHash runs BATCHED over the whole row group (one flat shingle
    # array + segment mins) — per-row hashing paid ~150us of numpy/md5 call
    # overhead per caption, the dominant non-decode CPU term
    out["minhash"] = [
        s.tolist() for s in signatures.minhash_signatures_batch(captions, cfg)
    ]
    decoded = [codec.try_decode_image(blob) for blob in blobs]
    # signatures run BATCHED over same-shape stacks (bit-identical to the
    # per-image path — parity-tested in tests/test_signatures.py): real
    # corpora cluster on a few common dimensions, and stacking amortizes the
    # ~25 small-array numpy calls per image (~20% off the signature term,
    # the largest CPU slice of this stage)
    sim_b, ph_b = signatures.pixel_signatures_batch(decoded, cfg)
    for image_id, blob, caption, pixels, sh, ph in zip(
        ids, blobs, captions, decoded, sim_b, ph_b
    ):
        out["image_id"].append(image_id)
        out["byte_len"].append(len(blob))
        out["byte_sha256"].append(hashlib.sha256(blob).hexdigest())
        out["caption"].append(caption or "")
        if pixels is None:  # non-image payload (container/corrupt): F4 —
            out["pixel_sha256"].append(None)  # byte-hash-only row
            out["w"].append(0)
            out["h"].append(0)
            out["simhash"].append(None)
            out["phash"].append(None)
            continue
        h, w, c = pixels.shape
        hasher = hashlib.sha256()
        hasher.update(f"{h}x{w}x{c}:".encode())
        hasher.update(pixels.tobytes())
        out["pixel_sha256"].append(hasher.digest())
        out["w"].append(w)
        out["h"].append(h)
        out["simhash"].append(sh)
        out["phash"].append(ph)
    frame = pd.DataFrame(out)
    frame["simhash"] = pd.array(out["simhash"], dtype="Int64")
    frame["phash"] = pd.array(out["phash"], dtype="Int64")
    frame["src_file"] = src_file
    frame["src_rg"] = pd.Series([src_rg] * len(frame), dtype="Int32")
    frame["src_pos"] = pd.array(np.arange(len(frame)), dtype="Int32")
    if file_idx is None:
        frame["sid"] = pd.array([None] * len(frame), dtype="Int64")
    else:
        base = (int(file_idx) << 40) | (int(src_rg) << 20)
        frame["sid"] = pd.array(base + np.arange(len(frame)), dtype="Int64")
    return frame


def extract_features_from_files(
    spark: SparkSession, source_path: str, cfg: DedupConfig,
    files_with_idx: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Feature table from a parquet directory, payloads read worker-side.

    Parallelism granularity = parquet row groups (each task reads row groups
    of its file directly via pyarrow). Write inputs with enough files/row
    groups for the cluster; the generator here writes 64.

    files_with_idx: explicit (path, file_idx) subset to extract — the
    incremental-resume path passes only NEW/CHANGED files here, with indices
    allocated past every previously-used file_idx so the derived sid
    surrogates can never collide with reused checkpointed rows."""
    import pyarrow.parquet as pq

    from dupion_spark.sources.files import list_parquet_files

    if files_with_idx is None:
        files_with_idx = list(enumerate(list_parquet_files(source_path)))
        files_with_idx = [(f, i) for i, f in files_with_idx]
    if not files_with_idx:
        raise ValueError(f"no parquet files under {source_path}")
    # one task per (file, row_group): row groups are the scan-split unit,
    # exactly like Iceberg/Parquet file-scan task planning. Footer reads are
    # DISTRIBUTED — at 10^6 files, opening every footer on the driver
    # serializes split planning on one node (Iceberg sidesteps this entirely:
    # manifests carry the split list; this path is the raw-parquet fallback).
    # file_idx feeds the sid surrogate (file_idx<<40 | rg<<20 | pos): unique
    # iff files < 2^23, row groups/file < 2^20, rows/row-group < 2^20 —
    # comfortably true for this raw-file fallback path (table formats carry
    # their own row ids)
    files_df = spark.createDataFrame(
        files_with_idx, "file string, file_idx int"
    )
    files_df = files_df.repartition(min(len(files_with_idx), 256))

    def footer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "file": pdf["file"],
                    "file_idx": pdf["file_idx"],
                    "n_rg": [pq.ParquetFile(f).num_row_groups for f in pdf["file"]],
                }
            )

    # the split list STAYS distributed (explode, no collect): only a scalar
    # count comes back to size the round-robin fan-out — at 10^6 files a
    # driver-side split list would serialize planning on one node
    from pyspark.sql import functions as F

    splits = (
        files_df.mapInPandas(footer, "file string, file_idx int, n_rg int")
        .filter(F.col("n_rg") > 0)
        .select(
            "file",
            "file_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_rg") - 1)).alias("row_group"),
        )
        .localCheckpoint(eager=False)
    )
    n_splits = splits.count()
    split_df = splits.repartition(min(n_splits, 4096))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, fidx, rg in zip(pdf["file"], pdf["file_idx"], pdf["row_group"]):
                table = pq.ParquetFile(path).read_row_group(
                    int(rg), columns=["image_id", "bytes", "caption"]
                )
                yield _extract_rows(table, cfg, src_file=path, src_rg=int(rg),
                                    file_idx=int(fidx))

    return split_df.mapInPandas(gen, FEATURE_SCHEMA)


def hashes_from_features(features: DataFrame) -> DataFrame:
    """The `hashes` stage from the feature table, preserving the reference's
    candidate-prune semantics (F2, state/mod.rs:95-111): pixel_sha256 is
    exposed only for rows whose (w,h) group has >1 member — a row with a
    unique shape cannot be an exact pixel duplicate."""
    from pyspark.sql import functions as F

    counts = features.groupBy("w", "h").agg(F.count(F.lit(1)).alias("_shape_n"))
    return (
        features.join(F.broadcast(counts), ["w", "h"])
        .select(
            "image_id",
            "byte_len",
            "byte_sha256",
            F.when(F.col("_shape_n") > 1, F.col("pixel_sha256"))
            .otherwise(F.lit(None).cast("binary"))
            .alias("pixel_sha256"),
        )
    )


def signatures_from_features(features: DataFrame, reps: DataFrame) -> DataFrame:
    """Per-representative signature slice of the feature table."""
    from pyspark.sql import functions as F

    rep_ids = reps.filter(F.col("image_id") == F.col("rep_id")).select("rep_id")
    return (
        features.select(
            F.col("image_id").alias("rep_id"), "sid", "w", "h",
            "minhash", "simhash", "phash",
        ).join(rep_ids, "rep_id", "left_semi")
    )


def features_from_dataframe(images: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Fallback for non-file inputs: same feature schema via in-DF UDFs.
    Pays the (slow) binary Arrow boundary — fine for small/test inputs."""
    from pyspark.sql import functions as F

    from dupion_spark.functions.spark_udfs import (
        make_minhash_udf,
        make_pixel_sha256_udf,
        make_pixel_signature_udf,
    )

    pixel_sha256 = make_pixel_sha256_udf()
    minhash = make_minhash_udf(cfg)
    pixel_sig = make_pixel_signature_udf(cfg)
    return images.select(
        "image_id",
        F.length("bytes").cast("long").alias("byte_len"),
        F.sha2("bytes", 256).alias("byte_sha256"),
        pixel_sha256(F.col("bytes")).alias("pixel_sha256"),
        "w",
        "h",
        F.coalesce(F.col("caption"), F.lit("")).alias("caption"),
        minhash(F.col("caption")).alias("minhash"),
        pixel_sig(F.col("bytes")).alias("_px"),
    ).select(
        "image_id", "byte_len", "byte_sha256", "pixel_sha256", "w", "h",
        "caption", "minhash",
        F.col("_px.simhash").alias("simhash"),
        F.col("_px.phash").alias("phash"),
        F.lit(None).cast("string").alias("src_file"),
        F.lit(None).cast("int").alias("src_rg"),
        F.lit(None).cast("int").alias("src_pos"),
        # stable once the feature stage materializes (it is an eager anchor
        # in the pipeline); the file path derives sid from data instead
        F.monotonically_increasing_id().alias("sid"),
    )
