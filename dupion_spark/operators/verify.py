"""Candidate-pair verification: decoded-pixel PSNR + caption suffix-array LCS.

The expensive compare of the staged design (the graft's analog of dupion's
full blake3 re-read in pass 2, driver/platterwalker.rs:188-374): runs ONLY on
pairs that survived LSH banding.

Scale notes: the two payload joins (attach bytes/caption for each side) are
sort-merge joins on image_id; pairs are orders of magnitude fewer than rows,
so each join shuffles the pair table plus a semi-join-pruned slice of the
image table. The verify UDF receives Arrow batches bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so executor memory stays bounded
(two decoded images per pair in flight per row)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dupion_spark.config import DedupConfig
from dupion_spark.functions.spark_udfs import make_verify_udf


def prefilter_pairs(pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Cheap JVM-side pair prefilter: keep a pair only if phash OR simhash
    hamming distance is within cfg.prefilter_hamming. bit_count(xor) runs in
    whole-stage codegen — no decode, no Python. Genuine near-dups sit at
    hamming <= 11 by the multiprobe construction, so this is recall-free
    pruning of the accidental band collisions (the staged-pruning idea from
    dupion/src/state/mod.rs:95-111, applied a third time)."""
    if cfg.prefilter_hamming <= 0:
        return pairs
    sig = signatures.select("rep_id", "phash", "simhash")
    left = sig.select(
        F.col("rep_id").alias("id_l"),
        F.col("phash").alias("_ph_l"),
        F.col("simhash").alias("_sh_l"),
    )
    right = sig.select(
        F.col("rep_id").alias("id_r"),
        F.col("phash").alias("_ph_r"),
        F.col("simhash").alias("_sh_r"),
    )
    ph_ham = F.bit_count(F.col("_ph_l").bitwiseXOR(F.col("_ph_r")))
    sh_ham = F.bit_count(F.col("_sh_l").bitwiseXOR(F.col("_sh_r")))
    return (
        pairs.join(left, "id_l").join(right, "id_r")
        .filter(F.least(ph_ham, sh_ham) <= cfg.prefilter_hamming)
        .select("id_l", "id_r", "band_src")
    )


def verified_edges(pairs: DataFrame, images: DataFrame, cfg: DedupConfig) -> DataFrame:
    """pairs(id_l, id_r, band_src) x images -> verified edge table
    (id_l, id_r, band_src, psnr, lcs_len, passed)."""
    payload = images.select("image_id", "bytes", "caption")
    # prune the payload to ids that appear in any pair before joining — at
    # 10^12 rows this keeps the shuffled image slice proportional to the
    # candidate set, not the corpus. NO forced broadcast: the id set is all
    # endpoints of all candidate pairs, which at corpus scale can be billions
    # of rows — a broadcast hint would OOM the driver. AQE converts the
    # semi-join to broadcast automatically whenever the set IS small. The
    # payload is then MATERIALIZED once, because the plan below references it
    # twice (left and right side) and re-executing the semi-join scan twice
    # doubles the corpus reads.
    ids = pairs.select(F.col("id_l").alias("image_id")).unionByName(
        pairs.select(F.col("id_r").alias("image_id"))
    ).distinct()
    payload = payload.join(ids, "image_id", "left_semi")
    payload = payload.localCheckpoint(eager=False)

    left = payload.select(
        F.col("image_id").alias("id_l"),
        F.col("bytes").alias("bytes_l"),
        F.col("caption").alias("caption_l"),
    )
    right = payload.select(
        F.col("image_id").alias("id_r"),
        F.col("bytes").alias("bytes_r"),
        F.col("caption").alias("caption_r"),
    )
    verify = make_verify_udf(cfg)
    return (
        pairs.join(left, "id_l").join(right, "id_r")
        .withColumn(
            "_v",
            verify(
                F.col("bytes_l"), F.col("bytes_r"),
                F.col("caption_l"), F.col("caption_r"),
            ),
        )
        .select(
            "id_l",
            "id_r",
            "band_src",
            F.col("_v.psnr").alias("psnr"),
            F.col("_v.lcs_len").alias("lcs_len"),
            F.col("_v.passed").alias("passed"),
        )
    )
