"""LSH banding + candidate-pair generation with explicit skew handling.

No reference analog — dupion is exact-only. This stage generalizes dupion's
"cheap key first, expensive compare second" staging (state/mod.rs:95-111) to
near-duplicates: band keys are the cheap keys, PSNR/LCS verify is the
expensive compare.

Band sources:
  minhash — cfg.minhash_bands bands of cfg.minhash_rows signature slots over
            caption shingles (catches caption near-dups)
  phash   — 64-bit perceptual hash split into cfg.phash_bands bit-slices
            (pigeonhole: hamming distance < n_bands guarantees a shared band)
  simhash — same banding over the block-mean SimHash

Skew strategy (the mega-cluster problem):
  1. exact-duplicate collapse upstream (operators/exact.representatives) —
     identical images are ONE node here.
  2. bucket-size cap: buckets with <= cfg.max_band_bucket members use the
     all-pairs self-join (quadratic but tiny); larger buckets are CHAIN-linked
     (consecutive members after a sort) — linear in bucket size and exactly
     sufficient for connected components, which only needs connectivity, not
     every edge. A 10^6-member hot band emits 10^6-1 edges, not 5*10^11.
  3. the all-pairs self-join runs under AQE skew-join splitting
     (spark.sql.adaptive.skewJoin.enabled) with band keys salted into the
     shuffle via the band struct key itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dupion_spark.config import DedupConfig
from dupion_spark.functions.spark_udfs import make_minhash_udf, make_pixel_signature_udf


def signature_table(images: DataFrame, reps: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Per-representative signatures: rep_id, minhash array, simhash, phash.

    The pandas UDFs run MAP-SIDE over the scan (bytes never shuffle); the
    representative filter then semi-joins the small post-UDF rows. Computing
    signatures for every row and discarding non-reps costs decode cycles, but
    filtering first would shuffle the bytes column corpus-wide — the losing
    trade (see operators/exact.exact_hash_table). Exact replicas share the
    rep's signature downstream either way."""
    minhash = make_minhash_udf(cfg)
    pixel_sig = make_pixel_signature_udf(cfg)
    sigs = images.select(
        F.col("image_id").alias("rep_id"),
        F.col("w"),
        F.col("h"),
        minhash(F.col("caption")).alias("minhash"),
        pixel_sig(F.col("bytes")).alias("_px"),
    ).select(
        "rep_id",
        "w",
        "h",
        "minhash",
        F.col("_px.simhash").alias("simhash"),
        F.col("_px.phash").alias("phash"),
    )
    rep_ids = reps.filter(F.col("image_id") == F.col("rep_id")).select("rep_id")
    return sigs.join(rep_ids, "rep_id", "left_semi")


def _minhash_band_cols(cfg: DedupConfig):
    """JVM-side band keys over the minhash signature array: md5-60bit of the
    comma-joined band slice (same formula as signatures.minhash_bands and the
    DuckDB oracle SQL — cross-engine checkable)."""
    cols = []
    for band in range(cfg.minhash_bands):
        chunk = F.slice(F.col("minhash"), band * cfg.minhash_rows + 1, cfg.minhash_rows)
        joined = F.array_join(F.transform(chunk, lambda x: x.cast("string")), ",")
        key = F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
        cols.append(F.struct(F.lit("minhash").alias("band_src"),
                             F.lit(band).alias("band_idx"),
                             key.alias("band_val")))
    return cols


def _hash64_band_cols(col_name: str, n_bands: int, src: str, probe_bits: int):
    """Band keys over a 64-bit signature, with multiprobe expansion: besides
    the exact band value, emit every single-bit flip of it (probe_bits=1).
    Symmetric probing makes band values collide iff they differ in <=2 bits;
    pigeonhole over n_bands then guarantees a collision for total hamming
    <= n_bands*2 + n_bands - 1 (d<=11 at 4 bands). All JVM-side bit math."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    cols = []
    for band in range(n_bands):
        key = F.shiftrightunsigned(F.col(col_name), band * width).bitwiseAND(F.lit(mask))
        probes = [key]
        if probe_bits >= 1:
            probes += [key.bitwiseXOR(F.lit(1 << bit)) for bit in range(width)]
        for probe in probes:
            # fold the image shape into the pixel band key: near-duplicate
            # pixels always share (w, h) — the PSNR verify returns -inf on a
            # shape mismatch — so this splits the dense low-frequency band
            # buckets by shape class for free, with zero recall loss
            cols.append(F.struct(F.lit(src).alias("band_src"),
                                 F.lit(band).alias("band_idx"),
                                 F.xxhash64(probe, F.col("w"), F.col("h")).alias("band_val")))
    return cols


def band_table(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Explode per-rep signatures into (rep_id, band_src, band_idx, band_val,
    band_key, phash, simhash). band_key is a single 64-bit shuffle key
    (xxhash64 of the triple) so the downstream groupBy/join shuffles on one
    compact long. The two 64-bit pixel signatures ride along (16 bytes/row)
    so candidate_pairs can hamming-prefilter INLINE at pair generation —
    no join against a corpus-sized signature table afterwards."""
    # multiprobe expansion applies to phash ONLY: phash is the primary pixel
    # band source with the guaranteed hamming<=11 catch. simhash (a diversity
    # source with much lower entropy on smooth imagery) gets exact bands —
    # probing it multiplied junk candidate pairs ~17x for negligible recall.
    all_bands = (
        _minhash_band_cols(cfg)
        + _hash64_band_cols("phash", cfg.phash_bands, "phash", cfg.probe_bits)
        + _hash64_band_cols("simhash", cfg.simhash_bands, "simhash", 0)
    )
    # rows without pixel signatures (containers / corrupt payloads, F4) never
    # pass the pixel-authoritative verify — banding them is pure waste
    signatures = signatures.filter(F.col("phash").isNotNull())
    return (
        signatures.select(
            "rep_id", "phash", "simhash", F.explode(F.array(*all_bands)).alias("b")
        )
        .select(
            "rep_id",
            "phash",
            "simhash",
            F.col("b.band_src").alias("band_src"),
            F.col("b.band_idx").alias("band_idx"),
            F.col("b.band_val").alias("band_val"),
        )
        .withColumn("band_key", F.xxhash64("band_src", "band_idx", "band_val"))
    )


def _hamming_ok(ph_l, sh_l, ph_r, sh_r, cfg: DedupConfig):
    """Per-source prefilter predicate (see DedupConfig): phash within the
    multiprobe guarantee band OR simhash within the pigeonhole band."""
    ph_ham = F.bit_count(ph_l.bitwiseXOR(ph_r))
    sh_ham = F.bit_count(sh_l.bitwiseXOR(sh_r))
    return (ph_ham <= cfg.prefilter_hamming) | (
        sh_ham <= cfg.simhash_prefilter_hamming
    )


def candidate_pairs(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(id_l, id_r, band_src) candidate pairs, id_l < id_r, hamming-
    prefiltered INLINE and deduped.

    The raw pair stream (a pair per shared bucket — ~100M rows at 300k
    images) never hits a shuffle: the hamming test runs inside the bucket
    self-join using the signature columns the band rows carry, in whole-stage
    codegen, and only the ~1000x smaller survivor set pays the dedup groupBy.
    An earlier layout deduped the raw stream first and joined a signature
    table after — the dedup was the single biggest shuffle of the pipeline.

    Small buckets -> all-pairs self-join (AQE skew-join handles residual skew);
    buckets over the per-source cap -> STAR links to the bucket minimum
    (linear in bucket size, and — unlike chain links — the bucket subgraph is
    already a star, so connected components converges on it in one round
    instead of O(log chain-length))."""
    counts = bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("rep_id").alias("_hub"),
        F.min_by("phash", "rep_id").alias("_hub_ph"),
        F.min_by("simhash", "rep_id").alias("_hub_sh"),
    )
    # per-source cap: caption buckets get a tighter all-pairs window than
    # pixel buckets (see DedupConfig.max_band_bucket rationale)
    cap = (
        F.when(F.col("band_src") == "minhash", F.lit(cfg.minhash_max_bucket))
        .otherwise(F.lit(cfg.max_band_bucket))
    )
    sized = bands.join(counts, "band_key").withColumn("_cap", cap)

    small = sized.filter(F.col("_n") <= F.col("_cap"))
    left = small.select("band_key", F.col("rep_id").alias("id_l"),
                        F.col("phash").alias("_ph_l"),
                        F.col("simhash").alias("_sh_l"),
                        F.col("band_src").alias("band_src"))
    right = small.select("band_key", F.col("rep_id").alias("id_r"),
                         F.col("phash").alias("_ph_r"),
                         F.col("simhash").alias("_sh_r"))
    small_pairs = (
        left.join(right, "band_key")
        .filter(F.col("id_l") < F.col("id_r"))
        .filter(_hamming_ok(F.col("_ph_l"), F.col("_sh_l"),
                            F.col("_ph_r"), F.col("_sh_r"), cfg))
    )

    big_pairs = (
        sized.filter(F.col("_n") > F.col("_cap"))
        .filter(F.col("rep_id") != F.col("_hub"))
        .filter(_hamming_ok(F.col("_hub_ph"), F.col("_hub_sh"),
                            F.col("phash"), F.col("simhash"), cfg))
        .select(
            F.col("_hub").alias("id_l"),
            F.col("rep_id").alias("id_r"),
            F.col("band_src").alias("band_src"),
        )
    )

    return (
        small_pairs.select("id_l", "id_r", "band_src")
        .unionByName(big_pairs)
        .groupBy("id_l", "id_r")
        .agg(F.min("band_src").alias("band_src"))
    )
