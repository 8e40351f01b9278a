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


# bit 62 of every band key marks a CAPTION (minhash) bucket: it lets one
# skinny long column carry the per-source cap decision downstream without a
# band_src string per row (one bit of key entropy traded for a 56-byte-
# smaller, allocation-free band row — see band_table)
CAPTION_BIT = 1 << 62


def _caption_band_keys(cfg: DedupConfig):
    """One pre-combined 64-bit key per minhash band: xxhash64 over the band's
    signature slots directly — no md5/concat/string round-trip."""
    keys = []
    for band in range(cfg.minhash_bands):
        elems = [
            F.col("minhash").getItem(band * cfg.minhash_rows + r)
            for r in range(cfg.minhash_rows)
        ]
        keys.append(
            F.xxhash64(F.lit(f"mh:{band}"), *elems).bitwiseOR(F.lit(CAPTION_BIT))
        )
    return keys


def _hash64_band_keys(col_name: str, n_bands: int, tag: str, probe_bits: int):
    """Pre-combined keys over a 64-bit signature, with multiprobe expansion:
    besides the exact band value, emit every single-bit flip of it
    (probe_bits=1). Symmetric probing makes band values collide iff they
    differ in <=2 bits; pigeonhole over n_bands then guarantees a collision
    for total hamming <= n_bands*2 + n_bands - 1 (d<=11 at 4 bands). All
    JVM-side bit math. The image shape folds into the key: near-duplicate
    pixels always share (w, h) — the PSNR verify returns -inf on a shape
    mismatch — so dense low-frequency buckets split by shape class for free,
    with zero recall loss."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    keys = []
    for band in range(n_bands):
        val = F.shiftrightunsigned(F.col(col_name), band * width).bitwiseAND(F.lit(mask))
        probes = [val]
        if probe_bits >= 1:
            probes += [val.bitwiseXOR(F.lit(1 << bit)) for bit in range(width)]
        for probe in probes:
            keys.append(
                F.xxhash64(F.lit(f"{tag}:{band}"), probe, F.col("w"), F.col("h"))
                .bitwiseAND(F.lit(~CAPTION_BIT))
            )
    return keys


def band_table(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Explode per-rep signatures into (rep_id, phash, simhash, band_key).

    band_key is ONE pre-combined 64-bit long per band row (caption buckets
    flagged via CAPTION_BIT), exploded from an array<long> — an earlier
    layout exploded an array of 88 (band_src, band_idx, band_val) STRUCTS
    per row, and the resulting 2.3G struct allocations at 300k images made
    GC overhead grow with core count (allocation rate scales with
    parallelism against a fixed heap), directly eroding scaling efficiency.
    The two 64-bit pixel signatures ride along (16 bytes/row) so
    candidate_pairs can hamming-prefilter INLINE at pair generation — no
    join against a corpus-sized signature table afterwards.

    Multiprobe expansion applies to phash ONLY: phash is the primary pixel
    band source with the guaranteed hamming<=11 catch. simhash (a diversity
    source with much lower entropy on smooth imagery) gets exact bands —
    probing it multiplied junk candidate pairs ~17x for negligible recall."""
    all_keys = (
        _caption_band_keys(cfg)
        + _hash64_band_keys("phash", cfg.phash_bands, "ph", cfg.probe_bits)
        + _hash64_band_keys("simhash", cfg.simhash_bands, "sh", 0)
    )
    # rows without pixel signatures (containers / corrupt payloads, F4) never
    # pass the pixel-authoritative verify — banding them is pure waste
    signatures = signatures.filter(F.col("phash").isNotNull())
    return signatures.select(
        "rep_id", "phash", "simhash",
        F.explode(F.array(*all_keys)).alias("band_key"),
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
    # per-source cap via the key's caption bit: caption buckets get a tighter
    # all-pairs window than pixel buckets (see DedupConfig.max_band_bucket)
    is_caption = F.col("band_key").bitwiseAND(F.lit(CAPTION_BIT)) != 0
    cap = F.when(is_caption, F.lit(cfg.minhash_max_bucket)).otherwise(
        F.lit(cfg.max_band_bucket)
    )
    src = F.when(is_caption, F.lit("minhash")).otherwise(F.lit("pixel"))
    sized = bands.join(counts, "band_key").withColumn("_cap", cap)

    small = sized.filter(F.col("_n") <= F.col("_cap"))
    left = small.select("band_key", F.col("rep_id").alias("id_l"),
                        F.col("phash").alias("_ph_l"),
                        F.col("simhash").alias("_sh_l"))
    right = small.select("band_key", F.col("rep_id").alias("id_r"),
                         F.col("phash").alias("_ph_r"),
                         F.col("simhash").alias("_sh_r"))
    small_pairs = (
        left.join(right, "band_key")
        .filter(F.col("id_l") < F.col("id_r"))
        .filter(_hamming_ok(F.col("_ph_l"), F.col("_sh_l"),
                            F.col("_ph_r"), F.col("_sh_r"), cfg))
        .select("id_l", "id_r", src.alias("band_src"))
    )

    big_pairs = (
        sized.filter(F.col("_n") > F.col("_cap"))
        .filter(F.col("rep_id") != F.col("_hub"))
        .filter(_hamming_ok(F.col("_hub_ph"), F.col("_hub_sh"),
                            F.col("phash"), F.col("simhash"), cfg))
        .select(
            F.col("_hub").alias("id_l"),
            F.col("rep_id").alias("id_r"),
            src.alias("band_src"),
        )
    )

    return (
        small_pairs.unionByName(big_pairs)
        .groupBy("id_l", "id_r")
        .agg(F.min("band_src").alias("band_src"))
    )
