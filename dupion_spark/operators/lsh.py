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
  2. bucket-size caps sized to the multiprobe occupancy (DedupConfig
     .max_band_bucket): under-cap buckets run the inline-prefiltered
     all-pairs self-join; over-cap CAPTION and SIMHASH buckets fall back
     to hub star links (no recall obligation — the phash pigeonhole
     carries the guarantee); over-cap PHASH buckets go through
     second-level phash sub-banding so genuine near pairs keep a DIRECT
     verifiable edge (see candidate_pairs docstring). A 10^6-member hot
     bucket emits linear, not quadratic, work on every path.
  3. the all-pairs self-join is pinned to SHUFFLE_HASH (AQE would
     broadcast the corpus-sized band table) and runs under AQE skew-join
     splitting (spark.sql.adaptive.skewJoin.enabled).
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
# bit 61 (on non-caption keys) marks a SIMHASH bucket. Over-cap simhash
# buckets must route to hub STAR links, not phash sub-banding: simhash is a
# diversity source with NO recall obligation (the phash multiprobe pigeonhole
# carries the guarantee), and smooth-image simhash clumping grows over-cap
# membership LINEARLY with the corpus — routing those members through phash
# sub-banding produced 28.6e9 sub-bucket all-pairs comparisons at 1.2M images
# (~3600 core-s, the whole 483s pairs wall; BENCH/diag_band_sources.py),
# because low-entropy phash windows concentrate them into near-saturated
# sub-buckets. Caption keys keep bit 61 unrouted (is_caption is checked
# first), so only phash keys pay the 2-bit entropy cost.
SIMHASH_BIT = 1 << 61


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


def _hash64_band_keys(col_name: str, n_bands: int, tag: str, probe_bits: int,
                      mark_bit: int = 0):
    """Pre-combined keys over a 64-bit signature, with multiprobe expansion:
    besides the exact band value, emit every single-bit flip of it
    (probe_bits=1). Symmetric probing makes band values collide iff they
    differ in <=2 bits; pigeonhole over n_bands then guarantees a collision
    for total hamming <= n_bands*2 + n_bands - 1 (d<=11 at 4 bands). All
    JVM-side bit math. The image shape folds into the key: near-duplicate
    pixels always share (w, h) — the PSNR verify returns -inf on a shape
    mismatch — so dense low-frequency buckets split by shape class for free,
    with zero recall loss.

    mark_bit: source-marker bit OR'd into the key after clearing both marker
    bits (SIMHASH_BIT for simhash keys, 0 for phash) — candidate_pairs routes
    over-cap buckets by source (sub-banding vs star links)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    keys = []
    for band in range(n_bands):
        val = F.shiftrightunsigned(F.col(col_name), band * width).bitwiseAND(F.lit(mask))
        probes = [val]
        if probe_bits >= 1:
            probes += [val.bitwiseXOR(F.lit(1 << bit)) for bit in range(width)]
        for probe in probes:
            key = (
                F.xxhash64(F.lit(f"{tag}:{band}"), probe, F.col("w"), F.col("h"))
                .bitwiseAND(F.lit(~(CAPTION_BIT | SIMHASH_BIT)))
            )
            if mark_bit:
                key = key.bitwiseOR(F.lit(mark_bit))
            keys.append(key)
    return keys


def band_table(
    signatures: DataFrame, cfg: DedupConfig, n_reps: int | None = None
) -> DataFrame:
    """Explode per-rep signatures into (rep_id, phash, simhash, band_key).

    n_reps: corpus-size hint driving the ADAPTIVE pixel band plan
    (cfg.pixel_band_plan): as the corpus grows, fewer/wider phash bands keep
    band-bucket occupancy bounded (the fixed-entropy occupancy growth is the
    measured 600k superlinearity, BENCH/BASELINE.md) at the cost of a lower
    guaranteed hamming catch radius (11 -> 8 -> 5).

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
    phash_bands = cfg.pixel_band_plan(n_reps)
    all_keys = (
        _caption_band_keys(cfg)
        + _hash64_band_keys("phash", phash_bands, "ph", cfg.probe_bits)
        + _hash64_band_keys("simhash", cfg.simhash_bands, "sh", 0,
                            mark_bit=SIMHASH_BIT)
    )
    # rows without pixel signatures (containers / corrupt payloads, F4) never
    # pass the pixel-authoritative verify — banding them is pure waste
    signatures = signatures.filter(F.col("phash").isNotNull())
    # when the signature table carries the long surrogate id (operators/
    # features.FEATURE_SCHEMA `sid`), band rows use IT as the id column:
    # the pair self-joins then shuffle and compare fixed-width longs instead
    # of id strings (~40% of band-row bytes, and the join condition's
    # 300M+ id comparisons). candidate_pairs maps back to strings on its
    # tiny output via id_map.
    id_col = (
        F.col("sid").alias("rep_id") if "sid" in signatures.columns
        else F.col("rep_id")
    )
    return signatures.select(
        id_col, "phash", "simhash",
        F.explode(F.array(*all_keys)).alias("band_key"),
    )


def _hamming_ok(ph_l, sh_l, ph_r, sh_r, cfg: DedupConfig,
                ph_limit: int | None = None):
    """Per-source prefilter predicate (see DedupConfig): phash within the
    multiprobe guarantee band OR simhash within the pigeonhole band.

    ph_limit: effective phash radius (cfg.pixel_prefilter for the active
    band plan); defaults to the configured static radius. <= 0 DISABLES
    the prefilter entirely (every band collision goes to verify) — the
    escape hatch for auditing prefilter recall against raw LSH output."""
    limit = cfg.prefilter_hamming if ph_limit is None else ph_limit
    if limit <= 0:
        return F.lit(True)
    ph_ham = F.bit_count(ph_l.bitwiseXOR(ph_r))
    sh_ham = F.bit_count(sh_l.bitwiseXOR(sh_r))
    return (ph_ham <= limit) | (
        sh_ham <= cfg.simhash_prefilter_hamming
    )


def candidate_pairs(
    bands: DataFrame, cfg: DedupConfig, id_map: DataFrame | None = None,
    n_reps: int | None = None,
) -> DataFrame:
    """(id_l, id_r, band_src) candidate pairs, id_l < id_r, hamming-
    prefiltered INLINE and deduped.

    id_map (sid, rep_id): when the band table runs on long surrogate ids,
    pass the mapping so the OUTPUT pairs carry string ids again — the two
    join-backs touch only the pair table (candidate-proportional, tiny),
    never the band table.

    n_reps: the same corpus-size hint band_table received — the phash
    prefilter radius follows the ACTIVE band plan's catch guarantee
    (cfg.pixel_prefilter; 12 -> 9 -> 6 as the plan narrows 4 -> 3 -> 2
    bands). Passing a different hint than band_table's desynchronizes
    prefilter and guarantee; the pipeline passes one value to both.

    The raw pair stream (a pair per shared bucket — ~100M rows at 300k
    images) never hits a shuffle: the hamming test runs inside the bucket
    self-join using the signature columns the band rows carry, in whole-stage
    codegen, and only the ~1000x smaller survivor set pays the dedup groupBy.
    An earlier layout deduped the raw stream first and joined a signature
    table after — the dedup was the single biggest shuffle of the pipeline.

    Small buckets -> all-pairs self-join (AQE skew-join handles residual skew);
    buckets over the per-source cap -> linear-cost fallbacks by source:

    CAPTION over-cap buckets: STAR links to the bucket minimum (linear, and —
    unlike chain links — the bucket subgraph is already a star, so connected
    components converges on it in one round instead of O(log chain-length)).
    Caption buckets carry no recall obligation: a genuine near-dup pair
    (pixel PSNR >= 40) is guaranteed a phash band collision by the multiprobe
    pigeonhole, so pixel buckets always cover it; boilerplate-caption buckets
    are impure and their pairs can never pass the pixel-authoritative verify.

    SIMHASH over-cap buckets: hub STAR links too — simhash is a diversity
    source with no recall obligation (see the simhash-star comment below for
    the full argument and the measured 1.2M cost of sub-banding them).

    PHASH over-cap buckets: RECURSIVE SUB-BANDING, because star links cannot
    carry recall through the verify gate — a hub edge only survives if the
    member is a near-dup OF THE HUB, so two members near each other but far
    from the hub would lose connectivity (the round-2 latent recall hole),
    and the over-cap bucket may BE the pair's only guaranteed collision.
    Instead, members of an over-cap phash bucket are re-bucketed by 4
    DISJOINT 16-bit windows OFFSET BY 8 BITS from the top-level band slices
    (window s covers bits [16s+8, 16s+23] mod 64), with 1-bit multiprobe.
    Disjoint pigeonhole: a pair at hamming d <= 11 has SOME window with
    <= floor(11/4) = 2 differing bits (also <= 2 at the adaptive plans'
    8/5), within the 1-bit symmetric probe radius — every genuine near pair
    lands in a shared sub-bucket and keeps a DIRECT, verifiable edge
    (property-tested in tests/test_lsh.py). The 8-bit offset makes every
    sub window straddle TWO top-level bands, so the members of an over-cap
    top-level bucket (constant in ONE aligned window) split up to 256 ways
    in every sub window — an aligned 4x16 layout would re-create the
    over-cap crowd verbatim. 16-bit keys carry 256x the entropy of the
    round-3 8-bit sub keys (the saturation ADVICE item); an earlier 8-window
    cyclic byte-pair variant had the same guarantee but 136 keys/member —
    measured at 300k, its sub table approached the size of the TOP-level
    band table (17.1M vs 26.1M rows) and its self-join dominated the pairs
    stage, so the 68-key disjoint form wins at identical radius. Sub-buckets
    up to cfg.sub_allpairs_max run DIRECT all-pairs — a sub-bucket merely
    over the TOP-level cap no longer star-links, so a member far from its
    sub-hub keeps its direct edges (the round-4 residual recall hole,
    closed; quadratic work is bounded per bucket and inline-prefiltered in
    codegen, with AQE skew-join splitting the tasks). Only sub-buckets
    beyond sub_allpairs_max — adversarial mega-crowds agreeing on 16 phash
    bits within 1 flip — fall back to hub star links, labeled star_pixel so
    the exposed population is countable per run (the star_only_pairs
    lineage metric). Cost stays linear in members: 68 sub-rows per over-cap
    member, emitted only for the over-cap slice.

    Before sub-banding, over-cap members sharing an IDENTICAL
    (phash, simhash) collapse to one min-rep_id DELEGATE with hamming-0
    'sig_twin' edges to the other twins (linear): twins are
    indistinguishable to every banding decision — every bucket, probe, and
    sub-window holds all of them or none — and without the collapse a twin
    crowd inside the all-pairs window pays C(n,2) VERIFY pairs the hamming
    prefilter cannot thin (twins pass it by definition; measured: a planted
    3,000-twin crowd at 300k emitted 4.5M candidates and a 19.5-minute
    pairs wall). The 68 sub-rows are emitted per DELEGATE, so a
    million-twin crowd costs one sub-banding participant plus one linear
    star pass."""
    # Guard: when the band table was built on the LONG surrogate sid (see
    # band_table), downstream verify/CC join on STRING image_id — emitting
    # long pairs without an id_map would make every downstream inner join
    # empty, a silent total recall loss instead of an error.
    from pyspark.sql import types as _T

    if id_map is None and isinstance(
        bands.schema["rep_id"].dataType, (_T.LongType, _T.IntegerType)
    ):
        raise ValueError(
            "candidate_pairs: band table carries numeric surrogate ids (sid) "
            "but no id_map was supplied — pairs would never join back to "
            "string image_ids downstream. Pass id_map=signatures.select('sid','rep_id')."
        )

    # phash prefilter radius aligned to the active band plan (see docstring)
    ph_limit = cfg.pixel_prefilter(n_reps)

    # per-source cap via the key's caption bit: caption buckets get a tighter
    # all-pairs window than pixel buckets (see DedupConfig.max_band_bucket)
    is_caption = F.col("band_key").bitwiseAND(F.lit(CAPTION_BIT)) != 0
    cap = F.when(is_caption, F.lit(cfg.minhash_max_bucket)).otherwise(
        F.lit(cfg.max_band_bucket)
    )

    # MATERIALIZATION DISCIPLINE: every multiply-referenced intermediate is
    # lazily localCheckpointed — DataFrame reuse is NOT compute reuse (each
    # reference inlines the whole subtree; an early version of this plan
    # executed the 26M-row band explode EIGHT times). Measured both ways at
    # 300k: checkpointing the band table costs ~7s of single-disk write but
    # recomputing it per consumer costs more in BOTH wall and scaling
    # (65.7s vs 47.8s at 8 cores; AQE replans the wider trees serially), so
    # the checkpoint stays.
    bands = bands.localCheckpoint(eager=False)  # consumers: hot detection (sample+recheck or exact), small anti-join, big join

    # ONLY the over-cap bucket keys (with their hub signatures) ever need to
    # meet the band table again. An earlier layout joined the FULL per-bucket
    # count table back onto all band rows — a corpus-scale sort-merge join
    # that dominated the stage (measured: 2x the rest of pair generation
    # combined, and it scaled at ~0.5 efficiency). The over-cap key set is
    # orders of magnitude smaller (hot keys only), so the small path's
    # anti-join and the big path's inner join both stay AQE-broadcastable;
    # at scales where even the hot set outgrows broadcast they degrade to
    # shuffle joins that move only hot keys, never the counts table.

    def _hot_agg(rows: DataFrame, bucket_cap) -> DataFrame:
        return (
            rows.groupBy("band_key")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.min("rep_id").alias("_hub"),
                F.min_by("phash", "rep_id").alias("_hub_ph"),
                F.min_by("simhash", "rep_id").alias("_hub_sh"),
            )
            .filter(F.col("_n") > bucket_cap)
        )

    if n_reps is not None and n_reps >= cfg.hot_sample_min_reps:
        # sampled hot detection for the pixel keys (see DedupConfig): the
        # exact per-key counts agg is itself corpus-scale at large N (~40M
        # near-unique keys at 600k under the 3-band plan). Flag candidate
        # hot keys from a row sample, then EXACTLY re-count just the flagged
        # slice — a missed marginal bucket degrades to a bounded all-pairs
        # join, never to wrong output (verify is authoritative).
        frac = cfg.hot_sample_fraction
        flag_threshold = max(1, int(cfg.max_band_bucket * frac / 2))
        pix = bands.filter(~is_caption)
        flagged = (
            pix.sample(fraction=frac, seed=cfg.seed)
            .groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("_sn"))
            .filter(F.col("_sn") > flag_threshold)
            .select("band_key")
        )
        pix_hot = _hot_agg(pix.join(flagged, "band_key"), F.lit(cfg.max_band_bucket))
        capt_hot = _hot_agg(bands.filter(is_caption), F.lit(cfg.minhash_max_bucket))
        hot = pix_hot.unionByName(capt_hot).localCheckpoint(eager=False)
    else:
        # exact detection at small scale: bitwise-stable bucket routing is
        # what the sf0.001/sf0.01 golden oracles value-check against
        hot = _hot_agg(bands, cap).localCheckpoint(eager=False)
    # hot consumers: small-path anti-join + big-path inner join

    # ADAPTIVE BRANCH ELISION on the materialized hot statistic: which of the
    # three over-cap classes actually occur this run. `hot` is tiny (hot keys
    # only) and already checkpointed, so this is one sub-second driver-side
    # aggregation — the AQE idiom (plan from runtime stats) applied at the
    # orchestration level. Without it, every run pays shuffle-stage
    # round-trips for all five fallback branches (caption/simhash stars, twin
    # collapse, sub-banding + sub-stars, each behind its own localCheckpoint
    # materialization) even when the over-cap population is EMPTY — measured
    # ~3s of the 6.3s pairs wall at sf0.1 (6k images, zero hot buckets),
    # pure fixed overhead the scaling gate's small legs also pay. Output is
    # identical: an elided branch contributes zero rows by construction.
    hot_is_simhash = F.col("band_key").bitwiseAND(F.lit(SIMHASH_BIT)) != 0
    hot_classes = hot.agg(
        F.count(F.when(is_caption, 1)).alias("n_capt"),
        F.count(F.when((~is_caption) & hot_is_simhash, 1)).alias("n_sim"),
        F.count(F.when((~is_caption) & ~hot_is_simhash, 1)).alias("n_pix"),
    ).collect()[0]
    any_hot = (
        hot_classes["n_capt"] or hot_classes["n_sim"] or hot_classes["n_pix"]
    )

    # the all-pairs self-join joins the SAME materialized plan to itself
    # (aliases, not two differently-projected copies), so both join sides
    # read the one cached band RDD. SHUFFLE_HASH is pinned: AQE otherwise
    # saw a small compressed shuffle size and BROADCAST the 26M-row band
    # table — a single-threaded ~800MB driver build that cost more than the
    # whole join (measured 45s vs 18s at 8 cores) and grows with input, the
    # exact shape of parallelism-independent wall the scaling gate punishes.
    # At real corpus scale a broadcast here is impossible anyway; per-
    # partition hash builds stay bounded by the shuffle partition count.
    # r6: the hot anti-join is itself elided when the hot statistic says NO
    # over-cap bucket exists this run — an anti-join against an empty set is
    # the identity, so output is unchanged and the zero-hot case (every
    # bench SF) skips a full pass + broadcast over the band table.
    small = (
        bands if not any_hot
        else bands.join(hot.select("band_key"), "band_key", "left_anti")
    )
    sl, sr = small.alias("l"), small.alias("r")
    small_pairs = (
        sl.hint("SHUFFLE_HASH").join(sr, F.col("l.band_key") == F.col("r.band_key"))
        .filter(F.col("l.rep_id") < F.col("r.rep_id"))
        .filter(_hamming_ok(F.col("l.phash"), F.col("l.simhash"),
                            F.col("r.phash"), F.col("r.simhash"), cfg,
                            ph_limit=ph_limit))
        .select(
            F.col("l.rep_id").alias("id_l"),
            F.col("r.rep_id").alias("id_r"),
            F.when(
                F.col("l.band_key").bitwiseAND(F.lit(CAPTION_BIT)) != 0,
                F.lit("minhash"),
            ).otherwise(F.lit("pixel")).alias("band_src"),
        )
    )

    big = bands.join(hot, "band_key")

    # caption over-cap buckets: star links to the hub, hub-hamming filtered
    # (recall is carried by the pixel bands — see docstring). The PLAN-ALIGNED
    # ph_limit is intentionally shared with this caption path even though the
    # 3*bands catch-guarantee rationale is pixel-specific: caption banding can
    # surface pairs at phash hamming (plan_limit..12] that the narrowed radius
    # now drops, which is safe ONLY because verify is pixel-authoritative and
    # every measured such pair fails the PSNR gate (65,855/65,855 rejected at
    # 600k). If caption-verified edges (require_caption_lcs as an OR-path) are
    # ever added, caption-sourced pairs must keep cfg.prefilter_hamming
    # instead. Star links
    # carry a 'star_*' band_src: direct labels sort lexicographically before
    # star labels, so after the min-agg below a pair is labeled star_* iff
    # its ONLY provenance is hub-star links — the exact population exposed
    # to the documented star-recall caveat, countable for free from the
    # pair/edge tables (no extra jobs).
    branches = [small_pairs]
    if hot_classes["n_capt"]:
        branches.append(
            big.filter(is_caption)
            .filter(F.col("rep_id") != F.col("_hub"))
            .filter(_hamming_ok(F.col("_hub_ph"), F.col("_hub_sh"),
                                F.col("phash"), F.col("simhash"), cfg,
                                ph_limit=ph_limit))
            .select(
                F.col("_hub").alias("id_l"),
                F.col("rep_id").alias("id_r"),
                F.lit("star_minhash").alias("band_src"),
            )
        )

    # simhash over-cap buckets: hub STAR links, same shape and same recall
    # argument as the caption path — simhash carries no recall obligation
    # (any genuine near pair within the plan radius is guaranteed a phash
    # band collision; the simhash<=3 OR-path class in an over-cap bucket was
    # never guaranteed by phash sub-windows either, so star links lose
    # nothing it had). Routing these members through phash sub-banding
    # instead was the 1.2M pairs-wall blowup: smooth-image simhash clumping
    # grows over-cap membership linearly with the corpus, and those members'
    # phashes concentrate in low-entropy sub-windows — 28.6e9 sub-bucket
    # all-pairs comparisons at 1.2M (BENCH/diag_band_sources.py), ~100% of
    # the 483 s pairs wall. Star links keep the cost linear in members.
    is_simhash_key = (~is_caption) & (
        F.col("band_key").bitwiseAND(F.lit(SIMHASH_BIT)) != 0
    )
    if hot_classes["n_sim"]:
        branches.append(
            big.filter(is_simhash_key)
            .filter(F.col("rep_id") != F.col("_hub"))
            .filter(_hamming_ok(F.col("_hub_ph"), F.col("_hub_sh"),
                                F.col("phash"), F.col("simhash"), cfg,
                                ph_limit=ph_limit))
            .select(
                F.col("_hub").alias("id_l"),
                F.col("rep_id").alias("id_r"),
                F.lit("star_simhash").alias("band_src"),
            )
        )

    # pixel over-cap buckets: second-level sub-banding (4 disjoint 16-bit
    # windows offset 8 bits from the band slices, 1-bit multiprobe — see
    # docstring) over the DISTINCT over-cap member set — global scope, not
    # per parent bucket: the disjoint-pigeonhole guarantee works on the full
    # 64-bit phash regardless of scope, and per-bucket scoping would make a
    # mega-cluster member (over-cap in all its probe buckets) emit 68
    # sub-rows per bucket instead of 68 total. Shape is NOT in the sub key
    # (band rows don't carry w/h); cross-shape sub-collisions are junk pairs
    # bounded by the sub-bucket cap and killed by the hamming prefilter /
    # PSNR gate.
    if hot_classes["n_pix"]:
        _pixel_overcap_branches(
            branches, big.filter((~is_caption) & (~is_simhash_key)),
            cfg, ph_limit,
        )

    pairs = branches[0]
    for extra in branches[1:]:
        pairs = pairs.unionByName(extra)
    pairs = pairs.groupBy("id_l", "id_r").agg(F.min("band_src").alias("band_src"))
    if id_map is not None:
        # restore string ids on the tiny output (AQE broadcasts the map at
        # this scale; at corpus scale this is a candidate-proportional join)
        ml = id_map.select(F.col("sid").alias("id_l"), F.col("rep_id").alias("_l"))
        mr = id_map.select(F.col("sid").alias("id_r"), F.col("rep_id").alias("_r"))
        pairs = (
            pairs.join(ml, "id_l").join(mr, "id_r")
            .select(
                F.least("_l", "_r").alias("id_l"),
                F.greatest("_l", "_r").alias("id_r"),
                "band_src",
            )
        )
    return pairs


def _pixel_overcap_branches(
    branches: list, overcap_rows: DataFrame, cfg: DedupConfig, ph_limit: int
) -> None:
    """Append the pixel over-cap cascade branches (twin collapse, sub-band
    all-pairs, sub-star fallback) to `branches`. Split out of candidate_pairs
    so the whole cascade is built ONLY when the hot statistic says pixel
    over-cap buckets exist this run (see the branch-elision comment there)."""
    sub_keys = []
    for sub in range(4):
        lo = F.shiftrightunsigned(F.col("phash"), sub * 16 + 8).bitwiseAND(
            F.lit(0xFF)
        )
        hi = F.shiftrightunsigned(
            F.col("phash"), (sub * 16 + 16) % 64
        ).bitwiseAND(F.lit(0xFF))
        val = F.shiftleft(hi, 8).bitwiseOR(lo)
        for probe in [val] + [val.bitwiseXOR(F.lit(1 << bit)) for bit in range(16)]:
            sub_keys.append(F.xxhash64(F.lit(f"sub:{sub}"), probe))
    # checkpoint the DISTINCT MEMBER set (tiny), not the 72x-exploded sub
    # table — each consumer re-explodes from the cached members (parallel,
    # cheap) instead of reading a multi-hundred-MB checkpointed RDD
    members_all = (
        overcap_rows
        .select("rep_id", "phash", "simhash")
        .distinct()
        .localCheckpoint(eager=False)  # consumers: sig_groups agg, twin join
    )
    # EXACT-SIGNATURE TWIN COLLAPSE. Members sharing an IDENTICAL
    # (phash, simhash) are indistinguishable to every banding decision —
    # every bucket/probe/sub-window either holds all of them or none — so
    # running them all through sub-banding is pure redundancy, and the
    # all-pairs window below would pay C(n,2) VERIFY pairs for a crowd the
    # hamming prefilter cannot thin (twins pass it by definition). That trap
    # is real, not hypothetical: a planted 3,000-twin mega-crowd at 300k fit
    # inside sub_allpairs_max and emitted 4.5M verified candidates (19.5 min
    # pairs wall) before this collapse. Post-collapse: one min-rep_id
    # delegate per signature enters sub-banding; the other twins attach by
    # hamming-0 delegate edges ('sig_twin', linear). The label sorts between
    # the direct labels ('minhash'/'pixel') and 'star_*', so a twin pair
    # that also has direct band provenance keeps its direct label under the
    # min-agg, and twin edges are never miscounted by the star_only_pairs
    # metric — at hamming 0 the star-recall caveat does not apply (the only
    # residual is a phash+simhash 128-bit double collision of genuinely
    # dissimilar images failing verify against the delegate; verify stays
    # authoritative either way).
    sig_groups = (
        members_all.groupBy("phash", "simhash")
        .agg(F.min("rep_id").alias("_dg"), F.count(F.lit(1)).alias("_dn"))
        .localCheckpoint(eager=False)  # consumers: delegates + twin stars
    )
    members = (
        sig_groups.select(F.col("_dg").alias("rep_id"), "phash", "simhash")
        .localCheckpoint(eager=False)  # consumers: sub_hot, anti, star join
    )
    branches.append(
        members_all.join(
            sig_groups.filter(F.col("_dn") > 1), ["phash", "simhash"]
        )
        .filter(F.col("rep_id") != F.col("_dg"))
        .select(
            F.col("_dg").alias("id_l"),
            F.col("rep_id").alias("id_r"),
            F.lit("sig_twin").alias("band_src"),
        )
    )
    sub = members.select(
        "rep_id", "phash", "simhash",
        F.explode(F.array(*sub_keys)).alias("sub_key"),
    )
    # same hot-key structure as the top level, but with the LARGER
    # sub_allpairs_max window: sub-buckets within it run direct all-pairs
    # (recall-complete; see docstring), so only true mega-crowd sub-buckets
    # rejoin the sub table for star links
    sub_hot = (
        sub.groupBy("sub_key")
        .agg(
            F.count(F.lit(1)).alias("_sn"),
            F.min("rep_id").alias("_shub"),
            F.min_by("phash", "rep_id").alias("_shub_ph"),
            F.min_by("simhash", "rep_id").alias("_shub_sh"),
        )
        .filter(F.col("_sn") > F.lit(cfg.sub_allpairs_max))
        .localCheckpoint(eager=False)
    )
    sub_small = sub.join(sub_hot.select("sub_key"), "sub_key", "left_anti")
    ssl, ssr = sub_small.alias("sl"), sub_small.alias("sr")
    branches.append(
        ssl.hint("SHUFFLE_HASH").join(ssr, F.col("sl.sub_key") == F.col("sr.sub_key"))
        .filter(F.col("sl.rep_id") < F.col("sr.rep_id"))
        .filter(_hamming_ok(F.col("sl.phash"), F.col("sl.simhash"),
                            F.col("sr.phash"), F.col("sr.simhash"), cfg,
                            ph_limit=ph_limit))
        .select(
            F.col("sl.rep_id").alias("id_l"),
            F.col("sr.rep_id").alias("id_r"),
            F.lit("pixel").alias("band_src"),
        )
    )
    # sub-buckets beyond the sub_allpairs_max window fall back to hub stars:
    # >4096 members agreeing on 16 phash bits within 1 flip are adversarial
    # near-identical mega-crowds where star edges overwhelmingly pass verify
    # and quadratic work is unpayable; the residual risk — a member
    # >prefilter bits from its sub-hub losing its only direct edge — now
    # requires that mega-crowd saturation and stays countable per run via
    # the star_only_pairs lineage metric (see candidate_pairs docstring)
    branches.append(
        sub.join(sub_hot, "sub_key")
        .filter(F.col("rep_id") != F.col("_shub"))
        .filter(_hamming_ok(F.col("_shub_ph"), F.col("_shub_sh"),
                            F.col("phash"), F.col("simhash"), cfg,
                            ph_limit=ph_limit))
        .select(
            F.col("_shub").alias("id_l"),
            F.col("rep_id").alias("id_r"),
            F.lit("star_pixel").alias("band_src"),
        )
    )
