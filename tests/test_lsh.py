"""Candidate-pair generation: over-cap bucket recall (the round-2 latent hole).

Scenario (VERDICT r2 "What's wrong" #2): a genuine near pair (phash hamming
<= 11, guaranteed a shared band by the multiprobe pigeonhole) whose only
shared bucket is OVER the all-pairs cap, where neither member is the bucket
hub and both sit > 12 bits from it. Filtered star links drop both hub edges,
so the pair lost all connectivity. The fix sub-bands over-cap pixel buckets
(4 disjoint 16-bit windows offset 8 bits from the band slices: 16-bit sub
keys for entropy — the round-3 ADVICE showed 8-bit sub keys saturating at
scale — and the offset re-splits crowds the aligned top-level bucketing
concentrated), which must emit the DIRECT (A, B) candidate pair. Also
proves the corpus-ADAPTIVE band plans' hamming guarantees (4/3/2 bands ->
11/8/5).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from dupion_spark.config import DedupConfig
from dupion_spark.operators import lsh

SIG_SCHEMA = T.StructType(
    [
        T.StructField("rep_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("minhash", T.ArrayType(T.LongType())),
        T.StructField("simhash", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _ham(a: int, b: int) -> int:
    return bin((a & ((1 << 64) - 1)) ^ (b & ((1 << 64) - 1))).count("1")


def _phash(b0: int, b1: int, b2: int, b3: int) -> int:
    return _signed(b0 | (b1 << 16) | (b2 << 32) | (b3 << 48))


def _rows():
    """22 members of one over-cap band-0 bucket (shared 16-bit slice 0x1234):
    20 flood members + the near pair (A, B). A and B agree exactly on band 0,
    differ 3 bits in each of bands 1-3 (total hamming 9 <= 11, and >= 3 per
    band so NO other top-level band collides even with 1-bit probes). Every
    flood member (including the bucket-min hub f00) is ~48 bits from both A
    and B, so hub-hamming-filtered star links would drop the pair."""
    rows = []
    for i in range(20):
        ph = _phash(0x1234, 0x5555 ^ (i * 0x0101), 0x6666 ^ (i * 0x0303),
                    0x7777 ^ (i * 0x0505))
        sh = _signed(0x0123_4567_89AB_CDEF ^ (i * 0x1111_2222_3333_4444))
        mh = [1_000_000 + i * 64 + j for j in range(64)]
        rows.append((f"f{i:02d}", 64, 64, mh, sh, ph))
    ph_a = _phash(0x1234, 0xAAAA, 0xBBBB, 0xCCCC)
    ph_b = _phash(0x1234, 0xAAAA ^ 0x7, 0xBBBB ^ 0x7, 0xCCCC ^ 0x7)
    # simhashes with every 16-bit slice distinct -> no simhash band collision
    rows.append(("x_a", 64, 64, [2_000_000 + j for j in range(64)],
                 _signed(0x0F0F_0F0F_0F0F_0F0F), ph_a))
    rows.append(("x_b", 64, 64, [3_000_000 + j for j in range(64)],
                 _signed(0xF0F0_F0F0_F0F0_F0F0), ph_b))
    return rows


# small pixel cap so the 22-member bucket exercises the over-cap sub-band
# cascade (the default 256 cap would all-pairs it directly)
CFG = DedupConfig(max_band_bucket=16)


@pytest.fixture(scope="module")
def planted_pairs(spark):
    sigs = spark.createDataFrame(_rows(), SIG_SCHEMA)
    bands = lsh.band_table(sigs, CFG)
    return lsh.candidate_pairs(bands, CFG).collect()


def test_hamming(spark):
    a = next(r for r in _rows() if r[0] == "x_a")
    b = next(r for r in _rows() if r[0] == "x_b")
    assert _ham(a[5], b[5]) == 9
    hub = next(r for r in _rows() if r[0] == "f00")
    for x in (a, b):
        assert _ham(hub[5], x[5]) > 12


def test_overcap_near_pair_survives(planted_pairs):
    got = {(r["id_l"], r["id_r"]) for r in planted_pairs}
    assert ("x_a", "x_b") in got


def test_overcap_bucket_is_actually_overcap(spark):
    sigs = spark.createDataFrame(_rows(), SIG_SCHEMA)
    bands = lsh.band_table(sigs, CFG)
    from pyspark.sql import functions as F

    sizes = bands.groupBy("band_key").count().agg(F.max("count")).collect()[0][0]
    assert sizes == 22 > CFG.max_band_bucket


# --- no-Spark property tests of the recall guarantees ----------------------
# Replicate the band/probe/sub-band key math in plain python and check the
# pigeonhole claims the pipeline's docstrings make, over random pairs.
def _top_level_buckets(ph: int, w: int = 64, h: int = 64) -> set:
    """(band, probe_val) set a phash emits at 4x16-bit bands, 1-bit probes."""
    out = set()
    u = ph & ((1 << 64) - 1)
    for band in range(4):
        val = (u >> (band * 16)) & 0xFFFF
        out.add((band, val))
        for bit in range(16):
            out.add((band, val ^ (1 << bit)))
    return out


def _sub_buckets(ph: int) -> set:
    """(sub, probe_val) set at 4 disjoint 16-bit windows offset 8 bits from
    the top-level band slices (window s = bits [16s+8, 16s+23] mod 64),
    1-bit probes — the second-level cascade for over-cap pixel buckets.
    Disjoint pigeonhole: hamming d => some window with <= floor(d/4) diffs
    (= 2 at d <= 11, inside the symmetric 1-bit probe radius)."""
    out = set()
    u = ph & ((1 << 64) - 1)
    for sub in range(4):
        lo = (u >> (sub * 16 + 8)) & 0xFF
        hi = (u >> ((sub * 16 + 16) % 64)) & 0xFF
        val = (hi << 8) | lo
        out.add((sub, val))
        for bit in range(16):
            out.add((sub, val ^ (1 << bit)))
    return out


def _plan_buckets(ph: int, n_bands: int) -> set:
    """Top-level probe-bucket set under the ADAPTIVE plan's n_bands
    (width = 64 // n_bands, 1-bit probes) — mirrors _hash64_band_keys."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    out = set()
    u = ph & ((1 << 64) - 1)
    for band in range(n_bands):
        val = (u >> (band * width)) & mask
        out.add((band, val))
        for bit in range(width):
            out.add((band, val ^ (1 << bit)))
    return out


def test_multiprobe_guarantee_hamming_11():
    """Any pair at hamming <= 11 shares a top-level probe bucket AND a
    sub-band bucket (the over-cap fallback's direct-edge guarantee)."""
    rng = np.random.default_rng(7)
    for _ in range(300):
        a = int(rng.integers(0, 1 << 63))
        d = int(rng.integers(1, 12))
        bits = rng.choice(64, size=d, replace=False)
        b = a
        for bit in bits:
            b ^= 1 << int(bit)
        assert _top_level_buckets(a) & _top_level_buckets(b), (a, b, d)
        assert _sub_buckets(a) & _sub_buckets(b), (a, b, d)


@pytest.mark.parametrize("n_bands,guarantee", [(4, 11), (3, 8), (2, 5)])
def test_adaptive_plan_guarantees(n_bands, guarantee):
    """Each adaptive band plan catches every pair within its documented
    hamming radius (guarantee = 3*bands - 1 under 1-bit symmetric probing),
    and the sub-band cascade covers the same radius."""
    rng = np.random.default_rng(n_bands)
    covered = n_bands * (64 // n_bands)  # bits the bands actually see
    for _ in range(300):
        a = int(rng.integers(0, 1 << 63))
        d = int(rng.integers(1, guarantee + 1))
        bits = rng.choice(covered, size=d, replace=False)
        b = a
        for bit in bits:
            b ^= 1 << int(bit)
        assert _plan_buckets(a, n_bands) & _plan_buckets(b, n_bands), (a, b, d)
        assert _sub_buckets(a) & _sub_buckets(b), (a, b, d)


def test_pixel_band_plan_thresholds():
    cfg = DedupConfig()
    assert cfg.pixel_band_plan(None) == 4
    assert cfg.pixel_band_plan(1_200) == 4
    assert cfg.pixel_band_plan(399_999) == 4
    assert cfg.pixel_band_plan(600_000) == 3
    assert cfg.pixel_band_plan(50_000_000) == 2
    frozen = DedupConfig(adaptive_banding=False)
    assert frozen.pixel_band_plan(50_000_000) == 4


def test_probe_sets_disjoint_beyond_radius():
    """Sanity: a pair differing >= 3 bits in EVERY band shares no top-level
    bucket (the selectivity side of the multiprobe design)."""
    a = 0
    b = 0
    for band in range(4):
        b |= 0b111 << (band * 16)
    assert not (_top_level_buckets(a) & _top_level_buckets(b))


def test_pixel_prefilter_follows_band_plan():
    """The phash prefilter radius tracks the active plan's catch guarantee
    (3*bands): an unaligned radius admits band-collision pairs the plan no
    longer guarantees to generate — measured as ~91% of verify work at 600k
    (BENCH/BASELINE.md). <= 0 stays disabled at every scale."""
    cfg = DedupConfig()
    assert cfg.pixel_prefilter(None) == 12
    assert cfg.pixel_prefilter(1_200) == 12
    assert cfg.pixel_prefilter(600_000) == 9
    assert cfg.pixel_prefilter(50_000_000) == 6
    off = DedupConfig(prefilter_hamming=0)
    assert off.pixel_prefilter(600_000) == 0
    # a configured radius TIGHTER than the plan's is respected
    tight = DedupConfig(prefilter_hamming=7)
    assert tight.pixel_prefilter(600_000) == 7


def test_sampled_hot_detection_matches_exact_clusters(spark):
    """Sampled hot-key detection (DedupConfig.hot_sample_*) must preserve the
    candidate-pair guarantees: the sampled-hot set is a subset of the exact
    hot set re-counted exactly, so a missed bucket degrades to all-pairs —
    the near pair must still surface, and the pair set may only GROW
    (direct all-pairs supersedes the cascade's star links)."""
    sigs = spark.createDataFrame(_rows(), SIG_SCHEMA)
    # activate the sampled path on this tiny corpus
    cfg_sampled = DedupConfig(max_band_bucket=16, hot_sample_min_reps=1,
                              hot_sample_fraction=0.5)
    exact_pairs = {
        (r["id_l"], r["id_r"])
        for r in lsh.candidate_pairs(lsh.band_table(sigs, CFG), CFG).collect()
    }
    sampled_pairs = {
        (r["id_l"], r["id_r"])
        for r in lsh.candidate_pairs(
            lsh.band_table(sigs, cfg_sampled), cfg_sampled, n_reps=22
        ).collect()
    }
    assert ("x_a", "x_b") in sampled_pairs
    # the real monotonicity property: EVERY exact-path pair survives sampling
    # (a missed hot bucket degrades to all-pairs, which supersedes the
    # cascade's star links; detected buckets run the identical cascade) —
    # extras only, never fewer pairs
    assert exact_pairs <= sampled_pairs


# --- double-saturation recall (the round-4 residual hole, now closed) -------
# A 20-member crowd with IDENTICAL phash P saturates every top-level bucket
# AND every sub-window bucket it touches (at cap 16). The planted near pair
# (y_a, y_b) agrees with P exactly on band 0 and window 0 — so EVERY bucket
# the pair shares, at both levels, is a crowd-saturated one — while both
# members sit 32 bits from P (every hub star edge is hamming-filtered away).
# Pre-fix, the window-0 sub-bucket star-linked to the crowd hub and the pair
# lost all connectivity; with the sub_allpairs_max window it gets a DIRECT
# all-pairs edge.
def _saturated_rows():
    ph_crowd = _phash(0x1234, 0x5555, 0x6666, 0x7777)
    rows = []
    for i in range(20):
        sh = _signed(0x0123_4567_89AB_CDEF ^ (i * 0x1111_2222_3333_4444))
        mh = [1_000_000 + i * 64 + j for j in range(64)]
        rows.append((f"f{i:02d}", 64, 64, mh, sh, ph_crowd))
    # band 0 (bits 0-15) and band-1 low byte (bits 16-23) equal P's -> the
    # pair collides with the crowd in band 0 AND window 0 (bits 8-23); all
    # other bands/windows differ from P by >= 3 bits (no probe collision)
    ph_a = _phash(0x1234, 0xAA55, 0xBBBB, 0xCCCC)
    # y_b: 3-bit flips in window 1 (bits 24-26), window 2 (40-42) and
    # window 3 (56-58) -> hamming(a, b) = 9 <= 11 but >= 3 per band/window,
    # so the pair's ONLY shared buckets are the saturated crowd ones
    ph_b = _signed(
        (ph_a & ((1 << 64) - 1)) ^ (0b111 << 24) ^ (0b111 << 40) ^ (0b111 << 56)
    )
    rows.append(("y_a", 64, 64, [2_000_000 + j for j in range(64)],
                 _signed(0x0F0F_0F0F_0F0F_0F0F), ph_a))
    rows.append(("y_b", 64, 64, [3_000_000 + j for j in range(64)],
                 _signed(0xF0F0_F0F0_F0F0_F0F0), ph_b))
    return rows


def test_double_saturation_premises(spark):
    """The fixture actually saturates BOTH levels for every bucket the pair
    shares — otherwise the direct-pair assertion below would be vacuous."""
    rows = _saturated_rows()
    by_id = {r[0]: r for r in rows}
    ph_a, ph_b = by_id["y_a"][5], by_id["y_b"][5]
    ph_crowd = by_id["f00"][5]
    assert _ham(ph_a, ph_b) == 9
    assert _ham(ph_crowd, ph_a) > 12 and _ham(ph_crowd, ph_b) > 12
    # every sub-window bucket shared by the pair also holds the full crowd
    shared_sub = _sub_buckets(ph_a) & _sub_buckets(ph_b)
    assert shared_sub and shared_sub <= _sub_buckets(ph_crowd)
    # every TOP-level bucket shared by the pair is over-cap (crowd inside)
    from pyspark.sql import functions as F

    cfg = DedupConfig(max_band_bucket=16)
    bands = lsh.band_table(spark.createDataFrame(rows, SIG_SCHEMA), cfg)
    shared = (
        bands.groupBy("band_key")
        .agg(F.collect_set("rep_id").alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter(F.array_contains("ids", "y_a") & F.array_contains("ids", "y_b"))
        .collect()
    )
    assert shared and all(r["n"] > cfg.max_band_bucket for r in shared)


def test_double_saturated_pair_keeps_direct_edge(spark):
    """Sub-buckets within sub_allpairs_max run DIRECT all-pairs: the planted
    pair survives double saturation with a 'pixel' (non-star) edge."""
    cfg = DedupConfig(max_band_bucket=16)  # default sub_allpairs_max (4096)
    sigs = spark.createDataFrame(_saturated_rows(), SIG_SCHEMA)
    got = {
        (r["id_l"], r["id_r"]): r["band_src"]
        for r in lsh.candidate_pairs(lsh.band_table(sigs, cfg), cfg).collect()
    }
    assert got.get(("y_a", "y_b")) == "pixel"


def test_mega_crowd_still_falls_back_to_stars(spark):
    """Beyond sub_allpairs_max the bounded star fallback (and its documented
    residual exposure) still engages: the crowd keeps hub-star connectivity,
    the far-from-hub pair loses its direct edge — exactly the population the
    star_only_pairs lineage metric counts."""
    # 19 < 20 so even the crowd-only sub-windows (20 members) saturate
    cfg = DedupConfig(max_band_bucket=16, sub_allpairs_max=19)
    sigs = spark.createDataFrame(_saturated_rows(), SIG_SCHEMA)
    got = {
        (r["id_l"], r["id_r"]): r["band_src"]
        for r in lsh.candidate_pairs(lsh.band_table(sigs, cfg), cfg).collect()
    }
    assert ("y_a", "y_b") not in got
    assert got.get(("f00", "f01")) == "star_pixel"


# --- exact-signature twin collapse (round-5: the 300k quadratic-verify trap) -
def test_twin_crowd_emits_linear_sig_twin_edges(spark):
    """A crowd of n members with IDENTICAL (phash, simhash) — the planted
    mega-cluster shape — must emit n-1 hamming-0 'sig_twin' delegate edges,
    never C(n,2) all-pairs: twins pass the hamming prefilter wholesale, so
    without the collapse a quadratic candidate set goes straight to
    decode-cost verify (measured pre-fix at 300k: the planted 3,000-twin
    crowd fit inside sub_allpairs_max and emitted 4,515,182 candidates,
    a 19.5-minute pairs wall)."""
    n = 40
    ph = _phash(0x1234, 0x5555, 0x6666, 0x7777)
    sh = _signed(0x0123_4567_89AB_CDEF)
    rows = [
        (f"t{i:02d}", 64, 64,
         [5_000_000 + i * 64 + j for j in range(64)], sh, ph)
        for i in range(n)
    ]
    cfg = DedupConfig(max_band_bucket=16)
    sigs = spark.createDataFrame(rows, SIG_SCHEMA)
    got = lsh.candidate_pairs(lsh.band_table(sigs, cfg), cfg).collect()
    # delegate (min rep_id) -> every other twin, linear, and NOTHING else:
    # no C(n,2) leak through the all-pairs window or any star path
    assert sorted((r["id_l"], r["id_r"]) for r in got) == [
        ("t00", f"t{i:02d}") for i in range(1, n)
    ]
    # the hamming-0 twin label wins the provenance min-agg over star_* (so
    # these edges never inflate the star_only_pairs exposure metric)
    assert {r["band_src"] for r in got} == {"sig_twin"}


def test_twin_collapse_keeps_distinct_signature_crowds_intact(spark):
    """The collapse keys on EXACT (phash, simhash): the double-saturation
    crowd (identical phash, distinct simhash) must not collapse, and the
    planted far-from-hub pair keeps its direct all-pairs edge exactly as in
    test_double_saturated_pair_keeps_direct_edge."""
    cfg = DedupConfig(max_band_bucket=16)
    sigs = spark.createDataFrame(_saturated_rows(), SIG_SCHEMA)
    got = {
        (r["id_l"], r["id_r"]): r["band_src"]
        for r in lsh.candidate_pairs(lsh.band_table(sigs, cfg), cfg).collect()
    }
    assert got.get(("y_a", "y_b")) == "pixel"
    assert "sig_twin" not in set(got.values())


# --- simhash over-cap routing (round-5: the 1.2M pairs-wall fix) -----------
# A crowd sharing one IDENTICAL 64-bit simhash (smooth-image clumping) but
# pairwise-far phashes saturates every simhash band bucket. Pre-fix those
# members entered phash sub-banding, whose all-pairs work grew quadratically
# with the corpus (28.6e9 comparisons at 1.2M — BENCH/diag_band_sources.py);
# post-fix they take hub star links like caption buckets, which is recall-
# safe because the phash pigeonhole carries the guarantee: the planted near
# pair below sits INSIDE the over-cap simhash bucket and still gets its
# DIRECT edge from its (under-cap) phash band-0 bucket.
# The crowd shares phash window 0 (bits 8-23), so the OLD sub-banding would
# have emitted direct crowd pairs — their absence is the routing proof.
_B8 = [0x00, 0x0F, 0x33, 0x3C, 0x55, 0x5A, 0x66, 0x69]  # pairwise hamming 4


def _simhash_crowd_rows():
    sh_crowd = _signed(0xDEAD_BEEF_CAFE_F00D)
    rows = []
    for i, b in enumerate(_B8):
        ph = _signed(b | (0xABCD << 8) | (b << 24) | (b << 32) | (b << 48))
        mh = [1_000_000 + i * 64 + j for j in range(64)]
        rows.append((f"g{i:02d}", 64, 64, mh, sh_crowd, ph))
    ph_a = _phash(0x4321, 0x9999, 0x8888, 0x7777)
    ph_b = _signed(
        (ph_a & ((1 << 64) - 1)) ^ (0b111 << 16) ^ (0b111 << 32) ^ (0b111 << 48)
    )
    rows.append(("z_a", 64, 64, [2_000_000 + j for j in range(64)], sh_crowd, ph_a))
    rows.append(("z_b", 64, 64, [3_000_000 + j for j in range(64)], sh_crowd, ph_b))
    return rows


def test_simhash_crowd_premises(spark):
    """Non-vacuity: the pair is near (hamming 9), far from every crowd
    member in phash, inside over-cap simhash buckets, and its phash band-0
    bucket holds exactly the pair (under cap -> direct all-pairs)."""
    rows = _simhash_crowd_rows()
    by_id = {r[0]: r for r in rows}
    ph_a, ph_b = by_id["z_a"][5], by_id["z_b"][5]
    assert _ham(ph_a, ph_b) == 9
    for i in range(8):
        crowd_ph = by_id[f"g{i:02d}"][5]
        assert _ham(crowd_ph, ph_a) > 12 and _ham(crowd_ph, ph_b) > 12
        # no top-level phash probe collision with the pair (>= 3 bits/band)
        assert not (_top_level_buckets(crowd_ph) & _top_level_buckets(ph_a))
        assert not (_top_level_buckets(crowd_ph) & _top_level_buckets(ph_b))
        # but the OLD sub-band cascade WOULD have bucketed crowd members
        # together (shared window 0) — what the new routing must not do
        if i:
            assert _sub_buckets(crowd_ph) & _sub_buckets(by_id["g00"][5])
    from pyspark.sql import functions as F

    cfg = DedupConfig(max_band_bucket=4)
    bands = lsh.band_table(spark.createDataFrame(rows, SIG_SCHEMA), cfg)
    sim_keys = bands.filter(
        (F.col("band_key").bitwiseAND(F.lit(lsh.SIMHASH_BIT)) != 0)
        & (F.col("band_key").bitwiseAND(F.lit(lsh.CAPTION_BIT)) == 0)
    )
    sizes = [r["n"] for r in
             sim_keys.groupBy("band_key").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert sizes and all(n == 10 > cfg.max_band_bucket for n in sizes)


def test_simhash_overcap_routes_to_stars_not_subbanding(spark):
    cfg = DedupConfig(max_band_bucket=4)
    sigs = spark.createDataFrame(_simhash_crowd_rows(), SIG_SCHEMA)
    got = {
        (r["id_l"], r["id_r"]): r["band_src"]
        for r in lsh.candidate_pairs(lsh.band_table(sigs, cfg), cfg).collect()
    }
    # the planted near pair keeps its DIRECT phash edge (recall unharmed)
    assert got.get(("z_a", "z_b")) == "pixel"
    # over-cap simhash buckets emit hub star links (prefilter passes: the
    # crowd shares the hub's simhash exactly)
    assert got.get(("g00", "g01")) == "star_simhash"
    assert got.get(("g00", "z_a")) == "star_simhash"
    # NO direct crowd-to-crowd pairs: sub-banding (which would have joined
    # them via the shared phash window 0) must not run for simhash buckets
    assert ("g01", "g02") not in got
    assert not any(
        l.startswith("g") and r.startswith("g") and l != "g00"
        for (l, r) in got
    )
