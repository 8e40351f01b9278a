import numpy as np

from dupion_spark.config import MERSENNE_31, DedupConfig
from dupion_spark.functions.codec import decode_image, encode_jpeg, encode_png
from dupion_spark.functions.signatures import (
    char_shingles,
    hamming64,
    hash64_bands,
    md5_60bit,
    minhash_bands,
    minhash_signature,
    phash64,
    simhash64,
)

CFG = DedupConfig()


def test_md5_60bit_matches_duckdb():
    import duckdb

    for s in ["hello", "", "zephyr basalt", "日本語"]:
        expected = duckdb.sql(
            f"SELECT CAST('0x' || substr(md5('{s}'), 1, 15) AS BIGINT)"
        ).fetchone()[0]
        assert md5_60bit(s) == expected


def test_shingles_short_text():
    assert char_shingles("ab", 5) == ["ab"]
    assert char_shingles("abcdef", 5) == ["abcde", "bcdef"]


def test_minhash_jaccard_estimate():
    # signature agreement approximates jaccard similarity (property-style)
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river bend"
    c = "completely different caption about mountains and glaciers at dawn"
    sa, sb, sc = (minhash_signature(t, CFG) for t in (a, b, c))
    sh_a, sh_b = set(char_shingles(a, CFG.shingle_k)), set(char_shingles(b, CFG.shingle_k))
    true_j = len(sh_a & sh_b) / len(sh_a | sh_b)
    est_j = float(np.mean(sa == sb))
    assert abs(est_j - true_j) < 0.2
    assert float(np.mean(sa == sc)) < 0.2
    assert np.all(sa >= 0) and np.all(sa < MERSENNE_31)


def test_identical_captions_share_all_bands():
    sig = minhash_signature("same caption", CFG)
    assert minhash_bands(sig, CFG) == minhash_bands(sig.copy(), CFG)
    assert len(minhash_bands(sig, CFG)) == CFG.minhash_bands


def test_phash_stable_under_tiny_perturbation():
    # multiprobe LSH (probe_bits=1, 4 bands) guarantees catching hamming <= 11
    rng = np.random.default_rng(7)
    coarse = rng.integers(16, 240, size=(4, 4, 3))
    pixels = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1).astype(np.uint8)
    perturbed = pixels.copy()
    perturbed[3, 5, 1] += 1
    perturbed[20, 9, 0] += 1
    d = hamming64(phash64(pixels, CFG), phash64(perturbed, CFG))
    assert d <= CFG.phash_bands * (2 * CFG.probe_bits) + CFG.phash_bands - 1


def test_multiprobe_guarantees_bucket_collision():
    from dupion_spark.functions.signatures import hash64_band_probes

    rng = np.random.default_rng(11)
    for _ in range(50):
        value = int(rng.integers(-(2**62), 2**62))
        d = int(rng.integers(1, 12))  # hamming distance 1..11
        bits = rng.choice(64, size=d, replace=False)
        flipped = np.uint64(np.int64(value))
        for bit in bits:
            flipped ^= np.uint64(1) << np.uint64(bit)
        flipped = np.int64(flipped).item()
        probes_a = set(hash64_band_probes(value, CFG.phash_bands, CFG.probe_bits))
        probes_b = set(hash64_band_probes(flipped, CFG.phash_bands, CFG.probe_bits))
        assert probes_a & probes_b, f"missed collision at hamming {d}"


def test_phash_differs_for_different_images():
    rng = np.random.default_rng(8)
    a = np.repeat(np.repeat(rng.integers(0, 256, (4, 4, 3)), 8, 0), 8, 1).astype(np.uint8)
    b = np.repeat(np.repeat(rng.integers(0, 256, (4, 4, 3)), 8, 0), 8, 1).astype(np.uint8)
    assert hamming64(phash64(a, CFG), phash64(b, CFG)) > 8


def test_simhash_stable_under_reencode():
    rng = np.random.default_rng(9)
    coarse = rng.integers(16, 240, size=(4, 4, 3))
    pixels = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1).astype(np.uint8)
    redecoded = decode_image(encode_jpeg(pixels))
    assert hamming64(simhash64(pixels, CFG), simhash64(redecoded, CFG)) <= 8


def test_hash64_bands_pigeonhole():
    value = phash64(decode_image(encode_png(np.zeros((16, 16, 3), np.uint8))), CFG)
    flipped = np.int64(np.uint64(np.int64(value)) ^ np.uint64(0b101)).item()  # 2 bits differ
    bands_a = hash64_bands(value, CFG.phash_bands)
    bands_b = hash64_bands(flipped, CFG.phash_bands)
    shared = sum(1 for x, y in zip(bands_a, bands_b) if x == y)
    assert shared >= CFG.phash_bands - 2  # d bits can spoil at most d bands


# --- suffix-automaton LCS (north_rule: suffix-structure substring check) -----

def _lcs_dp(a: str, b: str) -> int:
    """O(n*m) reference: classic DP longest common substring."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def test_lcs_matches_dp_reference():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dupion_spark.functions.spark_udfs import _lcs_length

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcd ", max_size=40), st.text(alphabet="abcd ", max_size=40))
    def check(a, b):
        assert _lcs_length(a, b) == _lcs_dp(a, b)

    check()


def test_lcs_known_values():
    from dupion_spark.functions.spark_udfs import _lcs_length

    assert _lcs_length("", "anything") == 0
    assert _lcs_length("abcdef", "zabcy") == 3        # "abc"
    assert _lcs_length("same caption", "same caption") == len("same caption")
    assert _lcs_length("xyz", "abc") == 0
    # asymmetric lengths exercise the build-on-shorter swap
    assert _lcs_length("needle", "hay needle hay" * 50) == len("needle")


# --- batched signatures: bit-parity with the per-image path ------------------

def test_batch_matches_per_image():
    """pixel_signatures_batch must be BIT-IDENTICAL to pixel_signatures for
    every image: the feature stage (operators/features.py) batches, while the
    synth planted-truth generator, archive source, and DataFrame fallback
    path hash per image — any divergence silently shifts LSH band keys."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dupion_spark.functions.signatures import (
        pixel_signatures,
        pixel_signatures_batch,
    )

    shapes = st.tuples(
        st.integers(1, 40), st.integers(1, 40), st.sampled_from([0, 1, 3])
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(shapes, st.integers(0, 2**32 - 1)), max_size=12))
    def check(specs):
        rngs = [np.random.default_rng(seed) for _, seed in specs]
        imgs = []
        for ((h, w, c), _), rng in zip(specs, rngs):
            shape = (h, w) if c == 0 else (h, w, c)
            imgs.append(rng.integers(0, 256, shape, dtype=np.uint8))
        imgs.append(None)  # F4 row: stays None in both outputs
        sh_b, ph_b = pixel_signatures_batch(imgs, CFG)
        for img, sh, ph in zip(imgs, sh_b, ph_b):
            if img is None:
                assert sh is None and ph is None
            else:
                assert (sh, ph) == pixel_signatures(img, CFG)

    check()


def test_batch_same_shape_crowd_and_chunk_boundary():
    """Same-shape stacks cross the _SIG_BATCH_CHUNK boundary; smooth images
    exercise median/threshold tie-handling."""
    from dupion_spark.functions import signatures as S

    rng = np.random.default_rng(9)
    imgs = [
        rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        for _ in range(S._SIG_BATCH_CHUNK * 2 + 3)
    ]
    imgs += [np.full((24, 24, 3), v, dtype=np.uint8) for v in (0, 7, 255)]
    sh_b, ph_b = S.pixel_signatures_batch(imgs, CFG)
    for img, sh, ph in zip(imgs, sh_b, ph_b):
        assert (sh, ph) == S.pixel_signatures(img, CFG)
