"""Deterministic synthetic image+caption fixture generator (seed=42).

Produces the `input_hint` table shape
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)
with planted duplicate structure (FIXTURES.md §1), plus golden oracle tables
(`golden_clusters`, `golden_pairs`, `partition_map`) computed single-process —
these play the role of "the reference's grouping fixtures" for the recall>=0.99
gate, since the reference crate itself ships zero tests (SURVEY.md §5).

No Spark here: plain numpy + pyarrow, so the oracle is independent of the
system under test. Images are *smooth* (low-frequency upsampled noise) so
perceptual hashes behave like they do on photographs, not on white noise.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from dupion_spark.config import DedupConfig
from dupion_spark.functions.codec import encode_jpeg, encode_png
from dupion_spark.functions.signatures import phash64

VOCAB = (
    "aurora bramble cascade dune ember fjord glacier harbor islet juniper "
    "kestrel lagoon meadow nimbus orchard prairie quartz ridge summit thicket "
    "umber valley willow xenon yonder zephyr basalt copper drift elder"
).split()

SIZES = (16, 32, 64)

# bump when the generation logic changes — invalidates materialized fixtures
# (v6: images.parquet layout only — bytes column no longer dictionary-encoded,
# 256 KiB data pages — values identical to v5; enables page-selective gather)
SYNTH_VERSION = 6


@dataclass
class SynthResult:
    images: pd.DataFrame
    golden_clusters: pd.DataFrame   # image_id, cluster_id, kind
    golden_pairs: pd.DataFrame      # id_l, id_r, reason
    partition_map: pd.DataFrame     # image_id, part_key, rel_name
    golden_features: pd.DataFrame   # image_id, w, h, byte_len, byte_sha256,
    #                                 pixel_sha256_hex, content_hash — the
    #                                 single-process expected values the
    #                                 DuckDB image-query oracles read
    golden_tree: pd.DataFrame       # expected tree_rows output (P2/O3/O4):
    #                                 parent, name, icon, icon_prio, dups,
    #                                 size, label, child_rank, preview


class _Builder:
    def __init__(self, cfg: DedupConfig, seed: int):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.rows: list[dict] = []
        self.cluster_rows: list[dict] = []
        self.pair_rows: list[dict] = []
        self.next_cluster = 0

    # -- primitives ---------------------------------------------------------
    def smooth_pixels(self, h: int, w: int) -> np.ndarray:
        """Low-frequency image: coarse random grid upsampled + mild noise.

        The coarse grid is at least 4x4 so even 16px images carry enough
        texture for realistic perceptual-hash entropy — real photographs do
        not collide at hamming<=16 the way 2x2-gradient toys do."""
        coarse_h, coarse_w = max(4, h // 4), max(4, w // 4)
        coarse = self.rng.integers(16, 240, size=(coarse_h, coarse_w, self.cfg.channels))
        reps_h = int(np.ceil(h / coarse_h))
        reps_w = int(np.ceil(w / coarse_w))
        up = np.repeat(np.repeat(coarse, reps_h, axis=0), reps_w, axis=1)[:h, :w, :]
        noise = self.rng.integers(-6, 7, size=up.shape)
        return np.clip(up + noise, 0, 255).astype(np.uint8)

    def caption(self, n_words: int = 10) -> str:
        words = self.rng.choice(VOCAB, size=n_words, replace=True)
        return " ".join(words.tolist())

    def paraphrase(self, caption: str) -> str:
        """Keep a long core substring, swap the leading word(s)."""
        prefix = " ".join(self.rng.choice(VOCAB, size=2, replace=True).tolist())
        return prefix + " " + caption[caption.index(" ") + 1 :]

    def perturb(self, pixels: np.ndarray, n_pixels: int = 4) -> np.ndarray:
        """Flip the LSB-ish value of a handful of pixels (PSNR stays huge)."""
        out = pixels.copy()
        h, w, c = out.shape
        for _ in range(n_pixels):
            y = int(self.rng.integers(0, h))
            x = int(self.rng.integers(0, w))
            ch = int(self.rng.integers(0, c))
            delta = 1 if out[y, x, ch] < 255 else -1
            out[y, x, ch] = int(out[y, x, ch]) + delta
        return out

    def add_row(self, pixels: np.ndarray, fmt: str, caption: str) -> str:
        idx = len(self.rows)
        image_id = f"img{idx:08d}"
        data = encode_png(pixels) if fmt == "png" else encode_jpeg(pixels)
        h, w = pixels.shape[:2]
        self.rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": int(w),
                "h": int(h),
                "fmt": fmt,
                "caption": caption,
                "phash": phash64(pixels, self.cfg),
            }
        )
        return image_id

    def add_group(self, members: list[str], kind: str) -> None:
        cluster_id = self.next_cluster
        self.next_cluster += 1
        for image_id in members:
            self.cluster_rows.append(
                {"image_id": image_id, "cluster_id": cluster_id, "kind": kind}
            )
        ordered = sorted(members)
        for i in range(len(ordered)):
            for j in range(i + 1, len(ordered)):
                self.pair_rows.append(
                    {"id_l": ordered[i], "id_r": ordered[j], "reason": kind}
                )

    def add_singleton(self, image_id: str, kind: str) -> None:
        cluster_id = self.next_cluster
        self.next_cluster += 1
        self.cluster_rows.append(
            {"image_id": image_id, "cluster_id": cluster_id, "kind": kind}
        )


def generate(n_rows: int, cfg: DedupConfig | None = None) -> SynthResult:
    """Deterministic fixture of ~n_rows images (exact count may differ by <1%)."""
    cfg = cfg or DedupConfig()
    b = _Builder(cfg, cfg.seed)
    rng = b.rng

    n_exact_groups = max(2, n_rows // 50)        # ~4-6% of rows in exact groups
    n_reencode = max(2, n_rows // 50)
    n_nearpix = max(2, n_rows // 50)
    n_capnear = max(2, n_rows // 50)
    n_decoys = max(1, n_rows // 100)
    mega_size = max(8, n_rows // 20)             # 5% skew probe, one hot cluster

    # exact-duplicate groups: identical bytes under distinct ids
    for _ in range(n_exact_groups):
        size = int(rng.integers(2, 6))
        dim = int(rng.choice(SIZES))
        pixels = b.smooth_pixels(dim, dim)
        caption = b.caption()
        members = [b.add_row(pixels, "png", caption) for _ in range(size)]
        b.add_group(members, "exact")

    # re-encode duplicates: same pixels, png + jpeg encodings (byte-different)
    for _ in range(n_reencode):
        dim = int(rng.choice(SIZES))
        pixels = b.smooth_pixels(dim, dim)
        caption = b.caption()
        members = [b.add_row(pixels, "png", caption), b.add_row(pixels, "jpeg", caption)]
        b.add_group(members, "reencode")

    # near-duplicate pixels: tiny perturbations, *different* captions so only
    # the pixel band path (phash/simhash LSH) can catch them
    for _ in range(n_nearpix):
        dim = int(rng.choice(SIZES))
        pixels = b.smooth_pixels(dim, dim)
        members = [b.add_row(pixels, "png", b.caption())]
        for _ in range(int(rng.integers(1, 3))):
            members.append(b.add_row(b.perturb(pixels), "png", b.caption()))
        b.add_group(members, "near_pixel")

    # caption near-dups: same image, paraphrased caption (long shared substring)
    for _ in range(n_capnear):
        dim = int(rng.choice(SIZES))
        pixels = b.smooth_pixels(dim, dim)
        caption = b.caption()
        members = [
            b.add_row(pixels, "png", caption),
            b.add_row(pixels, "png", b.paraphrase(caption)),
        ]
        b.add_group(members, "near_caption")

    # decoys: identical caption, different images — must NOT cluster
    for _ in range(n_decoys):
        caption = b.caption()
        dim = int(rng.choice(SIZES))
        a = b.add_row(b.smooth_pixels(dim, dim), "png", caption)
        c = b.add_row(b.smooth_pixels(dim, dim), "png", caption)
        b.add_singleton(a, "decoy")
        b.add_singleton(c, "decoy")

    # skew probe: one mega-cluster of near-identical images (hot band key)
    mega_base = b.smooth_pixels(32, 32)
    mega_members = [b.add_row(mega_base, "png", b.caption())]
    for _ in range(mega_size - 1):
        mega_members.append(b.add_row(b.perturb(mega_base, 2), "png", b.caption()))
    b.add_group(mega_members, "mega")

    # degenerate rows: 1x1 images, empty captions, same-shape-different-content
    one_a = b.add_row(np.full((1, 1, cfg.channels), 7, dtype=np.uint8), "png", "")
    one_b = b.add_row(np.full((1, 1, cfg.channels), 7, dtype=np.uint8), "png", "")
    b.add_group([one_a, one_b], "exact")
    same_shape_a = b.add_row(b.smooth_pixels(16, 16), "png", "")
    same_shape_b = b.add_row(b.smooth_pixels(16, 16), "png", "")
    b.add_singleton(same_shape_a, "unique")
    b.add_singleton(same_shape_b, "unique")

    # uniques fill the remainder
    while len(b.rows) < n_rows:
        dim = int(rng.choice(SIZES))
        image_id = b.add_row(b.smooth_pixels(dim, dim), rng.choice(["png", "jpeg"]), b.caption())
        b.add_singleton(image_id, "unique")

    images = pd.DataFrame(b.rows)
    golden_clusters = pd.DataFrame(b.cluster_rows)
    golden_pairs = pd.DataFrame(b.pair_rows)

    # golden feature table: the EXPECTED per-row hash values, computed here in
    # plain numpy/hashlib (independent of the Spark path) so the driver's
    # DuckDB oracles can value-check the image queries. Hex casing matches the
    # Spark side exactly: sha2() emits lowercase, hex(binary) uppercase.
    # content_hash replicates the reference's F2 prune semantics
    # (state/mod.rs:95-111): pixel hash only when the (w,h) shape group has
    # >1 member — a unique-shape row cannot be an exact pixel duplicate —
    # byte hash otherwise.
    import hashlib as _hashlib

    from dupion_spark.functions.codec import decode_image as _decode

    shape_counts: dict[tuple[int, int], int] = {}
    for row in b.rows:
        key = (row["w"], row["h"])
        shape_counts[key] = shape_counts.get(key, 0) + 1
    feat_rows = []
    for row in b.rows:
        pixels = _decode(row["bytes"])
        ph, pw, pc = pixels.shape
        hasher = _hashlib.sha256()
        hasher.update(f"{ph}x{pw}x{pc}:".encode())
        hasher.update(pixels.tobytes())
        pixel_hex = hasher.hexdigest().upper()
        byte_sha = _hashlib.sha256(row["bytes"]).hexdigest()
        pruned = shape_counts[(row["w"], row["h"])] == 1
        feat_rows.append(
            {
                "image_id": row["image_id"],
                "w": row["w"],
                "h": row["h"],
                "byte_len": len(row["bytes"]),
                "byte_sha256": byte_sha,
                "pixel_sha256_hex": pixel_hex,
                "content_hash": byte_sha if pruned else pixel_hex,
            }
        )
    golden_features = pd.DataFrame(feat_rows)

    # partition map: round-robin partitions, plus two planted duplicate
    # partitions (same rel_name -> same pixels) for the rollup/shadow tests,
    # mirroring dupion's duplicated-folder detection (process/mod.rs:35-136)
    n_parts = max(4, n_rows // 250)
    part_rows = []
    dup_pool: list[dict] = []
    for i, row in enumerate(b.rows):
        part_rows.append(
            {
                "image_id": row["image_id"],
                "part_key": f"part{i % n_parts:03d}",
                "rel_name": f"r{i // n_parts:05d}",
            }
        )
    # planted duplicate partitions: members of exact groups split across dupA/dupB
    exact_groups: dict[int, list[str]] = {}
    for crow in b.cluster_rows:
        if crow["kind"] == "exact":
            exact_groups.setdefault(crow["cluster_id"], []).append(crow["image_id"])
    rank = 0
    overrides: dict[str, tuple[str, str]] = {}
    for members in exact_groups.values():
        if len(members) >= 2:
            overrides[members[0]] = ("dupA", f"r{rank:05d}")
            overrides[members[1]] = ("dupB", f"r{rank:05d}")
            rank += 1
    for prow in part_rows:
        if prow["image_id"] in overrides:
            prow["part_key"], prow["rel_name"] = overrides[prow["image_id"]]
    partition_map = pd.DataFrame(part_rows)

    # golden tree table: the EXPECTED tree_rows output (operators/tree.py —
    # reference P2/O3/O4 semantics, dupion/src/output/tree.rs:53-105) computed
    # single-process from golden_features + partition_map, so img_tree_rows is
    # value-checked like the other image queries. Node order, labels, ranks
    # and previews are deterministic functions of the content hashes.
    feat_by_id = golden_features.set_index("image_id")
    file_rows = []
    hash_members: dict[str, list[str]] = {}
    for prow in part_rows:
        frow = feat_by_id.loc[prow["image_id"]]
        hash_members.setdefault(frow["content_hash"], []).append(prow["image_id"])
    for prow in part_rows:
        frow = feat_by_id.loc[prow["image_id"]]
        members = sorted(hash_members[frow["content_hash"]])
        file_rows.append(
            {
                "parent": prow["part_key"],
                "name": prow["rel_name"],
                "icon": "F",
                "icon_prio": 2,
                "dups": len(members),
                "size": int(frow["byte_len"]),
                "preview": ";".join(members[:4]) if len(members) > 1 else "",
            }
        )
    # dir nodes under the synthetic root '' (no archive containers in this
    # fixture: part_keys are never image ids, so the icon is always 'D')
    import hashlib as _hl

    by_part: dict[str, list[tuple[str, str]]] = {}
    part_bytes: dict[str, int] = {}
    for prow in part_rows:
        frow = feat_by_id.loc[prow["image_id"]]
        by_part.setdefault(prow["part_key"], []).append(
            (prow["rel_name"], frow["content_hash"])
        )
        part_bytes[prow["part_key"]] = part_bytes.get(prow["part_key"], 0) + int(
            frow["byte_len"]
        )
    roll_hash = {
        pk: _hl.sha256(
            "|".join(sorted(f"{rel}:{ch}" for rel, ch in pairs)).encode()
        ).hexdigest()
        for pk, pairs in by_part.items()
    }
    roll_members: dict[str, list[str]] = {}
    for pk, rh in roll_hash.items():
        roll_members.setdefault(rh, []).append(pk)
    dir_rows = []
    for pk in by_part:
        twins = sorted(roll_members[roll_hash[pk]])
        dir_rows.append(
            {
                "parent": "",
                "name": pk,
                "icon": "D",
                "icon_prio": 0,
                "dups": len(twins),
                "size": part_bytes[pk],
                "preview": ";".join(twins[:4]) if len(twins) > 1 else "",
            }
        )
    tree_nodes = pd.DataFrame(file_rows + dir_rows)
    tree_nodes["label"] = (
        pd.Series(np.where(tree_nodes["dups"] > 1, "DUPS", "UNIQ"),
                  index=tree_nodes.index)
        + " " + tree_nodes["icon"] + " " + tree_nodes["name"]
        + " " + tree_nodes["size"].astype(str)
    )
    # child_rank: per parent by (icon_prio ASC, clamped-dups DESC, size DESC,
    # name ASC) — tree.rs:68's order with the [1,2] dup clamp
    tree_nodes["_clamp"] = tree_nodes["dups"].clip(1, 2)
    tree_nodes = tree_nodes.sort_values(
        ["parent", "icon_prio", "_clamp", "size", "name"],
        ascending=[True, True, False, False, True],
    ).reset_index(drop=True)
    tree_nodes["child_rank"] = tree_nodes.groupby("parent").cumcount() + 1
    golden_tree = tree_nodes[
        ["parent", "name", "icon", "icon_prio", "dups", "size",
         "label", "child_rank", "preview"]
    ].astype({"icon_prio": "int32", "dups": "int64", "size": "int64",
              "child_rank": "int32"})

    return SynthResult(
        images, golden_clusters, golden_pairs, partition_map, golden_features,
        golden_tree,
    )


def materialize(out_dir: str, n_rows: int, cfg: DedupConfig | None = None) -> SynthResult:
    """Write the fixture tables as parquet under out_dir (idempotent cache)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(
        out_dir, f"_SYNTH_v{SYNTH_VERSION}_{n_rows}_{(cfg or DedupConfig()).config_hash()}"
    )
    result = None
    if not os.path.exists(marker):
        result = generate(n_rows, cfg)
        schema = pa.schema(
            [
                ("image_id", pa.string()),
                ("bytes", pa.binary()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("caption", pa.string()),
                ("phash", pa.int64()),
            ]
        )
        pq.write_table(
            pa.Table.from_pandas(result.images, schema=schema, preserve_index=False),
            os.path.join(out_dir, "images.parquet"),
            # small row groups = scan-split granularity for the worker-side
            # direct-read feature extractor (operators/features.py)
            row_group_size=512,
            # unique multi-KB blobs must NOT be dictionary-encoded: a dict-
            # encoded chunk keeps every payload in its dictionary page, which
            # the page-selective verify gather (functions/pagegather) would
            # have to decompress whole regardless of how few rows it needs —
            # production blob writers disable dict for binary payloads for
            # the same reason. Bounded data pages make the gather's unit of
            # decompression ~a few images instead of the whole chunk.
            use_dictionary=["image_id", "fmt", "caption"],
            data_page_size=256 * 1024,
            # pyarrow only evaluates data_page_size every write_batch_size
            # values — the default (1024) exceeds the 512-row groups, which
            # would leave one giant page per chunk
            write_batch_size=64,
        )
        for name in (
            "golden_clusters", "golden_pairs", "partition_map",
            "golden_features", "golden_tree",
        ):
            pq.write_table(
                pa.Table.from_pandas(getattr(result, name), preserve_index=False),
                os.path.join(out_dir, f"{name}.parquet"),
            )
        with open(marker, "w") as fh:
            fh.write("ok")
    return result
