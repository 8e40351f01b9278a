"""Archive source (reference S7): containers as simultaneously file + dir.

dupion streams zip/tar/7z entries and inserts each inner regular file as a
child row under the archive's path (dupion/src/zip/mod.rs:8-90, open_zip
:92-109); the archive itself stays a FILE (own byte hash) and becomes a DIR
after decode (driver/platterwalker.rs:352-354), so it participates in both
file-level hash groups and directory-rollup groups.

Graft: an archive is a row of the images table whose `fmt` is an archive
format and whose `bytes` column is a real (stdlib zipfile) container of
encoded images + caption sidecars. The source operator explodes members into
child rows of the same input_hint shape — worker-side, inside mapInPandas, so
container payloads never round-trip anywhere — and emits a partition-map
fragment (child -> parent) that feeds the standard rollup/shadow operators:
the archive's "dir hash" IS its per-partition rollup hash, twin archives are
detected exactly like dupion's duplicated folders.

Nested containers (zip inside zip) are handled by iterating the explode until
a pass yields no archive rows (depth-bounded), mirroring the reference's
re-scan of archive children in pass 3 (main.rs:110-114).

Layout inside a container: `<name>` holds encoded image bytes;
`<name>.caption` holds the UTF-8 caption sidecar. Member names are the
child rel_names. ZIP timestamps are pinned so equal content packs to equal
bytes (byte-level dedup of twin archives also works).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dupion_spark.config import DedupConfig

ARCHIVE_FMTS = ("zip",)
_FIXED_ZIP_TIME = (1980, 1, 1, 0, 0, 0)

CHILD_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField("rel_name", T.StringType()),
    ]
)


def pack_zip(members: list[tuple[str, bytes, str]]) -> bytes:
    """Deterministically pack (name, image_bytes, caption) members."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        for name, data, caption in sorted(members):
            info = zipfile.ZipInfo(name, date_time=_FIXED_ZIP_TIME)
            zf.writestr(info, data)
            cap = zipfile.ZipInfo(f"{name}.caption", date_time=_FIXED_ZIP_TIME)
            zf.writestr(cap, (caption or "").encode("utf-8"))
    return buf.getvalue()


def _member_fmt(data: bytes) -> str:
    from dupion_spark.functions import codec

    if data[:4] == b"PK\x03\x04":
        return "zip"
    if data[:4] == codec.MAGIC_LOSSLESS:
        return "png"
    if data[:4] == codec.MAGIC_LOSSY:
        return "jpeg"
    return "unknown"


def _unpack_rows(parent_id: str, blob: bytes, cfg: DedupConfig) -> list[dict]:
    from dupion_spark.functions import codec, signatures

    rows = []
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = [n for n in zf.namelist() if not n.endswith(".caption")]
        captions = {
            n[: -len(".caption")]: zf.read(n).decode("utf-8")
            for n in zf.namelist()
            if n.endswith(".caption")
        }
        for name in names:
            data = zf.read(name)
            fmt = _member_fmt(data)
            if fmt in ("png", "jpeg"):
                pixels = codec.decode_image(data)
                h, w = pixels.shape[:2]
                phash = signatures.phash64(pixels, cfg)
            else:  # nested container (or opaque payload): no pixel props yet
                h = w = 0
                phash = 0
            rows.append(
                {
                    "image_id": f"{parent_id}/{name}",
                    "bytes": data,
                    "w": int(w),
                    "h": int(h),
                    "fmt": fmt,
                    "caption": captions.get(name, ""),
                    "phash": int(phash),
                    "parent_id": parent_id,
                    "rel_name": name,
                }
            )
    return rows


def explode_archives(images: DataFrame, cfg: DedupConfig) -> DataFrame:
    """One explode pass: child rows (CHILD_SCHEMA) of every archive row.

    Worker-side mapInPandas over ONLY the archive rows (pushed-down fmt
    filter); at corpus scale the archive slice shuffles nothing — unpacking
    happens in the scan pipeline of each task."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob in zip(pdf["image_id"], pdf["bytes"]):
                out.extend(_unpack_rows(image_id, bytes(blob), cfg))
            yield pd.DataFrame(
                out, columns=[f.name for f in CHILD_SCHEMA.fields]
            )

    return (
        images.filter(F.col("fmt").isin(*ARCHIVE_FMTS))
        .select("image_id", "bytes")
        .mapInPandas(gen, CHILD_SCHEMA)
    )


def flatten_with_archives(
    images: DataFrame, cfg: DedupConfig, max_depth: int = 3
) -> tuple[DataFrame, DataFrame]:
    """(flat_images, container_map): the input_hint-shaped table with archive
    members (incl. nested archives up to max_depth) appended as first-class
    rows, plus the child->container partition-map fragment
    (image_id, part_key=parent archive id, rel_name).

    Archive rows stay in flat_images (file nature: byte hash, exact groups);
    their dir nature comes from feeding container_map into
    operators/rollup.rollup_table — the rollup hash is the archive's dir
    hash, twin containers land in rollup twin groups (J3 shadows apply)."""
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    flat = images.select(*cols)
    cmap = None
    frontier = images
    for _ in range(max_depth):
        children = explode_archives(frontier, cfg)
        children = children.localCheckpoint(eager=False)  # referenced 3x below
        fragment = children.select(
            "image_id", F.col("parent_id").alias("part_key"), "rel_name"
        )
        cmap = fragment if cmap is None else cmap.unionByName(fragment)
        flat = flat.unionByName(children.select(*cols))
        frontier = children.filter(F.col("fmt").isin(*ARCHIVE_FMTS))
        # cheap emptiness probe per depth level: archives-of-archives are rare
        if frontier.isEmpty():
            break
    return flat, cmap
