"""Archive source (reference S7): containers as simultaneously file + dir.

dupion streams zip/tar/7z entries and inserts each inner regular file as a
child row under the archive's path (dupion/src/zip/mod.rs:8-90, open_zip
:92-109); the archive itself stays a FILE (own byte hash) and becomes a DIR
after decode (driver/platterwalker.rs:352-354), so it participates in both
file-level hash groups and directory-rollup groups.

Graft: an archive is a row of the images table whose `fmt` is an archive
format and whose `bytes` column is a real (stdlib zipfile/tarfile — zip,
tar, tar.gz, tar.xz) container of encoded images + caption sidecars. The source operator explodes members into
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

import gzip
import io
import lzma
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dupion_spark.config import DedupConfig

# the reference scans zip/tar/7z/tar.gz/tar.xz (dupion/src/opts/mod.rs:52-62);
# stdlib covers all but 7z — when py7zr is importable 7z joins the explode
# set; without it a 7z payload is detected and classified but its members
# are not exploded (F4: the row keeps its file nature / byte hash)
try:  # pragma: no cover - py7zr is not in this container
    import py7zr  # type: ignore

    _HAVE_7Z = True
except Exception:
    _HAVE_7Z = False

ARCHIVE_FMTS = ("zip", "tar", "tgz", "txz") + (("7z",) if _HAVE_7Z else ())
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


def pack_tar(members: list[tuple[str, bytes, str]], compress: str = "") -> bytes:
    """Deterministically pack (name, image_bytes, caption) members as tar
    (compress='' | 'gz' | 'xz'). All tar metadata is pinned (mtime 0, uid/gid
    0, mode 644) and gzip runs with mtime=0, so equal content packs to equal
    bytes — twin tars byte-dedup exactly like twin zips."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        entries = []
        for name, data, caption in sorted(members):
            entries.append((name, data))
            entries.append((f"{name}.caption", (caption or "").encode("utf-8")))
        for name, data in entries:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if compress == "gz":
        return gzip.compress(raw, compresslevel=6, mtime=0)
    if compress == "xz":
        return lzma.compress(raw, preset=6)
    return raw


def _member_fmt(data: bytes) -> str:
    from dupion_spark.functions import codec

    if data[:4] == b"PK\x03\x04":
        return "zip"
    if len(data) > 262 and data[257:262] == b"ustar":
        return "tar"
    if data[:2] == b"\x1f\x8b":
        return "tgz"  # gzip container; members resolve via tarfile r:*
    if data[:6] == b"\xfd7zXZ\x00":
        return "txz"
    if data[:6] == b"7z\xbc\xaf\x27\x1c":
        return "7z"  # exploded iff py7zr is importable (see ARCHIVE_FMTS)
    if data[:4] == codec.MAGIC_LOSSLESS or data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:4] == codec.MAGIC_LOSSY or data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":  # a lying BM prefix degrades via try_decode (F4)
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:2] in (b"P5", b"P6"):  # weak 2-byte magic: text members that
        return "pnm"                # start "P5"/"P6" degrade via try_decode
    return "unknown"


def _iter_members(blob: bytes) -> list[tuple[str, bytes]]:
    """(name, data) entries of a zip / (possibly compressed) tar / 7z
    container."""
    if blob[:4] == b"PK\x03\x04":
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            return [(n, zf.read(n)) for n in zf.namelist()]
    if blob[:6] == b"7z\xbc\xaf\x27\x1c":  # pragma: no cover - needs py7zr
        if not _HAVE_7Z:
            raise tarfile.TarError("7z container needs py7zr (not installed)")
        with py7zr.SevenZipFile(io.BytesIO(blob)) as zf:
            return [(n, bio.read()) for n, bio in (zf.readall() or {}).items()]
    # tarfile r:* auto-detects plain/gz/xz/bz2 framing
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
        out = []
        for info in tf.getmembers():
            if not info.isfile():
                continue
            out.append((info.name, tf.extractfile(info).read()))
        return out


def _unpack_rows(parent_id: str, blob: bytes, cfg: DedupConfig) -> list[dict]:
    from dupion_spark.functions import codec, signatures

    rows = []
    entries = _iter_members(blob)
    names = [n for n, _ in entries if not n.endswith(".caption")]
    captions = {
        # errors="replace": a non-UTF-8 caption sidecar must not kill the
        # task (F4) — valid UTF-8 passes through byte-identical
        n[: -len(".caption")]: d.decode("utf-8", errors="replace")
        for n, d in entries
        if n.endswith(".caption")
    }
    data_by_name = dict(entries)
    for name in names:
        data = data_by_name[name]
        fmt = _member_fmt(data)
        pixels = (
            codec.try_decode_image(data)
            if fmt in ("png", "jpeg", "gif", "bmp", "tiff", "pnm")
            else None
        )
        if pixels is not None:
            h, w = pixels.shape[:2]
            phash = signatures.phash64(pixels, cfg)
        else:
            # nested container, opaque payload, or a member whose image
            # magic lied (truncated body): keep the row with no pixel props
            # (F4 degrade) — its byte hash still joins exact groups upstream
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
                try:
                    out.extend(_unpack_rows(image_id, bytes(blob), cfg))
                except (zipfile.BadZipFile, tarfile.TarError, EOFError,
                        lzma.LZMAError, gzip.BadGzipFile):
                    # corrupt/mislabeled container (F4 validity): contributes
                    # no children; the row itself keeps its file nature (byte
                    # hash) upstream, matching dupion's decode-failure skip
                    continue
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
