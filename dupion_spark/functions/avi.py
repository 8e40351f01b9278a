"""Real AVI (RIFF) MJPEG video container: parse + synthesize without ffmpeg.

Public spec: the AVI RIFF File Format (Microsoft "AVI RIFF File Reference" /
msdn dd318189; OpenDML AVI File Format Extensions for the idx1 conventions).
An MJPEG AVI stores each video frame as an independent baseline JPEG inside
a ``00dc`` chunk of the ``movi`` list — which the pure-numpy decoder in
`functions/jpeg.py` already handles, so real AVI video decodes end-to-end in
this container with no external library, the same closure pattern as
functions/png.py (round 4) and functions/jpeg.py / functions/flac.py
(round 5).

Seek-without-decode: `avi_frame_spans` walks only the 8-byte RIFF chunk
headers of the ``movi`` list (no payload reads, no entropy decode), so
stride-sampling a 10k-frame AVI touches ~0.1% of the JPEG work — the same
property the engine's DVID length-prefix layout provides and the reason
frame sampling stays cheap at 100 TB. (Reference analogue: dupion walks
archive member headers without extracting payloads,
dupion/src/process/archive.rs.)

MJPEG quirk handled: many MJPEG encoders omit the DHT segment from each
frame, relying on the "fixed" ITU-T T.81 Annex K.3 Huffman tables (this is
codified in the OpenDML MJPEG notes). `ensure_dht` splices the standard
tables in front of SOS when a frame carries none, so such frames decode
instead of failing F4-validity.
"""

from __future__ import annotations

import struct

from dupion_spark.functions.jpeg import _AC_CHROMA, _AC_LUMA, _DC_CHROMA, _DC_LUMA

MAGIC_RIFF = b"RIFF"
FOURCC_AVI = b"AVI "


def is_avi(data: bytes) -> bool:
    return data[:4] == MAGIC_RIFF and data[8:12] == FOURCC_AVI


# --------------------------------------------------------------------------
# RIFF walking (headers only — never reads chunk payloads)
# --------------------------------------------------------------------------

def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for chunks in [pos, end).

    RIFF pads every chunk to an even byte boundary; a truncated header or a
    size running past `end` raises ValueError (F4: corrupt container)."""
    n = min(end, len(data))
    while pos + 8 <= n:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > n:
            raise ValueError(f"truncated AVI chunk {fourcc!r} at {pos}")
        yield fourcc, payload, size
        pos = payload + size + (size & 1)


def _require_avi(data: bytes) -> int:
    if not is_avi(data):
        raise ValueError(f"not an AVI: {data[:4]!r}/{data[8:12]!r}")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    # end of RIFF payload (fourcc 'AVI ' is payload byte 0..4)
    return min(8 + riff_size, len(data))


def avi_meta(data: bytes) -> dict:
    """Parse the hdrl list -> {width, height, fps, total_frames, handler}."""
    end = _require_avi(data)
    meta: dict = {}
    for fourcc, p, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST" or data[p:p + 4] != b"hdrl":
            continue
        for cc2, p2, sz2 in _iter_chunks(data, p + 4, p + size):
            if cc2 == b"avih":
                usec_pf, _, _, _, total = struct.unpack_from("<5I", data, p2)
                w, h = struct.unpack_from("<II", data, p2 + 32)
                meta.update(width=w, height=h, total_frames=total,
                            fps=(1e6 / usec_pf if usec_pf else 0.0))
            elif cc2 == b"LIST" and data[p2:p2 + 4] == b"strl":
                for cc3, p3, _ in _iter_chunks(data, p2 + 4, p2 + sz2):
                    if cc3 == b"strh" and data[p3:p3 + 4] == b"vids":
                        meta["handler"] = data[p3 + 4:p3 + 8].decode(
                            "ascii", "replace")
        break
    if "width" not in meta:
        raise ValueError("AVI has no avih header")
    return meta


def avi_frame_spans(data: bytes):
    """Yield (frame_idx, start, end) byte spans of video-frame payloads.

    Walks the movi list's chunk headers in file order — ``##dc`` (compressed)
    and ``##db`` (uncompressed/DIB, also used by some MJPEG writers) chunks,
    recursing into ``rec `` grouping lists. Audio (``##wb``) and index
    chunks are skipped. Only 8-byte headers are read; payloads are not
    touched, so this is the frame-sampling seek path."""
    end = _require_avi(data)
    idx = 0
    for fourcc, p, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST" or data[p:p + 4] != b"movi":
            continue
        stack = [(p + 4, p + size)]
        while stack:
            lo, hi = stack.pop(0)
            for cc2, p2, sz2 in _iter_chunks(data, lo, hi):
                if cc2 == b"LIST" and data[p2:p2 + 4] == b"rec ":
                    stack.append((p2 + 4, p2 + sz2))
                elif (cc2[2:4] in (b"dc", b"db")
                        and cc2[0:1].isdigit() and cc2[1:2].isdigit()):
                    yield idx, p2, p2 + sz2
                    idx += 1
        return
    raise ValueError("AVI has no movi list")


def avi_frame_count(data: bytes) -> int:
    """Frame count from the avih header; falls back to the movi walk when
    the header lies (dwTotalFrames == 0 is common in streamed writers)."""
    total = avi_meta(data)["total_frames"]
    if total:
        return total
    return sum(1 for _ in avi_frame_spans(data))


# --------------------------------------------------------------------------
# MJPEG omitted-DHT quirk
# --------------------------------------------------------------------------

def _dht_segment() -> bytes:
    tables = [(0x00, _DC_LUMA), (0x01, _DC_CHROMA),
              (0x10, _AC_LUMA), (0x11, _AC_CHROMA)]
    body = b"".join(bytes([tcth]) + bytes(bits) + bytes(vals)
                    for tcth, (bits, vals) in tables)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


_STD_DHT = _dht_segment()


def ensure_dht(jpeg: bytes) -> bytes:
    """Return `jpeg` with the Annex K.3 Huffman tables spliced before SOS if
    the frame carries no DHT segment (the MJPEG fixed-tables convention)."""
    if jpeg[:2] != b"\xff\xd8":
        return jpeg  # not JPEG; let the codec raise its own error
    pos, n = 2, len(jpeg)
    while pos + 4 <= n and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker == 0xC4:  # has DHT already
            return jpeg
        if marker == 0xDA:  # SOS reached with no DHT: splice
            return jpeg[:pos] + _STD_DHT + jpeg[pos:]
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        pos += 2 + seg_len
    return jpeg  # truncated; codec will raise ValueError


# --------------------------------------------------------------------------
# encoder (synthetic fixtures — spec-compliant single-video-stream MJPEG AVI)
# --------------------------------------------------------------------------

def encode_avi_mjpeg(frames_jpeg: list[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """Pack baseline-JPEG frame bytes into a standard MJPEG AVI file:
    RIFF('AVI ') { LIST hdrl {avih, LIST strl {strh 'vids'/'MJPG', strf
    BITMAPINFOHEADER}}, LIST movi {00dc...}, idx1 } — offsets in idx1 are
    relative to the 'movi' fourcc per the common convention."""
    n = len(frames_jpeg)
    max_sz = max((len(f) for f in frames_jpeg), default=0)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 // fps), max_sz * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_sz, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                          max_sz, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_parts, idx_parts = [], []
    off = 4  # idx1 offsets point at each chunk's fourcc, relative to 'movi'
    for f in frames_jpeg:
        movi_parts.append(chunk(b"00dc", f))
        idx_parts.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    movi = lst(b"movi", b"".join(movi_parts))
    idx1 = chunk(b"idx1", b"".join(idx_parts))

    body = FOURCC_AVI + hdrl + movi + idx1
    return MAGIC_RIFF + struct.pack("<I", len(body)) + body
