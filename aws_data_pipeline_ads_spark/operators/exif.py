"""EXIF/TIFF metadata tier for JPEG payloads — pure struct parsing.

A curation pipeline over crawled images filters on EXIF before any
pixel decodes: orientation (rotate-aware dedup and display), camera
make/model (device mixes, spam-farm detection), capture timestamp, and
— the privacy-relevant one — WHETHER A GPS TAG IS PRESENT (geotagged
personal photos are a PII class that redaction policies route away
from training corpora). All of that lives in the APP1 segment's TIFF
structure: a byte-order header and linked Image File Directories of
fixed 12-byte entries. Parsing it needs no codec and no library.

Format is public spec: JPEG markers per ITU-T T.81, EXIF-in-APP1 per
JEITA CP-3451 (TIFF 6.0 IFDs). Hostile-input posture mirrors the other
binary walkers in this package (operators/jpeg.py, multimodal.py box
walk): every offset/count is bounds-checked, IFD chains are
cycle/length-limited, failures are loud ValueErrors, never over-reads.

Reference parity note: the reference pipeline (a boto3 JSON ETL) has
no image surface; this belongs to the charter's multimodal-columns
extension (SURVEY §2C).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# TIFF entry types we materialize: (struct code, byte size)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_TAG_ORIENTATION = 0x0112
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825

_MAX_IFDS = 8          # IFD0 + chained/linked IFDs a sane file needs
_MAX_ENTRIES = 512     # per IFD; a bigger count is a bomb, not a photo


def _find_app1_exif(payload: bytes) -> bytes:
    """The TIFF blob inside the first APP1 'Exif' segment of a JPEG
    marker stream (walked like the SOF scan in operators/jpeg.py:
    length-checked segments, 0xFF fill bytes skipped)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG payload (no SOI)")
    pos, end = 2, len(payload)
    while pos + 4 <= end:
        if payload[pos] != 0xFF:
            raise ValueError("exif: marker desync in JPEG stream")
        while pos < end and payload[pos] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes
        if pos >= end:
            break
        marker = payload[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if marker == 0xD9 or marker == 0xDA:
            break     # EOI / entropy data: no EXIF past here
        if pos + 2 > end:
            raise ValueError("exif: truncated segment length")
        seg_len = struct.unpack(">H", payload[pos:pos + 2])[0]
        if seg_len < 2 or pos + seg_len > end:
            raise ValueError("exif: segment length out of bounds")
        body = payload[pos + 2:pos + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return body[6:]
        pos += seg_len
    raise ValueError("exif: no APP1 Exif segment")


def _read_entry_value(tiff: bytes, fmt: str, typ: int, count: int,
                      value_field: bytes):
    """A TIFF entry's materialized value: inline when it fits the
    4-byte value field, else at the recorded offset."""
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return None  # unknown type: skip, don't guess
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(fmt + "I", value_field)
        if off + total > len(tiff):
            raise ValueError("exif: entry value overruns the TIFF blob")
        raw = tiff[off:off + total]
    if typ == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00")[0].decode("latin-1")
    if typ == 3:
        return struct.unpack(fmt + f"{count}H", raw)[0] if count else None
    if typ == 4:
        return struct.unpack(fmt + f"{count}I", raw)[0] if count else None
    return raw


def parse_exif(payload: bytes) -> dict:
    """EXIF fields a curation pipeline filters on, from a JPEG payload:

    ``orientation`` (1-8 TIFF code or None), ``make``/``model``
    (ASCII), ``datetime`` (EXIF 'YYYY:MM:DD HH:MM:SS' string),
    ``has_gps`` (a GPS IFD pointer exists — the geotag/PII signal;
    the coordinates themselves are deliberately NOT extracted),
    ``n_tags`` (total entries walked). Raises ValueError on anything
    malformed; callers wanting quarantine semantics wrap it like
    video_metadata(permissive=True) does."""
    tiff = _find_app1_exif(payload)
    if len(tiff) < 8:
        raise ValueError("exif: TIFF header truncated")
    if tiff[:2] == b"II":
        fmt = "<"
    elif tiff[:2] == b"MM":
        fmt = ">"
    else:
        raise ValueError("exif: bad TIFF byte-order mark")
    (magic,) = struct.unpack(fmt + "H", tiff[2:4])
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    (ifd_off,) = struct.unpack(fmt + "I", tiff[4:8])

    out = {"orientation": None, "make": None, "model": None,
           "datetime": None, "has_gps": False, "n_tags": 0}
    to_walk = [ifd_off]
    seen: set[int] = set()
    while to_walk and len(seen) < _MAX_IFDS:
        off = to_walk.pop()
        if off in seen:
            raise ValueError("exif: IFD offset cycle")
        seen.add(off)
        if off == 0:
            continue
        if off + 2 > len(tiff):
            raise ValueError("exif: IFD offset out of bounds")
        (n,) = struct.unpack(fmt + "H", tiff[off:off + 2])
        if n > _MAX_ENTRIES:
            raise ValueError(f"exif: IFD declares {n} entries (bomb?)")
        base = off + 2
        if base + 12 * n + 4 > len(tiff):
            raise ValueError("exif: IFD table overruns the TIFF blob")
        for i in range(n):
            e = base + 12 * i
            tag, typ, count = struct.unpack(fmt + "HHI", tiff[e:e + 8])
            out["n_tags"] += 1
            value_field = tiff[e + 8:e + 12]
            if tag == _TAG_GPS_IFD:
                out["has_gps"] = True
                continue
            if tag == _TAG_EXIF_IFD:
                v = _read_entry_value(tiff, fmt, typ, count, value_field)
                if isinstance(v, int):
                    to_walk.append(v)
                continue
            if tag == _TAG_ORIENTATION:
                v = _read_entry_value(tiff, fmt, typ, count, value_field)
                if isinstance(v, int):
                    out["orientation"] = v
            elif tag == _TAG_MAKE:
                out["make"] = _read_entry_value(
                    tiff, fmt, typ, count, value_field)
            elif tag == _TAG_MODEL:
                out["model"] = _read_entry_value(
                    tiff, fmt, typ, count, value_field)
            elif tag == _TAG_DATETIME:
                out["datetime"] = _read_entry_value(
                    tiff, fmt, typ, count, value_field)
        (nxt,) = struct.unpack(fmt + "I", tiff[base + 12 * n:base + 12 * n + 4])
        if nxt:
            to_walk.append(nxt)
    return out


def make_exif_jpeg(orientation: int = 1, make: str = "", model: str = "",
                   datetime: str = "", gps: bool = False,
                   byte_order: str = "II") -> bytes:
    """A minimal JPEG carrying a spec-valid APP1 EXIF segment — the
    write-side twin of parse_exif, so tests and declarable corpora can
    build real EXIF without image libraries. Strings longer than 4
    bytes land at out-of-line offsets exactly as TIFF requires."""
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be II or MM: {byte_order!r}")
    fmt = "<" if byte_order == "II" else ">"

    entries: list[tuple[int, int, int, bytes | None, bytes]] = []

    def add(tag: int, typ: int, count: int, inline: bytes | None,
            blob: bytes = b""):
        entries.append((tag, typ, count, inline, blob))

    add(_TAG_ORIENTATION, 3, 1,
        struct.pack(fmt + "H", orientation) + b"\x00\x00")
    for tag, s in ((_TAG_MAKE, make), (_TAG_MODEL, model),
                   (_TAG_DATETIME, datetime)):
        if s:
            raw = s.encode("latin-1") + b"\x00"
            if len(raw) <= 4:
                add(tag, 2, len(raw), raw.ljust(4, b"\x00"))
            else:
                add(tag, 2, len(raw), None, raw)
    if gps:
        # a GPS IFD with zero entries: presence is the signal
        add(_TAG_GPS_IFD, 4, 1, None, struct.pack(fmt + "H", 0)
            + struct.pack(fmt + "I", 0))
    entries.sort(key=lambda t: t[0])  # TIFF requires ascending tags

    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    table = struct.pack(fmt + "H", n)
    heap = b""
    for tag, typ, count, inline, blob in entries:
        if inline is not None:
            value = inline
        else:
            value = struct.pack(fmt + "I", data_off + len(heap))
            heap += blob
        table += struct.pack(fmt + "HHI", tag, typ, count) + value
    table += struct.pack(fmt + "I", 0)  # no next IFD
    tiff = (byte_order.encode() + struct.pack(fmt + "H", 42)
            + struct.pack(fmt + "I", ifd_off) + table + heap)
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return b"\xff\xd8" + seg + b"\xff\xd9"


def synthetic_exif_images(documents: DataFrame) -> DataFrame:
    """Deterministic EXIF-bearing JPEG per document: orientation
    1+(doc_id%8), make 'maker_<doc_id%5>', model 'm<doc_id%3>', a GPS
    IFD when doc_id%3==0, and byte order alternating II/MM by parity —
    pure functions of doc_id, so a declared query over the parsed
    output has an arithmetic DuckDB oracle and a hash match proves the
    EXIF write→parse roundtrip lossless (same pattern as the avc1
    codec-config corpus)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "content": [
                    make_exif_jpeg(
                        orientation=1 + d % 8,
                        make=f"maker_{d % 5}",
                        model=f"m{d % 3}",
                        gps=(d % 3 == 0),
                        byte_order="II" if d % 2 else "MM",
                    )
                    for d in ids
                ],
            })

    return documents.select("doc_id").mapInPandas(
        batches,
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("content", T.BinaryType())]),
    )


EXIF_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("orientation", T.IntegerType()),
    T.StructField("make", T.StringType()),
    T.StructField("model", T.StringType()),
    T.StructField("datetime", T.StringType()),
    T.StructField("has_gps", T.BooleanType()),
    T.StructField("n_tags", T.LongType()),
    T.StructField("error", T.StringType()),
])


def image_exif(media: DataFrame, permissive: bool = True) -> DataFrame:
    """Per-image EXIF triage over (doc_id, content) — Arrow-batched
    mapInPandas, pixels never decode, payloads never shuffle. Default
    PERMISSIVE (an unparsable or EXIF-less payload is one quarantine
    row with the reason), matching the mixed-crawl contract of
    video_metadata; permissive=False raises through the task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                try:
                    meta = parse_exif(bytes(blob))
                    rows.append({"doc_id": int(doc_id), **meta,
                                 "error": None})
                except (ValueError, struct.error, IndexError) as e:
                    if not permissive:
                        if isinstance(e, ValueError):
                            raise
                        raise ValueError(f"malformed EXIF: {e}") from e
                    rows.append({"doc_id": int(doc_id), "error": str(e)})
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              EXIF_SCHEMA.fields])

    return media.mapInPandas(batches, EXIF_SCHEMA)
