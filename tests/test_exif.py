"""EXIF/TIFF metadata tier (operators/exif.py): writer↔parser
round-trips in both byte orders, the GPS/PII presence signal, hostile
inputs, and the Spark quarantine contract."""

from __future__ import annotations

import struct

import pytest

from aws_data_pipeline_ads_spark.operators import exif


def test_exif_roundtrip_both_byte_orders():
    """make_exif_jpeg → parse_exif recovers orientation, make/model
    (incl. out-of-line long strings), datetime, and GPS presence, under
    both II (little) and MM (big) TIFF byte orders."""
    for bo in ("II", "MM"):
        jpg = exif.make_exif_jpeg(
            orientation=6, make="ACME Imaging Corp", model="X100",
            datetime="2021:07:04 12:34:56", gps=True, byte_order=bo)
        got = exif.parse_exif(jpg)
        assert got == {
            "orientation": 6, "make": "ACME Imaging Corp",
            "model": "X100", "datetime": "2021:07:04 12:34:56",
            "has_gps": True, "n_tags": 5,
        }, bo
    # short (inline) strings and no GPS
    got = exif.parse_exif(exif.make_exif_jpeg(orientation=1, make="AB"))
    assert (got["make"], got["has_gps"]) == ("AB", False)
    assert got["model"] is None and got["datetime"] is None


def test_exif_hostile_inputs():
    """Truncations, bad byte-order marks, IFD bombs, cycles, and
    out-of-bounds value offsets all raise loud ValueErrors."""
    jpg = exif.make_exif_jpeg(orientation=3, make="LongMakerName",
                              gps=True)
    with pytest.raises(ValueError, match="no SOI"):
        exif.parse_exif(b"nope")
    with pytest.raises(ValueError, match="no APP1"):
        exif.parse_exif(b"\xff\xd8\xff\xd9")
    # truncated inside the APP1 segment body
    with pytest.raises(ValueError):
        exif.parse_exif(jpg[:20])
    tiff_at = jpg.find(b"Exif\x00\x00") + 6
    # bad byte-order mark
    bad = bytearray(jpg)
    bad[tiff_at:tiff_at + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        exif.parse_exif(bytes(bad))
    # entry-count bomb
    bomb = bytearray(jpg)
    bomb[tiff_at + 8:tiff_at + 10] = struct.pack("<H", 50_000)
    with pytest.raises(ValueError, match="bomb|overruns"):
        exif.parse_exif(bytes(bomb))
    # IFD cycle: next-IFD pointer back to IFD0
    n = struct.unpack("<H", jpg[tiff_at + 8:tiff_at + 10])[0]
    next_at = tiff_at + 8 + 2 + 12 * n
    cyc = bytearray(jpg)
    cyc[next_at:next_at + 4] = struct.pack("<I", 8)
    with pytest.raises(ValueError, match="cycle"):
        exif.parse_exif(bytes(cyc))
    # out-of-line value offset past the blob end
    long_make_entry = None
    base = tiff_at + 10
    for i in range(n):
        tag = struct.unpack("<H", jpg[base + 12 * i:base + 12 * i + 2])[0]
        if tag == 0x010F:
            long_make_entry = base + 12 * i
    oob = bytearray(jpg)
    oob[long_make_entry + 8:long_make_entry + 12] = struct.pack("<I", 10**6)
    with pytest.raises(ValueError, match="overruns"):
        exif.parse_exif(bytes(oob))


def test_image_exif_spark_quarantine(spark):
    """image_exif over a mixed corpus: parsed rows for EXIF payloads,
    one quarantine row per EXIF-less/garbage payload (the crawl
    contract), FAILFAST raises through the task."""
    from pyspark.sql import Row

    rows = [
        Row(doc_id=1, content=bytearray(exif.make_exif_jpeg(
            orientation=8, make="Maker A", gps=True))),
        Row(doc_id=2, content=bytearray(b"\xff\xd8\xff\xd9")),  # no EXIF
        Row(doc_id=3, content=bytearray(b"not a jpeg at all")),
        Row(doc_id=4, content=bytearray(exif.make_exif_jpeg(
            orientation=1, model="Z9", byte_order="MM"))),
    ]
    media = spark.createDataFrame(rows)
    got = {r.doc_id: r for r in exif.image_exif(media).collect()}
    assert got[1].orientation == 8 and got[1].has_gps is True
    assert got[1].error is None
    assert got[2].error and "no APP1" in got[2].error
    assert got[3].error and "no SOI" in got[3].error
    assert got[4].model == "Z9" and got[4].has_gps is False
    with pytest.raises(Exception):
        exif.image_exif(media, permissive=False).collect()
    # determinism across reruns
    again = {r.doc_id: r for r in exif.image_exif(media).collect()}
    assert got == again
