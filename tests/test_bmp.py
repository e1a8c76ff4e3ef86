"""BMP codec: round-trips, paletted/top-down hand-built DIBs, hostile
inputs, dimension-tier + resize wiring."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_data_pipeline_ads_spark.operators import bmp


def _img(h, w):
    r = (np.arange(h * w) * 7 % 256).reshape(h, w)
    g = (np.arange(h * w) * 13 % 256).reshape(h, w)
    b = (np.arange(h * w) * 29 % 256).reshape(h, w)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def test_round_trip_24bit_with_padding():
    for w in (5, 6, 7, 8):          # exercise every row-padding case
        img = _img(9, w)
        out = bmp.bmp_decode_pixels(bmp.bmp_encode_pixels(img))
        assert np.array_equal(out, img), w


def test_paletted_8bit_and_top_down_hand_built():
    """2x2 paletted DIB assembled byte-by-byte, top-down (negative
    height), 2-entry palette."""
    pal = bytes([255, 0, 0, 0,   0, 0, 255, 0])   # BGRX: blue, red
    rows = bytes([0, 1, 0, 0]) + bytes([1, 0, 0, 0])  # padded to 4
    off = 14 + 40 + len(pal)
    payload = (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
               + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 8, 0,
                             len(rows), 0, 0, 2, 0)
               + pal + rows)
    out = bmp.bmp_decode_pixels(payload)
    assert out.tolist() == [[[0, 0, 255], [255, 0, 0]],
                            [[255, 0, 0], [0, 0, 255]]]


def test_hostile_inputs():
    good = bmp.bmp_encode_pixels(_img(4, 4))
    with pytest.raises(ValueError, match="signature"):
        bmp.bmp_decode_pixels(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        bmp.bmp_decode_pixels(good[:20])
    with pytest.raises(ValueError, match="overruns"):
        bmp.bmp_decode_pixels(good[:-8])
    bad_comp = bytearray(good)
    struct.pack_into("<I", bad_comp, 30, 1)        # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        bmp.bmp_decode_pixels(bytes(bad_comp))
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 16)
    with pytest.raises(ValueError, match="bit depth"):
        bmp.bmp_decode_pixels(bytes(bad_bpp))


def test_dimension_tier_and_resize_wiring(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import multimodal

    img = _img(10, 14)
    payload = bmp.bmp_encode_pixels(img)
    assert multimodal._decode_image_real(payload) == (14, 10)
    media = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(payload),
             meta={"media_type": "image/bmp", "n_bytes": str(len(payload)),
                   "sha256": "x"})])
    out = multimodal.resize_images(media, 7, 5,
                                   use_fake_decoder=False).collect()[0]
    px = multimodal._png_decode_pixels(bytes(out["content"]))
    assert np.array_equal(px, multimodal._nn_resize(img, 7, 5))
