"""GIF codec: round-trips (incl. interlace and LZW table growth/reset),
a hand-built spec-example stream, hostile inputs, Spark pipeline wiring.
"""

from __future__ import annotations

import numpy as np
import pytest

from aws_data_pipeline_ads_spark.operators import gif


def _quilt(h, w, colors):
    """Deterministic h×w image drawing from `colors` (no RNG)."""
    pal = np.asarray(colors, dtype=np.uint8)
    idx = (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % len(pal)
    return pal[idx]


def test_round_trip_exact():
    img = _quilt(23, 31, [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                          (10, 20, 30)])
    out = gif.gif_decode_pixels(gif.gif_encode_pixels(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_round_trip_interlaced():
    img = _quilt(17, 9, [(0, 0, 0), (255, 255, 255), (128, 0, 128)])
    payload = gif.gif_encode_pixels(img, interlace=True)
    assert payload[:6] == b"GIF89a"
    assert np.array_equal(gif.gif_decode_pixels(payload), img)


def test_round_trip_full_palette_and_width_growth():
    """256 distinct colors over enough pixels that the LZW table grows
    through several width steps and past 4096 (forcing the encoder's
    CLEAR/reset path, which the decoder must follow)."""
    colors = [(r, (r * 7) % 256, (r * 31) % 256) for r in range(256)]
    img = _quilt(101, 97, colors)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) == 256
    assert np.array_equal(gif.gif_decode_pixels(gif.gif_encode_pixels(img)),
                          img)


def test_grayscale_single_channel_input():
    img = (_quilt(8, 8, [(0,), (85,), (170,), (255,)]))[:, :, :1]
    out = gif.gif_decode_pixels(gif.gif_encode_pixels(img))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_hand_built_stream():
    """Tiny 3x1 stream assembled byte-by-byte (not by our encoder):
    2-bit palette {black, white, red}, pixels white,black,red."""
    pal = bytes([0, 0, 0, 255, 255, 255, 255, 0, 0, 9, 9, 9])
    mcs = 2
    lzw = gif._lzw_encode([1, 0, 2], mcs)
    payload = (b"GIF89a" + (3).to_bytes(2, "little")
               + (1).to_bytes(2, "little")
               + bytes([0x80 | 1, 0, 0]) + pal
               + b"\x2C" + b"\x00" * 4
               + (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + bytes([0, mcs])
               + bytes([len(lzw)]) + lzw + b"\x00\x3B")
    out = gif.gif_decode_pixels(payload)
    assert out.tolist() == [[[255, 255, 255], [0, 0, 0], [255, 0, 0]]]


def test_hostile_inputs():
    good = gif.gif_encode_pixels(_quilt(6, 6, [(1, 2, 3), (4, 5, 6)]))
    with pytest.raises(ValueError, match="signature"):
        gif.gif_decode_pixels(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError, match="truncated|overruns|sub-block"):
        gif.gif_decode_pixels(good[:15])
    # declared image size larger than the LZW stream delivers
    bad = bytearray(good)
    w_off = good.index(b"\x2C") + 5
    bad[w_off:w_off + 2] = (600).to_bytes(2, "little")
    with pytest.raises(ValueError, match="declares|decodes|beyond"):
        gif.gif_decode_pixels(bytes(bad))
    # >256 colors refused at encode time
    big = np.zeros((20, 20, 3), dtype=np.uint8)
    big[:, :, 0] = (np.arange(400) % 256).reshape(20, 20)
    big[:, :, 1] = (np.arange(400) // 256 * 37).reshape(20, 20)
    assert len(np.unique(big.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="palette"):
        gif.gif_encode_pixels(big)


def test_header_dims_and_resize_pipeline(spark):
    """The dimension tier reads GIF headers; the real-decoder resize
    path decodes GIF pixels and re-encodes PNG."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import multimodal

    img = _quilt(12, 20, [(9, 9, 9), (200, 100, 50)])
    payload = gif.gif_encode_pixels(img)
    assert multimodal._decode_image_real(payload) == (20, 12)

    media = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(payload),
             meta={"media_type": "image/gif", "n_bytes": str(len(payload)),
                   "sha256": "x"})])
    out = multimodal.resize_images(media, 5, 4,
                                   use_fake_decoder=False).collect()[0]
    px = multimodal._png_decode_pixels(bytes(out["content"]))
    assert px.shape == (4, 5, 3)
    ref = multimodal._nn_resize(img, 5, 4)
    assert np.array_equal(px, ref)
