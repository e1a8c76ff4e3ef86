"""Baseline JPEG codec tests (operators/jpeg.py) — pure codec golden
tests plus the Spark resize path over real JPEG payloads.

The round-trip tests run with all-ones quantization: DCT→quant→dequant→
IDCT is then exact up to float rounding (≤1 level gray, ≤2 through the
color transform), so they are golden-pixel tests, not just smoke. The
hand-built fixture decodes a JPEG whose every byte — Huffman tables,
entropy bits, expected pixels — was computed long-hand from T.81,
independent of the encoder (a shared encoder/decoder bug cannot pass
it)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_data_pipeline_ads_spark.operators import jpeg


def test_dct_matrix_matches_t81_definition():
    """DCT_MAT must reproduce T.81's FDCT: S(v,u) = 1/4 C(u) C(v)
    ΣΣ s(y,x) cos((2x+1)uπ/16) cos((2y+1)vπ/16) — computed here with
    scalar loops, independent of the numpy construction."""
    rng = np.random.default_rng(0)
    s = rng.uniform(-128, 127, (8, 8))
    got = jpeg.DCT_MAT @ s @ jpeg.DCT_MAT.T
    import math

    for v in range(8):
        for u in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            acc = 0.0
            for y in range(8):
                for x in range(8):
                    acc += (s[y, x]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16))
            assert got[v, u] == pytest.approx(0.25 * cu * cv * acc, abs=1e-9)
    # and it is orthonormal, so decode inverts encode exactly
    assert np.allclose(jpeg.DCT_MAT @ jpeg.DCT_MAT.T, np.eye(8), atol=1e-12)


def test_zigzag_is_the_standard_order():
    flat = [r * 8 + c for r, c in jpeg.ZIGZAG]
    assert flat[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(flat) == list(range(64)) and flat[-1] == 63


def test_decode_hand_built_fixture():
    """8x8 gray, all pixels 130, all-ones quant. Long-hand: level-shifted
    block is all 2s; F(0,0) = 1/4 · (1/√2)(1/√2) · 64·2 = 16, all other
    coefficients 0. DC category 5, extra bits 10000. One-symbol Huffman
    tables (code 0, length 1). Entropy stream: 0 10000 0, padded with
    1s → 0b01000001 = 0x41. The decoder must produce exactly 130s."""
    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = bytes([0x00]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([5])
    dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    payload = (b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
               + seg(0xC4, dht_dc) + seg(0xC4, dht_ac) + seg(0xDA, sos)
               + bytes([0x41]) + b"\xff\xd9")
    out = jpeg.jpeg_decode_pixels(payload)
    assert out.shape == (8, 8, 1)
    assert (out == 130).all()


def test_roundtrip_gray_all_shapes():
    rng = np.random.default_rng(42)
    for shape in [(8, 8), (16, 24), (17, 13), (1, 1)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_pixels(arr))
        assert dec.shape == (*shape, 1)
        assert np.abs(dec[:, :, 0].astype(int) - arr.astype(int)).max() <= 1


def test_roundtrip_rgb_444():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    dec = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_pixels(arr, subsample="444"))
    assert dec.shape == arr.shape
    # ±2: forward+inverse color transform rounding on top of DCT float
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 2


def test_roundtrip_rgb_420_smooth():
    """2x2 chroma box-average then sample replication: exact on images
    whose chroma is constant per 2x2 cell; a smooth gradient stays
    within a few levels."""
    y, x = np.mgrid[0:32, 0:48]
    sm = np.stack([(y * 4) % 256, (x * 4) % 256, ((x + y) * 2) % 256],
                  axis=2).astype(np.uint8)
    dec = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_pixels(sm, subsample="420"))
    assert dec.shape == sm.shape
    assert np.abs(dec.astype(int) - sm.astype(int)).max() <= 4


def test_roundtrip_rgb_422():
    """4:2:2 — chroma halved horizontally only: exact on images whose
    chroma is constant per horizontal pair, a few levels on gradients."""
    y, x = np.mgrid[0:24, 0:36]
    sm = np.stack([(y * 4) % 256, ((x // 2) * 8) % 256, ((y * 3)) % 256],
                  axis=2).astype(np.uint8)
    dec = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_pixels(sm, subsample="422"))
    assert dec.shape == sm.shape
    assert np.abs(dec.astype(int) - sm.astype(int)).max() <= 4

    rng = np.random.default_rng(9)
    odd = rng.integers(0, 256, size=(17, 21, 3), dtype=np.uint8)
    dec = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_pixels(odd, subsample="422"))
    assert dec.shape == odd.shape  # odd dims survive the MCU padding


def test_roundtrip_restart_intervals():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    enc = jpeg.jpeg_encode_pixels(arr, restart_interval=3)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc  # DRI + RST0 present
    dec = jpeg.jpeg_decode_pixels(enc)
    assert np.abs(dec[:, :, 0].astype(int) - arr.astype(int)).max() <= 1

    ycc = np.stack([arr[:33, :47]] * 3, axis=2)
    enc = jpeg.jpeg_encode_pixels(ycc, subsample="420", restart_interval=2)
    dec = jpeg.jpeg_decode_pixels(enc)
    assert dec.shape == ycc.shape
    assert np.abs(dec.astype(int) - ycc.astype(int)).max() <= 4


def test_nonbaseline_rejected_loudly():
    """Arithmetic/lossless/differential modes stay loudly rejected;
    progressive (SOF2) is DECODED since round 5 — a baseline stream
    merely relabeled SOF2 still fails loudly (its baseline scan header
    Se=63 is invalid for a progressive DC scan)."""
    arr = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(jpeg.jpeg_encode_pixels(arr))
    i = enc.find(b"\xff\xc0")
    for marker, words in [(0xC9, "arithmetic"), (0xC3, "lossless"),
                          (0xCA, "arithmetic progressive"),
                          (0xC6, "differential")]:
        bad = bytearray(enc)
        bad[i + 1] = marker
        with pytest.raises(ValueError, match=words):
            jpeg.jpeg_decode_pixels(bytes(bad))
    relabeled = bytearray(enc)
    relabeled[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se = 0"):
        jpeg.jpeg_decode_pixels(bytes(relabeled))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.jpeg_decode_pixels(b"\x00\x01\x02")
    # 12-bit precision
    twelve = bytearray(enc)
    twelve[i + 4] = 12  # SOF precision byte
    with pytest.raises(ValueError, match="precision"):
        jpeg.jpeg_decode_pixels(bytes(twelve))


def test_progressive_decode_matches_baseline_exactly():
    """Progressive encode → decode is BIT-IDENTICAL to baseline encode →
    decode of the same pixels: both encoders share one FDCT/quantizer,
    so a correct progressive decoder must reconstruct the identical
    coefficient store. Covers spectral selection (split AC bands),
    successive approximation (Al=1 + refinement), every subsampling,
    odd dimensions, grayscale, and restart intervals."""
    rng = np.random.default_rng(42)
    cases = [
        ((16, 16, 3), "444", 0),
        ((24, 40, 3), "420", 0),
        ((24, 40, 3), "422", 3),
        ((17, 19), "444", 0),  # grayscale, non-multiple-of-8
        ((8, 8, 3), "420", 2),
        ((64, 48, 3), "444", 5),
    ]
    for shape, ss, ri in cases:
        img = rng.integers(0, 256, shape, np.uint8)
        base = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_pixels(img, subsample=ss))
        prog = jpeg.jpeg_decode_pixels(
            jpeg.jpeg_encode_progressive(img, subsample=ss, restart_interval=ri)
        )
        assert np.array_equal(base, prog), (shape, ss, ri)


def test_marker_fill_bytes_between_scans():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker. Inject fill runs before every marker of a progressive
    stream (where real encoders pad between scans) and before baseline
    markers — decode must be unaffected, not desync."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), np.uint8)
    for enc in (jpeg.jpeg_encode_progressive(img, subsample="420"),
                jpeg.jpeg_encode_pixels(img)):
        want = jpeg.jpeg_decode_pixels(enc)
        # rebuild the stream with 3 fill bytes before each non-SOI
        # marker segment (walk markers, skip entropy data verbatim)
        out = bytearray(enc[:2])
        pos = 2
        while pos < len(enc):
            assert enc[pos] == 0xFF
            marker = enc[pos + 1]
            if marker == 0xD9:
                out += b"\xff\xff\xff" + enc[pos:pos + 2]
                pos += 2
                continue
            size = int.from_bytes(enc[pos + 2:pos + 4], "big")
            out += b"\xff\xff\xff" + enc[pos:pos + 2 + size]
            pos += 2 + size
            if marker == 0xDA:  # copy entropy bytes until next marker
                while pos < len(enc):
                    if (enc[pos] == 0xFF and pos + 1 < len(enc)
                            and enc[pos + 1] != 0x00
                            and not 0xD0 <= enc[pos + 1] <= 0xD7):
                        break
                    out.append(enc[pos])
                    pos += 1
        got = jpeg.jpeg_decode_pixels(bytes(out))
        assert np.array_equal(want, got)


def test_progressive_eob_runs_and_deep_refinement():
    """Smooth/flat content under a real quantization table produces
    multi-block EOBn runs (the encoder aggregates, the decoder must
    skip 2^n + extra whole blocks); a deep custom scan script walks
    Al=2 → 1 → 0, exercising repeated AC refinement over both bands."""
    rng = np.random.default_rng(1)
    q = np.array([16] * 8 + [24] * 16 + [40] * 40, np.float64)
    g = np.tile(np.arange(64, dtype=np.uint8), (48, 1))
    cases = [
        (np.stack([g, g // 2, 255 - g], axis=2), "420", 0, None),  # gradient
        (np.full((40, 56, 3), 130, np.uint8), "444", 4, None),  # flat
        (rng.integers(0, 256, (32, 32, 3), np.uint8), "422", 0, None),
    ]
    img = rng.integers(0, 256, (24, 24, 3), np.uint8)
    scans = [([0, 1, 2], 0, 0, 0, 2), ([0, 1, 2], 0, 0, 1, 1),
             ([0, 1, 2], 0, 0, 1, 0)]
    for c in range(3):
        scans += [([c], 1, 20, 0, 2), ([c], 21, 63, 0, 2)]
    for c in range(3):
        scans += [([c], 1, 20, 1, 1), ([c], 21, 63, 1, 1)]
    for c in range(3):
        scans += [([c], 1, 20, 1, 0), ([c], 21, 63, 1, 0)]
    cases.append((img, "444", 2, scans))
    for im, ss, ri, sc in cases:
        base = jpeg.jpeg_decode_pixels(
            jpeg.jpeg_encode_pixels(im, quant=q, subsample=ss))
        prog = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_progressive(
            im, quant=q, subsample=ss, restart_interval=ri, scans=sc))
        assert np.array_equal(base, prog)


def test_progressive_hostile_inputs():
    """Truncated progressive streams and malformed scan scripts raise
    ValueError (quarantineable), never internal errors or hangs."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    enc = jpeg.jpeg_encode_progressive(img)
    # truncations inside scan data / between scans
    for cut in (len(enc) // 4, len(enc) // 2, len(enc) - 4):
        with pytest.raises(ValueError):
            jpeg.jpeg_decode_pixels(enc[:cut])
    # interleaved AC scan is illegal
    rgb = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="single-component"):
        jpeg.jpeg_decode_pixels(jpeg.jpeg_encode_progressive(
            rgb, scans=[([0, 1, 2], 0, 0, 0, 0), ([0, 1, 2], 1, 63, 0, 0)]))


def test_resize_images_real_decoder_handles_jpeg(spark):
    """Spark-side: resize_images(use_fake_decoder=False) decodes a mix
    of PNG and JPEG payloads and emits identical-content PNGs when the
    pixels agree — the real multimodal pipeline shape over both
    codecs."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import multimodal

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    png = multimodal._png_encode_pixels(arr)
    jpg = jpeg.jpeg_encode_pixels(arr, subsample="444")

    def media_row(doc_id, raw, mt):
        import hashlib

        return Row(doc_id=doc_id, content=bytearray(raw),
                   meta=Row(media_type=mt, n_bytes=len(raw),
                            sha256=hashlib.sha256(raw).hexdigest()))

    media = spark.createDataFrame(
        [media_row(1, png, "image/png"), media_row(2, jpg, "image/jpeg")],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.doc_id: r for r in
           multimodal.resize_images(media, 8, 8, use_fake_decoder=False).collect()}
    px_png = multimodal._png_decode_pixels(bytes(out[1].content))
    px_jpg = multimodal._png_decode_pixels(bytes(out[2].content))
    assert px_png.shape == px_jpg.shape == (8, 8, 3)
    # JPEG 444 all-ones-quant decode is within ±2 of the source, and the
    # resize picks the same source pixels for both payloads.
    assert np.abs(px_png.astype(int) - px_jpg.astype(int)).max() <= 2
    assert (px_png == multimodal._nn_resize(arr, 8, 8)).all()
