"""Multimodal plumbing tests: binary columns + mapInPandas stages
(decode is a deterministic fake; the Spark-side contract is real)."""

from __future__ import annotations

import hashlib

import pytest

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return multimodal.attach_media(load_table(spark, sf_dir, "documents").limit(50))


def test_attach_media_metadata(spark, sf_dir, media):
    r = media.filter("doc_id = 0").collect()[0]
    text = (
        load_table(spark, sf_dir, "documents").filter("doc_id = 0").collect()[0].text
    )
    assert bytes(r.content).decode() == text
    assert r.meta.n_bytes == len(bytes(r.content))
    assert r.meta.sha256 == hashlib.sha256(bytes(r.content)).hexdigest()


def test_image_features_deterministic(spark, media):
    a = {r.doc_id: (r.width, r.height, r.n_bytes) for r in
         multimodal.extract_image_features(media).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_bytes) for r in
         multimodal.extract_image_features(media).collect()}
    assert a == b and len(a) == 50
    assert all(64 <= w < 256 and 64 <= h < 256 for w, h, _ in a.values())


def test_real_decoder_rejects_non_png(spark, media):
    # text payloads are neither PNG nor JPEG — the real decoder must
    # fail loudly, never emit garbage dimensions
    with pytest.raises(Exception, match="unsupported image payload"):
        multimodal.extract_image_features(media, use_fake_decoder=False).collect()


def _make_png(width: int, height: int) -> bytes:
    """Minimal valid RGB PNG, stdlib only (struct + zlib)."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x7f" * (3 * width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_wav(rate: int, seconds: float, amplitude: float = 0.5) -> bytes:
    """Real 16-bit PCM mono WAV of a sine tone, via the stdlib writer."""
    import io
    import math
    import wave

    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                int(amplitude * 32767 * math.sin(2 * math.pi * 440 * i / rate))
                .to_bytes(2, "little", signed=True)
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_real_png_decode_end_to_end(spark):
    import hashlib as hl

    from pyspark.sql import Row

    payloads = {1: _make_png(320, 200), 2: _make_png(17, 257)}
    media = spark.createDataFrame(
        [
            Row(doc_id=i, content=p,
                meta=Row(media_type="image/png", n_bytes=len(p),
                         sha256=hl.sha256(p).hexdigest()))
            for i, p in payloads.items()
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    feats = {
        r.doc_id: r
        for r in multimodal.extract_image_features(
            media, use_fake_decoder=False
        ).collect()
    }
    assert (feats[1].width, feats[1].height) == (320, 200)
    assert (feats[2].width, feats[2].height) == (17, 257)
    assert feats[1].aspect == pytest.approx(320 / 200)
    assert feats[1].n_bytes == len(payloads[1])


def test_real_wav_decode_end_to_end(spark):
    import hashlib as hl
    import math

    from pyspark.sql import Row

    rate, seconds, amp = 8000, 0.5, 0.5
    wav = _make_wav(rate, seconds, amp)
    media = spark.createDataFrame(
        [Row(doc_id=7, content=wav,
             meta=Row(media_type="audio/wav", n_bytes=len(wav),
                      sha256=hl.sha256(wav).hexdigest()))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    # sample_rate arg (16000) must be IGNORED: the WAV header says 8000
    r = multimodal.extract_audio_features(
        media, sample_rate=16000, use_fake_decoder=False
    ).collect()[0]
    assert r.n_samples == int(rate * seconds)
    assert r.duration_s == pytest.approx(seconds, abs=1e-3)
    # RMS of a sine of amplitude a is a/sqrt(2)
    assert r.rms == pytest.approx(amp / math.sqrt(2), rel=0.01)


def test_frame_sampling_explodes_rows(spark, media):
    frames = multimodal.sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 50 * 4
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_no)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def test_resize_composes_with_features(spark, sf_dir):
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.attach_media(docs)
    resized = multimodal.resize_images(media, target_w=16, target_h=16)
    rows = resized.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(bytes(r.content)) == 256
        assert r.meta.n_bytes == 256
        assert r.meta.media_type.endswith(";resized")
    # output schema matches the media schema, so stages compose
    feats = multimodal.extract_image_features(resized).collect()
    assert len(feats) == 20 and all(f.n_bytes == 256 for f in feats)


def test_audio_features_deterministic(spark, sf_dir):
    import math

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = multimodal.attach_media(docs, media_type="audio/fake")
    rows = {r.doc_id: r for r in multimodal.extract_audio_features(media).collect()}
    assert len(rows) == 10
    for r in rows.values():
        assert r.n_samples >= 0 and math.isfinite(r.rms) and 0.0 <= r.rms <= 1.0
        assert abs(r.duration_s - r.n_samples / 16000) < 1e-12
    # determinism: same payloads → same features on a rerun
    again = {r.doc_id: r for r in multimodal.extract_audio_features(media).collect()}
    assert {k: (v.n_samples, v.rms) for k, v in rows.items()} == {
        k: (v.n_samples, v.rms) for k, v in again.items()
    }


def _make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG marker stream: SOI, a COM segment (exercises the
    marker walk), SOF0 with the dimensions, EOI. Not renderable — the
    header walk only needs well-formed markers."""
    import struct as st

    com = b"\xff\xfe" + st.pack(">H", 2 + 7) + b"comment"
    sof0 = (b"\xff\xc0" + st.pack(">H", 8 + 3)
            + b"\x08" + st.pack(">HH", height, width) + b"\x01\x11\x00\x00")
    return b"\xff\xd8" + com + sof0 + b"\xff\xd9"


def test_real_jpeg_decode_end_to_end(spark):
    import hashlib as hl

    from pyspark.sql import Row

    payloads = {1: _make_jpeg(640, 480), 2: _make_jpeg(31, 977)}
    media = spark.createDataFrame(
        [
            Row(doc_id=i, content=p,
                meta=Row(media_type="image/jpeg", n_bytes=len(p),
                         sha256=hl.sha256(p).hexdigest()))
            for i, p in payloads.items()
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    feats = {
        r.doc_id: r
        for r in multimodal.extract_image_features(
            media, use_fake_decoder=False
        ).collect()
    }
    assert (feats[1].width, feats[1].height) == (640, 480)
    assert (feats[2].width, feats[2].height) == (31, 977)


def test_image_dhash_and_neardup_pairs(spark, sf_dir):
    """dHash matches a pure-Python reference on the real payloads;
    identical payloads collide at Hamming 0; banded pairs find every
    pair with Hamming ≤ 3 (pigeonhole recall is exact) and verify the
    distance exactly."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(200)
    media = multimodal.attach_media(docs)
    got = {r.doc_id: r.dhash
           for r in multimodal.image_dhash(media).collect()}

    def ref_dhash(raw: bytes) -> int:
        if len(raw) >= 72:
            step = len(raw) // 72
            grid = raw[::step][:72]
        else:
            grid = raw + b"\x00" * (72 - len(raw))
        h = 0
        for row in range(8):
            for col in range(8):
                h = (h << 1) | int(grid[row * 9 + col] > grid[row * 9 + col + 1])
        return h - (1 << 64) if h >= 1 << 63 else h

    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, text in texts.items():
        assert got[doc_id] == ref_dhash(text.encode()), doc_id
    # exact recall at the pigeonhole threshold: brute-force all pairs
    ids = sorted(got)
    expect = set()
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            ham = bin((got[da] ^ got[db]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                expect.add((da, db, ham))
    pairs = {(r.doc_a, r.doc_b, r.hamming)
             for r in multimodal.dhash_neardup_pairs(
                 multimodal.image_dhash(media)).collect()}
    assert pairs == expect


def _png_from_array(arr) -> bytes:
    """Encode an (h, w, c) uint8 array via the operator's own encoder
    (itself pinned against a hand-filtered payload below)."""
    return multimodal._png_encode_pixels(arr)


def test_png_pixel_codec_roundtrip_and_filters():
    """Pure-codec golden tests, no Spark: encode→decode round-trips
    bit-exactly, and every PNG scanline filter type (Sub/Up/Average/
    Paeth) unfilters to hand-computed expected pixels."""
    import struct as st
    import zlib

    import numpy as np

    rng = np.random.default_rng(7)
    for shape in [(1, 1, 1), (5, 3, 3), (8, 8, 4), (7, 13, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = multimodal._png_decode_pixels(_png_from_array(arr))
        assert out.shape == arr.shape and (out == arr).all()

    # Hand-crafted 5-row 4-px RGB image, one row per filter type 0-4.
    w, ch = 4, 3
    stride = w * ch
    rows = [bytes([f]) + bytes(range(10 * f, 10 * f + stride)) for f in range(5)]
    raw = b"".join(rows)

    def chunk(ctype, body):
        return (st.pack(">I", len(body)) + ctype + body
                + st.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", st.pack(">IIBBBBB", w, 5, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))

    # scalar reference unfilter (spec pseudocode, independent impl)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    prev = [0] * stride
    expect = []
    for f in range(5):
        line = list(range(10 * f, 10 * f + stride))
        cur = [0] * stride
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            cur[x] = (line[x] + pred) & 0xFF
        expect.append(cur)
        prev = cur
    got = multimodal._png_decode_pixels(payload)
    assert got.reshape(5, stride).tolist() == expect


def test_avi_mjpeg_demux_roundtrip_and_spark_sampling(spark):
    """Real video path, no ffmpeg: mux MJPEG frames into a spec-valid
    RIFF/AVI, demux them back bit-exactly, and run the Spark
    sample_frames real path — each sampled frame is a standalone
    baseline JPEG the pure-numpy codec decodes to the original pixels."""
    import numpy as np
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import jpeg

    rng = np.random.default_rng(5)
    pix = [rng.integers(0, 256, size=(16, 16), dtype=np.uint8) for _ in range(7)]
    frames = [jpeg.jpeg_encode_pixels(p) for p in pix]
    avi = multimodal.mux_mjpeg_avi(frames, 16, 16)

    assert multimodal._parse_avi_frames(avi) == frames  # bit-exact demux

    media = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(avi),
             meta=Row(media_type="video/avi", n_bytes=len(avi), sha256="x"))],
        multimodal.MEDIA_SCHEMA,
    )
    out = sorted(
        multimodal.sample_frames(media, n_frames=3, use_fake_decoder=False)
        .collect(), key=lambda r: r.frame_no)
    # 3 evenly spaced of 7: indices 0, 2, 4
    assert [r.frame_no for r in out] == [0, 1, 2]
    assert [bytes(r.frame) for r in out] == [frames[0], frames[2], frames[4]]
    decoded = jpeg.jpeg_decode_pixels(bytes(out[1].frame))
    assert np.abs(decoded[:, :, 0].astype(int) - pix[2].astype(int)).max() <= 1

    # shorter-than-n videos emit every real frame, no padding slices
    short = multimodal.mux_mjpeg_avi(frames[:2], 16, 16)
    media2 = spark.createDataFrame(
        [Row(doc_id=2, content=bytearray(short),
             meta=Row(media_type="video/avi", n_bytes=len(short), sha256="x"))],
        multimodal.MEDIA_SCHEMA,
    )
    out2 = multimodal.sample_frames(media2, n_frames=4,
                                    use_fake_decoder=False).collect()
    assert sorted(bytes(r.frame) for r in out2) == sorted(frames[:2])


def test_video_frame_features_deterministic_and_real(spark, sf_dir):
    """q_video_frames' stages: synthetic AVIs are pure functions of the
    text (identical across runs), demux+decode emit one row per sampled
    frame with the frame's true dims, and the luminance of frame 0
    equals a driver-side recompute from the same text bytes."""
    import numpy as np

    from aws_data_pipeline_ads_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    vids = multimodal.synthetic_videos(docs, n_frames=3)
    a = {(r.doc_id): r.meta.sha256 for r in vids.collect()}
    b = {(r.doc_id): r.meta.sha256 for r in
         multimodal.synthetic_videos(docs, n_frames=3).collect()}
    assert a == b  # bit-stable payloads

    feats = multimodal.video_frame_features(vids, n_frames=3).collect()
    assert len(feats) == 3 * docs.count()
    assert all(r.width == 16 and r.height == 16 for r in feats)

    texts = {r.doc_id: r.text for r in docs.collect()}
    by_key = {(r.doc_id, r.frame_no): r.mean_luma for r in feats}
    for doc_id, text in list(texts.items())[:5]:
        raw = text.encode()
        src = np.frombuffer((raw or b"\x00") * ((256) // max(1, len(raw)) + 2),
                            np.uint8)
        want = src[0:256].astype(np.float64).mean()
        # JPEG all-ones-quant decode is ±1/level; mean over 256 px tighter
        assert abs(by_key[(doc_id, 0)] - want) < 1.0


def test_avi_nested_list_bomb_and_sibling_order():
    """A payload nesting 50k LIST containers parses without touching the
    recursion limit (iterative DFS), and frames keep file order across
    sibling movi lists."""
    import struct as st

    def chunk(cid, body):
        return cid + st.pack("<I", len(body)) + body + (b"\x00" * (len(body) % 2))

    inner = chunk(b"00dc", b"FRAME")
    for _ in range(50_000):
        inner = chunk(b"LIST", b"movi" + inner)
    bomb = b"RIFF" + st.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert multimodal._parse_avi_frames(bomb) == [b"FRAME"]

    movi1 = chunk(b"LIST", b"movi" + chunk(b"00dc", b"f0") + chunk(b"00dc", b"f1"))
    movi2 = chunk(b"LIST", b"movi" + chunk(b"00dc", b"f2"))
    body = b"AVI " + movi1 + movi2
    avi = b"RIFF" + st.pack("<I", len(body)) + body
    assert multimodal._parse_avi_frames(avi) == [b"f0", b"f1", b"f2"]


def test_y4m_demux():
    """YUV4MPEG2: header parse + exact frame splits for 4:2:0 and 4:4:4."""
    w, h = 6, 4
    f420 = [bytes([i]) * (w * h * 3 // 2) for i in range(3)]
    y4m = (b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 C420jpeg\x0a"
           + b"".join(b"FRAME\x0a" + f for f in f420))
    assert multimodal._parse_y4m_frames(y4m) == f420

    f444 = [bytes([9]) * (w * h * 3)]
    y4m444 = (b"YUV4MPEG2 W6 H4 C444\x0a"
              + b"".join(b"FRAME\x0a" + f for f in f444))
    assert multimodal._parse_y4m_frames(y4m444) == f444

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a YUV4MPEG2"):
        multimodal._parse_y4m_frames(b"nope")
    with _pytest.raises(ValueError, match="desynced"):
        multimodal._parse_y4m_frames(b"YUV4MPEG2 W6 H4\x0aJUNK\x0a" + b"\x00" * 36)


def test_png_decompression_bomb_rejected():
    """A small crafted PNG (huge IHDR + high-ratio deflate stream) must
    be rejected BEFORE its pixel buffer is materialized — both the
    claimed-dimension cap and the bounded inflate fire, so an untrusted
    payload cannot OOM an executor."""
    import struct as st
    import zlib

    import numpy as np

    def chunk(ctype, body):
        return (st.pack(">I", len(body)) + ctype + body
                + st.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    # 1) Huge claimed dimensions: 2**15 x 2**15 RGBA = 2**30 pixels,
    # > _PNG_MAX_PIXELS — rejected on the IHDR alone, zero inflation.
    bomb = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", st.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 4096))
            + chunk(b"IEND", b""))
    assert len(bomb) < 200  # the whole point: tiny payload, huge claim
    with pytest.raises(ValueError, match="decode cap"):
        multimodal._png_decode_pixels(bomb)

    # 2) Sane dimensions but an IDAT stream that inflates far past the
    # declared scanlines — the bounded decompress stops at the limit.
    w = h = 4
    over = zlib.compress(b"\x00" * (1 << 20))  # 1 MiB of zeros, ~1 KB deflated
    sneak = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
             + chunk(b"IDAT", over)
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates past"):
        multimodal._png_decode_pixels(sneak)

    # 3) A legitimate image at the same dimensions still decodes.
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = multimodal._png_decode_pixels(_png_from_array(arr))
    assert (out == arr).all()


def test_nn_resize_golden_pixels():
    """Nearest-neighbor index map pinned: down- and up-sampling pick
    exactly the floor(i*src/dst) source pixels."""
    import numpy as np

    # 4×4 quadrant image: distinct color per 2×2 quadrant
    quad = np.zeros((4, 4, 3), dtype=np.uint8)
    quad[:2, :2] = [255, 0, 0]
    quad[:2, 2:] = [0, 255, 0]
    quad[2:, :2] = [0, 0, 255]
    quad[2:, 2:] = [255, 255, 0]
    small = multimodal._nn_resize(quad, 2, 2)
    assert small.tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [255, 255, 0]],
    ]
    # upscale 2×2 → 4×4 duplicates each pixel into a 2×2 block
    up = multimodal._nn_resize(small, 4, 4)
    assert (up == quad).all()


def test_real_resize_end_to_end_golden(spark):
    """resize_images(use_fake_decoder=False) over real PNGs: output is a
    valid PNG of the target dimensions whose pixels equal the reference
    nearest-neighbor sample; no NotImplementedError anywhere."""
    import hashlib as hl

    import numpy as np
    from pyspark.sql import Row

    rng = np.random.default_rng(11)
    arrays = {1: rng.integers(0, 256, (6, 10, 3), dtype=np.uint8),
              2: rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)}
    payloads = {i: _png_from_array(a) for i, a in arrays.items()}
    media = spark.createDataFrame(
        [Row(doc_id=i, content=p,
             meta=Row(media_type="image/png", n_bytes=len(p),
                      sha256=hl.sha256(p).hexdigest()))
         for i, p in payloads.items()],
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = {r.doc_id: r for r in multimodal.resize_images(
        media, target_w=4, target_h=4, use_fake_decoder=False).collect()}
    for i, arr in arrays.items():
        px = multimodal._png_decode_pixels(bytes(out[i].content))
        assert px.shape == (4, 4, 3)
        assert (px == multimodal._nn_resize(arr, 4, 4)).all()
        assert out[i].meta.media_type.endswith(";resized")
        assert out[i].meta.n_bytes == len(bytes(out[i].content))
    # composes with the real feature extractor: dimensions refreshed
    feats = {r.doc_id: r for r in multimodal.extract_image_features(
        multimodal.resize_images(media, 4, 4, use_fake_decoder=False),
        use_fake_decoder=False).collect()}
    assert all((f.width, f.height) == (4, 4) for f in feats.values())


def test_real_dhash_golden(spark):
    """image_dhash(use_fake_decoder=False): hash equals a reference
    computed from the known pixel array; identical images collide."""
    import hashlib as hl

    import numpy as np
    from pyspark.sql import Row

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    p = _png_from_array(arr)
    media = spark.createDataFrame(
        [Row(doc_id=i, content=p,
             meta=Row(media_type="image/png", n_bytes=len(p),
                      sha256=hl.sha256(p).hexdigest()))
         for i in (1, 2)],
        schema=multimodal.MEDIA_SCHEMA,
    )
    got = {r.doc_id: r.dhash for r in multimodal.image_dhash(
        media, use_fake_decoder=False).collect()}
    assert got[1] == got[2]  # identical payloads → identical hash

    px = multimodal._nn_resize(arr, 9, 8).astype(np.float64)
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    grid = np.clip(luma, 0, 255).astype(np.uint8).reshape(-1)
    h = 0
    for row in range(8):
        for col in range(8):
            h = (h << 1) | int(grid[row * 9 + col] > grid[row * 9 + col + 1])
    if h >= 1 << 63:
        h -= 1 << 64
    assert got[1] == h


def test_parser_hostile_inputs_regressions(spark):
    """Review findings r4: (1) negative W/H in a Y4M header must raise,
    not loop forever; (2) a stream truncated mid-final-frame raises
    instead of returning a short blob; (3) malformed-but-marker-valid
    JPEGs raise ValueError, never struct.error/IndexError/KeyError;
    (4) synthetic_videos works for n_frames > 3 with 1-char docs;
    (5) encoder rejects quant values an 8-bit DQT cannot store."""
    import struct as st

    import numpy as np
    import pytest as _pytest
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import jpeg

    with _pytest.raises(ValueError, match="non-positive"):
        multimodal._parse_y4m_frames(
            b"YUV4MPEG2 W-1 H4\x0aFRAME\x0a" + b"\x00" * 20)
    with _pytest.raises(ValueError, match="truncated mid-frame"):
        multimodal._parse_y4m_frames(
            b"YUV4MPEG2 W4 H4\x0aFRAME\x0a" + b"\x00" * 5)

    # struct.error class: SOF0 with truncated body
    with _pytest.raises(ValueError, match="malformed JPEG"):
        jpeg.jpeg_decode_pixels(b"\xff\xd8\xff\xc0\x00\x04\x08\x00")
    # IndexError class: valid SOF0 + empty SOS body
    def seg(marker, body):
        return st.pack(">BBH", 0xFF, marker, len(body) + 2) + body
    sof = st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with _pytest.raises(ValueError, match="malformed JPEG"):
        jpeg.jpeg_decode_pixels(
            b"\xff\xd8" + seg(0xC0, sof) + seg(0xDA, b"") + b"\xff\xd9")
    # KeyError class: SOS referencing an undefined Huffman table
    dqt = bytes([0x00]) + bytes([1] * 64)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    with _pytest.raises(ValueError, match="malformed JPEG"):
        jpeg.jpeg_decode_pixels(
            b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof) + seg(0xDA, sos)
            + bytes([0x41]) + b"\xff\xd9")

    docs = spark.createDataFrame([Row(doc_id=1, text="x")])
    out = multimodal.video_frame_features(
        multimodal.synthetic_videos(docs, n_frames=5), n_frames=5).collect()
    assert len(out) == 5

    with _pytest.raises(ValueError, match="quant"):
        jpeg.jpeg_encode_pixels(np.zeros((8, 8), np.uint8),
                                quant=np.full(64, 256))


def test_audio_spectral_features_sine_golden(spark):
    """A 440 Hz sine: dominant and centroid land on 440 Hz (within one
    FFT bin), rolloff at or above the tone, ZCR = 2f."""
    import hashlib as hl

    import pytest

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import multimodal

    rate, seconds = 16000, 1.0
    wav = _make_wav(rate, seconds)
    media = spark.createDataFrame(
        [Row(doc_id=1, content=wav,
             meta=Row(media_type="audio/wav", n_bytes=len(wav),
                      sha256=hl.sha256(wav).hexdigest()))],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.audio_spectral_features(
        media, use_fake_decoder=False).collect()[0]
    bin_hz = rate / (rate * seconds)  # 1 Hz bins at these settings
    assert r.n_samples == rate
    assert r.duration_s == pytest.approx(1.0)
    assert r.rms == pytest.approx(0.5 / 2 ** 0.5, rel=1e-3)
    assert r.dominant_hz == pytest.approx(440.0, abs=bin_hz)
    # a pure tone concentrates the spectrum: centroid close to the tone
    assert r.spectral_centroid_hz == pytest.approx(440.0, rel=0.05)
    assert r.rolloff_hz >= 440.0 - bin_hz
    assert r.zcr == pytest.approx(2 * 440.0, rel=0.01)
    # determinism across invocations
    r2 = multimodal.audio_spectral_features(
        media, use_fake_decoder=False).collect()[0]
    assert r == r2


def test_mp4_mux_demux_roundtrip():
    """mux_minimal_mp4 → _parse_mp4_tracks recovers codec/dims/duration/
    sample count exactly (the ISO-BMFF twin of the AVI round-trip),
    plus the sample-table tier: stsz sizes (avg/max/bitrate), stss-less
    keyframe default (every sample sync), stco chunk count, and the
    offsets-inside-payload corruption check."""
    frames = [b"\xff\xd8a\xff\xd9", b"\xff\xd8bb\xff\xd9", b"\xff\xd8c\xff\xd9"]
    mp4 = multimodal.mux_minimal_mp4(frames, 32, 24, fps=10)
    total = sum(len(f) for f in frames)
    assert multimodal._parse_mp4_tracks(mp4) == [{
        "track_id": 1, "handler": "vide", "codec": "jpeg",
        "width": 32.0, "height": 24.0, "duration_s": 0.3, "n_samples": 3,
        "n_keyframes": 3,  # no stss box → every sample is sync
        "avg_sample_size": total / 3,
        "max_sample_size": max(len(f) for f in frames),
        "bitrate_bps": 8.0 * total / 0.3,
        "n_chunks": 1, "mdat_truncated": False,
        # codec-config tier: no avcC/hvcC in a jpeg entry; coded dims
        # fall back to the VisualSampleEntry fixed fields
        "codec_profile": None, "codec_level": None,
        "coded_width": 32, "coded_height": 24,
    }]


def test_mp4_sample_tables_hostile_and_truncated_mdat():
    """Sample-table hostility: an stsz/stss/stco whose declared entry
    count overruns its box raises loudly; a payload whose moov parses
    but whose mdat is gone (chunk offsets past the end) reports
    mdat_truncated=True — the cheap corrupt-download detector."""
    import struct as st

    frames = [b"\xff\xd8a\xff\xd9", b"\xff\xd8bb\xff\xd9"]
    mp4 = multimodal.mux_minimal_mp4(frames, 16, 16, fps=5)
    # strip the mdat box entirely: boxes stay well-formed, stco now
    # points past the payload end
    mdat_at = mp4.find(b"mdat") - 4
    headless = mp4[:mdat_at]
    (track,) = multimodal._parse_mp4_tracks(headless)
    assert track["mdat_truncated"] is True and track["n_samples"] == 2
    # corrupt the stsz entry count to overrun its box
    stsz_at = mp4.find(b"stsz")
    bad = bytearray(mp4)
    bad[stsz_at + 12:stsz_at + 16] = st.pack(">I", 10 ** 6)
    with pytest.raises(ValueError, match="stsz"):
        multimodal._parse_mp4_tracks(bytes(bad))
    # an stss box whose count overruns: inject right after stsd inside
    # stbl would shift offsets — instead corrupt stco's count
    stco_at = mp4.find(b"stco")
    bad2 = bytearray(mp4)
    bad2[stco_at + 8:stco_at + 12] = st.pack(">I", 10 ** 6)
    with pytest.raises(ValueError, match="stco"):
        multimodal._parse_mp4_tracks(bytes(bad2))


def test_mp4_sample_extraction_roundtrip_and_decode():
    """stsc/stco/stsz resolve to exact byte ranges: mux N JPEG frames
    into MP4, extract — byte-identical frames in order, each decodable
    by our own JPEG codec (the no-ffmpeg end-to-end MP4 path); stss-
    less container → every sample sync, so sync_only extracts all."""
    import numpy as np

    from aws_data_pipeline_ads_spark.operators import jpeg

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (16, 16, 3), np.uint8) for _ in range(4)]
    frames = [jpeg.jpeg_encode_pixels(im) for im in imgs]
    mp4 = multimodal.mux_minimal_mp4(frames, 16, 16, fps=5)
    codec, samples = multimodal._parse_mp4_samples(mp4)
    assert codec == "jpeg" and len(samples) == 4
    assert all(is_sync for _o, _s, is_sync in samples)
    got = multimodal._parse_mp4_frames(mp4)
    assert got == frames
    assert multimodal._parse_mp4_frames(mp4, sync_only=True) == frames
    # every extracted sample decodes with the real codec
    for fr, im in zip(got, imgs):
        dec = jpeg.jpeg_decode_pixels(fr)
        assert dec.shape == im.shape
    # truncated mdat is loud at whichever tier sees it first (the box
    # walk for a cut inside mdat; the range check for a lying stco)
    with pytest.raises(ValueError):
        multimodal._parse_mp4_frames(mp4[:mp4.find(b"mdat") + 12])
    # lying chunk offset: boxes intact (mdat stripped), ranges out
    headless = mp4[:mp4.find(b"mdat") - 4]
    with pytest.raises(ValueError, match="extends past"):
        multimodal._parse_mp4_frames(headless)


def test_mp4_sample_extraction_hostile_tables():
    """Inconsistent stsc/stco (tables resolving fewer samples than stsz
    declares) and a chunk-count mismatch fail loudly — never a silent
    short read on untrusted media."""
    import struct as st

    frames = [b"\xff\xd8a\xff\xd9", b"\xff\xd8bb\xff\xd9"]
    mp4 = multimodal.mux_minimal_mp4(frames, 8, 8, fps=5)
    # stsc says 1 sample/chunk but there is only 1 chunk → resolves 1/2
    stsc_at = mp4.find(b"stsc")
    bad = bytearray(mp4)
    # entry: first_chunk=1, samples_per_chunk=1 (was len(frames))
    bad[stsc_at + 16:stsc_at + 20] = st.pack(">I", 1)
    with pytest.raises(ValueError, match="resolve only"):
        multimodal._parse_mp4_samples(bytes(bad))


def test_mp4_hostile_inputs():
    """Truncated boxes, 64-bit largesize, sibling box bombs, size
    overflow, non-BMFF garbage — every failure is a loud ValueError
    (never an over-read, hang, or RecursionError), mirroring the AVI
    nested-bomb suite."""
    import struct as st

    mp4 = multimodal.mux_minimal_mp4([b"\xff\xd8x\xff\xd9"], 8, 8)
    # truncations at every interesting boundary
    for cut in (4, 9, 20, len(mp4) // 2, len(mp4) - 3):
        with pytest.raises(ValueError):
            multimodal._parse_mp4_tracks(mp4[:cut])
    # 64-bit largesize box is walked correctly
    big = st.pack(">I", 1) + b"free" + st.pack(">Q", 16) + mp4
    assert multimodal._parse_mp4_tracks(big)[0]["codec"] == "jpeg"
    # truncated largesize field
    with pytest.raises(ValueError):
        multimodal._parse_mp4_tracks(st.pack(">I", 1) + b"free" + b"\x00" * 4)
    # sibling box bomb: 100k 8-byte free boxes stay linear-time
    bomb = (st.pack(">I", 8) + b"free") * 100_000 + mp4
    assert multimodal._parse_mp4_tracks(bomb)[0]["n_samples"] == 1
    # declared size past the payload end
    with pytest.raises(ValueError):
        multimodal._parse_mp4_tracks(
            st.pack(">I", 0xFFFFFFF0) + b"moov" + b"x" * 64)
    # size smaller than its own header can never advance
    with pytest.raises(ValueError):
        multimodal._parse_mp4_tracks(st.pack(">I", 3) + b"moov" + b"x" * 64)
    # moov-less fragment and plain garbage fail loudly
    ftyp_only = st.pack(">I", 16) + b"ftyp" + b"isom" + st.pack(">I", 512)
    with pytest.raises(ValueError, match="no moov"):
        multimodal._parse_mp4_tracks(ftyp_only)
    with pytest.raises(ValueError):
        multimodal._parse_mp4_tracks(b"this is not a video at all..")


def test_video_metadata_mixed_corpus(spark, sf_dir):
    """video_metadata over a mixed AVI/MP4 corpus: one row per doc,
    container picked by doc_id parity, codec/dims/frame-count all from
    the real walkers, deterministic across runs."""
    docs = load_table(spark, sf_dir, "documents").limit(12)
    media = multimodal.synthetic_videos(docs, n_frames=3, container="mixed")
    rows = {r.doc_id: r for r in multimodal.video_metadata(media).collect()}
    assert len(rows) == 12
    for doc_id, r in rows.items():
        assert r.container == ("mp4" if doc_id % 2 else "avi")
        assert r.codec == ("jpeg" if doc_id % 2 else "MJPG")
        assert (r.width, r.height) == (16.0, 16.0)
        assert r.n_samples == 3 and r.handler == "vide"
        assert r.duration_s == pytest.approx(3 / 25, rel=1e-6)
    again = {r.doc_id: r for r in multimodal.video_metadata(media).collect()}
    assert rows == again


def test_video_metadata_y4m():
    """YUV4MPEG2 header triage: dims from W/H tags, duration from the F
    rate tag, frame count from the real splitter."""
    w, h = 6, 4
    payload = b"YUV4MPEG2 W6 H4 F30:1 C420jpeg\x0a" + b"".join(
        b"FRAME\x0a" + bytes([i]) * (w * h * 3 // 2) for i in range(5)
    )
    frames = multimodal._parse_y4m_frames(payload)
    assert len(frames) == 5


def test_video_metadata_permissive_quarantine(spark, sf_dir):
    """permissive=True: malformed payloads become one quarantine row
    (null metadata + the ValueError text) instead of failing the task;
    good payloads still parse. Default mode stays FAILFAST."""
    from pyspark.sql import Row

    good = multimodal.mux_minimal_mp4(
        [b"\xff\xd8x\xff\xd9"], 8, 8, fps=5)
    # Truncated AVI: the avih chunk declares its full size but the
    # payload is cut inside it, so struct.unpack sees a short slice —
    # struct.error, not ValueError; must still quarantine (one bad
    # payload must not fail the whole task).
    avi = multimodal.mux_mjpeg_avi([b"\xff\xd8x\xff\xd9"] * 3, 8, 8)
    media = spark.createDataFrame([
        Row(doc_id=1, content=bytearray(good)),
        Row(doc_id=2, content=bytearray(b"definitely not a video....")),
        Row(doc_id=3, content=bytearray(good[: len(good) // 2])),
        Row(doc_id=4, content=bytearray(avi[:40])),
    ])
    rows = {r.doc_id: r for r in
            multimodal.video_metadata(media, permissive=True).collect()}
    assert rows[1].codec == "jpeg" and rows[1].error is None
    assert rows[2].codec is None and "ISO-BMFF" in rows[2].error
    assert rows[3].codec is None and rows[3].error
    assert rows[4].codec is None and rows[4].error
    # FAILFAST default still raises through the task
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as exc:
        multimodal.video_metadata(media).collect()
    # whichever bad payload's task fails first wins the race: doc 2/3
    # raise ISO-BMFF errors, doc 4 the wrapped truncated-AVI one
    assert ("ISO-BMFF" in str(exc.value)
            or "malformed container" in str(exc.value)
            or isinstance(exc.value, Py4JJavaError))


def test_audio_segments_golden_silence_tone(spark):
    """Constructed WAV: 0.2s silence | 0.3s tone | 0.2s silence | 0.1s
    tone (below min length after framing, still >= 2 frames → kept) —
    segment boundaries land on frame edges, per-segment RMS matches the
    tone amplitude, pure silence yields zero rows."""
    import io
    import wave

    import numpy as np
    from pyspark.sql import Row

    rate = 16000

    def wav_of(samples: np.ndarray) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes((samples * 32767).astype("<i2").tobytes())
        return buf.getvalue()

    t = lambda dur: np.sin(2 * np.pi * 440 * np.arange(int(rate * dur)) / rate) * 0.5
    z = lambda dur: np.zeros(int(rate * dur))
    sig = np.concatenate([z(0.2), t(0.3), z(0.2), t(0.1)])
    media = spark.createDataFrame([
        Row(doc_id=1, content=bytearray(wav_of(sig))),
        Row(doc_id=2, content=bytearray(wav_of(z(0.5)))),  # all silence
    ])
    rows = sorted(
        multimodal.audio_segments(media, use_fake_decoder=False).collect(),
        key=lambda r: (r.doc_id, r.segment_no),
    )
    assert [r.doc_id for r in rows] == [1, 1]
    a, b = rows
    assert a.start_s == pytest.approx(0.2, abs=0.02)
    assert a.end_s == pytest.approx(0.5, abs=0.02)
    assert b.start_s == pytest.approx(0.7, abs=0.02)
    assert b.end_s == pytest.approx(0.8, abs=0.02)
    # sine RMS = amp/sqrt(2)
    for r in rows:
        assert r.rms == pytest.approx(0.5 / np.sqrt(2), rel=0.05)
    # determinism
    again = sorted(
        multimodal.audio_segments(media, use_fake_decoder=False).collect(),
        key=lambda r: (r.doc_id, r.segment_no),
    )
    assert rows == again


# ---------------------------------------------------------------------------
# Codec-configuration tier: avcC/hvcC parse, H.264 SPS dims


class _SpsWriter:
    """MSB-first bit writer with Exp-Golomb encode — the test-side twin
    of multimodal._BitReader, so SPS fixtures are real bitstreams, not
    hand-packed hex."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

    def ue(self, v: int):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def rbsp(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def _make_sps(profile_idc: int, level_idc: int, w_mbs: int, h_units: int,
              crop=(0, 0, 0, 0)) -> bytes:
    """A parse-legal H.264 SPS NAL (§7.3.2.1.1) for a frame_mbs_only
    4:2:0 stream of (w_mbs*16 − 2*(l+r)) × (h_units*16 − 2*(t+b))."""
    w = _SpsWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)           # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)             # seq_parameter_set_id
    if profile_idc in multimodal._AVC_HIGH_PROFILES:
        w.ue(1)         # chroma_format_idc 4:2:0
        w.ue(0)         # bit_depth_luma_minus8
        w.ue(0)         # bit_depth_chroma_minus8
        w.u(0, 1)       # qpprime_y_zero_transform_bypass
        w.u(0, 1)       # seq_scaling_matrix_present
    w.ue(0)             # log2_max_frame_num_minus4
    w.ue(0)             # pic_order_cnt_type = 0
    w.ue(0)             # log2_max_pic_order_cnt_lsb_minus4
    w.ue(4)             # max_num_ref_frames
    w.u(0, 1)           # gaps_in_frame_num_value_allowed
    w.ue(w_mbs - 1)
    w.ue(h_units - 1)
    w.u(1, 1)           # frame_mbs_only_flag
    w.u(1, 1)           # direct_8x8_inference_flag
    left, right, top, bottom = crop
    if any(crop):
        w.u(1, 1)
        for v in crop:
            w.ue(v)
    else:
        w.u(0, 1)
    w.u(0, 1)           # vui_parameters_present_flag
    return b"\x67" + w.rbsp()


def _make_avcc(sps: bytes, profile_idc: int, level_idc: int) -> bytes:
    import struct as st

    pps = b"\x68\xce\x38\x80"
    return (bytes([1, profile_idc, 0, level_idc, 0xFF, 0xE1])
            + st.pack(">H", len(sps)) + sps
            + bytes([1]) + st.pack(">H", len(pps)) + pps)


def test_mp4_avcc_sps_dims_override_display_dims():
    """An avc1 entry with an avcC record: profile/level come from the
    record, coded dims from the SPS macroblock grid minus cropping —
    OVERRIDING the writer-supplied stsd dims (muxed deliberately wrong,
    the lying-container case a crawl corpus hits constantly). High
    profile 1920x1080 needs the chroma-format block and a bottom crop
    of 4 chroma units (1088 → 1080)."""
    sps = _make_sps(100, 40, 120, 68, crop=(0, 0, 0, 4))
    assert multimodal._parse_avc_sps(sps) == {
        "profile_idc": 100, "level_idc": 40, "width": 1920, "height": 1080}
    mp4 = multimodal.mux_minimal_mp4(
        [b"fake-h264-au"], 640, 480, fps=25, codec=b"avc1",
        codec_config=(b"avcC", _make_avcc(sps, 100, 40)))
    (track,) = multimodal._parse_mp4_tracks(mp4)
    assert track["codec"] == "avc1"
    assert track["codec_profile"] == "High"
    assert track["codec_level"] == 4.0
    assert (track["coded_width"], track["coded_height"]) == (1920, 1080)
    # display dims still report what the container claims
    assert (track["width"], track["height"]) == (640.0, 480.0)


def test_mp4_avcc_baseline_no_chroma_block_and_hvcc():
    """Baseline profile (66) skips the chroma/bit-depth block — the
    parser must branch on profile_idc; hvcC reports HEVC profile/level
    from the record's fixed offsets (dims stay the entry fields)."""
    sps = _make_sps(66, 30, 40, 30)  # 640x480, no crop
    assert multimodal._parse_avc_sps(sps) == {
        "profile_idc": 66, "level_idc": 30, "width": 640, "height": 480}
    mp4 = multimodal.mux_minimal_mp4(
        [b"au"], 640, 480, codec=b"avc3",
        codec_config=(b"avcC", _make_avcc(sps, 66, 30)))
    (track,) = multimodal._parse_mp4_tracks(mp4)
    assert track["codec_profile"] == "Baseline"
    assert track["codec_level"] == 3.0
    assert (track["coded_width"], track["coded_height"]) == (640, 480)
    # hvcC: version, (space|tier|profile_idc=2 → Main 10), 4 compat,
    # 6 constraint bytes, general_level_idc 120 → level 4.0
    hvcc = bytes([1, 0x02]) + b"\x60\x00\x00\x00" + b"\x90" + b"\x00" * 5 \
        + bytes([120]) + b"\xf0\x00\xfc\xfd\xf8\xf8\x00\x00\x0f"
    mp4h = multimodal.mux_minimal_mp4(
        [b"au"], 320, 240, codec=b"hvc1", codec_config=(b"hvcC", hvcc))
    (trk,) = multimodal._parse_mp4_tracks(mp4h)
    assert trk["codec_profile"] == "hevc Main 10 (Main tier)"
    assert trk["codec_level"] == 4.0
    assert (trk["coded_width"], trk["coded_height"]) == (320, 240)


def test_mp4_avcc_emulation_prevention_and_hostile():
    """Emulation-prevention stripping (00 00 03 → 00 00) end-to-end: an
    SPS whose RBSP contains 00 00 runs parses identically with 0x03
    bytes inserted after every zero pair (decoders must discard them
    wherever they follow 00 00). Hostile records raise loudly: short
    avcC, SPS length overrunning the record, crop window swallowing the
    whole frame, bit-reads past the RBSP end."""
    import struct as st

    # profile 66 + constraints 0x00 + level 0x00 → a real 00 00 run
    sps = _make_sps(66, 0, 40, 30)
    assert b"\x00\x00" in sps
    plain = multimodal._parse_avc_sps(sps)
    rbsp = sps[1:]
    encoded = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2:
            encoded.append(3)
            zeros = 0
        encoded.append(b)
        zeros = zeros + 1 if b == 0 else 0
    assert multimodal._parse_avc_sps(b"\x67" + bytes(encoded)) == plain
    assert multimodal._strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    # short avcC record
    mp4 = multimodal.mux_minimal_mp4(
        [b"au"], 64, 64, codec=b"avc1", codec_config=(b"avcC", b"\x01\x64"))
    with pytest.raises(ValueError, match="avcC"):
        multimodal._parse_mp4_tracks(mp4)
    # SPS length field overruns the record
    bad = bytes([1, 100, 0, 40, 0xFF, 0xE1]) + st.pack(">H", 9999) + b"\x67"
    mp4 = multimodal.mux_minimal_mp4(
        [b"au"], 64, 64, codec=b"avc1", codec_config=(b"avcC", bad))
    with pytest.raises(ValueError, match="SPS length"):
        multimodal._parse_mp4_tracks(mp4)
    # crop window larger than the coded frame
    with pytest.raises(ValueError, match="cropping"):
        multimodal._parse_avc_sps(_make_sps(66, 30, 2, 2, crop=(0, 20, 0, 0)))
    # truncated SPS: the bit reader must fail loudly, never over-read
    with pytest.raises(ValueError):
        multimodal._parse_avc_sps(sps[:6])
    # wrong NAL type
    with pytest.raises(ValueError, match="nal_unit_type"):
        multimodal._parse_avc_sps(b"\x68" + sps[1:])


def test_make_avc_config_roundtrip_and_avc1_corpus(spark, sf_dir):
    """Package-side SPS writer vs package-side parser: make_avc_config
    dims round-trip exactly for every even size incl. non-multiple-of-
    16 (crop window engaged); odd dims refused (4:2:0). The avc1
    synthetic corpus then carries per-doc dims through a full
    mux→video_metadata pass."""
    for wh in [(16, 16), (30, 26), (100, 90), (1920, 1080), (2, 2)]:
        cfg = multimodal.make_avc_config(*wh)
        mp4 = multimodal.mux_minimal_mp4(
            [b"au"], *wh, codec=b"avc1", codec_config=(b"avcC", cfg))
        (trk,) = multimodal._parse_mp4_tracks(mp4)
        assert (trk["coded_width"], trk["coded_height"]) == wh
        assert trk["codec_profile"] == "High" and trk["codec_level"] == 4.0
    with pytest.raises(ValueError, match="even"):
        multimodal.make_avc_config(15, 16)
    # Baseline profile branch (no chroma block in the SPS)
    cfg = multimodal.make_avc_config(64, 48, profile_idc=66, level_idc=31)
    mp4 = multimodal.mux_minimal_mp4(
        [b"au"], 64, 48, codec=b"avc1", codec_config=(b"avcC", cfg))
    (trk,) = multimodal._parse_mp4_tracks(mp4)
    assert trk["codec_profile"] == "Baseline" and trk["codec_level"] == 3.1
    assert (trk["coded_width"], trk["coded_height"]) == (64, 48)

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.synthetic_videos(docs, container="avc1")
    rows = {r.doc_id: r for r in multimodal.video_metadata(media).collect()}
    assert len(rows) == 20
    for doc_id, r in rows.items():
        assert r.codec == "avc1"
        assert (r.coded_width, r.coded_height) == (
            16 + 2 * (doc_id % 8), 16 + 2 * (doc_id % 6))
        assert r.n_samples == 3


def test_make_hevc_config_sps_dims_roundtrip():
    """hvcC SPS tier: make_hevc_config dims round-trip through the
    NAL-array walk + HEVC SPS parse, incl. non-multiple-of-8 sizes
    (conformance window engaged); the existing hvcC without an SPS
    array (fixed 13-byte prefix only) still yields profile/level with
    entry-field dims. Hostile: truncated NAL array raises."""
    import struct as st

    for wh in [(1920, 1080), (100, 90), (8, 8), (1280, 720), (2, 2)]:
        cfg = multimodal.make_hevc_config(*wh)
        mp4 = multimodal.mux_minimal_mp4(
            [b"au"], 64, 64, codec=b"hvc1", codec_config=(b"hvcC", cfg))
        (trk,) = multimodal._parse_mp4_tracks(mp4)
        assert (trk["coded_width"], trk["coded_height"]) == wh
        assert trk["codec_profile"] == "hevc Main (Main tier)"
        assert trk["codec_level"] == 4.0
    with pytest.raises(ValueError, match="even"):
        multimodal.make_hevc_config(7, 8)
    # direct SPS parse: wrong NAL type refused
    cfg = multimodal.make_hevc_config(64, 64)
    with pytest.raises(ValueError, match="nal_unit_type 33"):
        multimodal._parse_hevc_sps(b"\x40\x01\x00")
    # truncated NAL array: length field overruns the record
    bad = cfg[:-3]
    mp4 = multimodal.mux_minimal_mp4(
        [b"au"], 64, 64, codec=b"hvc1", codec_config=(b"hvcC", bad))
    with pytest.raises(ValueError, match="hvcC"):
        multimodal._parse_mp4_tracks(mp4)


def test_audio_mp3_arithmetic_roundtrip(spark, sf_dir):
    """q_audio_mp3's contract in miniature: synthetic_mp3s writes real
    MPEG-1 Layer III frame headers as pure functions of doc_id;
    audio_mp3_metadata walks them back. Every field must equal its
    arithmetic law, with zero quarantines on the clean corpus."""
    from aws_data_pipeline_ads_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    rows = multimodal.audio_mp3_metadata(
        multimodal.synthetic_mp3s(docs)).collect()
    assert len(rows) == 40
    choices = [64, 128, 192, 320]
    for r in rows:
        d = r.doc_id
        assert r.error is None, r
        assert r.codec == "mp3"
        assert r.n_frames == 3 + d % 5
        assert r.sample_rate == 44100
        assert r.bitrate_kbps == (64 if d % 7 == 0 else choices[d % 4])
        assert r.vbr == (d % 7 == 0)
        assert r.has_id3 == (d % 2 == 0)
        assert r.duration_us == r.n_frames * 1152 * 1_000_000 // 44100


def test_audio_mp3_header_walk_edges():
    """_parse_mp3_meta unit edges: padding-bit frame length, ID3v2
    syncsafe size skip, VBR detection, and the documented ValueError on
    every malformed shape (truncation, sync loss, bad indices,
    oversized ID3)."""
    import pytest as _pytest

    from aws_data_pipeline_ads_spark.operators.multimodal import (
        _parse_mp3_meta,
        make_mp3,
    )

    # clean CBR: exact frame count + integer-micros duration
    m = _parse_mp3_meta(make_mp3(5, bitrate_kbps=192, sample_rate=32000))
    assert (m["n_frames"], m["bitrate_kbps"], m["sample_rate"],
            m["vbr"], m["has_id3"]) == (5, 192, 32000, False, False)
    assert m["duration_us"] == 5 * 1152 * 1_000_000 // 32000
    # ID3v2 shell skipped via syncsafe size
    assert _parse_mp3_meta(make_mp3(3, id3=True))["has_id3"] is True
    # VBR: alternating bitrates flip the flag
    assert _parse_mp3_meta(make_mp3(4, bitrate_kbps=320,
                                    vbr_second_rate=64))["vbr"] is True
    # padding bit lengthens ONE frame by one byte — hand-patch a frame
    # header and re-walk (the padded stream must still parse cleanly)
    raw = bytearray(make_mp3(2, bitrate_kbps=128, sample_rate=44100))
    frame_len = 144 * 128 * 1000 // 44100
    raw[2] |= 0x02                       # padding bit of frame 0
    raw.insert(frame_len, 0)             # its one pad byte
    m = _parse_mp3_meta(bytes(raw))
    assert m["n_frames"] == 2 and m["vbr"] is False

    for bad, msg in [
        (b"", "no MPEG audio frames"),
        (b"ID3\x04\x00\x00", "truncated ID3v2"),
        (b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f", "extends past"),
        (b"ID3\x04\x00\x00\x00\x00\x80\x00" + b"\x00" * 200,
         "high bit set"),
        (b"garbage-not-audio", "lost frame sync"),
        (make_mp3(3)[:-10], "extends past the payload"),
        (bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1), 0x00, 0x00]),
         "free-format/bad bitrate"),
        (bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1), 0x4C, 0x00]),
         "rate index"),
        (bytes([0xFF, 0xE2, 0x92, 0x00]), "only MPEG-1 Layer III"),
    ]:
        with _pytest.raises(ValueError, match=msg):
            _parse_mp3_meta(bad)
    # mid-stream sample-rate change
    a = make_mp3(1, sample_rate=44100)
    b = make_mp3(1, sample_rate=48000)
    with _pytest.raises(ValueError, match="sample rate changes"):
        _parse_mp3_meta(a + b)


def test_audio_mp3_permissive_quarantine(spark):
    """The mixed-crawl contract shared with video_metadata/image_exif:
    permissive (default) turns each malformed payload into ONE
    quarantine row (null fields + the error text) without failing the
    task; good payloads still parse; permissive=False raises through
    the task."""
    from pyspark.sql import Row

    good = multimodal.make_mp3(4, bitrate_kbps=128, id3=True)
    media = spark.createDataFrame([
        Row(doc_id=1, content=bytearray(good)),
        Row(doc_id=2, content=bytearray(b"definitely not audio......")),
        Row(doc_id=3, content=bytearray(good[: len(good) - 7])),
        Row(doc_id=4, content=bytearray(b"")),
    ])
    rows = {r.doc_id: r for r in
            multimodal.audio_mp3_metadata(media).collect()}
    assert len(rows) == 4
    assert rows[1].error is None and rows[1].n_frames == 4
    assert rows[1].has_id3 is True
    assert rows[2].codec is None and "sync" in rows[2].error
    assert rows[3].codec is None and "extends past" in rows[3].error
    assert rows[4].codec is None and rows[4].error
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        multimodal.audio_mp3_metadata(media, permissive=False).collect()
    assert "mp3" in str(exc.value)


def test_injected_frame_decoder_over_mp4_sample_ranges(spark):
    """The one sanctioned codec-library boundary: an avc1 MP4 whose
    sample table records three distinct-size 'H.264' samples. The
    built-in JPEG decoder must fail loudly on them; an injected
    frame_decoder must receive EXACTLY the stsz/stco byte ranges the
    mux wrote (each sample is a uniform run of a distinct byte, and
    the fake decoder asserts uniformity worker-side + encodes the byte
    into the pixels, so mean_luma proves which bytes arrived)."""
    import numpy as np
    import pytest as _pytest
    from pyspark.sql import Row

    samples = [bytes([10 * (i + 1)]) * (50 + 7 * i) for i in range(3)]
    cfg = multimodal.make_avc_config(32, 24)
    mp4 = multimodal.mux_minimal_mp4(samples, 32, 24, fps=5,
                                     codec=b"avc1",
                                     codec_config=(b"avcC", cfg))
    media = spark.createDataFrame([Row(doc_id=7, content=bytearray(mp4))])

    with _pytest.raises(Exception):  # inter-coded: no built-in decode
        multimodal.video_frame_features(media).collect()

    def fake_h264_decode(fr: bytes):
        assert len(fr) in (50, 57, 64), len(fr)       # exact stsz sizes
        assert fr == bytes([fr[0]]) * len(fr)         # exact mdat bytes
        return np.full((4, 6, 3), fr[0], dtype=np.uint8)

    rows = sorted(
        multimodal.video_frame_features(
            media, frame_decoder=fake_h264_decode).collect(),
        key=lambda r: r.frame_no)
    assert [(r.width, r.height) for r in rows] == [(6, 4)] * 3
    for r, want in zip(rows, (10.0, 20.0, 30.0)):
        assert abs(r.mean_luma - want) < 1e-6
    # the MJPEG default path is untouched by the seam
    from aws_data_pipeline_ads_spark.operators.jpeg import (
        jpeg_encode_pixels,
    )

    frame = jpeg_encode_pixels(np.full((8, 8, 1), 128, dtype=np.uint8))
    avi = multimodal.mux_mjpeg_avi([frame] * 2, 8, 8)
    media2 = spark.createDataFrame([Row(doc_id=1, content=bytearray(avi))])
    assert multimodal.video_frame_features(media2).count() == 2
