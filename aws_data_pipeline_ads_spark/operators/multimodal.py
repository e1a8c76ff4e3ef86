"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. Real codec paths that need no native libraries
ARE implemented: PNG header AND full pixel decode (stdlib-zlib inflate
+ scanline unfilter), BASELINE + PROGRESSIVE JPEG pixel decode
(pure-numpy Huffman + dequant + IDCT, operators/jpeg.py; arithmetic
coding rejected loudly), nearest-neighbor resize + PNG re-encode,
dHash over real luminance grids, RIFF/WAVE 16-bit PCM parsing, REAL
video demux (RIFF/AVI chunk walk → MJPEG frames the JPEG codec
decodes; YUV4MPEG2 raw-frame splits), and ISO-BMFF (MP4) container
metadata (moov box walk → per-track codec/dims/duration/samples) —
`use_fake_decoder=False` exercises them end-to-end. The remaining
honest boundary is inter-coded video codecs (H.264 etc.), which
genuinely need a decoder library; their payloads fail loudly at the
JPEG-decode stage (while their MP4 metadata still parses), and the
fake-decoder contract covers arbitrary bytes.

Scale notes: mapInPandas streams Arrow batches, so peak memory is one
batch, not one partition; media tables should be repartitioned by a
size-balanced key before heavy decode stages so stragglers don't
dominate — `operators.partitioning.size_balanced_partitions` is that
rebalance (byte-targeted buckets, oversized payloads isolated).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def attach_media(documents: DataFrame, media_type: str = "image/fake") -> DataFrame:
    """Build a media table from documents: text bytes stand in for media
    payloads (deterministic fake), metadata computed engine-side."""
    content = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        content.alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
            F.sha2(content, 256).alias("sha256"),
        ).alias("meta"),
    )


def _decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real image header decode, pure Python, by sniffed format:

    - PNG: 8-byte signature, then the IHDR chunk (length + type at
      offsets 8-16) whose first 8 data bytes are big-endian width,
      height.
    - JPEG: walk the marker stream to the first SOFn frame header
      (C0-CF except the non-frame C4/C8/CC); its payload is precision,
      big-endian height, width.

    - GIF: GIF87a/89a signature, then little-endian width, height in
      the logical screen descriptor (bytes 6-10).

    Pixel-level decode (IDAT inflate / DCT) would need PIL/libvips and
    is not required for dimension features."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("gif: truncated logical screen descriptor")
        return (int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"))
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("bmp: truncated headers")
        w, h = struct.unpack_from("<ii", payload, 18)
        return w, abs(h)  # negative height = top-down row order
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR chunk")
        width, height = struct.unpack(">II", payload[16:24])
        return width, height
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("JPEG marker stream desynced")
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length
                continue
            size = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                height, width = struct.unpack(">HH", payload[pos + 5:pos + 9])
                return width, height
            pos += 2 + size
        raise ValueError("JPEG missing SOF frame header")
    raise ValueError("unsupported image payload (need PNG or JPEG)")


def _parse_wav(payload: bytes):
    """Real RIFF/WAVE parse, pure Python: walk word-aligned chunks, read
    (format, channels, sample_rate, bits) from 'fmt ', PCM from 'data'.
    Returns (sample_rate, mono float samples in [-1, 1)). Only 16-bit
    PCM — the format the stdlib `wave` writer produces — is supported;
    compressed codecs would need ffmpeg at this swap-in point."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sample_rate = channels = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV is supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are 2-byte aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
    samples = pcm.astype("float64") / 32768.0
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return sample_rate, samples


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Decode cap for untrusted payloads: 16.7M pixels (a 4096x4096 RGBA frame
# is ~67 MB decoded) — far above thumbnail-pipeline sizes, far below what
# a decompression-bomb IHDR can claim.
_PNG_MAX_PIXELS = 1 << 24


def _png_decode_pixels(payload: bytes):
    """Full PNG pixel decode, pure Python + numpy + stdlib zlib — no PIL.

    Supports the subset a pipeline's own writers produce: 8-bit depth,
    color types 0 (gray) / 2 (RGB) / 6 (RGBA), non-interlaced. All five
    scanline filters (None/Sub/Up/Average/Paeth) are unfiltered; Up is
    vectorized (uint8 wraparound IS mod-256), the left-dependent filters
    run a per-byte loop — fine for thumbnail-scale work, and the marked
    swap-in point for an optimized codec at production volume.

    Returns an (h, w, channels) uint8 array.
    """
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln = struct.unpack(">I", payload[pos:pos + 4])[0]
        typ = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR chunk")
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            "unsupported PNG subset (need 8-bit gray/RGB/RGBA, non-interlaced)"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    # Bomb guard: cap the claimed dimensions BEFORE inflating, then
    # decompress with an output bound — a small crafted PNG (huge IHDR
    # + high-ratio deflate stream) must not be able to OOM an executor
    # processing untrusted media payloads.
    expected = h * (stride + 1)
    if w * h > _PNG_MAX_PIXELS:
        raise ValueError(
            f"PNG dimensions {w}x{h} exceed the {_PNG_MAX_PIXELS}-pixel "
            f"decode cap"
        )
    dec = zlib.decompressobj()
    raw = dec.decompress(idat, expected + 1)
    if len(raw) > expected or dec.decompress(dec.unconsumed_tail, 1):
        raise ValueError("PNG IDAT inflates past the declared scanlines")
    if len(raw) != expected:
        raise ValueError("PNG scanline payload has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorized, uint8 add wraps mod 256
            cur = line + prev
        elif f in (1, 3, 4):
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(pv[x])
                if f == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:  # Paeth
                    c = int(pv[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
            cur = cur.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, ch)


def _png_encode_pixels(arr) -> bytes:
    """Re-encode an (h, w, channels) uint8 array as PNG (filter 0 rows,
    stdlib zlib, CRC32 per chunk) — the re-encode half of the pure-
    Python codec."""
    import zlib

    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")
    )


def _nn_resize(arr, target_w: int, target_h: int):
    """Nearest-neighbor resample of an (h, w, c) array — two integer
    index maps (floor(i*src/dst), PIL's NEAREST convention for exact
    integer ratios), zero interpolation arithmetic."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys][:, xs]


def _decode_image_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from a content hash —
    stable across runs/partitions, so downstream plumbing is testable."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


IMAGE_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("aspect", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_image_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches in/out)."""
    decode = _decode_image_fake if use_fake_decoder else _decode_image_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "aspect": [w / h for w, h in dims],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                }
            )

    return media.mapInPandas(batches, IMAGE_FEATURES)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_features(media: DataFrame, sample_rate: int = 16000,
                           use_fake_decoder: bool = True) -> DataFrame:
    """Audio path: payload → (n_samples, duration, RMS energy).

    `use_fake_decoder=True` treats the raw payload as headerless 16-bit
    PCM mono at `sample_rate` (deterministic over arbitrary bytes);
    `False` parses a real RIFF/WAVE container (_parse_wav) and takes the
    sample rate from its header. The numpy math after decode is the same
    either way, vectorized per Arrow batch.
    """
    import numpy as np

    def decode(raw: bytes):
        if use_fake_decoder:
            pcm = np.frombuffer(raw[: len(raw) - len(raw) % 2], dtype="<i2")
            return sample_rate, pcm.astype("float64") / 32768.0
        return _parse_wav(raw)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_samples, duration, rms = [], [], []
            for blob in pdf["content"]:
                rate, samples = decode(bytes(blob))
                n_samples.append(len(samples))
                duration.append(len(samples) / rate)
                rms.append(
                    float(np.sqrt(np.mean(samples ** 2))) if len(samples) else 0.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": n_samples,
                    "duration_s": duration,
                    "rms": rms,
                }
            )

    return media.mapInPandas(batches, AUDIO_FEATURES)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224,
                  use_fake_decoder: bool = True) -> DataFrame:
    """Resize stage: binary in → binary out with refreshed metadata.

    `use_fake_decoder=False` is the REAL pixel path, no PIL required:
    PNG payloads decode via _png_decode_pixels (stdlib-zlib inflate +
    scanline unfilter); JPEG payloads via the pure-numpy baseline codec
    (operators/jpeg.py — Huffman + dequant + IDCT; progressive/
    arithmetic variants rejected loudly); GIF payloads via the LZW
    codec (operators/gif.py, interlace-aware). Any way: nearest-neighbor
    resample (_nn_resize) → deterministic PNG re-encode
    (_png_encode_pixels; lossless output, so downstream hashes are
    stable regardless of input codec).

    The fake 'resize' deterministically resamples the payload to
    target_w*target_h bytes (stride-sampled, zero-padded) — same
    in/out contract, usable over arbitrary bytes. Output schema is the
    media schema itself, so stages compose: attach → resize → features.
    """
    target = target_w * target_h

    def one(raw: bytes) -> bytes:
        if use_fake_decoder:
            if len(raw) >= target:
                step = len(raw) // target
                return raw[::step][:target]
            return raw + b"\x00" * (target - len(raw))
        if raw[:2] == b"\xff\xd8":
            from aws_data_pipeline_ads_spark.operators.jpeg import (
                jpeg_decode_pixels,
            )

            px = jpeg_decode_pixels(raw)
        elif raw[:6] in (b"GIF87a", b"GIF89a"):
            from aws_data_pipeline_ads_spark.operators.gif import (
                gif_decode_pixels,
            )

            px = gif_decode_pixels(raw)
        elif raw[:2] == b"BM":
            from aws_data_pipeline_ads_spark.operators.bmp import (
                bmp_decode_pixels,
            )

            px = bmp_decode_pixels(raw)
        else:
            px = _png_decode_pixels(raw)
        return _png_encode_pixels(_nn_resize(px, target_w, target_h))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [one(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": resized,
                    "meta": [
                        {
                            "media_type": m["media_type"] + ";resized",
                            "n_bytes": len(r),
                            "sha256": hashlib.sha256(r).hexdigest(),
                        }
                        for m, r in zip(pdf["meta"], resized)
                    ],
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _parse_avi_frames(payload: bytes) -> list[bytes]:
    """Real RIFF/AVI demux, pure Python: walk word-aligned chunks,
    recurse into LIST containers, collect the 'movi' list's video
    stream chunks (fourcc ##dc compressed / ##db uncompressed) in file
    order. For an MJPEG AVI each returned blob is a standalone baseline
    JPEG that operators/jpeg.py decodes — no ffmpeg anywhere."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    # Iterative chunk walk (explicit stack): a crafted payload nesting
    # thousands of LIST containers must not blow the recursion limit —
    # untrusted media fails with ValueError, never RecursionError.
    stack: list[tuple[int, int]] = [(12, len(payload))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
            body_at = pos + 8
            nxt = body_at + size + (size % 2)  # chunks are 2-byte aligned
            if cid in (b"LIST", b"RIFF"):
                # descend NOW (depth-first, preserving frame order);
                # the continuation after the container resumes later
                stack.append((nxt, end))
                pos, end = body_at + 4, min(body_at + size, end)
                continue
            if cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[body_at:body_at + size])
            pos = nxt
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return frames


def _parse_y4m_frames(payload: bytes) -> list[bytes]:
    """Real YUV4MPEG2 demux: parse the plain-text stream header
    (W/H/C tags), then split the raw planar frames at their exact byte
    size. Returns raw YCbCr planes per frame (C420jpeg/C420/C444)."""
    nl = payload.find(b"\x0a")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fmt = "420"
    for tag in payload[9:nl].split():
        try:
            if tag[:1] == b"W":
                w = int(tag[1:])
            elif tag[:1] == b"H":
                h = int(tag[1:])
            elif tag[:1] == b"C":
                fmt = tag[1:4].decode("ascii")
        except (UnicodeDecodeError, ValueError) as e:
            raise ValueError(f"YUV4MPEG2 header tag unparsable: {tag!r}") from e
    # strict positivity: a crafted negative W/H would make fsize
    # negative and the scan position stop advancing — an untrusted
    # payload must never be able to wedge the task in an infinite loop
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("YUV4MPEG2 header missing or non-positive W/H")
    fsize = w * h * 3 if fmt == "444" else w * h * 3 // 2
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\x0a", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("YUV4MPEG2 frame header desynced")
        frame = payload[fnl + 1:fnl + 1 + fsize]
        if len(frame) != fsize:
            raise ValueError(
                f"YUV4MPEG2 truncated mid-frame ({len(frame)}/{fsize} bytes)"
            )
        frames.append(frame)
        pos = fnl + 1 + fsize
    if not frames:
        raise ValueError("YUV4MPEG2 stream has no frames")
    return frames


def sample_frames(media: DataFrame, n_frames: int = 4,
                  use_fake_decoder: bool = True) -> DataFrame:
    """Frame sampling for video payloads — the 1→N row explosion shape
    in mapInPandas.

    `use_fake_decoder=False` is the REAL demux path, no ffmpeg: RIFF/AVI
    containers are walked chunk-by-chunk, MP4/ISO-BMFF sample tables
    (stsc/stco/stsz) resolve to exact byte ranges (MJPEG video samples
    come out as standalone JPEGs the baseline codec decodes), and
    YUV4MPEG2 streams split at exact frame boundaries; n_frames
    evenly-spaced REAL frames are emitted (all frames if the video is
    shorter). Inter-coded codecs (H.264 etc.) genuinely need a decoder
    library and their fourccs land here as JPEG-decode failures
    downstream — the honest boundary is now the codec, not the
    container.

    The fake path emits N evenly-spaced byte slices (same contract over
    arbitrary bytes)."""

    def real_frames(raw: bytes) -> list[bytes]:
        fs = (_parse_avi_frames(raw) if raw[:4] == b"RIFF"
              else _parse_y4m_frames(raw) if raw[:9] == b"YUV4MPEG2"
              else _parse_mp4_frames(raw))
        if len(fs) <= n_frames:
            return fs
        idx = [(i * len(fs)) // n_frames for i in range(n_frames)]
        return [fs[i] for i in idx]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(blob)
                if use_fake_decoder:
                    step = max(1, len(raw) // n_frames)
                    sel = [raw[i * step:(i + 1) * step] for i in range(n_frames)]
                else:
                    sel = real_frames(raw)
                for i, fr in enumerate(sel):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame"].append(fr)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) container metadata demux
# ---------------------------------------------------------------------------
#
# Real crawl corpora are overwhelmingly MP4/H.264; full pixel decode
# genuinely needs a codec library, but the metadata a curation pipeline
# FILTERS on first — per-track codec fourcc, dimensions, duration,
# sample count — lives in the `moov` box tree and is a pure byte walk
# (same bounded scope as the SOF-dims JPEG tier). Box grammar:
# [size:u32 BE][type:4cc][body]; size==1 → u64 largesize follows;
# size==0 → box runs to the end of its container.


def _scan_boxes(payload: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for ONE nesting level.

    Hostile-input posture mirrors the AVI walker: every size is bounds-
    checked (a truncated or oversized box raises ValueError, never an
    over-read), each step strictly advances (size >= header length), and
    descent happens only along the fixed moov/trak/mdia/minf/stbl path
    in the callers — so sibling "box bombs" cost one linear scan and
    nesting bombs are never followed."""
    while pos + 8 <= end:
        size = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("ISO-BMFF: truncated 64-bit box size")
            size = int.from_bytes(payload[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"ISO-BMFF: box {typ!r} size {size} out of bounds "
                f"({end - pos} bytes remain)"
            )
        yield typ, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("ISO-BMFF: truncated box header at end of container")


def _first_box(payload: bytes, pos: int, end: int, typ: bytes):
    for t, b, e in _scan_boxes(payload, pos, end):
        if t == typ:
            return b, e
    return None


def _full_box(payload: bytes, b: int, e: int) -> tuple[int, int]:
    """(version, body offset past version+flags) of a FullBox."""
    if e - b < 4:
        raise ValueError("ISO-BMFF: truncated FullBox header")
    return payload[b], b + 4


def _be(payload: bytes, at: int, n: int, end: int) -> int:
    if at + n > end:
        raise ValueError("ISO-BMFF: field extends past its box")
    return int.from_bytes(payload[at:at + n], "big")


def _parse_mp4_tracks(payload: bytes) -> list[dict]:
    """Per-track metadata from an ISO-BMFF payload: track_id, handler
    (vide/soun/...), sample-entry codec fourcc, tkhd display dims,
    mdhd duration seconds, plus the SAMPLE-TABLE tier — the fields a
    curation pipeline filters on without any pixel decode:

    * stsz → n_samples, avg/max sample size, bitrate_bps (8·Σsize/dur)
    * stss → n_keyframes (sync-sample count; absent stss means every
      sample is a sync sample per ISO 14496-12 §8.6.2, so n_samples)
    * stco/co64 → n_chunks, mdat_truncated (any chunk offset at or
      past the payload end — the cheap corrupt-stream detector for a
      crawl corpus whose downloads got cut mid-mdat)

    Every table read is bounds-checked against its box end (a declared
    entry count that overruns the box raises ValueError — hostile-input
    posture identical to the box walker itself)."""
    top = list(_scan_boxes(payload, 0, len(payload)))
    if not any(t in (b"ftyp", b"moov") for t, _, _ in top):
        raise ValueError("not an ISO-BMFF payload (no ftyp/moov box)")
    moov = next(((b, e) for t, b, e in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("ISO-BMFF: no moov box (streaming-only fragment?)")
    tracks: list[dict] = []
    for t, tb, te in _scan_boxes(payload, *moov):
        if t != b"trak":
            continue
        info: dict = {"track_id": None, "handler": None, "codec": None,
                      "width": None, "height": None, "duration_s": None,
                      "n_samples": None, "n_keyframes": None,
                      "avg_sample_size": None, "max_sample_size": None,
                      "bitrate_bps": None, "n_chunks": None,
                      "mdat_truncated": None, "codec_profile": None,
                      "codec_level": None, "coded_width": None,
                      "coded_height": None}
        tkhd = _first_box(payload, tb, te, b"tkhd")
        if tkhd:
            b, e = tkhd
            ver, p = _full_box(payload, b, e)
            info["track_id"] = _be(payload, p + (16 if ver == 1 else 8), 4, e)
            # width/height are the final two 16.16 fixed-point fields
            if e - b >= 8:
                info["width"] = _be(payload, e - 8, 4, e) / 65536.0
                info["height"] = _be(payload, e - 4, 4, e) / 65536.0
        mdia = _first_box(payload, tb, te, b"mdia")
        if mdia:
            mb, me = mdia
            mdhd = _first_box(payload, mb, me, b"mdhd")
            if mdhd:
                b, e = mdhd
                ver, p = _full_box(payload, b, e)
                if ver == 1:
                    timescale = _be(payload, p + 16, 4, e)
                    duration = _be(payload, p + 20, 8, e)
                else:
                    timescale = _be(payload, p + 8, 4, e)
                    duration = _be(payload, p + 12, 4, e)
                if timescale > 0:
                    info["duration_s"] = duration / timescale
            hdlr = _first_box(payload, mb, me, b"hdlr")
            if hdlr:
                b, e = hdlr
                _, p = _full_box(payload, b, e)
                info["handler"] = payload[p + 4:p + 8].decode("latin-1")
            minf = _first_box(payload, mb, me, b"minf")
            if minf:
                stbl = _first_box(payload, *minf, b"stbl")
                if stbl:
                    sb, se = stbl
                    stsd = _first_box(payload, sb, se, b"stsd")
                    if stsd:
                        b, e = stsd
                        _, p = _full_box(payload, b, e)
                        if _be(payload, p, 4, e) >= 1:
                            # first sample entry: size(4) + format fourcc
                            info["codec"] = payload[p + 8:p + 12].decode("latin-1")
                            entry = next(
                                iter(_scan_boxes(payload, p + 4, e)), None)
                            if entry is not None and info["handler"] == "vide":
                                _, eb, ee = entry
                                # VisualSampleEntry fixed dims (body+24);
                                # SPS-derived values override below when
                                # an avcC config is present
                                if eb + 28 <= ee:
                                    info["coded_width"] = _be(
                                        payload, eb + 24, 2, ee)
                                    info["coded_height"] = _be(
                                        payload, eb + 26, 2, ee)
                                info.update(
                                    _parse_codec_config(payload, eb, ee))
                    stsz = _first_box(payload, sb, se, b"stsz")
                    if stsz:
                        b, e = stsz
                        _, p = _full_box(payload, b, e)
                        uniform = _be(payload, p, 4, e)
                        count = _be(payload, p + 4, 4, e)
                        info["n_samples"] = count
                        if count:
                            if uniform:  # constant-size samples
                                total = uniform * count
                                info["max_sample_size"] = uniform
                            else:
                                if p + 8 + 4 * count > e:
                                    raise ValueError(
                                        "ISO-BMFF: stsz table overruns its box"
                                    )
                                sizes = [
                                    int.from_bytes(
                                        payload[p + 8 + 4 * i:p + 12 + 4 * i],
                                        "big")
                                    for i in range(count)
                                ]
                                total = sum(sizes)
                                info["max_sample_size"] = max(sizes)
                            info["avg_sample_size"] = total / count
                            if info["duration_s"]:
                                info["bitrate_bps"] = (
                                    8.0 * total / info["duration_s"]
                                )
                    stss = _first_box(payload, sb, se, b"stss")
                    if stss:
                        b, e = stss
                        _, p = _full_box(payload, b, e)
                        nk = _be(payload, p, 4, e)
                        if p + 4 + 4 * nk > e:
                            raise ValueError(
                                "ISO-BMFF: stss table overruns its box"
                            )
                        info["n_keyframes"] = nk
                    elif info["n_samples"] is not None:
                        # no stss box: every sample is a sync sample
                        info["n_keyframes"] = info["n_samples"]
                    for co_typ, width_b in ((b"stco", 4), (b"co64", 8)):
                        co = _first_box(payload, sb, se, co_typ)
                        if not co:
                            continue
                        b, e = co
                        _, p = _full_box(payload, b, e)
                        nc = _be(payload, p, 4, e)
                        if p + 4 + width_b * nc > e:
                            raise ValueError(
                                f"ISO-BMFF: {co_typ.decode()} table "
                                f"overruns its box"
                            )
                        offs = [
                            int.from_bytes(
                                payload[p + 4 + width_b * i:
                                        p + 4 + width_b * (i + 1)], "big")
                            for i in range(nc)
                        ]
                        info["n_chunks"] = nc
                        info["mdat_truncated"] = any(
                            o >= len(payload) for o in offs
                        )
                        break
        tracks.append(info)
    if not tracks:
        raise ValueError("ISO-BMFF: moov contains no trak boxes")
    return tracks


def _parse_mp4_samples(payload: bytes) -> tuple[str, list[tuple[int, int, bool]]]:
    """Resolve the first VIDEO track's sample table to concrete byte
    ranges: (codec fourcc, [(offset, size, is_sync), ...] in sample
    order). The stsc sample-to-chunk runs are expanded against the
    stco/co64 chunk offsets and stsz sizes; stss marks sync samples
    (absent stss → all sync). This is the tier that lets a curation
    pipeline LOCATE keyframes in the dominant crawl format without a
    codec library — for MJPEG-in-MP4 the extracted samples are
    standalone JPEGs our own decoder handles end-to-end; for H.264 the
    byte ranges are what a real decoder would be handed.

    Hostile-input posture: every table read is bounds-checked, every
    resolved range must lie inside the payload (a truncated mdat or
    lying chunk offset raises ValueError, never an over-read)."""
    top = list(_scan_boxes(payload, 0, len(payload)))
    moov = next(((b, e) for t, b, e in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("ISO-BMFF: no moov box")
    for t, tb, te in _scan_boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _first_box(payload, tb, te, b"mdia")
        if not mdia:
            continue
        hdlr = _first_box(payload, *mdia, b"hdlr")
        if not hdlr:
            continue
        b, e = hdlr
        _, p = _full_box(payload, b, e)
        if payload[p + 4:p + 8] != b"vide":
            continue
        minf = _first_box(payload, *mdia, b"minf")
        stbl = _first_box(payload, *minf, b"stbl") if minf else None
        if not stbl:
            continue
        sb, se = stbl
        codec = "????"
        stsd = _first_box(payload, sb, se, b"stsd")
        if stsd:
            b, e = stsd
            _, p = _full_box(payload, b, e)
            if _be(payload, p, 4, e) >= 1:
                codec = payload[p + 8:p + 12].decode("latin-1")
        # sizes
        stsz = _first_box(payload, sb, se, b"stsz")
        if not stsz:
            raise ValueError("ISO-BMFF: video track has no stsz")
        b, e = stsz
        _, p = _full_box(payload, b, e)
        uniform = _be(payload, p, 4, e)
        count = _be(payload, p + 4, 4, e)
        if uniform:
            sizes = [uniform] * count
        else:
            if p + 8 + 4 * count > e:
                raise ValueError("ISO-BMFF: stsz table overruns its box")
            sizes = [
                int.from_bytes(payload[p + 8 + 4 * i:p + 12 + 4 * i], "big")
                for i in range(count)
            ]
        # chunk offsets
        offs: list[int] = []
        for co_typ, wd in ((b"stco", 4), (b"co64", 8)):
            co = _first_box(payload, sb, se, co_typ)
            if not co:
                continue
            b, e = co
            _, p = _full_box(payload, b, e)
            nc = _be(payload, p, 4, e)
            if p + 4 + wd * nc > e:
                raise ValueError(
                    f"ISO-BMFF: {co_typ.decode()} table overruns its box")
            offs = [
                int.from_bytes(payload[p + 4 + wd * i:p + 4 + wd * (i + 1)],
                               "big")
                for i in range(nc)
            ]
            break
        if not offs:
            raise ValueError("ISO-BMFF: video track has no stco/co64")
        # sample-to-chunk runs
        stsc = _first_box(payload, sb, se, b"stsc")
        if not stsc:
            raise ValueError("ISO-BMFF: video track has no stsc")
        b, e = stsc
        _, p = _full_box(payload, b, e)
        nr = _be(payload, p, 4, e)
        if p + 4 + 12 * nr > e:
            raise ValueError("ISO-BMFF: stsc table overruns its box")
        runs = [
            (
                _be(payload, p + 4 + 12 * i, 4, e),       # first_chunk, 1-based
                _be(payload, p + 8 + 12 * i, 4, e),       # samples_per_chunk
            )
            for i in range(nr)
        ]
        # sync set
        sync: set[int] | None = None
        stss = _first_box(payload, sb, se, b"stss")
        if stss:
            b, e = stss
            _, p = _full_box(payload, b, e)
            nk = _be(payload, p, 4, e)
            if p + 4 + 4 * nk > e:
                raise ValueError("ISO-BMFF: stss table overruns its box")
            sync = {
                int.from_bytes(payload[p + 4 + 4 * i:p + 8 + 4 * i], "big")
                for i in range(nk)
            }
        # expand runs over chunks → per-sample (offset, size, is_sync)
        out: list[tuple[int, int, bool]] = []
        sample = 0  # 0-based index into sizes
        for ci in range(len(offs)):
            chunk_no = ci + 1
            spc = 0
            for first, n in runs:
                if first <= chunk_no:
                    spc = n
                else:
                    break
            pos = offs[ci]
            for _ in range(spc):
                if sample >= count:
                    break
                sz = sizes[sample]
                if pos + sz > len(payload):
                    raise ValueError(
                        f"ISO-BMFF: sample {sample + 1} extends past the "
                        f"payload end (truncated mdat?)"
                    )
                out.append((pos, sz,
                            sync is None or (sample + 1) in sync))
                pos += sz
                sample += 1
        if sample != count:
            raise ValueError(
                f"ISO-BMFF: sample tables resolve only {sample}/{count} "
                f"samples (inconsistent stsc/stco)"
            )
        return codec, out
    raise ValueError("ISO-BMFF: no video track with sample tables")


def _parse_mp4_frames(payload: bytes, sync_only: bool = False) -> list[bytes]:
    """The MP4 twin of _parse_avi_frames: slice every (or every SYNC)
    video sample out of the container in sample order. For MJPEG-in-MP4
    each blob is a standalone JPEG our own baseline/progressive decoder
    handles — the no-ffmpeg end-to-end path on the dominant container."""
    _codec, samples = _parse_mp4_samples(payload)
    frames = [payload[o:o + s] for o, s, is_sync in samples
              if is_sync or not sync_only]
    if not frames:
        raise ValueError("ISO-BMFF: video track has no samples")
    return frames


# ---------------------------------------------------------------------------
# Codec-configuration tier: avcC (H.264) / hvcC (H.265) records in stsd.
#
# Inter-coded pixel decode stays out of pure-Python reach, but the codec
# CONFIG is plain bit-syntax: the AVCDecoderConfigurationRecord carries
# profile/level directly and embeds the SPS NAL, whose Exp-Golomb fields
# yield the TRUE coded dimensions (the tkhd/stsd dims are writer-supplied
# and routinely lie in crawl corpora — anamorphic, rotated, or plain
# wrong). A curation pipeline filters on profile/level/dims to route
# payloads to real decoders; this tier computes them with zero codec
# libraries. ISO 14496-15 §5.3.3.1 (avcC), §8.3.3.1 (hvcC);
# ITU-T H.264 §7.3.2.1.1 (SPS RBSP syntax).


class _BitReader:
    """MSB-first bit reader with Exp-Golomb (ue/se) decode over an RBSP.
    Every read is bounds-checked: running off the end raises ValueError
    (hostile-input posture matching the box walker)."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit cursor

    def u(self, n: int) -> int:
        if self._pos + n > 8 * len(self._d):
            raise ValueError("SPS: bit read past end of RBSP")
        v = 0
        for _ in range(n):
            byte = self._d[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("SPS: Exp-Golomb code exceeds 32 bits")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _strip_emulation(data: bytes) -> bytes:
    """NAL → RBSP: drop the 0x03 of every 00 00 03 emulation-prevention
    sequence (H.264 §7.4.1)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


_AVC_PROFILES = {66: "Baseline", 77: "Main", 88: "Extended", 100: "High",
                 110: "High 10", 122: "High 4:2:2", 244: "High 4:4:4",
                 44: "CAVLC 4:4:4"}
_HEVC_PROFILES = {1: "Main", 2: "Main 10", 3: "Main Still Picture"}
# profile_idc values whose SPS carries the chroma/bit-depth block
_AVC_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128,
                      138, 139, 134, 135}


def _parse_avc_sps(sps: bytes) -> dict:
    """profile/level + true coded WxH from an H.264 sequence parameter
    set (§7.3.2.1.1): macroblock grid minus the frame-cropping window,
    with chroma-format-dependent crop units. Parses every field up to
    frame_cropping (incl. scaling lists) so the bit cursor is exact."""
    if not sps or (sps[0] & 0x1F) != 7:
        raise ValueError("avcC: first SPS NAL is not nal_unit_type 7")
    r = _BitReader(_strip_emulation(sps[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint_set flags + reserved_zero_2bits
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # default 4:2:0 when the block is absent
    separate_colour_plane = 0
    if profile_idc in _AVC_HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            n_lists = 12 if chroma_format_idc == 3 else 8
            for i in range(n_lists):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = last if nxt == 0 else nxt
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    width = w_mbs * 16
    height = (2 - frame_mbs_only) * h_units * 16
    if r.u(1):  # frame_cropping_flag
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        if chroma_format_idc == 0 or separate_colour_plane:
            cux, cuy = 1, 2 - frame_mbs_only
        else:
            sub_w = 1 if chroma_format_idc == 3 else 2
            sub_h = 2 if chroma_format_idc == 1 else 1
            cux, cuy = sub_w, sub_h * (2 - frame_mbs_only)
        width -= cux * (left + right)
        height -= cuy * (top + bottom)
    if width <= 0 or height <= 0:
        raise ValueError("SPS: cropping window exceeds the coded frame")
    return {"profile_idc": profile_idc, "level_idc": level_idc,
            "width": width, "height": height}


def _parse_hevc_sps(sps: bytes) -> dict:
    """True coded WxH from an H.265 sequence parameter set (ITU-T H.265
    §7.3.2.2.1): profile_tier_level is a fixed 12-byte block plus
    per-sub-layer presence flags, then pic_width/height_in_luma_samples
    (ue) minus the conformance window in chroma sub-sampling units."""
    if len(sps) < 2 or ((sps[0] >> 1) & 0x3F) != 33:
        raise ValueError("hvcC: NAL is not nal_unit_type 33 (SPS)")
    r = _BitReader(_strip_emulation(sps[2:]))  # 2-byte HEVC NAL header
    r.u(4)  # sps_video_parameter_set_id
    max_sub_layers_minus1 = r.u(3)
    r.u(1)  # sps_temporal_id_nesting_flag
    # profile_tier_level(1, max_sub_layers_minus1)
    r.u(2 + 1 + 5)      # profile_space / tier / profile_idc
    r.u(32)             # general_profile_compatibility_flags
    r.u(48)             # progressive/interlaced/non-packed/frame-only
    #                     + general_reserved_zero_43bits + inbld flag
    r.u(8)              # general_level_idc
    profile_present = [r.u(1) for _ in range(max_sub_layers_minus1)]
    level_present = [r.u(1) for _ in range(max_sub_layers_minus1)]
    if max_sub_layers_minus1 > 0:
        for _ in range(max_sub_layers_minus1, 8):
            r.u(2)      # reserved_zero_2bits
    for i in range(max_sub_layers_minus1):
        if profile_present[i]:
            r.u(88)
        if level_present[i]:
            r.u(8)
    r.ue()  # sps_seq_parameter_set_id
    chroma_format_idc = r.ue()
    if chroma_format_idc == 3:
        r.u(1)  # separate_colour_plane_flag
    width = r.ue()   # pic_width_in_luma_samples
    height = r.ue()  # pic_height_in_luma_samples
    if r.u(1):       # conformance_window_flag
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        width -= sub_w * (left + right)
        height -= sub_h * (top + bottom)
    if width <= 0 or height <= 0:
        raise ValueError("HEVC SPS: conformance window exceeds the frame")
    return {"width": width, "height": height}


def _parse_codec_config(payload: bytes, body: int, end: int) -> dict:
    """Scan a VisualSampleEntry's child boxes (past the 78-byte fixed
    header) for avcC/hvcC and return codec_profile / codec_level /
    coded_width / coded_height (SPS-derived for H.264; record fields
    for H.265, whose coded dims would need an HEVC SPS parse — profile
    and level are fixed-offset there). Unknown/absent config → {}."""
    kids = body + 78
    if kids + 8 > end:
        return {}
    for t, b, e in _scan_boxes(payload, kids, end):
        if t == b"avcC":
            if e - b < 7:
                raise ValueError("avcC: record shorter than its fixed header")
            profile_idc = payload[b + 1]
            level_idc = payload[b + 3]
            out = {
                "codec_profile": _AVC_PROFILES.get(
                    profile_idc, f"avc profile {profile_idc}"),
                "codec_level": level_idc / 10.0,
            }
            n_sps = payload[b + 5] & 0x1F
            p = b + 6
            if n_sps:
                ln = _be(payload, p, 2, e)
                if p + 2 + ln > e:
                    raise ValueError("avcC: SPS length overruns the record")
                sps = _parse_avc_sps(payload[p + 2:p + 2 + ln])
                out["coded_width"] = sps["width"]
                out["coded_height"] = sps["height"]
            return out
        if t == b"hvcC":
            if e - b < 13:
                raise ValueError("hvcC: record shorter than its fixed header")
            profile_idc = payload[b + 1] & 0x1F
            tier = "High" if payload[b + 1] & 0x20 else "Main"
            level_idc = payload[b + 12]
            out = {
                "codec_profile": "hevc " + _HEVC_PROFILES.get(
                    profile_idc, f"profile {profile_idc}") + f" ({tier} tier)",
                "codec_level": level_idc / 30.0,
            }
            # NAL-unit arrays start after the 22-byte fixed record
            # (ISO 14496-15 §8.3.3.1); find the SPS array (type 33)
            # and parse its first NAL for the true coded dims
            if e - b >= 23:
                p = b + 23
                for _ in range(payload[b + 22]):  # numOfArrays
                    if p + 3 > e:
                        raise ValueError("hvcC: truncated NAL array header")
                    nal_type = payload[p] & 0x3F
                    n_nalus = _be(payload, p + 1, 2, e)
                    p += 3
                    for _ in range(n_nalus):
                        ln = _be(payload, p, 2, e)
                        if p + 2 + ln > e:
                            raise ValueError(
                                "hvcC: NAL length overruns the record")
                        if nal_type == 33:
                            out.update(
                                _parse_hevc_sps(payload[p + 2:p + 2 + ln]))
                            out["coded_width"] = out.pop("width")
                            out["coded_height"] = out.pop("height")
                            return out
                        p += 2 + ln
            return out
    return {}


class _BitWriter:
    """MSB-first bit writer with Exp-Golomb encode — the write-side
    twin of _BitReader, so avc1 fixtures carry REAL SPS bitstreams."""

    def __init__(self):
        self._bits: list[int] = []

    def u(self, v: int, n: int):
        self._bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

    def ue(self, v: int):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def rbsp(self) -> bytes:
        bits = self._bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def make_avc_config(width: int, height: int, profile_idc: int = 100,
                    level_idc: int = 40) -> bytes:
    """A spec-valid AVCDecoderConfigurationRecord whose embedded SPS
    encodes exactly `width`×`height` (4:2:0, frame_mbs_only): the
    macroblock grid rounds up to 16 and the frame-cropping window trims
    the remainder in 2-pixel chroma units — so dims must be even, the
    4:2:0 constraint every real encoder enforces. The write-side twin
    of _parse_codec_config/_parse_avc_sps; lets a declarable corpus
    carry real H.264 codec configs with no codec library."""
    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError(f"avc 4:2:0 dims must be positive and even: "
                         f"{width}x{height}")
    w_mbs = -(-width // 16)
    h_units = -(-height // 16)
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)                 # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)                   # seq_parameter_set_id
    if profile_idc in _AVC_HIGH_PROFILES:
        w.ue(1)               # chroma_format_idc 4:2:0
        w.ue(0)               # bit_depth_luma_minus8
        w.ue(0)               # bit_depth_chroma_minus8
        w.u(0, 1)             # qpprime_y_zero_transform_bypass
        w.u(0, 1)             # seq_scaling_matrix_present
    w.ue(0)                   # log2_max_frame_num_minus4
    w.ue(0)                   # pic_order_cnt_type = 0
    w.ue(0)                   # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)                   # max_num_ref_frames
    w.u(0, 1)                 # gaps_in_frame_num_value_allowed
    w.ue(w_mbs - 1)
    w.ue(h_units - 1)
    w.u(1, 1)                 # frame_mbs_only_flag
    w.u(1, 1)                 # direct_8x8_inference_flag
    crop_r = (w_mbs * 16 - width) // 2
    crop_b = (h_units * 16 - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)             # frame_cropping_flag
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)                 # vui_parameters_present_flag
    sps = b"\x67" + w.rbsp()
    pps = b"\x68\xce\x38\x80"
    return (bytes([1, profile_idc, 0, level_idc, 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)


def make_hevc_config(width: int, height: int, level_idc: int = 120) -> bytes:
    """A spec-valid HEVCDecoderConfigurationRecord (hvcC) whose SPS NAL
    array encodes exactly `width`×`height`: luma samples round up to
    the 8-pixel minimum coding block and the conformance window trims
    the remainder in 4:2:0 chroma units (even dims required). The
    write-side twin of the hvcC/_parse_hevc_sps path."""
    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError(f"hevc 4:2:0 dims must be positive and even: "
                         f"{width}x{height}")
    luma_w = -(-width // 8) * 8
    luma_h = -(-height // 8) * 8
    w = _BitWriter()
    w.u(0, 4)             # sps_video_parameter_set_id
    w.u(0, 3)             # sps_max_sub_layers_minus1
    w.u(1, 1)             # sps_temporal_id_nesting_flag
    # profile_tier_level: space/tier/profile, compat, flags, level
    w.u(0, 2)
    w.u(0, 1)             # Main tier
    w.u(1, 5)             # general_profile_idc = Main
    w.u(1 << 30, 32)      # compatibility: Main profile bit
    w.u(1 << 47, 48)      # general_progressive_source_flag + reserved
    w.u(level_idc, 8)
    w.ue(0)               # sps_seq_parameter_set_id
    w.ue(1)               # chroma_format_idc 4:2:0
    w.ue(luma_w)          # pic_width_in_luma_samples
    w.ue(luma_h)          # pic_height_in_luma_samples
    crop_r = (luma_w - width) // 2
    crop_b = (luma_h - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)         # conformance_window_flag
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    sps = bytes([33 << 1, 1]) + w.rbsp()
    fixed = (bytes([1, 0x01]) + struct.pack(">I", 1 << 30)
             + (1 << 47).to_bytes(6, "big") + bytes([level_idc])
             + b"\xf0\x00\xfc\xfd\xf8\xf8" + b"\x00\x00" + bytes([0x03]))
    assert len(fixed) == 22
    return (fixed + bytes([1])                     # numOfArrays
            + bytes([0x80 | 33]) + struct.pack(">H", 1)  # SPS array, 1 NAL
            + struct.pack(">H", len(sps)) + sps)


def mux_minimal_mp4(frames: list[bytes], w: int, h: int, fps: int = 25,
                    codec: bytes = b"jpeg",
                    codec_config: tuple[bytes, bytes] | None = None,
                    stss_samples: list[int] | None = None) -> bytes:
    """Minimal spec-valid MP4 writer (ftyp + moov[mvhd, trak[tkhd,
    mdia[mdhd, hdlr, minf[stbl[stsd/stsz/stts/stsc/stco]]]]] + mdat) —
    the ISO-BMFF twin of mux_mjpeg_avi, so tests can round-trip the box
    walker without ffmpeg. `stss_samples` (1-based sample numbers)
    writes an explicit sync-sample box; None keeps the box absent
    (ISO semantics: every sample is sync)."""
    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    def full(typ: bytes, ver: int, body: bytes) -> bytes:
        return box(typ, bytes([ver, 0, 0, 0]) + body)

    timescale = fps
    dur = len(frames)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = full(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, dur)
                + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = full(b"tkhd", 0, struct.pack(">IIII", 0, 0, 1, 0)
                + struct.pack(">I", dur) + b"\x00" * 8
                + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", w << 16, h << 16))
    mdhd = full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale, dur,
                                        0x55C4, 0))
    hdlr = full(b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                + b"Video\x00")
    # Visual sample entry: 6 reserved + data_ref_index, then the fixed
    # VisualSampleEntry fields (dims at offset 24 of the entry body).
    entry_body = (b"\x00" * 6 + struct.pack(">H", 1)
                  + struct.pack(">HHIII", 0, 0, 0, 0, 0)
                  + struct.pack(">HH", w, h)
                  + struct.pack(">II", 0x00480000, 0x00480000)
                  + struct.pack(">I", 0) + struct.pack(">H", 1)
                  + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    if codec_config is not None:
        cfg_type, cfg_bytes = codec_config
        entry_body += box(cfg_type, cfg_bytes)
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + box(codec, entry_body))
    stts = full(b"stts", 0, struct.pack(">III", 1, len(frames), 1))
    stsc = full(b"stsc", 0, struct.pack(">IIII", 1, 1, len(frames), 1))
    stsz = full(b"stsz", 0, struct.pack(">II", 0, len(frames))
                + b"".join(struct.pack(">I", len(f)) for f in frames))
    stss = (b"" if stss_samples is None else
            full(b"stss", 0, struct.pack(">I", len(stss_samples))
                 + b"".join(struct.pack(">I", s) for s in stss_samples)))
    # one chunk holding all samples; offset filled after sizing moov
    stco_body = struct.pack(">I", 1) + struct.pack(">I", 0)
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stss
               + full(b"stco", 0, stco_body))
    minf = box(b"minf", box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
               + box(b"dinf", full(b"dref", 0, struct.pack(">I", 1)
                                   + full(b"url ", 1, b"")))
               + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    mdat_payload = b"".join(frames)
    # rewrite the stco chunk offset now that ftyp+moov sizes are known
    chunk_off = len(ftyp) + len(moov) + 8
    moov = moov.replace(
        full(b"stco", 0, stco_body),
        full(b"stco", 0, struct.pack(">II", 1, chunk_off)), 1,
    )
    return ftyp + moov + box(b"mdat", mdat_payload)


def _parse_avi_meta(payload: bytes) -> dict:
    """Container metadata from the RIFF/AVI header list: avih dims +
    frame count, strh codec fourcc + rate, duration from the
    microseconds-per-frame field."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos, end = 12, len(payload)
    usec_pf = n_frames = w = h = 0
    codec = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = pos + 8
        if cid == b"LIST" and payload[body:body + 4] in (b"hdrl", b"strl"):
            pos = body + 4  # descend
            end = min(body + size, end)
            continue
        if cid == b"avih" and size >= 40:
            usec_pf, _, _, _, n_frames = struct.unpack(
                "<5I", payload[body:body + 20])
            w, h = struct.unpack("<2I", payload[body + 32:body + 40])
        elif cid == b"strh" and size >= 8:
            if payload[body:body + 4] == b"vids":
                codec = payload[body + 4:body + 8].decode("latin-1")
        pos = body + size + (size % 2)
    if not w or not h:
        raise ValueError("AVI header list has no avih dimensions")
    return {
        "track_id": 1, "handler": "vide", "codec": codec,
        "width": float(w), "height": float(h),
        "duration_s": n_frames * usec_pf / 1e6 if usec_pf else None,
        "n_samples": n_frames,
        # RIFF keeps no cheap sample-table analog in the header list
        # (idx1 sits after movi); the MP4/Y4M tiers carry these
        "n_keyframes": None, "avg_sample_size": None,
        "max_sample_size": None, "bitrate_bps": None,
        "n_chunks": None, "mdat_truncated": None,
    }


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("track_id", T.IntegerType()),
        T.StructField("handler", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
        # sample-table tier (MP4 stss/stsz/stco; Y4M from the frame
        # splitter; AVI reports null where RIFF has no cheap source)
        T.StructField("n_keyframes", T.LongType()),
        T.StructField("avg_sample_size", T.DoubleType()),
        T.StructField("max_sample_size", T.LongType()),
        T.StructField("bitrate_bps", T.DoubleType()),
        T.StructField("n_chunks", T.LongType()),
        T.StructField("mdat_truncated", T.BooleanType()),
        # codec-config tier (avcC/hvcC in stsd): profile/level from the
        # decoder configuration record; coded dims from the H.264 SPS
        # when present (the authoritative values — stsd/tkhd dims are
        # writer-supplied), else the VisualSampleEntry fixed fields
        T.StructField("codec_profile", T.StringType()),
        T.StructField("codec_level", T.DoubleType()),
        T.StructField("coded_width", T.LongType()),
        T.StructField("coded_height", T.LongType()),
    ]
)

# permissive mode: same columns + the quarantine reason
VIDEO_META_PERMISSIVE_SCHEMA = T.StructType(
    list(VIDEO_META_SCHEMA.fields) + [T.StructField("error", T.StringType())]
)


def video_metadata(media: DataFrame, permissive: bool = False) -> DataFrame:
    """One row per video TRACK: container kind, codec fourcc, display
    dims, duration, sample count — the fields a curation pipeline
    filters on before any pixel ever decodes. MP4/ISO-BMFF (moov box
    walk), RIFF/AVI (header list), and YUV4MPEG2 (stream header) are
    parsed for real.

    Failure mode is the caller's choice, same contract as Spark's own
    PERMISSIVE/FAILFAST readers: by default a malformed container fails
    the task loudly (ValueError); with `permissive=True` the output
    gains an `error` column and each unparsable payload becomes ONE
    quarantine row (null metadata + the reason) while good payloads
    parse normally — the shape a mixed crawl corpus needs."""

    def meta_rows(doc_id: int, raw: bytes) -> list[dict]:
        if raw[:4] == b"RIFF":
            return [dict(_parse_avi_meta(raw), container="avi")]
        if raw[:9] == b"YUV4MPEG2":
            frames = _parse_y4m_frames(raw)
            nl = raw.find(b"\x0a")
            tags = dict((t[:1], t[1:]) for t in raw[9:nl].split())
            w, h = int(tags[b"W"]), int(tags[b"H"])
            num, den = 25, 1
            if b"F" in tags and b":" in tags[b"F"]:
                num, den = (int(x) for x in tags[b"F"].split(b":"))
            dur = len(frames) * den / num if num else None
            total = sum(len(f) for f in frames)
            return [{
                "track_id": 1, "handler": "vide", "codec": "rawvideo",
                "width": float(w), "height": float(h),
                "duration_s": dur,
                "n_samples": len(frames), "container": "y4m",
                # every raw frame is independently decodable
                "n_keyframes": len(frames),
                "avg_sample_size": total / len(frames) if frames else None,
                "max_sample_size": max((len(f) for f in frames), default=None),
                "bitrate_bps": 8.0 * total / dur if dur else None,
                "n_chunks": None, "mdat_truncated": None,
            }]
        return [dict(t, container="mp4") for t in _parse_mp4_tracks(raw)]

    schema = VIDEO_META_PERMISSIVE_SCHEMA if permissive else VIDEO_META_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                try:
                    for r in meta_rows(int(doc_id), bytes(blob)):
                        rows.append({"doc_id": int(doc_id), **r,
                                     **({"error": None} if permissive else {})})
                except (ValueError, struct.error, IndexError, KeyError) as e:
                    # struct.error/IndexError/KeyError: a truncated or
                    # hostile container whose declared chunk sizes
                    # overrun the payload — the jpeg_decode_pixels
                    # untrusted-input contract: one quarantine row per
                    # bad payload, never a failed task.
                    if not permissive:
                        if isinstance(e, ValueError):
                            raise
                        raise ValueError(f"malformed container: {e}") from e
                    rows.append({"doc_id": int(doc_id), "error": str(e)})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(batches, schema)


def mux_mjpeg_avi(frames: list[bytes], w: int, h: int, fps: int = 25) -> bytes:
    """Minimal spec-valid MJPEG AVI writer (RIFF avih/strl headers +
    movi 00dc chunks + idx1). Exists so video-pipeline tests can build
    real containers without ffmpeg; also the demux round-trip twin."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) % 2))

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<14I", 10**6 // fps, 0, 0, 0x10, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    # dwFlags..dwSampleSize (AVISTREAMHEADER after fccType/fccHandler):
    # flags, prio+lang, initialFrames, scale, rate, start, length,
    # bufSize, quality, sampleSize, then rcFrame.
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), 0, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthetic_videos(documents: DataFrame, n_frames: int = 3,
                     w: int = 16, h: int = 16,
                     container: str = "avi") -> DataFrame:
    """Deterministic video payload per document: each frame is the
    doc's text bytes tiled into an h×w grayscale image (shifted per
    frame), JPEG-encoded and muxed. Pure functions of the text — stable
    across runs/partitions — so the video pipeline has a declarable
    corpus without external media files. `container`: 'avi' (MJPEG
    RIFF), 'mp4' (ISO-BMFF, jpeg sample entries), 'mixed' (doc_id
    parity picks — exercises both demux paths in one corpus), or
    'avc1' (ISO-BMFF with a REAL H.264 codec config: per-doc coded
    dims `(w + 2*(doc_id%8)) x (h + 2*(doc_id%6))` are encoded into an
    SPS via make_avc_config and the sample payloads are opaque access
    units — honest about the pure-Python boundary, pixel decode needs
    a codec library; the metadata tier is fully real)."""
    import numpy as np

    if container not in ("avi", "mp4", "mixed", "avc1"):
        raise ValueError(f"container must be avi/mp4/mixed/avc1: "
                         f"{container!r}")

    def one(doc_id: int, raw: bytes) -> tuple[bytes, str]:
        from aws_data_pipeline_ads_spark.operators.jpeg import jpeg_encode_pixels

        raw = raw or b"\x00"
        if container == "avc1":
            wi = w + 2 * (doc_id % 8)
            hi = h + 2 * (doc_id % 6)
            aus = [hashlib.sha256(raw + bytes([i])).digest()
                   for i in range(n_frames)]
            payload = mux_minimal_mp4(
                aus, wi, hi, codec=b"avc1",
                codec_config=(b"avcC", make_avc_config(wi, hi)))
            return payload, "video/mp4;avc1"
        # frame i reads bytes [i, i + w*h): size the tiled buffer for the
        # LAST frame's end (w*h + n_frames), not just w*h — with a short
        # doc and n_frames > 3 an undersized buffer would fail reshape
        need = w * h + n_frames
        src = np.frombuffer(raw * (need // len(raw) + 1), np.uint8)
        frames = [
            jpeg_encode_pixels(src[i:i + w * h].reshape(h, w).copy())
            for i in range(n_frames)
        ]
        kind = container if container != "mixed" else (
            "mp4" if doc_id % 2 else "avi")
        if kind == "mp4":
            return mux_minimal_mp4(frames, w, h), "video/mp4;jpeg"
        return mux_mjpeg_avi(frames, w, h), "video/x-msvideo;mjpeg"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = [one(int(d), str(t).encode())
                    for d, t in zip(pdf["doc_id"], pdf["text"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [v for v, _ in vids],
                    "meta": [
                        {
                            "media_type": mt,
                            "n_bytes": len(v),
                            "sha256": hashlib.sha256(v).hexdigest(),
                        }
                        for v, mt in vids
                    ],
                }
            )

    return documents.select("doc_id", "text").mapInPandas(batches, MEDIA_SCHEMA)


VIDEO_FRAME_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def video_frame_features(media: DataFrame, n_frames: int = 3,
                         frame_decoder=None,
                         sync_only: bool = False) -> DataFrame:
    """The full real video pipeline in one declared stage: container
    demux (RIFF/AVI chunk walk, MP4 sample-table byte ranges, Y4M frame
    split) → evenly-spaced frame sample → pixel decode → per-frame
    luminance features. Arrow-batched, pixels never shuffle — only
    (doc_id, frame_no, dims, mean) rows leave the stage.

    `frame_decoder` is THE one sanctioned codec-library boundary in
    this repo: a callable `bytes -> HxWxC uint8 ndarray` applied to
    each demuxed sample. Default None = the built-in pure-Python
    baseline/progressive JPEG decoder, so MJPEG-AVI and MJPEG-in-MP4
    corpora decode end-to-end with no libraries (Y4M demuxes to RAW
    planar YCbCr frames — route them through an injected decoder, the
    default JPEG path rejects them loudly). For inter-coded
    codecs (H.264/H.265 — the dominant crawl format) the sample tier
    already computes EXACT per-sample byte ranges (stsc/stco/stsz, with
    `sync_only=True` restricting to stss keyframes); inject e.g. a
    PyAV/ffmpeg wrapper here and every downstream feature works
    unchanged. Decoder exceptions propagate (the caller chose the
    codec boundary; a quarantine wrapper belongs in the decoder)."""
    import numpy as np

    from aws_data_pipeline_ads_spark.operators.jpeg import jpeg_decode_pixels

    decode = frame_decoder if frame_decoder is not None else jpeg_decode_pixels

    def demux(raw: bytes) -> list[bytes]:
        if raw[:4] == b"RIFF":
            return _parse_avi_frames(raw)
        if raw[:9] == b"YUV4MPEG2":
            return _parse_y4m_frames(raw)
        return _parse_mp4_frames(raw, sync_only=sync_only)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_no": [], "width": [], "height": [],
                "mean_luma": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                fs = demux(bytes(blob))
                if len(fs) > n_frames:
                    fs = [fs[(i * len(fs)) // n_frames] for i in range(n_frames)]
                for i, fr in enumerate(fs):
                    px = np.asarray(decode(fr)).astype(np.float64)
                    luma = (px[:, :, 0] if px.shape[2] == 1
                            else 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                            + 0.114 * px[:, :, 2])
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["mean_luma"].append(round(float(luma.mean()), 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, VIDEO_FRAME_FEATURES)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def image_dhash(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: 9×8 luminance grid,
    bit = left pixel brighter than right neighbor → 64-bit fingerprint.
    Near-duplicate images differ in a few bits (the image-side analogue
    of SimHash on text).

    The luminance grid comes from the decode stage: with the fake
    decoder it is a deterministic 72-byte stride sample of the payload
    (same contract as resize_images); `use_fake_decoder=False` runs the
    real PNG pixel path — _png_decode_pixels → BT.601 luminance →
    9×8 nearest-neighbor grid — with no codec library. Hamming
    distance and candidate banding run JVM-side on the hash —
    only THIS stage pays the Python/Arrow toll, and it emits 8 bytes
    per image into the shuffle, never pixels.
    """

    def grid_of(raw: bytes) -> bytes:
        if use_fake_decoder:
            if len(raw) >= 72:
                step = len(raw) // 72
                return raw[::step][:72]
            return raw + b"\x00" * (72 - len(raw))
        import numpy as np

        px = _nn_resize(_png_decode_pixels(raw), 9, 8).astype(np.float64)
        if px.shape[2] >= 3:  # RGB(A) → BT.601 luma; alpha ignored
            luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        else:
            luma = px[:, :, 0]
        return bytes(np.clip(luma, 0, 255).astype(np.uint8).reshape(-1))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for blob in pdf["content"]:
                grid = grid_of(bytes(blob))
                h = 0
                for row in range(8):
                    for col in range(8):
                        bit = grid[row * 9 + col] > grid[row * 9 + col + 1]
                        h = (h << 1) | int(bit)
                # two's-complement into signed 64-bit (Spark LongType)
                if h >= 1 << 63:
                    h -= 1 << 64
                hashes.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "dhash": hashes})

    return media.mapInPandas(batches, DHASH_SCHEMA)


def dhash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs by banded LSH over the 64-bit dHash, verified
    exactly by Hamming distance — the simhash_pairs posture on images.

    4 bands × 16 bits: any pair at Hamming ≤ 3 has ≥ 1 intact band
    (pigeonhole), so recall is EXACT at the default threshold. The self-
    join is equi on (band_no, band): linear candidates, never all-pairs;
    only (doc_id, 8-byte hash) crosses the exchange. All JVM bit ops.
    """
    bands = hashes.select(
        "doc_id", "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_no"),
                    F.shiftrightunsigned("dhash", 16 * i)
                    .bitwiseAND(F.lit(0xFFFF)).alias("band"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("doc_id", "dhash", "b.band_no", "b.band")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    return (
        a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


AUDIO_SPECTRAL = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("rolloff_hz", T.DoubleType()),
        T.StructField("dominant_hz", T.DoubleType()),
    ]
)


def audio_spectral_features(media: DataFrame, sample_rate: int = 16000,
                            use_fake_decoder: bool = True,
                            max_fft: int = 1 << 16) -> DataFrame:
    """Spectral audio descriptors per payload: zero-crossing rate,
    spectral centroid, 85% rolloff, dominant frequency — the signals a
    training pipeline filters audio corpora on (silence/tone/noise
    screens) before expensive transcription.

    Same decode contract as extract_audio_features (headerless PCM or
    real RIFF/WAVE); the spectrum is a numpy rFFT over the first
    `max_fft` samples (bounded work per clip regardless of length —
    features of a 10 s prefix screen as well as the full clip and keep
    per-row cost flat), vectorized per Arrow batch. Deterministic:
    rFFT of identical input is bit-stable on a given BLAS, and the
    features are ratios over the magnitude spectrum — pinned by a
    synthetic-sine golden pytest rather than an oracle (complex FFT is
    not SQL-expressible).
    """
    import numpy as np

    def decode(raw: bytes):
        if use_fake_decoder:
            pcm = np.frombuffer(raw[: len(raw) - len(raw) % 2], dtype="<i2")
            return sample_rate, pcm.astype("float64") / 32768.0
        return _parse_wav(raw)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("n_samples", "duration_s", "rms", "zcr",
                                   "spectral_centroid_hz", "rolloff_hz",
                                   "dominant_hz")}
            for blob in pdf["content"]:
                rate, s = decode(bytes(blob))
                n = len(s)
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate)
                if n == 0:
                    for k in ("rms", "zcr", "spectral_centroid_hz",
                              "rolloff_hz", "dominant_hz"):
                        out[k].append(0.0)
                    continue
                out["rms"].append(float(np.sqrt(np.mean(s ** 2))))
                out["zcr"].append(
                    float(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1])))
                    * rate / max(n - 1, 1)
                )
                w = s[:max_fft]
                mag = np.abs(np.fft.rfft(w))
                freqs = np.fft.rfftfreq(len(w), d=1.0 / rate)
                total = float(mag.sum())
                if total <= 0.0:
                    for k in ("spectral_centroid_hz", "rolloff_hz",
                              "dominant_hz"):
                        out[k].append(0.0)
                    continue
                out["spectral_centroid_hz"].append(
                    float((freqs * mag).sum() / total)
                )
                cum = np.cumsum(mag)
                out["rolloff_hz"].append(
                    float(freqs[int(np.searchsorted(cum, 0.85 * total))])
                )
                out["dominant_hz"].append(float(freqs[int(np.argmax(mag))]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **out})

    return media.mapInPandas(batches, AUDIO_SPECTRAL)


AUDIO_SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("segment_no", T.IntegerType()),
        T.StructField("start_s", T.DoubleType()),
        T.StructField("end_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_segments(media: DataFrame, frame_ms: int = 20,
                   threshold: float = 0.02, min_frames: int = 2,
                   sample_rate: int = 16000,
                   use_fake_decoder: bool = True) -> DataFrame:
    """Energy-based segmentation (the VAD-ish stage a speech pipeline
    runs before transcription): frame the signal at `frame_ms`, mark
    frames whose RMS exceeds `threshold`, merge contiguous active
    frames into segments, drop segments shorter than `min_frames`.
    Emits one row per segment (1→N explosion like sample_frames).

    Same decode contract as extract_audio_features (headerless PCM or
    real RIFF/WAVE via use_fake_decoder=False); per-clip work is one
    vectorized reshape + per-frame RMS — no Python loop over samples.
    Deterministic, pinned by a constructed silence/tone golden test
    (frame algebra is not SQL-expressible over a VARCHAR corpus)."""
    import numpy as np

    def decode(raw: bytes):
        if use_fake_decoder:
            pcm = np.frombuffer(raw[: len(raw) - len(raw) % 2], dtype="<i2")
            return sample_rate, pcm.astype("float64") / 32768.0
        return _parse_wav(raw)

    def segments_of(rate: int, s) -> list[tuple[float, float, float]]:
        spf = max(1, rate * frame_ms // 1000)
        n_frames = len(s) // spf
        if n_frames == 0:
            return []
        frames = s[: n_frames * spf].reshape(n_frames, spf)
        rms = np.sqrt((frames * frames).mean(axis=1))
        active = rms > threshold
        segs = []
        start = None
        for i, a in enumerate(list(active) + [False]):  # sentinel closes
            if a and start is None:
                start = i
            elif not a and start is not None:
                if i - start >= min_frames:
                    seg_rms = float(np.sqrt(
                        (frames[start:i] ** 2).mean()))
                    segs.append((start * spf / rate, i * spf / rate,
                                 round(seg_rms, 6)))
                start = None
        return segs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                rate, s = decode(bytes(blob))
                for j, (a, b, r) in enumerate(segments_of(rate, s)):
                    rows.append({"doc_id": int(doc_id), "segment_no": j,
                                 "start_s": round(a, 6), "end_s": round(b, 6),
                                 "rms": r})
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SEGMENTS_SCHEMA.fields]
            )

    return media.mapInPandas(batches, AUDIO_SEGMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# MP3 frame-header triage — the audio twin of the MP4/EXIF metadata tiers.
#
# MPEG audio frames are self-describing: a 4-byte header carries
# version/layer/bitrate/samplerate/padding, from which the frame length
# is computable, so the whole stream can be WALKED without decoding a
# single sample (ISO/IEC 11172-3). A curation pipeline filters crawl
# audio on bitrate floors, duration bounds, and CBR/VBR before any
# decoder runs. ID3v2 tags (syncsafe length prefix) are skipped, not
# parsed. Honest boundary: pixel... sample decode (MDCT synthesis)
# needs a real codec; this tier never claims it.

_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                      160, 192, 224, 256, 320]
_MP3_RATES_V1 = [44100, 48000, 32000]


def _parse_mp3_meta(payload: bytes) -> dict:
    """Walk every MPEG-1 Layer III frame header: n_frames, duration
    (1152 samples/frame), first-frame bitrate, CBR/VBR flag, ID3v2
    presence. Bounds-checked; a sync loss mid-stream or a frame
    running past the payload raises ValueError (truncated download —
    the corrupt-stream detector)."""
    pos = 0
    has_id3 = payload[:3] == b"ID3"
    if has_id3:
        if len(payload) < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("mp3: ID3v2 size byte has high bit set")
            size = (size << 7) | b
        pos = 10 + size
        if pos > len(payload):
            raise ValueError("mp3: ID3v2 tag extends past payload")
    n_frames = 0
    bitrates = set()
    sample_rate = None
    first_bitrate = None
    while pos + 4 <= len(payload):
        h = payload[pos:pos + 4]
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            raise ValueError(
                f"mp3: lost frame sync at byte {pos} "
                f"(frame {n_frames})"
            )
        version = (h[1] >> 3) & 0x3
        layer = (h[1] >> 1) & 0x3
        if version != 3 or layer != 1:
            raise ValueError("mp3: only MPEG-1 Layer III is triaged")
        br_idx = (h[2] >> 4) & 0xF
        sr_idx = (h[2] >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("mp3: free-format/bad bitrate or rate index")
        bitrate = _MP3_BITRATES_V1L3[br_idx]
        rate = _MP3_RATES_V1[sr_idx]
        if sample_rate is None:
            sample_rate, first_bitrate = rate, bitrate
        elif rate != sample_rate:
            raise ValueError("mp3: sample rate changes mid-stream")
        padding = (h[2] >> 1) & 0x1
        frame_len = 144 * bitrate * 1000 // rate + padding
        if pos + frame_len > len(payload):
            raise ValueError(
                f"mp3: frame {n_frames} extends past the payload "
                f"(truncated download?)"
            )
        bitrates.add(bitrate)
        n_frames += 1
        pos += frame_len
        if n_frames > 4_000_000:
            raise ValueError("mp3: frame-count bomb")
    if n_frames == 0:
        raise ValueError("mp3: no MPEG audio frames")
    return {
        "codec": "mp3", "n_frames": n_frames,
        "sample_rate": sample_rate, "bitrate_kbps": first_bitrate,
        "vbr": len(bitrates) > 1, "has_id3": has_id3,
        # integer micros: exact in any engine (1152 samples per
        # MPEG-1 Layer III frame)
        "duration_us": n_frames * 1152 * 1_000_000 // sample_rate,
    }


def make_mp3(n_frames: int, bitrate_kbps: int = 128,
             sample_rate: int = 44100, id3: bool = False,
             vbr_second_rate: int | None = None) -> bytes:
    """Header-valid MPEG-1 Layer III stream (zero audio payload — the
    triage tier reads only headers, and a header walker is exactly what
    this exercises): n_frames frames at bitrate_kbps, optional ID3v2
    shell, optional alternating second bitrate to fabricate VBR."""
    br_rev = {v: i for i, v in enumerate(_MP3_BITRATES_V1L3)}
    sr_rev = {v: i for i, v in enumerate(_MP3_RATES_V1)}
    if bitrate_kbps not in br_rev or sample_rate not in sr_rev:
        raise ValueError("mp3: unsupported bitrate/sample rate")
    out = bytearray()
    if id3:
        body = b"\x00" * 17
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body
    for i in range(n_frames):
        br = bitrate_kbps
        if vbr_second_rate is not None and i % 2:
            br = vbr_second_rate
        h = bytes([
            0xFF,
            0xE0 | (3 << 3) | (1 << 1),          # MPEG-1, Layer III
            (br_rev[br] << 4) | (sr_rev[sample_rate] << 2),
            0x00,
        ])
        frame_len = 144 * br * 1000 // sample_rate
        out += h + b"\x00" * (frame_len - 4)
    return bytes(out)


MP3_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("codec", T.StringType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("bitrate_kbps", T.IntegerType()),
    T.StructField("vbr", T.BooleanType()),
    T.StructField("has_id3", T.BooleanType()),
    T.StructField("duration_us", T.LongType()),
    T.StructField("error", T.StringType()),
])


def audio_mp3_metadata(media: DataFrame,
                       permissive: bool = True) -> DataFrame:
    """Per-payload MP3 triage over (doc_id, content): Arrow-batched
    mapInPandas, headers only, PERMISSIVE quarantine by default (the
    mixed-crawl contract shared with video_metadata/image_exif)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                try:
                    meta = _parse_mp3_meta(bytes(blob))
                    rows.append({"doc_id": int(doc_id), **meta,
                                 "error": None})
                except (ValueError, IndexError) as e:
                    if not permissive:
                        if isinstance(e, ValueError):
                            raise
                        raise ValueError(f"malformed mp3: {e}") from e
                    rows.append({"doc_id": int(doc_id), "error": str(e)})
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MP3_META_SCHEMA.fields])

    return media.mapInPandas(batches, MP3_META_SCHEMA)


def synthetic_mp3s(documents: DataFrame) -> DataFrame:
    """Deterministic MP3 per document: n_frames 3+(doc_id%5), bitrate
    from [64,128,192,320] by doc_id%4, ID3v2 shell when doc_id%2==0,
    VBR (alternating 64/128) when doc_id%7==0 — pure functions of
    doc_id, so the parsed output has an arithmetic DuckDB oracle and a
    hash match proves the write→walk roundtrip (same pattern as the
    avc1 and EXIF corpora)."""
    choices = [64, 128, 192, 320]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "content": [
                    make_mp3(
                        3 + d % 5,
                        bitrate_kbps=64 if d % 7 == 0 else choices[d % 4],
                        id3=(d % 2 == 0),
                        vbr_second_rate=128 if d % 7 == 0 else None,
                    )
                    for d in ids
                ],
            })

    return documents.select("doc_id").mapInPandas(
        batches,
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("content", T.BinaryType())]),
    )
