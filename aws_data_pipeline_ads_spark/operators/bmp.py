"""Pure-numpy BMP codec (Windows BITMAPINFOHEADER, BI_RGB).

Completes the classic raster family next to PNG (multimodal), JPEG
(operators/jpeg.py) and GIF (operators/gif.py): uncompressed 24-bit
truecolor and 8-bit paletted DIBs, bottom-up or top-down, with the
4-byte row padding the format mandates. Decode is two numpy reshapes —
no per-pixel Python. Hostile posture matches the other codecs:
structural lies (truncated pixel array, palette overrun, unsupported
compression/bpp) raise ValueError naming the field; crawl-corpus
callers wrap in the PERMISSIVE quarantine like every other parser.
"""

from __future__ import annotations

import struct

import numpy as np


def bmp_decode_pixels(payload: bytes) -> np.ndarray:
    """HxWx3 uint8 from a BI_RGB BMP (24-bit or 8-bit paletted)."""
    if payload[:2] != b"BM":
        raise ValueError("bmp: missing BM signature")
    if len(payload) < 54:
        raise ValueError("bmp: truncated headers")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    n_colors = struct.unpack_from("<I", payload, 46)[0]
    if w <= 0 or h_raw == 0:
        raise ValueError(f"bmp: invalid dimensions {w}x{h_raw}")
    if planes != 1:
        raise ValueError(f"bmp: planes must be 1, got {planes}")
    if compression != 0:
        raise ValueError(f"bmp: only BI_RGB supported, got "
                         f"compression {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"bmp: unsupported bit depth {bpp}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = (w * bpp // 8 + 3) & ~3
    end = data_off + row_bytes * h
    if end > len(payload):
        raise ValueError("bmp: pixel array overruns the payload")
    raw = np.frombuffer(payload[data_off:end], dtype=np.uint8)
    rows = raw.reshape(h, row_bytes)
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    else:
        n_pal = n_colors or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_pal > data_off:
            raise ValueError("bmp: palette overruns the pixel offset")
        pal = np.frombuffer(
            payload[pal_off:pal_off + 4 * n_pal], dtype=np.uint8
        ).reshape(n_pal, 4)[:, :3][:, ::-1]                 # BGRX→RGB
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("bmp: pixel index beyond the palette")
        px = pal[idx]
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def bmp_encode_pixels(arr: np.ndarray, top_down: bool = False) -> bytes:
    """HxWx3 uint8 → 24-bit BI_RGB BMP (bottom-up by default;
    `top_down=True` writes the negative-height row order — both are
    legal on-disk layouts and decoders must handle both)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    ordered = arr if top_down else arr[::-1]
    rows[:, : w * 3] = ordered[:, :, ::-1].reshape(h, w * 3)  # RGB→BGR
    data = rows.tobytes()
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                      1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + dib + data


def synthetic_bmps(documents):
    """Per-doc BMPs with geometry a pure function of doc_id (the
    synthetic_gifs posture): width 5 + id%9 (odd widths exercise the
    4-byte row padding), height 6 + id%7, a two-band image (top half
    color A = (id, 3·id, 7·id) mod 256, bottom half its inverse) so
    vertical orientation is observable, every third doc written
    TOP-DOWN (negative height)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
    ])

    def batches(it):
        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 5 + did % 9, 6 + did % 7
                a = np.array([did % 256, 3 * did % 256, 7 * did % 256],
                             dtype=np.uint8)
                img = np.empty((h, w, 3), dtype=np.uint8)
                img[: h // 2] = a
                img[h // 2:] = 255 - a
                blobs.append(bmp_encode_pixels(img,
                                               top_down=(did % 3 == 0)))
                ids.append(did)
            yield pd.DataFrame({"doc_id": ids, "content": blobs,
                                "media_type": ["image/bmp"] * len(ids)})

    return documents.select("doc_id").mapInPandas(batches, schema)


def bmp_image_stats(media):
    """Decode-side stats: dims, the decoded TOP-LEFT pixel (proves the
    bottom-up/top-down flip was applied — a flip bug swaps the bands)
    and the full channel sum (proves padding bytes never leak into
    pixels). Every field has a closed-form arithmetic oracle for the
    synthetic corpus."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("first_r", T.IntegerType()),
        T.StructField("first_g", T.IntegerType()),
        T.StructField("first_b", T.IntegerType()),
        T.StructField("channel_sum", T.LongType()),
    ])

    def batches(it):
        for pdf in it:
            out = {f.name: [] for f in schema.fields}
            for did, blob in zip(pdf["doc_id"], pdf["content"]):
                px = bmp_decode_pixels(bytes(blob))
                out["doc_id"].append(int(did))
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["first_r"].append(int(px[0, 0, 0]))
                out["first_g"].append(int(px[0, 0, 1]))
                out["first_b"].append(int(px[0, 0, 2]))
                out["channel_sum"].append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema)
