"""Pure-Python GIF codec (GIF87a/89a, LZW) — no imaging library.

Extends the real-pixel codec tier (operators/jpeg.py baseline/
progressive JPEG, multimodal's PNG inflate+unfilter) with the third
classic raster format a crawl corpus carries. Decode walks the spec
shapes exactly: logical screen descriptor, global/local color tables,
interlace deinterlacing, variable-width LZW with table growth and
CLEAR/EOI handling (GIF89a spec, Appendix F). Encode is a real LZW
compressor (string table, width growth, max 12-bit codes) so
round-trips are byte-exact on the pixel level and the decoder's
growth paths get exercised by the tests.

Hostile-input posture matches jpeg.py: structural lies (truncated
data, overrunning color tables, codes beyond the table) raise
ValueError with the offending field named — a corrupt-download
quarantine bucket at 100 TB, never a silent garbage image.

First frame only: animation frames beyond the first are a sample-tier
concern (the MP4 path's job); corpus image features read frame 0.
"""

from __future__ import annotations

import numpy as np

_MAX_WIDTH = 12  # LZW code width cap per the GIF spec


def _read_color_table(buf: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    end = off + 3 * n
    if end > len(buf):
        raise ValueError("gif: color table overruns the payload")
    tbl = np.frombuffer(buf[off:end], dtype=np.uint8).reshape(n, 3)
    return tbl, end


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[tuple[int, ...]] = []

    def reset():
        nonlocal table, width
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = n_bits = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("gif: first code after clear is "
                                     "not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise ValueError("gif: LZW code beyond the table")
            out.extend(entry)
            if len(out) > n_pixels:
                raise ValueError("gif: LZW stream decodes past the "
                                 "declared image size")
            prev = entry
            if (len(table) == (1 << width) and width < _MAX_WIDTH):
                width += 1
    raise ValueError("gif: LZW stream ended without an EOI code")


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # the decoder widens when ITS table hits 1<<width; mirror it
        if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
            width += 1
        if next_code >= (1 << _MAX_WIDTH):
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode_pixels(payload: bytes) -> np.ndarray:
    """First frame of a GIF as an HxWx3 uint8 array."""
    return _decode(payload)[0]


def gif_decode_frame(payload: bytes) -> tuple[np.ndarray, bool]:
    """(pixels, interlaced flag) — the flag comes from the image
    descriptor actually walked, not from caller assumptions."""
    return _decode(payload)


def _decode(payload: bytes) -> tuple[np.ndarray, bool]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: missing GIF87a/GIF89a signature")
    if len(payload) < 13:
        raise ValueError("gif: truncated logical screen descriptor")
    flags = payload[10]
    off = 13
    gct = None
    if flags & 0x80:
        gct, off = _read_color_table(payload, off, 2 << (flags & 0x07))
    while off < len(payload):
        b = payload[off]
        if b == 0x21:  # extension: label + sub-blocks
            off += 2
            while off < len(payload) and payload[off] != 0:
                off += 1 + payload[off]
            off += 1
        elif b == 0x2C:  # image descriptor
            if off + 10 > len(payload):
                raise ValueError("gif: truncated image descriptor")
            w = int.from_bytes(payload[off + 5:off + 7], "little")
            h = int.from_bytes(payload[off + 7:off + 9], "little")
            iflags = payload[off + 9]
            off += 10
            table = gct
            if iflags & 0x80:
                table, off = _read_color_table(
                    payload, off, 2 << (iflags & 0x07))
            if table is None:
                raise ValueError("gif: image has neither global nor "
                                 "local color table")
            if off >= len(payload):
                raise ValueError("gif: missing LZW minimum code size")
            mcs = payload[off]
            if not 2 <= mcs <= 11:
                raise ValueError(f"gif: LZW minimum code size {mcs} "
                                 f"out of range")
            off += 1
            data = bytearray()
            while True:
                if off >= len(payload):
                    raise ValueError("gif: unterminated image data "
                                     "sub-blocks")
                n = payload[off]
                off += 1
                if n == 0:
                    break
                if off + n > len(payload):
                    raise ValueError("gif: image data sub-block "
                                     "overruns the payload")
                data += payload[off:off + n]
                off += n
            idx = _lzw_decode(bytes(data), mcs, w * h)
            if len(idx) < w * h:
                raise ValueError(f"gif: LZW stream decodes {len(idx)} "
                                 f"pixels, image declares {w * h}")
            arr = np.asarray(idx[: w * h], dtype=np.int32)
            if int(arr.max(initial=0)) >= len(table):
                raise ValueError("gif: pixel index beyond the color "
                                 "table")
            rows = arr.reshape(h, w)
            if iflags & 0x40:  # interlaced: reorder row passes
                ordered = np.empty_like(rows)
                src = 0
                for start, step in _DEINTERLACE:
                    for y in range(start, h, step):
                        ordered[y] = rows[src]
                        src += 1
                rows = ordered
            return table[rows], bool(iflags & 0x40)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"gif: unknown block introducer "
                             f"0x{b:02x}")
    raise ValueError("gif: no image descriptor before the trailer")


def synthetic_gifs(documents):
    """Per-doc single-frame GIFs whose geometry is a pure function of
    doc_id (the synthetic_mp3s posture — the testdata ships no image
    corpus, but the payloads are REAL GIFs through the real encoder):

    * width 8 + id%9, height 6 + id%7, n = 2 + id%5 palette colors,
      every third doc interlaced;
    * pixel k (raster order) uses palette index k % n;
    * palette color c = (36c % 256, (17c+5) % 256, c) — the BLUE
      channel IS the palette index, so decoded pixels invert to
      indices with no lookup.

    Arrow-batched mapInPandas; emits (doc_id, content, meta) like
    attach_media."""
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
                w, h, n = 8 + did % 9, 6 + did % 7, 2 + did % 5
                pal = np.array(
                    [(36 * c % 256, (17 * c + 5) % 256, c)
                     for c in range(n)], dtype=np.uint8)
                idx = (np.arange(w * h) % n).reshape(h, w)
                blobs.append(gif_encode_pixels(
                    pal[idx], interlace=(did % 3 == 0)))
                ids.append(did)
            yield pd.DataFrame({"doc_id": ids, "content": blobs,
                                "media_type": ["image/gif"] * len(ids)})

    return documents.select("doc_id").mapInPandas(batches, schema)


def gif_image_stats(media):
    """Decode-side stats over a GIF column: dims, distinct palette
    colors actually used, the interlace flag as WALKED from the image
    descriptor, and the palette-index sum recovered from decoded
    pixels — everything an arithmetic oracle can predict for the
    synthetic corpus, so a hash match proves the encode → (interlaced)
    LZW → decode → deinterlace roundtrip lossless at corpus scale."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_colors", T.IntegerType()),
        T.StructField("interlaced", T.BooleanType()),
        T.StructField("idx_sum", T.LongType()),
    ])

    def batches(it):
        for pdf in it:
            out = {k.name: [] for k in schema.fields}
            for did, blob in zip(pdf["doc_id"], pdf["content"]):
                px, inter = gif_decode_frame(bytes(blob))
                out["doc_id"].append(int(did))
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["n_colors"].append(
                    int(len(np.unique(px.reshape(-1, 3), axis=0))))
                out["interlaced"].append(inter)
                out["idx_sum"].append(int(px[:, :, 2].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema)


def gif_encode_pixels(arr: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx3 uint8 → single-frame GIF89a (≤256 distinct colors)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"gif: {len(palette)} distinct colors, "
                         f"palette caps at 256")
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    rows = inverse.reshape(h, w)
    if interlace:
        order = [y for start, step in _DEINTERLACE
                 for y in range(start, h, step)]
        rows = rows[order]
    mcs = max(2, bits)
    lzw = _lzw_encode([int(v) for v in rows.reshape(-1)], mcs)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])        # GCT present
    out += pal.tobytes()
    out += b"\x2C" + b"\x00" * 4                   # descriptor at 0,0
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00, mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)
