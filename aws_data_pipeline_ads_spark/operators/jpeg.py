"""Baseline JPEG codec, pure Python + numpy — no libjpeg/PIL.

Scope (the subset training-image corpora overwhelmingly use):
- decode: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
  with any h/v sampling factors in {1, 2} (4:4:4, 4:2:2, 4:2:0),
  restart intervals, multiple DQT/DHT segments. Progressive (SOF2),
  arithmetic coding (SOF9+), 12-bit precision, and hierarchical modes
  are rejected LOUDLY with the reason in the error.
- encode: baseline sequential, grayscale or 4:4:4 / 4:2:0 YCbCr, with
  per-image canonical Huffman tables built from actual symbol
  frequencies (fixed-length canonical codes — valid DHT, zero reliance
  on remembering Annex K constants). quant=None writes all-ones
  quantization tables, making the round-trip near-lossless (error is
  float-DCT rounding only, ≤1 level) — which is what makes golden-pixel
  decoder tests possible without a codec library.

Everything is float64 numpy per 8x8 block; the entropy loop is plain
Python. That is thumbnail-scale throughput — fine for the test suite
and metadata pipelines; the module boundary is the marked swap-in point
for libjpeg-turbo at production volume (operators/multimodal.py wires
it behind mapInPandas, where the swap changes no Spark-side code).

No reference parity: the reference (j-cooper/aws-data-pipeline-ads) has
no multimodal surface; this implements the charter §2C multimodal
column family from the public JPEG (ITU T.81) spec.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared constants ---------------------------------------------------------


def _zigzag_order() -> list[tuple[int, int]]:
    """The T.81 zigzag scan: anti-diagonals, even diagonals walked
    bottom-up (i descending), odd top-down."""
    out = []
    for s in range(15):
        cells = [(i, s - i) for i in range(min(s, 7), max(s - 7, 0) - 1, -1)]
        if s % 2 == 0:
            out.extend(cells)  # i descending
        else:
            out.extend(reversed(cells))
    return out


ZIGZAG = _zigzag_order()  # index k -> (row, col)

_k = np.ones(8) * np.sqrt(2.0 / 8.0)
_k[0] = np.sqrt(1.0 / 8.0)
# Orthonormal DCT-II basis: DCT_MAT[u, x] = k(u) cos((2x+1)uπ/16);
# forward F = C s Cᵀ and inverse s = Cᵀ F C reproduce T.81's 1/4·CuCv
# normalization exactly.
DCT_MAT = _k[:, None] * np.cos(
    (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16.0
)


def _bit_length(v: int) -> int:
    return int(v).bit_length()


# -- decoder ------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy segments."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted mid-symbol")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _receive_extend(r: _BitReader, t: int) -> int:
    """RECEIVE+EXTEND (T.81 F.2.2.1): t raw bits -> signed coefficient."""
    if t == 0:
        return 0
    v = r.read_bits(t)
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table -> {(code_len, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code (corrupt stream?)")


_NONBASELINE = {
    0xC1: "extended sequential (SOF1)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def jpeg_decode_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, channels) uint8 array
    (channels = 1 for grayscale, 3 RGB otherwise).

    Untrusted-input contract: every malformed payload raises ValueError
    (per-row quarantineable) — structural parse failures that would
    surface as struct.error / IndexError / KeyError (truncated segment
    bodies, SOS referencing an undefined Huffman table, empty SOS) are
    wrapped here so the decode stage never leaks an internal exception
    type."""
    try:
        return _jpeg_decode_impl(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(
            f"malformed JPEG structure: {type(e).__name__}: {e}"
        ) from e


def _jpeg_decode_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynced")
        marker = payload[pos + 1]
        if marker in _NONBASELINE:
            raise ValueError(
                f"unsupported JPEG mode: {_NONBASELINE[marker]} — only "
                f"baseline sequential (SOF0) is implemented"
            )
        size = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + size]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq == 0:
                    tab = np.frombuffer(body[p:p + 64], np.uint8).astype(np.float64)
                    p += 64
                else:
                    tab = np.frombuffer(body[p:p + 128], ">u2").astype(np.float64)
                    p += 128
                qt[tq] = tab
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (need 8-bit)")
            comps = []
            for i in range(nc):
                cid, hv, tq_i = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq_i))
            frame = (h, w, comps)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = body[0]
            scan_map = {}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i:3 + 2 * i]
                scan_map[cs] = (tdta >> 4, tdta & 0xF)
            segments = _split_entropy(payload, pos + 2 + size)
            return _decode_scan(
                frame, scan_map, qt, huff_dc, huff_ac, restart_interval, segments
            )
        pos += 2 + size
    raise ValueError("JPEG missing SOS scan")


def _split_entropy(payload: bytes, start: int) -> list[bytes]:
    """De-stuff the entropy-coded bytes; split at RSTn markers."""
    segs: list[bytes] = []
    cur = bytearray()
    p = start
    while p < len(payload):
        b = payload[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
        if nxt == 0x00:  # stuffed literal FF
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:  # EOI or next marker — scan ends
            break
    segs.append(bytes(cur))
    return segs


def _decode_scan(frame, scan_map, qt, huff_dc, huff_ac,
                 restart_interval, segments) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, hi, vi, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), np.float64)
    preds = {cid: 0 for cid, *_ in comps}
    inv_zz_r = np.array([r for r, _ in ZIGZAG])
    inv_zz_c = np.array([c for _, c in ZIGZAG])

    seg_i = 0
    reader = _BitReader(segments[0])
    for mcu in range(mcus_y * mcus_x):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("JPEG restart interval past entropy data")
            reader = _BitReader(segments[seg_i])
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(mcu, mcus_x)
        for cid, hi, vi, tq_i in comps:
            td, ta = scan_map[cid]
            dct, act = huff_dc[td], huff_ac[ta]
            q = qt[tq_i]
            for by in range(vi):
                for bx in range(hi):
                    zz = np.zeros(64, np.float64)
                    t = _huff_decode(reader, dct)
                    if t > 11:
                        raise ValueError("invalid JPEG DC category")
                    preds[cid] += _receive_extend(reader, t)
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, act)
                        run, size_ = rs >> 4, rs & 0xF
                        if size_ == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _receive_extend(reader, size_)
                        k += 1
                    block = np.zeros((8, 8), np.float64)
                    block[inv_zz_r, inv_zz_c] = zz * q
                    px = DCT_MAT.T @ block @ DCT_MAT + 128.0
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    planes[cid][y0:y0 + 8, x0:x0 + 8] = px

    # Upsample each component to full resolution (sample replication —
    # the T.81-sanctioned simple filter), crop, color-convert.
    full = []
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# -- encoder (test-fixture grade, but spec-valid baseline JPEG) ---------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _fixed_len_table(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Canonical Huffman table with all codes the same length L =
    ceil(log2(n+1)) — valid per T.81 (any canonical code works), leaves
    the all-ones code unused (n ≤ 2^L - 1), and needs no Annex K
    constants. Returns (bits[16], vals, {symbol: (code, L)})."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length()) if n else 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {s: (i, length) for i, s in enumerate(vals)}
    return bits, vals, enc


def _encode_component_blocks(plane: np.ndarray, q: np.ndarray):
    """FDCT + quantize every 8x8 block of a (H, W) plane (H, W multiples
    of 8); yields zigzagged int coefficient vectors in raster order."""
    zz_r = np.array([r for r, _ in ZIGZAG])
    zz_c = np.array([c for _, c in ZIGZAG])
    qm = np.zeros((8, 8))
    qm[zz_r, zz_c] = q
    for y0 in range(0, plane.shape[0], 8):
        for x0 in range(0, plane.shape[1], 8):
            blk = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
            coef = DCT_MAT @ blk @ DCT_MAT.T
            yield np.round(coef / qm)[zz_r, zz_c].astype(np.int64)


def _block_symbols(zz: np.ndarray, pred: int):
    """(dc_sym, dc_extra), [(ac_sym, ac_extra), ...], new_pred."""
    diff = int(zz[0]) - pred
    t = _bit_length(abs(diff))
    dc_extra = diff if diff >= 0 else diff + (1 << t) - 1
    acs = []
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _bit_length(abs(v))
        extra = v if v >= 0 else v + (1 << s) - 1
        acs.append(((run << 4) | s, extra, s))
        run = 0
    if last_nz < 63:
        acs.append((0x00, 0, 0))  # EOB
    return (t, dc_extra), acs, int(zz[0])


def jpeg_encode_pixels(arr: np.ndarray, quant: np.ndarray | None = None,
                       subsample: str = "444",
                       restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 1|3) uint8 array as baseline JPEG.

    quant: 64 zigzag-ordered quantization values (default all-ones —
    near-lossless, the golden-test configuration). subsample: '444',
    '422' or '420' (3-channel only). restart_interval > 0 writes a DRI
    segment and RSTn markers every N MCUs (predictors reset,
    byte-aligned)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError("need 1 or 3 channels")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    q = (np.ones(64) if quant is None else np.asarray(quant, np.float64))
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        # the writer emits an 8-bit (pq=0) DQT; silently masking values
        # with & 0xFF would quantize with one table and store another
        raise ValueError("quant must be 64 values in [1, 255] (8-bit DQT)")

    if ch == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
    else:
        a = arr.astype(np.float64)
        y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        cb = -0.168736 * a[:, :, 0] - 0.331264 * a[:, :, 1] + 0.5 * a[:, :, 2] + 128.0
        cr = 0.5 * a[:, :, 0] - 0.418688 * a[:, :, 1] - 0.081312 * a[:, :, 2] + 128.0
        if subsample == "444":
            planes, samps = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsample == "422":
            planes, samps = [y, None, None], [(2, 1), (1, 1), (1, 1)]
            # horizontal-pair box average (chroma halved in x only)
            ce = _pad_to(cb, 1, 2)
            re_ = _pad_to(cr, 1, 2)
            planes[1] = (ce[:, 0::2] + ce[:, 1::2]) / 2.0
            planes[2] = (re_[:, 0::2] + re_[:, 1::2]) / 2.0
        else:
            planes, samps = [y, None, None], [(2, 2), (1, 1), (1, 1)]
            # pad to even then 2x2 box-average the chroma
            ce = _pad_to(cb, 2, 2)
            re_ = _pad_to(cr, 2, 2)
            planes[1] = (ce[0::2, 0::2] + ce[1::2, 0::2]
                         + ce[0::2, 1::2] + ce[1::2, 1::2]) / 4.0
            planes[2] = (re_[0::2, 0::2] + re_[1::2, 0::2]
                         + re_[0::2, 1::2] + re_[1::2, 1::2]) / 4.0

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    blocks = {}  # comp index -> 2D list [rows][cols] of zigzag vectors
    for i, (p, (hi, vi)) in enumerate(zip(planes, samps)):
        padded = _pad_to(p, mcus_y * vi * 8, mcus_x * hi * 8, exact=True)
        bl = list(_encode_component_blocks(padded, q))
        ncols = padded.shape[1] // 8
        blocks[i] = [bl[r * ncols:(r + 1) * ncols] for r in range(len(bl) // ncols)]

    # Pass 1: walk MCU order collecting symbols (per table class),
    # resetting DC predictors at restart boundaries exactly as the
    # decoder will.
    dc_syms: dict[int, set] = {0: set(), 1: set()}
    ac_syms: dict[int, set] = {0: set(), 1: set()}
    mcu_stream = []  # one entry per MCU: list of (tcls, dc, acs)
    preds = [0] * len(planes)
    for mcu in range(mcus_y * mcus_x):
        if restart_interval and mcu and mcu % restart_interval == 0:
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        entry = []
        for i, (hi, vi) in enumerate(samps):
            tcls = 0 if i == 0 else 1
            for by in range(vi):
                for bx in range(hi):
                    zz = blocks[i][my * vi + by][mx * hi + bx]
                    dc, acs, _dcv = _block_symbols(zz, preds[i])
                    preds[i] = int(zz[0])
                    dc_syms[tcls].add(dc[0])
                    ac_syms[tcls].update(s for s, _, _ in acs)
                    entry.append((tcls, dc, acs))
        mcu_stream.append(entry)

    n_tables = 1 if ch == 1 else 2
    dc_tabs = {c: _fixed_len_table(dc_syms[c] or {0}) for c in range(n_tables)}
    ac_tabs = {c: _fixed_len_table(ac_syms[c] or {0}) for c in range(n_tables)}

    entropy = bytearray()
    wtr = _BitWriter()
    for mcu, entry in enumerate(mcu_stream):
        if restart_interval and mcu and mcu % restart_interval == 0:
            entropy += wtr.flush()
            entropy += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            wtr = _BitWriter()
        for tcls, (t, dc_extra), acs in entry:
            code, ln = dc_tabs[tcls][2][t]
            wtr.write(code, ln)
            if t:
                wtr.write(dc_extra & ((1 << t) - 1), t)
            for sym, extra, s in acs:
                code, ln = ac_tabs[tcls][2][sym]
                wtr.write(code, ln)
                if s:
                    wtr.write(extra & ((1 << s) - 1), s)
    entropy += wtr.flush()
    entropy = bytes(entropy)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) & 0xFF for x in q))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i, (hi, vi) in enumerate(samps):
        sof += bytes([i + 1, (hi << 4) | vi, 0])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for c in range(n_tables):
        bits, vals, _ = dc_tabs[c]
        out += seg(0xC4, bytes([0x00 | c]) + bytes(bits) + bytes(vals))
        bits, vals, _ = ac_tabs[c]
        out += seg(0xC4, bytes([0x10 | c]) + bytes(bits) + bytes(vals))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        c = 0 if i == 0 else min(1, n_tables - 1)
        sos += bytes([i + 1, (c << 4) | c])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _pad_to(p: np.ndarray, my: int, mx: int, exact: bool = False) -> np.ndarray:
    """Edge-replicate pad: to multiples of (my, mx), or to exactly
    (my, mx) when exact=True."""
    ty = my if exact else -(-p.shape[0] // my) * my
    tx = mx if exact else -(-p.shape[1] // mx) * mx
    return np.pad(p, ((0, ty - p.shape[0]), (0, tx - p.shape[1])), mode="edge")
