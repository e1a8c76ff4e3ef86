"""JPEG codec (baseline + Huffman progressive), pure Python + numpy —
no libjpeg/PIL.

Scope (the subset training-image corpora overwhelmingly use):
- decode: baseline sequential DCT (SOF0) AND Huffman progressive
  (SOF2 — spectral selection, successive approximation, multi-block
  EOB runs, interleaved DC scans; ~10% of web JPEGs are progressive,
  so a crawl pipeline hits them daily), 8-bit, grayscale or YCbCr
  with any h/v sampling factors in {1, 2} (4:4:4, 4:2:2, 4:2:0),
  restart intervals, multiple DQT/DHT segments. Arithmetic coding
  (SOF9+), 12-bit precision, lossless, and hierarchical modes are
  rejected LOUDLY with the reason in the error.
- encode: baseline sequential or progressive (jpeg_encode_progressive;
  fixture-grade, spec-valid SOF2 with a configurable scan script),
  grayscale or 4:4:4 / 4:2:2 / 4:2:0 YCbCr, with per-image canonical
  Huffman tables built from actual symbol frequencies (fixed-length
  canonical codes — valid DHT, zero reliance on remembering Annex K
  constants). quant=None writes all-ones quantization tables, making
  the round-trip near-lossless (error is float-DCT rounding only,
  ≤1 level) — which is what makes golden-pixel decoder tests possible
  without a codec library. Both encoders share one FDCT/quantizer, so
  progressive decode must equal baseline decode BIT-FOR-BIT — the
  strongest oracle available without a codec library.

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


def _parse_dqt(body: bytes, qt: dict[int, np.ndarray]) -> None:
    p = 0
    while p < len(body):
        pq, tq = body[p] >> 4, body[p] & 0xF
        p += 1
        if pq == 0:
            qt[tq] = np.frombuffer(body[p:p + 64], np.uint8).astype(np.float64)
            p += 64
        else:
            qt[tq] = np.frombuffer(body[p:p + 128], ">u2").astype(np.float64)
            p += 128


def _parse_dht(body: bytes, huff_dc: dict[int, dict],
               huff_ac: dict[int, dict]) -> None:
    p = 0
    while p < len(body):
        tc, th = body[p] >> 4, body[p] & 0xF
        bits = list(body[p + 1:p + 17])
        n = sum(bits)
        vals = list(body[p + 17:p + 17 + n])
        (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
        p += 17 + n


def _jpeg_decode_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    progressive = False
    store = None  # progressive: cid -> (blocks_y, blocks_x, 64) int32
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynced")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker (common between progressive scans) — skip them so the
        # length read below starts at the real marker byte.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker in _NONBASELINE:
            raise ValueError(
                f"unsupported JPEG mode: {_NONBASELINE[marker]} — only "
                f"baseline sequential (SOF0) and Huffman progressive "
                f"(SOF2) are implemented"
            )
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            # fill-byte skipping may leave <2 bytes for the length
            # field; a hostile stream truncated right after trailing
            # 0xFF padding must fail as the documented ValueError, not
            # let struct.unpack raise struct.error past strict callers
            raise ValueError("JPEG truncated inside a marker segment")
        size = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + size]
        if marker == 0xDB:  # DQT (possibly several tables)
            _parse_dqt(body, qt)
        elif marker == 0xC4:  # DHT (possibly several tables)
            _parse_dht(body, huff_dc, huff_ac)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (need 8-bit)")
            comps = []
            for i in range(nc):
                cid, hv, tq_i = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq_i))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            if progressive:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                store = {
                    cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), np.int64)
                    for cid, hi, vi, _tq in comps
                }
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i:3 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            segments, entropy_end = _split_entropy(payload, pos + 2 + size)
            if not progressive:
                scan_map = {cs: (td, ta) for cs, td, ta in scan_comps}
                return _decode_scan(
                    frame, scan_map, qt, huff_dc, huff_ac,
                    restart_interval, segments,
                )
            _progressive_scan(
                frame, store, scan_comps, ss, se, ahal >> 4, ahal & 0xF,
                huff_dc, huff_ac, restart_interval, segments,
            )
            pos = entropy_end
            continue
        pos += 2 + size
    if progressive and store is not None:
        return _reconstruct_progressive(frame, store, qt)
    raise ValueError("JPEG missing SOS scan")


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff the entropy-coded bytes; split at RSTn markers. Returns
    (segments, end) where end points at the 0xFF of the marker that
    terminated the scan (so a multi-scan parse can resume there)."""
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
    return segs, min(p, len(payload))


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
    return _finish_planes(full)


def _finish_planes(full: list[np.ndarray]) -> np.ndarray:
    """Color-convert upsampled component planes to uint8 pixels
    (shared by the baseline and progressive reconstruction paths)."""
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# -- progressive (SOF2) scan decoding -----------------------------------------
#
# A progressive JPEG spreads each block's 64 coefficients over MANY
# scans: DC first/refinement scans (optionally interleaved), then
# per-component AC scans over a spectral band [Ss, Se] at successive
# approximation levels (first scan codes coefficient >> Al; refinements
# add one magnitude bit each). Coefficients accumulate in an integer
# store; dequantization + IDCT happen ONCE at EOI. Algorithms follow
# T.81 G.1.2 (the same control flow libjpeg documents publicly).


def _ac_first(r: _BitReader, act: dict, coef, ss: int, se: int, al: int,
              eobrun: int) -> int:
    """First AC scan of a band: run-length coded (coef >> Al) values
    plus EOBn symbols that skip 2^n + extra WHOLE blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, act)
        run, s = rs >> 4, rs & 0xF
        if s == 0:
            if run != 15:
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.read_bits(run)
                return eobrun
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("JPEG progressive AC run past band end")
        coef[k] = _receive_extend(r, s) << al
        k += 1
    return 0


def _ac_refine(r: _BitReader, act: dict, coef, ss: int, se: int, al: int,
               eobrun: int) -> int:
    """AC refinement scan (T.81 G.1.2.3): newly-nonzero coefficients
    arrive as (run, 1) symbols + a sign bit; every already-nonzero
    coefficient crossed on the way contributes one correction bit that
    may add ±2^Al toward larger magnitude."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, act)
            run, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # run == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement symbol")
                newval = p1 if r.read_bit() else m1
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if r.read_bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    run -= 1
                    if run < 0:
                        break
                k += 1
            if newval:
                if k > se:
                    raise ValueError("JPEG AC refinement run past band end")
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(coef[k])
            if c != 0:
                if r.read_bit() and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _comp_block_grid(frame, cid) -> tuple[int, int]:
    """REAL (not MCU-padded) block grid of one component — the unit
    space of non-interleaved progressive scans (T.81 A.2.2)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    hi, vi = next((hi, vi) for c, hi, vi, _ in comps if c == cid)
    cw = -(-(w * hi) // hmax)
    ch = -(-(h * vi) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(frame, store, scan_comps, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval, segments) -> None:
    h, w, comps = frame
    byid = {cid: (hi, vi) for cid, hi, vi, _tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    interleaved = len(scan_comps) > 1
    if ss == 0 and se != 0:
        raise ValueError("JPEG progressive DC scan must have Se = 0")
    if ss > 0 and interleaved:
        raise ValueError("JPEG progressive AC scans must be single-component")
    if ss > 0 and not (ss <= se <= 63):
        raise ValueError("JPEG progressive band out of range")
    if interleaved:
        units = mcus_y * mcus_x
    else:
        bh, bw = _comp_block_grid(frame, scan_comps[0][0])
        units = bh * bw

    seg_i = 0
    reader = _BitReader(segments[0])
    preds = {cs: 0 for cs, _, _ in scan_comps}
    eobrun = 0
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("JPEG restart interval past entropy data")
            reader = _BitReader(segments[seg_i])
            preds = dict.fromkeys(preds, 0)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcus_x)
            blocks = [
                (cs, my * vi + by, mx * hi + bx, td)
                for cs, td, _ta in scan_comps
                for hi, vi in (byid[cs],)
                for by in range(vi)
                for bx in range(hi)
            ]
        else:
            cs, td, _ta = scan_comps[0]
            by, bx = divmod(u, bw)
            blocks = [(cs, by, bx, td)]
        for cs, by, bx, td in blocks:
            coef = store[cs][by, bx]
            if ss == 0:
                if ah == 0:
                    t = _huff_decode(reader, huff_dc[td])
                    if t > 11:
                        raise ValueError("invalid JPEG DC category")
                    preds[cs] += _receive_extend(reader, t)
                    coef[0] = preds[cs] << al
                elif reader.read_bit():
                    coef[0] |= 1 << al
            else:
                _ta = scan_comps[0][2]
                if ah == 0:
                    eobrun = _ac_first(
                        reader, huff_ac[_ta], coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(
                        reader, huff_ac[_ta], coef, ss, se, al, eobrun)


def _reconstruct_progressive(frame, store, qt) -> np.ndarray:
    """Dequantize the accumulated coefficient store and IDCT every block
    (vectorized: one matmul pair per component, not per block)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    inv_r = np.array([r for r, _ in ZIGZAG])
    inv_c = np.array([c for _, c in ZIGZAG])
    full = []
    for cid, hi, vi, tq in comps:
        cf = store[cid].astype(np.float64) * qt[tq][None, None, :]
        by, bx = cf.shape[:2]
        blocks = np.zeros((by, bx, 8, 8))
        blocks[:, :, inv_r, inv_c] = cf
        px = DCT_MAT.T @ blocks @ DCT_MAT + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        full.append(plane[:h, :w])
    return _finish_planes(full)


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


def _prep_encode(arr: np.ndarray, quant, subsample: str):
    """Shared encode front end (baseline + progressive): validate,
    color-convert/subsample, FDCT+quantize every block. Returns
    (h, w, samps, q, blocks, mcus_x, mcus_y) with blocks[i] a 2D list
    [rows][cols] of zigzag coefficient vectors over the MCU-padded
    grid."""
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
    return h, w, samps, q, blocks, mcus_x, mcus_y


def jpeg_encode_pixels(arr: np.ndarray, quant: np.ndarray | None = None,
                       subsample: str = "444",
                       restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 1|3) uint8 array as baseline JPEG.

    quant: 64 zigzag-ordered quantization values (default all-ones —
    near-lossless, the golden-test configuration). subsample: '444',
    '422' or '420' (3-channel only). restart_interval > 0 writes a DRI
    segment and RSTn markers every N MCUs (predictors reset,
    byte-aligned)."""
    h, w, samps, q, blocks, mcus_x, mcus_y = _prep_encode(arr, quant, subsample)
    nc = len(samps)
    ch = 1 if nc == 1 else 3

    # Pass 1: walk MCU order collecting symbols (per table class),
    # resetting DC predictors at restart boundaries exactly as the
    # decoder will.
    dc_syms: dict[int, set] = {0: set(), 1: set()}
    ac_syms: dict[int, set] = {0: set(), 1: set()}
    mcu_stream = []  # one entry per MCU: list of (tcls, dc, acs)
    preds = [0] * nc
    for mcu in range(mcus_y * mcus_x):
        if restart_interval and mcu and mcu % restart_interval == 0:
            preds = [0] * nc
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
    sof = struct.pack(">BHHB", 8, h, w, nc)
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
    sos = bytes([nc])
    for i in range(nc):
        c = 0 if i == 0 else min(1, n_tables - 1)
        sos += bytes([i + 1, (c << 4) | c])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# -- progressive encoder (test-fixture grade, spec-valid SOF2) ----------------
#
# Exists so the progressive DECODER has hand-built fixtures covering
# both progressive dimensions — spectral selection (per-band AC scans)
# and successive approximation (point transform + refinement bits) —
# without shipping libjpeg output as binary blobs. Symbol semantics
# mirror T.81 G.1.2: DC uses an arithmetic shift, AC magnitudes shift
# toward zero, refinement correction bits are buffered until the next
# emitted symbol (the only order the decoder can consume them in).


def _ac_first_ops(zz, ss: int, se: int, al: int) -> tuple[list, bool]:
    """(ops, band_ends_open): ops WITHOUT a terminating EOB — the caller
    aggregates open blocks into multi-block EOBn runs."""
    ops = []
    r = 0
    for k in range(ss, se + 1):
        c = int(zz[k])
        v = abs(c) >> al
        if v == 0:
            r += 1
            continue
        if c < 0:
            v = -v
        while r > 15:
            ops.append((0xF0, 0, 0))  # ZRL
            r -= 16
        s = _bit_length(abs(v))
        extra = v if v >= 0 else v + (1 << s) - 1
        ops.append(((r << 4) | s, extra, s))
        r = 0
    return ops, r > 0


def _ac_refine_ops(zz, ss: int, se: int, al: int) -> tuple[list, bool, list]:
    """(ops, band_ends_open, trailing_correction_bits): correction bits
    after the last newly-nonzero coefficient ride the block's EOB and
    are returned for the caller's run buffer."""
    band = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1  # last newly-nonzero position (relative)
    for j, t in enumerate(band):
        if t == 1:
            eob = j
    ops: list = []
    br: list[int] = []  # buffered correction bits
    r = 0
    for j, t in enumerate(band):
        if t == 0:
            r += 1
            continue
        # ZRLs are needed only when another newly-nonzero coefficient
        # follows; trailing runs fold into the EOB
        while r > 15 and j <= eob:
            ops.append((0xF0, 0, 0))
            ops += [(None, b, 1) for b in br]
            br = []
            r -= 16
        if t > 1:  # already nonzero: one correction bit, buffered
            br.append(t & 1)
            continue
        # newly nonzero: (run, 1) + sign bit, then the buffered bits
        ops.append(((r << 4) | 1, 1 if int(zz[ss + j]) >= 0 else 0, 1))
        ops += [(None, b, 1) for b in br]
        br = []
        r = 0
    return ops, bool(r > 0 or br), br


def _prog_scan_ops(comp_idx, ss, se, ah, al, blocks, samps,
                   mcus_x, mcus_y, h, w, restart_interval) -> list[list]:
    """Op stream for one progressive scan, split at restart boundaries.
    Each op is (symbol|None, raw_value, n_raw_bits)."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    interleaved = len(comp_idx) > 1
    if interleaved:
        units = mcus_y * mcus_x
    else:
        i = comp_idx[0]
        hi, vi = samps[i]
        bw = -(-(-(-(w * hi) // hmax)) // 8)
        bh = -(-(-(-(h * vi) // vmax)) // 8)
        units = bh * bw
    segments: list[list] = []
    ops: list = []
    preds = dict.fromkeys(comp_idx, 0)
    eobrun = 0
    pending: list = []  # refine correction bits riding the open EOB run

    def flush_eob() -> None:
        nonlocal eobrun, pending
        if eobrun:
            n = eobrun.bit_length() - 1  # 2^n <= eobrun
            ops.append(((n << 4) | 0, eobrun - (1 << n), n))
            ops.extend(pending)
        eobrun = 0
        pending = []

    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            flush_eob()
            segments.append(ops)
            ops = []
            preds = dict.fromkeys(preds, 0)
        if interleaved:
            my, mx = divmod(u, mcus_x)
            unit = [
                (i, my * vi + by, mx * hi + bx)
                for i in comp_idx
                for hi, vi in (samps[i],)
                for by in range(vi)
                for bx in range(hi)
            ]
        else:
            by, bx = divmod(u, bw)
            unit = [(comp_idx[0], by, bx)]
        for i, by, bx in unit:
            zz = blocks[i][by][bx]
            if ss == 0:
                v = int(zz[0]) >> al  # arithmetic shift (T.81 DC rule)
                if ah == 0:
                    diff = v - preds[i]
                    preds[i] = v
                    t = _bit_length(abs(diff))
                    extra = diff if diff >= 0 else diff + (1 << t) - 1
                    ops.append((t, extra, t))
                else:
                    ops.append((None, v & 1, 1))
            elif ah == 0:
                bops, open_ = _ac_first_ops(zz, ss, se, al)
                if bops:
                    flush_eob()
                    ops += bops
                if open_:
                    eobrun += 1
                    if eobrun == 32767:  # EOBn cap (T.81: n <= 14)
                        flush_eob()
            else:
                bops, open_, br = _ac_refine_ops(zz, ss, se, al)
                if bops:
                    flush_eob()
                    ops += bops
                if open_:
                    eobrun += 1
                    pending += [(None, b, 1) for b in br]
                    if eobrun == 32767:
                        flush_eob()
    flush_eob()
    segments.append(ops)
    return segments


def jpeg_encode_progressive(arr: np.ndarray, quant: np.ndarray | None = None,
                            subsample: str = "444",
                            restart_interval: int = 0,
                            scans: list[tuple] | None = None) -> bytes:
    """Encode an (h, w, 1|3) uint8 array as progressive JPEG (SOF2).

    The default scan script exercises BOTH progressive dimensions:
    an interleaved DC first scan at Al=1 plus a DC refinement, then
    per-component AC scans split into two spectral bands at Al=1 with
    matching refinement scans to Al=0. A custom script is a list of
    (comp_indices, Ss, Se, Ah, Al). Coefficients are identical to the
    baseline encoder's (same FDCT/quantizer), so progressive decode of
    this stream must match baseline decode bit-for-bit."""
    h, w, samps, q, blocks, mcus_x, mcus_y = _prep_encode(arr, quant, subsample)
    nc = len(samps)
    if scans is None:
        scans = [(list(range(nc)), 0, 0, 0, 1), (list(range(nc)), 0, 0, 1, 0)]
        for c in range(nc):
            scans += [([c], 1, 5, 0, 1), ([c], 6, 63, 0, 1)]
        for c in range(nc):
            scans += [([c], 1, 5, 1, 0), ([c], 6, 63, 1, 0)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) & 0xFF for x in q))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (hi, vi) in enumerate(samps):
        sof += bytes([i + 1, (hi << 4) | vi, 0])
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    for comp_idx, ss, se, ah, al in scans:
        tcls = 0 if ss == 0 else 1
        segments = _prog_scan_ops(comp_idx, ss, se, ah, al, blocks, samps,
                                  mcus_x, mcus_y, h, w, restart_interval)
        syms = {s for segops in segments for s, _, _ in segops if s is not None}
        enc = None
        if syms:  # DC refinement scans are pure raw bits — no DHT
            bits, vals, enc = _fixed_len_table(syms)
            out += seg(0xC4, bytes([(tcls << 4) | 0]) + bytes(bits) + bytes(vals))
        sos = bytes([len(comp_idx)])
        for i in comp_idx:
            sos += bytes([i + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        for si, segops in enumerate(segments):
            if si:
                out += bytes([0xFF, 0xD0 + ((si - 1) % 8)])
            wtr = _BitWriter()
            for s, val, nb in segops:
                if s is not None:
                    code, ln = enc[s]
                    wtr.write(code, ln)
                if nb:
                    wtr.write(val & ((1 << nb) - 1), nb)
            out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _pad_to(p: np.ndarray, my: int, mx: int, exact: bool = False) -> np.ndarray:
    """Edge-replicate pad: to multiples of (my, mx), or to exactly
    (my, mx) when exact=True."""
    ty = my if exact else -(-p.shape[0] // my) * my
    tx = mx if exact else -(-p.shape[1] // mx) * mx
    return np.pad(p, ((0, ty - p.shape[0]), (0, tx - p.shape[1])), mode="edge")
