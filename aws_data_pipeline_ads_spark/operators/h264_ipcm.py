"""Spec-conformant H.264 I_PCM keyframe encode/decode, pure Python.

The frame_decoder seam (multimodal.video_frame_features) is the one
sanctioned codec-library boundary in this repo; its byte-range contract
(avcC config extraction, stsz/stco/stss sample walk, AVCC
length-prefixed NALU framing) previously executed end-to-end only where
an ffmpeg binary existed. This module closes that gap WITHOUT a codec
library: I_PCM macroblocks (ITU-T H.264 §7.4.5, mb_type 25 in I slices,
Table 7-11) carry raw byte-aligned 4:2:0 samples — no prediction, no
transform, no entropy-coded residuals — so a complete, standard-
conformant IDR keyframe can be written and bit-exactly re-read with
nothing but an Exp-Golomb reader/writer. Any real H.264 decoder
(ffmpeg, PyAV) decodes these streams to the same pixels; the env-gated
integration test cross-checks that wherever one is installed.

Bitstream layout (all public ITU-T H.264 (V14) sections):
  SPS  §7.3.2.1.1 — Baseline (profile_idc 66), frame_mbs_only,
       pic_order_cnt_type=2 (no POC fields in the slice header).
  PPS  §7.3.2.2   — CAVLC, no deblocking-control override.
  IDR  §7.3.3 slice header + §7.3.5 macroblock_layer: mb_type ue(25)
       → pcm_alignment_zero_bit* → 256 Y + 64 Cb + 64 Cr raw bytes per
       macroblock; rbsp_slice_trailing_bits after the last MB.
  Emulation prevention §7.4.1.1: 00 00 {00,01,02,03} → 00 00 03 xx.

Reference parity note: the reference repo (j-cooper/aws-data-pipeline-
ads) has no media surface at all — this is charter scope (SURVEY §2C
multimodal), same posture as operators/jpeg.py and gif.py.
"""

from __future__ import annotations

import struct

import numpy as np

MB = 16  # macroblock luma edge


# -- bit-level primitives -----------------------------------------------------

class _Writer:
    """MSB-first bit writer over a bytearray; PCM byte runs append
    directly (always byte-aligned by construction)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((v >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit* (§7.3.5)."""
        while self._n:
            self.u(0, 1)

    def raw(self, data: bytes) -> None:
        assert self._n == 0, "raw bytes must start byte-aligned"
        self.buf += data

    def rbsp(self) -> bytes:
        """Close with rbsp_stop_one_bit + alignment (§7.3.2.11)."""
        self.u(1, 1)
        self.align_zero()
        return bytes(self.buf)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def raw(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        b = self.pos >> 3
        self.pos += 8 * n
        return self.data[b:b + n]


def escape_rbsp(rbsp: bytes) -> bytes:
    """RBSP → EBSP: insert emulation_prevention_three_byte (§7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def unescape_ebsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < len(ebsp) and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# -- encode -------------------------------------------------------------------

def encode_sps(width: int, height: int, level_idc: int = 10) -> bytes:
    """Baseline SPS NAL for an exact MB-multiple frame (§7.3.2.1.1)."""
    if width % MB or height % MB or width <= 0 or height <= 0:
        raise ValueError(f"I_PCM fixture dims must be multiples of {MB}: "
                         f"{width}x{height}")
    w = _Writer()
    w.u(66, 8)           # profile_idc Baseline
    w.u(0, 8)            # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)              # seq_parameter_set_id
    w.ue(0)              # log2_max_frame_num_minus4 → frame_num u(4)
    w.ue(2)              # pic_order_cnt_type 2: no POC slice fields
    w.ue(0)              # max_num_ref_frames
    w.u(0, 1)            # gaps_in_frame_num_value_allowed_flag
    w.ue(width // MB - 1)
    w.ue(height // MB - 1)
    w.u(1, 1)            # frame_mbs_only_flag
    w.u(1, 1)            # direct_8x8_inference_flag
    w.u(0, 1)            # frame_cropping_flag
    w.u(0, 1)            # vui_parameters_present_flag
    return b"\x67" + escape_rbsp(w.rbsp())


def encode_pps() -> bytes:
    """CAVLC PPS NAL (§7.3.2.2), every optional control off."""
    w = _Writer()
    w.ue(0)              # pic_parameter_set_id
    w.ue(0)              # seq_parameter_set_id
    w.u(0, 1)            # entropy_coding_mode_flag: CAVLC
    w.u(0, 1)            # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)              # num_slice_groups_minus1
    w.ue(0)              # num_ref_idx_l0_default_active_minus1
    w.ue(0)              # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)            # weighted_pred_flag
    w.u(0, 2)            # weighted_bipred_idc
    w.se(0)              # pic_init_qp_minus26
    w.se(0)              # pic_init_qs_minus26
    w.se(0)              # chroma_qp_index_offset
    w.u(0, 1)            # deblocking_filter_control_present_flag
    w.u(0, 1)            # constrained_intra_pred_flag
    w.u(0, 1)            # redundant_pic_cnt_present_flag
    return b"\x68" + escape_rbsp(w.rbsp())


def encode_ipcm_idr(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                    idr_pic_id: int = 0) -> bytes:
    """One IDR slice NAL whose macroblocks are all I_PCM (§7.3.5):
    y HxW uint8 (MB multiples), cb/cr (H/2)x(W/2) uint8 4:2:0."""
    h, wd = y.shape
    if cb.shape != (h // 2, wd // 2) or cr.shape != cb.shape:
        raise ValueError("chroma planes must be 4:2:0 halves of luma")
    w = _Writer()
    w.ue(0)              # first_mb_in_slice
    w.ue(7)              # slice_type: I (all slices of picture)
    w.ue(0)              # pic_parameter_set_id
    w.u(0, 4)            # frame_num (log2_max_frame_num = 4)
    w.ue(idr_pic_id)
    # pic_order_cnt_type 2 → no POC fields
    w.u(0, 1)            # no_output_of_prior_pics_flag
    w.u(0, 1)            # long_term_reference_flag
    w.se(0)              # slice_qp_delta
    for mby in range(h // MB):
        for mbx in range(wd // MB):
            w.ue(25)     # mb_type I_PCM (Table 7-11)
            w.align_zero()
            w.raw(y[mby * MB:(mby + 1) * MB,
                    mbx * MB:(mbx + 1) * MB].tobytes())
            w.raw(cb[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8]
                  .tobytes())
            w.raw(cr[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8]
                  .tobytes())
    return b"\x65" + escape_rbsp(w.rbsp())


def make_avcc(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1), 4-byte
    NALU length prefixes."""
    return (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)


def avcc_sample(nal: bytes) -> bytes:
    """One AVCC sample: 4-byte big-endian length + NAL (no start code)."""
    return struct.pack(">I", len(nal)) + nal


def make_ipcm_mp4(frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
                  fps: int = 5) -> bytes:
    """avc1 MP4 of I_PCM IDR keyframes — every sample sync, stss
    written explicitly so the keyframe byte-range path executes."""
    from aws_data_pipeline_ads_spark.operators.multimodal import (
        mux_minimal_mp4,
    )

    h, wd = frames[0][0].shape
    sps, pps = encode_sps(wd, h), encode_pps()
    samples = [avcc_sample(encode_ipcm_idr(y, cb, cr, idr_pic_id=i))
               for i, (y, cb, cr) in enumerate(frames)]
    return mux_minimal_mp4(
        samples, wd, h, fps=fps, codec=b"avc1",
        codec_config=(b"avcC", make_avcc(sps, pps)),
        stss_samples=list(range(1, len(samples) + 1)))


# -- decode -------------------------------------------------------------------

_HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135})


def _parse_sps_fields(sps_nal: bytes) -> dict:
    """The SPS fields that size IDR slice-header reads (§7.3.2.1.1),
    parsed from the actual stream instead of assumed from our own
    encoder — a spec-valid I_PCM stream from any other encoder carries
    its own log2_max_frame_num / pic_order_cnt_type. Shapes the I_PCM
    sample walk genuinely cannot handle (non-4:2:0, >8-bit, scaling
    matrices, interlace) refuse loudly here instead of desynchronizing
    the Exp-Golomb reads."""
    r = _Reader(unescape_ebsp(sps_nal[1:]))
    profile = r.u(8)
    r.u(8)                               # constraint flags + reserved
    r.u(8)                               # level_idc
    r.ue()                               # seq_parameter_set_id
    chroma_format, bd_luma, bd_chroma = 1, 8, 8
    if profile in _HIGH_PROFILES:
        chroma_format = r.ue()
        if chroma_format == 3:
            r.u(1)                       # separate_colour_plane_flag
        bd_luma = r.ue() + 8
        bd_chroma = r.ue() + 8
        r.u(1)                           # qpprime_y_zero_transform_bypass
        if r.u(1):                       # seq_scaling_matrix_present
            raise ValueError(
                "SPS carries scaling matrices — outside the I_PCM "
                "fixture decoder's scope (use a real codec binary)")
    if (chroma_format, bd_luma, bd_chroma) != (1, 8, 8):
        raise ValueError(
            f"I_PCM decoder supports 4:2:0 8-bit only, SPS says "
            f"chroma_format_idc={chroma_format} "
            f"bit_depth={bd_luma}/{bd_chroma}")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    delta_poc_always_zero = 0
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        delta_poc_always_zero = r.u(1)
        r.se()                           # offset_for_non_ref_pic
        r.se()                           # offset_for_top_to_bottom
        for _ in range(r.ue()):          # num_ref_frames_in_poc_cycle
            r.se()
    r.ue()                               # max_num_ref_frames
    r.u(1)                               # gaps_in_frame_num_allowed
    r.ue()                               # pic_width_in_mbs_minus1
    r.ue()                               # pic_height_in_map_units_minus1
    if r.u(1) == 0:                      # frame_mbs_only_flag
        raise ValueError(
            "interlaced SPS (frame_mbs_only_flag=0) — outside the "
            "I_PCM fixture decoder's scope")
    return {"log2_max_frame_num": log2_max_frame_num,
            "poc_type": poc_type,
            "log2_max_poc_lsb": log2_max_poc_lsb,
            "delta_poc_always_zero": delta_poc_always_zero}


def _parse_pps_fields(pps_nal: bytes) -> dict:
    """The PPS flags that add IDR slice-header fields (§7.3.2.2):
    bottom-field POC presence, deblocking control, redundant counts.
    CABAC and slice groups change macroblock-layer parsing entirely —
    refused loudly."""
    r = _Reader(unescape_ebsp(pps_nal[1:]))
    r.ue()                               # pic_parameter_set_id
    r.ue()                               # seq_parameter_set_id
    if r.u(1):                           # entropy_coding_mode_flag
        raise ValueError(
            "CABAC PPS — the I_PCM fixture decoder parses CAVLC "
            "macroblock layers only (use a real codec binary)")
    bottom_field = r.u(1)
    if r.ue() != 0:                      # num_slice_groups_minus1
        raise ValueError(
            "slice groups (FMO) — outside the I_PCM fixture decoder's "
            "scope")
    r.ue()                               # num_ref_idx_l0_default
    r.ue()                               # num_ref_idx_l1_default
    r.u(1)                               # weighted_pred_flag
    r.u(2)                               # weighted_bipred_idc
    r.se()                               # pic_init_qp_minus26
    r.se()                               # pic_init_qs_minus26
    r.se()                               # chroma_qp_index_offset
    deblock = r.u(1)                     # deblocking_filter_control
    r.u(1)                               # constrained_intra_pred_flag
    redundant = r.u(1)                   # redundant_pic_cnt_present
    return {"bottom_field_poc": bottom_field,
            "deblocking_control": deblock,
            "redundant_pic_cnt": redundant}


def make_ipcm_decoder(avcc: bytes):
    """bytes -> HxWx3 uint8 for the video_frame_features frame_decoder
    seam: walks the AVCC length prefixes, bit-parses the IDR slice
    header, checks mb_type==I_PCM per macroblock and re-reads the raw
    planes. Returns luma replicated into 3 channels (the fixture's
    chroma is neutral; 0.299+0.587+0.114 = 1 keeps mean_luma == mean Y
    exactly). The same closure shape as an ffmpeg/PyAV wrapper — THIS
    decoder just needs no binary.

    Slice-header field widths come from the SUPPLIED avcC's SPS/PPS
    (_parse_sps_fields/_parse_pps_fields) — frame_num is read with the
    stream's own log2_max_frame_num, POC slice fields follow the
    stream's pic_order_cnt_type, and PPS-conditional fields
    (deblocking control, redundant counts) are consumed — so a
    spec-valid I_PCM stream from any conformant encoder parses, and
    genuinely unsupported shapes (CABAC, FMO, interlace, non-4:2:0)
    refuse loudly instead of desynchronizing."""
    sps_len = struct.unpack(">H", avcc[6:8])[0]
    sps = avcc[8:8 + sps_len]
    q0 = 8 + sps_len + 1                 # skip numOfPictureParameterSets
    pps_len = struct.unpack(">H", avcc[q0:q0 + 2])[0]
    pps = avcc[q0 + 2:q0 + 2 + pps_len]
    nal_len = (avcc[4] & 0x03) + 1
    from aws_data_pipeline_ads_spark.operators.multimodal import (
        _parse_avc_sps,
    )
    dims = _parse_avc_sps(sps)
    wd, h = dims["width"], dims["height"]
    sf = _parse_sps_fields(sps)
    pf = _parse_pps_fields(pps)

    def decode(sample: bytes) -> np.ndarray:
        q = 0
        while q < len(sample):
            ln = int.from_bytes(sample[q:q + nal_len], "big")
            q += nal_len
            nal = sample[q:q + ln]
            q += ln
            if nal[0] & 0x1F != 5:
                continue
            r = _Reader(unescape_ebsp(nal[1:]))
            assert r.ue() == 0, "first_mb_in_slice"
            assert r.ue() in (2, 7), "slice_type must be I"
            r.ue()                       # pic_parameter_set_id
            r.u(sf["log2_max_frame_num"])      # frame_num
            r.ue()                       # idr_pic_id
            if sf["poc_type"] == 0:
                r.u(sf["log2_max_poc_lsb"])    # pic_order_cnt_lsb
                if pf["bottom_field_poc"]:
                    r.se()               # delta_pic_order_cnt_bottom
            elif sf["poc_type"] == 1 and \
                    not sf["delta_poc_always_zero"]:
                r.se()                   # delta_pic_order_cnt[0]
                if pf["bottom_field_poc"]:
                    r.se()               # delta_pic_order_cnt[1]
            if pf["redundant_pic_cnt"]:
                r.ue()                   # redundant_pic_cnt
            r.u(2)                       # dec_ref_pic_marking (IDR)
            r.se()                       # slice_qp_delta
            if pf["deblocking_control"]:
                if r.ue() != 1:          # disable_deblocking_filter_idc
                    r.se()               # slice_alpha_c0_offset_div2
                    r.se()               # slice_beta_offset_div2
            y = np.zeros((h, wd), np.uint8)
            cb = np.zeros((h // 2, wd // 2), np.uint8)
            cr = np.zeros_like(cb)
            for mby in range(h // MB):
                for mbx in range(wd // MB):
                    mb_type = r.ue()
                    if mb_type != 25:
                        raise ValueError(
                            f"not an I_PCM macroblock (mb_type {mb_type})"
                            " — this decoder handles I_PCM streams only")
                    r.align()
                    y[mby * MB:(mby + 1) * MB, mbx * MB:(mbx + 1) * MB] = \
                        np.frombuffer(r.raw(256), np.uint8).reshape(MB, MB)
                    cb[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8] = \
                        np.frombuffer(r.raw(64), np.uint8).reshape(8, 8)
                    cr[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8] = \
                        np.frombuffer(r.raw(64), np.uint8).reshape(8, 8)
            return np.repeat(y[:, :, None], 3, axis=2)
        raise ValueError("no IDR NAL in sample")

    return decode


def fixture_frames(width: int = 32, height: int = 32,
                   n: int = 3) -> list[tuple[np.ndarray, np.ndarray,
                                             np.ndarray]]:
    """Deterministic gradient planes for the committed fixture: Y walks
    a per-frame-offset gradient (plenty of 0x00 bytes → the emulation-
    prevention path is exercised), chroma is neutral 128."""
    out = []
    for k in range(n):
        r, c = np.mgrid[0:height, 0:width]
        y = ((7 * r + 3 * c + 29 * k) % 256).astype(np.uint8)
        # the gradient's neighbor deltas (±3/±7) never produce 00 00 —
        # plant an explicit zero run ending in 01 so every frame's PCM
        # forces emulation_prevention_three_byte insertion (§7.4.1.1)
        y[0, 0:6] = 0
        y[0, 6] = 1
        cb = np.full((height // 2, width // 2), 128, np.uint8)
        out.append((y, cb, cb.copy()))
    return out
