"""Integration proof for the frame_decoder seam with REAL H.264
bitstreams.

Two tiers:

1. COMMITTED fixture, runs EVERYWHERE (no binary needed): a
   standard-conformant I_PCM IDR stream (operators/h264_ipcm.py —
   raw byte-aligned 4:2:0 macroblocks, ITU-T H.264 §7.4.5) muxed as
   an avc1 MP4 with explicit stss. The tests assert the exact
   avcC/stsz/stss byte offsets and per-sample (offset, size, sync)
   ranges against committed goldens, re-derive the bytes from the
   deterministic generator (staleness guard), and drive the full
   video_frame_features seam with the pure-Python I_PCM decoder to
   golden pixel hashes.

2. ffmpeg tier, env-gated: a real encoder's OWN mux layout through
   our box walker + a real codec decode through the seam; plus a
   cross-check that ffmpeg decodes the committed I_PCM fixture to the
   same pixels our decoder produces. Skips cleanly when no ffmpeg
   binary is installed (none in the CI container; green wherever one
   exists).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess

import numpy as np
import pytest

ffmpeg = shutil.which("ffmpeg")
needs_ffmpeg = pytest.mark.skipif(ffmpeg is None,
                                  reason="no ffmpeg binary on PATH")

from aws_data_pipeline_ads_spark.operators import h264_ipcm  # noqa: E402
from aws_data_pipeline_ads_spark.operators import multimodal  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture():
    with open(os.path.join(FIXTURE_DIR, "h264_ipcm_32x32.mp4"), "rb") as f:
        mp4 = f.read()
    with open(os.path.join(FIXTURE_DIR, "h264_ipcm_32x32.json")) as f:
        return mp4, json.load(f)


def _avcc_of(mp4: bytes) -> bytes:
    i = mp4.find(b"avcC")
    size = int.from_bytes(mp4[i - 4:i], "big")
    return mp4[i + 4:i - 4 + size]


def test_fixture_is_reproducible_from_generator():
    """The committed bytes equal a fresh regeneration — the fixture
    cannot drift from the encoder it documents (tools/
    make_h264_fixture.py reruns the same deterministic path)."""
    mp4, golden = _fixture()
    regen = h264_ipcm.make_ipcm_mp4(h264_ipcm.fixture_frames(32, 32, 3),
                                    fps=5)
    assert hashlib.md5(mp4).hexdigest() == golden["file_md5"]
    assert regen == mp4


def test_fixture_box_walk_matches_golden_byte_ranges():
    """Our ISO-BMFF walker against the committed goldens: avcC/stsz/
    stss box offsets, SPS-parsed dims, and the exact per-sample
    (offset, size, sync) byte ranges the seam will read."""
    mp4, golden = _fixture()
    assert mp4.find(b"avcC") - 4 == golden["avcC_off"]
    assert mp4.find(b"stsz") - 4 == golden["stsz_off"]
    assert mp4.find(b"stss") - 4 == golden["stss_off"]

    tracks = multimodal._parse_mp4_tracks(mp4)
    vid = next(t for t in tracks if t.get("handler") == "vide")
    assert vid["codec"] == "avc1"
    assert (vid["coded_width"], vid["coded_height"]) == (32, 32)
    assert vid["n_samples"] == golden["n_frames"]
    assert vid["n_keyframes"] == golden["n_frames"]  # explicit stss

    codec, samples = multimodal._parse_mp4_samples(mp4)
    assert codec == "avc1"
    assert [[o, s, bool(k)] for o, s, k in samples] == golden["samples"]
    # every sample range holds exactly one AVCC-framed NAL
    for off, size, _sync in samples:
        nal_len = int.from_bytes(mp4[off:off + 4], "big")
        assert nal_len == size - 4
        assert mp4[off + 4] & 0x1F == 5  # IDR


def test_fixture_pixels_through_frame_decoder_seam(spark):
    """The full seam without any codec binary: demux → per-sample byte
    ranges → pure-Python I_PCM decode → golden mean lumas, exactly."""
    from pyspark.sql import Row

    mp4, golden = _fixture()
    decoder = h264_ipcm.make_ipcm_decoder(_avcc_of(mp4))
    media = spark.createDataFrame([Row(doc_id=1, content=bytearray(mp4))])
    rows = sorted(
        multimodal.video_frame_features(
            media, n_frames=3, frame_decoder=decoder,
            sync_only=True).collect(),
        key=lambda r: r.frame_no)
    assert [(r.width, r.height) for r in rows] == [(32, 32)] * 3
    assert [r.mean_luma for r in rows] == golden["mean_luma"]
    # and the decoded planes hash to the committed pixel goldens
    _codec, samples = multimodal._parse_mp4_samples(mp4)
    for k, (off, size, _sync) in enumerate(samples):
        px = decoder(mp4[off:off + size])
        assert hashlib.md5(px[:, :, 0].tobytes()).hexdigest() \
            == golden["y_md5"][k]


def test_fixture_exercises_emulation_prevention():
    """The fixture's PCM payload plants 00-runs, so the EBSP actually
    contains emulation_prevention_three_byte sequences and the decode
    path must strip them (a pass-through would corrupt pixels AND the
    golden hashes above)."""
    mp4, _ = _fixture()
    _codec, samples = multimodal._parse_mp4_samples(mp4)
    off, size, _sync = samples[0]
    assert b"\x00\x00\x03" in mp4[off:off + size]
    ebsp = b"\x00\x00\x03\x01\x00\x00\x03\x00ab"
    assert h264_ipcm.unescape_ebsp(ebsp) == b"\x00\x00\x01\x00\x00\x00ab"
    assert h264_ipcm.escape_rbsp(
        h264_ipcm.unescape_ebsp(ebsp)) == ebsp


@needs_ffmpeg
def test_ffmpeg_decodes_committed_fixture_to_same_pixels(tmp_path):
    """Cross-decoder agreement: a real codec decodes the committed
    I_PCM stream to the identical luma plane (I_PCM is lossless, so
    equality is exact, not approximate)."""
    mp4, golden = _fixture()
    p = tmp_path / "fixture.mp4"
    p.write_bytes(mp4)
    proc = subprocess.run(
        [ffmpeg, "-loglevel", "error", "-i", str(p), "-frames:v", "1",
         "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"],
        capture_output=True, check=True)
    y = np.frombuffer(proc.stdout, dtype=np.uint8)[:32 * 32]
    assert hashlib.md5(y.tobytes()).hexdigest() == golden["y_md5"][0]


def _extract_avcc(mp4: bytes) -> bytes:
    """The raw avcC record body (after the 8-byte box header)."""
    i = mp4.find(b"avcC")
    assert i > 4, "no avcC box in the encoded file"
    size = int.from_bytes(mp4[i - 4:i], "big")
    return mp4[i + 4:i - 4 + size]


def _avcc_annexb_params(avcc: bytes) -> tuple[bytes, int]:
    """SPS+PPS as Annex-B start-code units, plus the NALU length-prefix
    width the samples use (ISO 14496-15 AVCDecoderConfigurationRecord)."""
    nal_len = (avcc[4] & 0x03) + 1
    out = b""
    p = 6
    for _ in range(avcc[5] & 0x1F):                       # SPS set
        ln = int.from_bytes(avcc[p:p + 2], "big")
        p += 2
        out += b"\x00\x00\x00\x01" + avcc[p:p + ln]
        p += ln
    n_pps = avcc[p]
    p += 1
    for _ in range(n_pps):                                # PPS set
        ln = int.from_bytes(avcc[p:p + 2], "big")
        p += 2
        out += b"\x00\x00\x00\x01" + avcc[p:p + ln]
        p += ln
    return out, nal_len


def _ffmpeg_frame_decoder(avcc: bytes):
    """bytes -> HxWx3 uint8, decoding one AVCC sample via the ffmpeg
    CLI: length-prefixed NALUs -> Annex-B, SPS/PPS prepended (each
    sample is an IDR — the encode below forces -g 1), raw RGB out."""
    import numpy as np

    params, nal_len = _avcc_annexb_params(avcc)
    sps_start = params.index(b"\x00\x00\x00\x01") + 4
    sps_end = params.index(b"\x00\x00\x00\x01", sps_start)
    dims = multimodal._parse_avc_sps(params[sps_start:sps_end])
    w, h = dims["width"], dims["height"]

    def decode(sample: bytes):
        es, q = b"", 0
        while q < len(sample):
            ln = int.from_bytes(sample[q:q + nal_len], "big")
            q += nal_len
            es += b"\x00\x00\x00\x01" + sample[q:q + ln]
            q += ln
        proc = subprocess.run(
            [ffmpeg, "-loglevel", "error", "-f", "h264", "-i", "pipe:0",
             "-frames:v", "1", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "pipe:1"],
            input=params + es, capture_output=True, check=True)
        arr = np.frombuffer(proc.stdout, dtype=np.uint8)
        assert arr.size == h * w * 3, (arr.size, h, w, proc.stderr[-500:])
        return arr.reshape(h, w, 3)

    return decode


@needs_ffmpeg
def test_real_h264_through_frame_decoder_seam(spark, tmp_path):
    """ffmpeg-encoded H.264 MP4 → our sample-table demux → real decode
    through the seam: frame dims and the solid-gray luminance come out
    right, and the sample tier agrees with ffmpeg's own mux."""
    from pyspark.sql import Row

    out = tmp_path / "gray.mp4"
    subprocess.run(
        [ffmpeg, "-loglevel", "error", "-f", "lavfi",
         "-i", "color=c=0x808080:size=64x48:rate=5:duration=1",
         "-c:v", "libx264", "-pix_fmt", "yuv420p", "-g", "1",
         "-movflags", "+faststart", str(out)],
        check=True)
    mp4 = out.read_bytes()

    # our box walker reads ffmpeg's real mux (not a hand-built fixture)
    tracks = multimodal._parse_mp4_tracks(mp4)
    vid = next(t for t in tracks if t.get("handler") == "vide")
    assert vid["codec"] == "avc1"
    assert vid["n_samples"] == 5
    assert vid["n_keyframes"] == 5                  # -g 1: all IDR
    assert (vid["coded_width"], vid["coded_height"]) == (64, 48)

    media = spark.createDataFrame([Row(doc_id=1, content=bytearray(mp4))])
    decoder = _ffmpeg_frame_decoder(_extract_avcc(mp4))
    rows = sorted(
        multimodal.video_frame_features(
            media, n_frames=3, frame_decoder=decoder,
            sync_only=True).collect(),
        key=lambda r: r.frame_no)
    assert len(rows) == 3
    assert [(r.width, r.height) for r in rows] == [(64, 48)] * 3
    for r in rows:
        # 0x80 gray in BT.601 luma ≈ 128 (codec round-trip tolerance)
        assert abs(r.mean_luma - 128.0) < 3.0, r.mean_luma


def test_decoder_follows_foreign_sps_pps_field_widths():
    """ADVICE r9: the I_PCM decoder must size its slice-header reads
    from the SUPPLIED avcC, not from what our own encoder happens to
    emit. Build a spec-valid stream a DIFFERENT encoder could produce
    — log2_max_frame_num 6 (not 4), pic_order_cnt_type 0 with a POC
    lsb field, deblocking control present in the PPS — and check the
    pixels still round-trip bit-exactly."""
    from aws_data_pipeline_ads_spark.operators.h264_ipcm import (
        MB, _Writer, escape_rbsp, avcc_sample, make_avcc,
        make_ipcm_decoder,
    )

    wd, h = 32, 32
    # SPS: baseline but log2_max_frame_num_minus4=2, poc_type=0 with
    # log2_max_pic_order_cnt_lsb_minus4=1
    w = _Writer()
    w.u(66, 8); w.u(0, 8); w.u(10, 8)            # noqa: E702
    w.ue(0)                                      # sps_id
    w.ue(2)                                      # log2_max_frame_num=6
    w.ue(0)                                      # poc_type 0
    w.ue(1)                                      # log2_max_poc_lsb=5
    w.ue(0)                                      # max_num_ref_frames
    w.u(0, 1)
    w.ue(wd // MB - 1)
    w.ue(h // MB - 1)
    w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)   # noqa: E702
    sps = b"\x67" + escape_rbsp(w.rbsp())
    # PPS: CAVLC, deblocking_filter_control_present_flag=1
    w = _Writer()
    w.ue(0); w.ue(0)                             # noqa: E702
    w.u(0, 1)                                    # CAVLC
    w.u(0, 1)                                    # bottom_field POC
    w.ue(0); w.ue(0); w.ue(0)                    # noqa: E702
    w.u(0, 1); w.u(0, 2)                         # noqa: E702
    w.se(0); w.se(0); w.se(0)                    # noqa: E702
    w.u(1, 1)                                    # deblocking control ON
    w.u(0, 1); w.u(0, 1)                         # noqa: E702
    pps = b"\x68" + escape_rbsp(w.rbsp())
    # IDR slice with the matching header shape
    y = ((np.arange(h)[:, None] * 5 + np.arange(wd)[None, :] * 11) % 256
         ).astype(np.uint8)
    cb = np.full((h // 2, wd // 2), 90, np.uint8)
    cr = np.full((h // 2, wd // 2), 200, np.uint8)
    w = _Writer()
    w.ue(0)                                      # first_mb_in_slice
    w.ue(7)                                      # slice_type I
    w.ue(0)                                      # pps_id
    w.u(3, 6)                                    # frame_num u(6)!
    w.ue(9)                                      # idr_pic_id
    w.u(17, 5)                                   # pic_order_cnt_lsb u(5)!
    w.u(0, 1); w.u(0, 1)                         # noqa: E702 dec_ref(IDR)
    w.se(0)                                      # slice_qp_delta
    w.ue(0)                                      # disable_deblocking=0
    w.se(1); w.se(-1)                            # noqa: E702 alpha/beta
    for mby in range(h // MB):
        for mbx in range(wd // MB):
            w.ue(25)
            w.align_zero()
            w.raw(y[mby * MB:(mby + 1) * MB,
                    mbx * MB:(mbx + 1) * MB].tobytes())
            w.raw(cb[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8]
                  .tobytes())
            w.raw(cr[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8]
                  .tobytes())
    idr = b"\x65" + escape_rbsp(w.rbsp())

    decode = make_ipcm_decoder(make_avcc(sps, pps))
    rgb = decode(avcc_sample(idr))
    assert rgb.shape == (h, wd, 3)
    assert np.array_equal(rgb[:, :, 0], y)

    # and genuinely unsupported shapes refuse LOUDLY: CABAC PPS
    w = _Writer()
    w.ue(0); w.ue(0)                             # noqa: E702
    w.u(1, 1)                                    # CABAC!
    w.u(0, 1)
    w.ue(0); w.ue(0); w.ue(0)                    # noqa: E702
    w.u(0, 1); w.u(0, 2)                         # noqa: E702
    w.se(0); w.se(0); w.se(0)                    # noqa: E702
    w.u(0, 1); w.u(0, 1); w.u(0, 1)              # noqa: E702
    cabac_pps = b"\x68" + escape_rbsp(w.rbsp())
    with pytest.raises(ValueError, match="CABAC"):
        make_ipcm_decoder(make_avcc(sps, cabac_pps))
