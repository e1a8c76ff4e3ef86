"""Integration proof for the frame_decoder seam with a REAL H.264
decoder.

The MP4 sample tier computes exact stsc/stco/stsz byte ranges and the
seam test (test_multimodal.py) proves those bytes arrive at an injected
decoder verbatim — but only a real codec closes the loop end-to-end on
a real-world file: ffmpeg encodes an H.264 MP4, OUR box walker demuxes
its sample table (not a hand-muxed fixture — ffmpeg's own mux layout),
and a thin ffmpeg-CLI wrapper decodes the AVCC samples through
`video_frame_features(frame_decoder=...)`. Skips cleanly when no
ffmpeg binary is installed (none in the CI container; green wherever
one exists).
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

ffmpeg = shutil.which("ffmpeg")
pytestmark = pytest.mark.skipif(ffmpeg is None,
                                reason="no ffmpeg binary on PATH")

from aws_data_pipeline_ads_spark.operators import multimodal  # noqa: E402


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
