"""Regenerate the committed H.264 I_PCM fixture + goldens.

Deterministic pure Python (operators/h264_ipcm.py) — no ffmpeg needed
to REGENERATE either; tests/test_h264_integration.py additionally
asserts the committed bytes equal a fresh in-test regeneration, so the
fixture can never go stale silently. Run from the repo root:

    python tools/make_h264_fixture.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_data_pipeline_ads_spark.operators import h264_ipcm as H  # noqa: E402
from aws_data_pipeline_ads_spark.operators import multimodal  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main() -> None:
    frames = H.fixture_frames(32, 32, 3)
    mp4 = H.make_ipcm_mp4(frames, fps=5)
    codec, samples = multimodal._parse_mp4_samples(mp4)
    golden = {
        "width": 32, "height": 32, "fps": 5, "n_frames": 3,
        "file_md5": hashlib.md5(mp4).hexdigest(),
        "codec": codec,
        "avcC_off": mp4.find(b"avcC") - 4,
        "stsz_off": mp4.find(b"stsz") - 4,
        "stss_off": mp4.find(b"stss") - 4,
        "samples": [[off, size, bool(sync)] for off, size, sync in samples],
        "mean_luma": [round(float(y.mean()), 6) for y, _, _ in frames],
        "y_md5": [hashlib.md5(y.tobytes()).hexdigest()
                  for y, _, _ in frames],
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "h264_ipcm_32x32.mp4"), "wb") as f:
        f.write(mp4)
    with open(os.path.join(OUT_DIR, "h264_ipcm_32x32.json"), "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {len(mp4)} bytes; {json.dumps(golden, sort_keys=True)}")


if __name__ == "__main__":
    main()
