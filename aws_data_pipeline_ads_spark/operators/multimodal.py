"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The actual codec work is STUBBED (no image/audio
libraries in this environment — `_decode_image_real` raises
NotImplementedError and tests exercise the deterministic fake), but the
Spark-side plumbing — schema, batch iteration, per-row binary handling,
frame explosion — is real and tested.

Scale notes: mapInPandas streams Arrow batches, so peak memory is one
batch, not one partition; media tables should be repartitioned by a
size-balanced key before heavy decode stages so stragglers don't
dominate (documents with wildly mixed media sizes → salt or bin-pack).
"""

from __future__ import annotations

import hashlib
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
    """Real decode would go through PIL/libvips — not present here."""
    raise NotImplementedError("image codecs are not available in this environment")


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

    Fake decode treats the payload as 16-bit PCM mono (a real impl
    swaps in soundfile/ffmpeg at the marked line); the numpy math after
    decode is exactly what a real feature stage runs, vectorized per
    Arrow batch.
    """
    if not use_fake_decoder:
        raise NotImplementedError("audio codecs are not available in this environment")
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_samples, rms = [], []
            for blob in pdf["content"]:
                raw = bytes(blob)
                # <- real impl: decode container/codec to PCM here
                pcm = np.frombuffer(raw[: len(raw) - len(raw) % 2], dtype="<i2")
                n_samples.append(len(pcm))
                rms.append(
                    float(np.sqrt(np.mean((pcm / 32768.0) ** 2))) if len(pcm) else 0.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": n_samples,
                    "duration_s": [n / sample_rate for n in n_samples],
                    "rms": rms,
                }
            )

    return media.mapInPandas(batches, AUDIO_FEATURES)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224,
                  use_fake_decoder: bool = True) -> DataFrame:
    """Resize stage: binary in → binary out with refreshed metadata.

    The fake 'resize' deterministically resamples the payload to
    target_w*target_h bytes (stride-sampled, zero-padded) — same
    in/out contract as a real thumbnailer (PIL `Image.resize` +
    re-encode would drop in at the marked line). Output schema is the
    media schema itself, so stages compose: attach → resize → features.
    """
    if not use_fake_decoder:
        raise NotImplementedError("image codecs are not available in this environment")
    target = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for blob in pdf["content"]:
                raw = bytes(blob)
                # <- real impl: decode, resize to (target_w, target_h), re-encode
                if len(raw) >= target:
                    step = len(raw) // target
                    raw = raw[:: step][:target]
                else:
                    raw = raw + b"\x00" * (target - len(raw))
                resized.append(raw)
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


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: emit N evenly-spaced byte
    slices per row (fake frames; a real impl swaps the slicer for a
    demuxer). Demonstrates the 1→N row explosion shape in mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(blob)
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame"].append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)
