"""Multimodal plumbing tests: binary columns + mapInPandas stages
(decode is a deterministic fake; the Spark-side contract is real)."""

from __future__ import annotations

import hashlib

import pytest

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return multimodal.attach_media(load_table(spark, sf_dir, "documents").limit(50))


def test_attach_media_metadata(spark, sf_dir, media):
    r = media.filter("doc_id = 0").collect()[0]
    text = (
        load_table(spark, sf_dir, "documents").filter("doc_id = 0").collect()[0].text
    )
    assert bytes(r.content).decode() == text
    assert r.meta.n_bytes == len(bytes(r.content))
    assert r.meta.sha256 == hashlib.sha256(bytes(r.content)).hexdigest()


def test_image_features_deterministic(spark, media):
    a = {r.doc_id: (r.width, r.height, r.n_bytes) for r in
         multimodal.extract_image_features(media).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_bytes) for r in
         multimodal.extract_image_features(media).collect()}
    assert a == b and len(a) == 50
    assert all(64 <= w < 256 and 64 <= h < 256 for w, h, _ in a.values())


def test_real_decoder_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        multimodal.extract_image_features(media, use_fake_decoder=False).collect()


def test_frame_sampling_explodes_rows(spark, media):
    frames = multimodal.sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 50 * 4
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_no)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def test_resize_composes_with_features(spark, sf_dir):
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.attach_media(docs)
    resized = multimodal.resize_images(media, target_w=16, target_h=16)
    rows = resized.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(bytes(r.content)) == 256
        assert r.meta.n_bytes == 256
        assert r.meta.media_type.endswith(";resized")
    # output schema matches the media schema, so stages compose
    feats = multimodal.extract_image_features(resized).collect()
    assert len(feats) == 20 and all(f.n_bytes == 256 for f in feats)


def test_audio_features_deterministic(spark, sf_dir):
    import math

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = multimodal.attach_media(docs, media_type="audio/fake")
    rows = {r.doc_id: r for r in multimodal.extract_audio_features(media).collect()}
    assert len(rows) == 10
    for r in rows.values():
        assert r.n_samples >= 0 and math.isfinite(r.rms) and 0.0 <= r.rms <= 1.0
        assert abs(r.duration_s - r.n_samples / 16000) < 1e-12
    # determinism: same payloads → same features on a rerun
    again = {r.doc_id: r for r in multimodal.extract_audio_features(media).collect()}
    assert {k: (v.n_samples, v.rms) for k, v in rows.items()} == {
        k: (v.n_samples, v.rms) for k, v in again.items()
    }
