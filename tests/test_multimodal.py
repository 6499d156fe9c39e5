"""Multimodal pipeline plumbing tests: decode (stub) → resize (real
block-mean pooling) → embedding; video frame fan-out; determinism."""

from __future__ import annotations

import numpy as np
import pytest

from alix_spark.textops import multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    m = multimodal.as_media_table(docs).persist()
    m.count()
    return m


def test_decode_image_shapes(spark, media):
    dec = multimodal.decode_image(media).collect()
    assert len(dec) == 30
    for r in dec:
        assert (r["width"], r["height"], r["channels"]) == (32, 32, 3)
        assert len(r["pixels"]) == 32 * 32 * 3


def test_real_decode_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(media, real_decode=True)
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample(media, real_decode=True)


def test_resize_block_mean(spark, media):
    dec = multimodal.decode_image(media)
    res = multimodal.resize_images(dec, size=8).collect()
    for r in res:
        assert (r["width"], r["height"]) == (8, 8)
        assert len(r["pixels"]) == 8 * 8 * 3
    # verify one pooled value by hand
    d0 = {r["media_id"]: r for r in dec.collect()}
    r0 = res[0]
    a = np.frombuffer(bytes(d0[r0["media_id"]]["pixels"]), np.uint8).reshape(32, 32, 3)
    want = a.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3)).astype(np.uint8)
    got = np.frombuffer(bytes(r0["pixels"]), np.uint8).reshape(8, 8, 3)
    assert (got == want).all()


def test_frame_sample_fanout(spark, media):
    frames = multimodal.frame_sample(media, n_frames=4).collect()
    assert len(frames) == 30 * 4
    by_media: dict[int, list[int]] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_image_embedding_unit_norm(spark, media):
    emb = multimodal.image_embedding(
        multimodal.resize_images(multimodal.decode_image(media), size=8)
    ).collect()
    for r in emb:
        v = np.array(r["embedding"])
        assert v.size == 16
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3


def test_pipeline_deterministic(spark, media):
    p = lambda: multimodal.image_embedding(  # noqa: E731
        multimodal.resize_images(multimodal.decode_image(media), size=8)
    ).orderBy("media_id").collect()
    assert [tuple(r) for r in p()] == [tuple(r) for r in p()]


def test_string_ids_and_null_payloads(spark):
    """String doc ids hash to stable non-NULL media_ids (a bare long
    cast NULLed them), and NULL payloads flow as empty media instead of
    crashing the Arrow stage (review regressions)."""
    docs = spark.createDataFrame(
        [("https://a/1", "bonjour"), ("https://a/2", None)],
        "url string, text string",
    )
    media = multimodal.as_media_table(docs, id_col="url")
    rows = media.collect()
    ids = [r["media_id"] for r in rows]
    assert all(i is not None for i in ids) and len(set(ids)) == 2
    feats = multimodal.decode_features(media, feat_dim=4).collect()
    assert len(feats) == 2
    null_feat = [r for r in feats if r["features"] == [0.0] * 4]
    assert len(null_feat) == 1  # the NULL-text doc: zero vector
    frames = multimodal.frame_sample(media, n_frames=2).collect()
    assert len(frames) == 4
