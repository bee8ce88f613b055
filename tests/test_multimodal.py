"""Multimodal plumbing: binary columns + metadata, Arrow-batched feature
extraction, stubbed decode paths."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from kaer_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_fake_media,
    extract_media_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(documents):
    return attach_fake_media(documents.limit(50))


def test_media_schema(media_df):
    schema = dict(media_df.dtypes)
    assert schema["media"] == "binary"
    assert schema["media_meta"].startswith("struct<mime:string,n_bytes:bigint")
    row = media_df.select("media", "media_meta", "text").first()
    assert bytes(row["media"]) == row["text"].encode("utf-8")
    assert row["media_meta"]["n_bytes"] == len(row["media"])


def test_feature_extraction_matches_numpy(media_df):
    feats = {r["doc_id"]: r for r in extract_media_features(media_df).collect()}
    rows = media_df.select("doc_id", "text").collect()
    assert len(feats) == len(rows)
    for r in rows:
        arr = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8)
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == arr.size
        assert abs(f["byte_mean"] - float(arr.mean())) < 1e-12
        hist = np.bincount(arr // (256 // FEATURE_DIM), minlength=FEATURE_DIM)
        assert f["byte_histogram"] == hist.tolist()
        assert f["content_digest"] == hashlib.blake2b(
            r["text"].encode("utf-8"), digest_size=8
        ).hexdigest()


def test_feature_determinism(media_df):
    a = sorted(map(str, extract_media_features(media_df).collect()))
    b = sorted(map(str, extract_media_features(media_df).collect()))
    assert a == b


def test_real_decode_is_stubbed(media_df):
    with pytest.raises(NotImplementedError):
        extract_media_features(media_df, decode="real")
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            resize_images(media_df, decode="real")


def test_resize_fake_decode(media_df):
    out = resize_images(media_df, width=16, height=8)
    rows = out.collect()
    assert len(rows) == media_df.count()
    for r in rows:
        assert len(r["resized"]) == 16 * 8
        assert r["out_width"] == 16 and r["out_height"] == 8
    # deterministic: same input → same bytes
    again = {r["doc_id"]: r["resized"] for r in resize_images(media_df, width=16, height=8).collect()}
    for r in rows:
        assert bytes(r["resized"]) == bytes(again[r["doc_id"]])


def test_frame_sampling_offsets(media_df):
    out = sample_frames(media_df, every_ms=1000).select(
        "media_meta.duration_ms", "frame_offsets_ms"
    )
    for r in out.collect():
        offsets = r["frame_offsets_ms"]
        assert offsets[0] == 0
        assert all(b - a == 1000 for a, b in zip(offsets, offsets[1:]))
        assert offsets[-1] <= max(r["duration_ms"] - 1, 0)
