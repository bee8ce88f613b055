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


def test_image_dhash_python_replay(spark):
    """dHash fingerprints ≡ a pure-python replay of the fake decode +
    adjacent-pixel comparison (bit c of row r set iff p[r,c] < p[r,c+1]
    on the 9x8 resample)."""
    from kaer_spark.operators.multimodal import image_dhash

    blobs = [
        (1, bytes(range(100))),       # monotone ramp → all bits set
        (2, bytes([5] * 80)),         # constant → no bits
        (3, b""),                     # empty → decodes to zeros → no bits
        (4, bytes([7, 200] * 50)),
    ]
    df = spark.createDataFrame(blobs, "doc_id long, media binary")
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}

    def py_dhash(raw: bytes):
        src = list(raw) if raw else [0]
        px = [src[(i * len(src)) // 72] for i in range(72)]
        out = []
        for r in range(8):
            byte = 0
            for c in range(8):
                if px[9 * r + c] < px[9 * r + c + 1]:
                    byte |= 1 << c
            out.append(byte)
        return out

    for doc_id, raw in blobs:
        assert got[doc_id] == py_dhash(raw), doc_id
    assert got[1] == [255] * 8
    assert got[2] == [0] * 8 and got[3] == [0] * 8


def test_image_near_dups_finds_perceptual_copies(spark):
    """A lightly perturbed copy pairs with its original at small hamming;
    a structurally different blob does not; exact copies collide at 0."""
    from kaer_spark.operators.multimodal import image_near_dups

    def py_dhash(raw: bytes):
        src = list(raw) if raw else [0]
        px = [src[(i * len(src)) // 72] for i in range(72)]
        return [
            sum(
                1 << c
                for c in range(8)
                if px[9 * r + c] < px[9 * r + c + 1]
            )
            for r in range(8)
        ]

    def py_ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    base = bytes((i * 13) % 251 for i in range(300))
    # perturb at RESAMPLED positions so a handful of adjacent comparisons
    # actually flip (edits between sample points are invisible to dHash)
    perturbed = bytearray(base)
    for i in (5, 23, 41):
        perturbed[(i * 300) // 72] = 255
    want_ham = py_ham(py_dhash(base), py_dhash(bytes(perturbed)))
    assert 0 < want_ham <= 10  # fixture sanity: a true near-dup
    rows = [
        (1, base),
        (2, base),                   # exact copy → hamming 0
        (3, bytes(perturbed)),       # near copy → small hamming
        (4, bytes(reversed(base))),  # structurally inverted
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(df, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs.get((1, 3)) == want_ham
    assert not any(4 in p for p in pairs)
    import pytest as _p

    with _p.raises(ValueError):
        from kaer_spark.operators.multimodal import image_dhash

        image_dhash(df, decode="jpeg")


def test_image_near_dups_complete_at_threshold(spark):
    """Pigeonhole completeness (r9 verdict item #4 / r11 fix): with
    bands derived as max_hamming + 1, EVERY pair within the declared
    threshold is found — verified exhaustively against all-pairs hamming
    over the collected signatures, at thresholds the old fixed four-band
    split was incomplete for (4..6) and beyond."""
    from itertools import combinations

    from kaer_spark.operators.multimodal import image_dhash, image_near_dups

    rng_rows = [
        (i, bytes(((i * 37 + j * 101 + (i * j) % 17) % 256) for j in range(120)))
        for i in range(24)
    ]
    df = spark.createDataFrame(rng_rows, "doc_id long, media binary")
    sigs = {
        r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    for max_hamming in (0, 4, 6, 11, 20):
        want = {
            (a, b, ham(sigs[a], sigs[b]))
            for a, b in combinations(sorted(sigs), 2)
            if ham(sigs[a], sigs[b]) <= max_hamming
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in image_near_dups(df, max_hamming=max_hamming).collect()
        }
        assert got == want, (max_hamming, want - got, got - want)
