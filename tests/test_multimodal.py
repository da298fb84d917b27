"""Unit tests for the multimodal plumbing: binary schema, Arrow batch flow,
decode-stub determinism, frame-sample explosion arithmetic."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.multimodal import (
    FEATURE_SCHEMA,
    attach_media_columns,
    decode_media,
    extract_media_features,
    frame_sample_stub,
)

SF = "/root/testdata/sf0.001"


def test_media_columns_binary_typed(spark):
    media = attach_media_columns(load_table(spark, SF, "documents"))
    assert media.schema["content"].dataType == T.BinaryType()
    assert media.schema["media_type"].dataType == T.StringType()
    types = {r[0] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_feature_extraction_one_to_one(spark):
    docs = load_table(spark, SF, "documents")
    feats = extract_media_features(attach_media_columns(docs))
    assert feats.schema == FEATURE_SCHEMA
    assert feats.count() == docs.count()  # 1:1, no drops
    # spot-check digest correctness against driver-side hashing
    doc = docs.filter(F.col("doc_id") == 0).collect()[0]
    feat = feats.filter(F.col("doc_id") == 0).collect()[0]
    assert feat["digest"] == hashlib.md5(doc["text"].encode()).hexdigest()
    assert feat["n_bytes"] == len(doc["text"].encode())
    assert feat["decoder"] == "stub"


def test_decode_stub_deterministic():
    w1, h1, d1 = decode_media(b"same bytes", "image")
    w2, h2, d2 = decode_media(b"same bytes", "image")
    assert (w1, h1, d1) == (w2, h2, d2)
    assert d1 == "stub" and 64 <= w1 < 80 and 64 <= h1 < 80


def test_frame_sample_counts(spark):
    docs = load_table(spark, SF, "documents")
    media = attach_media_columns(docs)
    frames = frame_sample_stub(media, every_n_bytes=64)
    videos = media.filter(F.col("media_type") == "video")
    # ceil(n_bytes / 64) frames per video item
    expected = videos.select(
        F.ceil(F.length(F.col("content")) / 64).cast("long").alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert frames.count() == expected
    assert frames.filter(F.col("byte_offset") % 64 != 0).count() == 0


# --- pillow decode branch via a sys.modules-injected fake -------------------
# Pillow is not in this image (and installs are off-limits), so the real
# decode branch is exercised the same way the Delta MERGE branch is: a fake
# PIL.Image whose open() yields known dims, or raises (corrupt bytes).


def _install_fake_pil(monkeypatch, *, width=None, height=None, raises=False):
    import sys
    import types

    class _Im:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImage:
        @staticmethod
        def open(buf):
            if raises:
                raise OSError("cannot identify image file")
            im = _Im()
            im.width, im.height = width, height
            return im

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = FakeImage.open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_decode_pillow_path(monkeypatch):
    from stock_etl_pipeline_spark.multimodal import _make_decoder

    _install_fake_pil(monkeypatch, width=123, height=45)
    assert _make_decoder()(b"\x89PNG...", "image") == (123, 45, "pillow")


def test_decode_corrupt_image_flagged(monkeypatch):
    from stock_etl_pipeline_spark.multimodal import _make_decoder

    _install_fake_pil(monkeypatch, raises=True)
    assert _make_decoder()(b"not an image", "image") == (-1, -1, "corrupt")


def test_decode_non_image_skips_decoder(monkeypatch):
    """audio/video blobs never enter the image decoder, even when present."""
    from stock_etl_pipeline_spark.multimodal import _make_decoder

    _install_fake_pil(monkeypatch, raises=True)
    w, h, mode = _make_decoder()(b"riff-ish bytes", "audio")
    assert mode == "stub" and w >= 64 and h >= 64
